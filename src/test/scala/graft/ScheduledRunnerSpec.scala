package graft

import java.nio.file.Files

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The scheduled entry point: retry/backoff semantics (the DAG's
  * `retries`/`retry_delay`, `0eeeb621168f_dag.py:29-33`) and an end-to-end
  * run over fixture JSON writing the 9 reference-query results.
  */
class ScheduledRunnerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("withRetries: transient failures retry with doubling backoff") {
    val delays = ListBuffer.empty[Long]
    var calls = 0
    val out = ScheduledRunner.withRetries(3, 100L, delays += _) { tryNo =>
      calls += 1
      if (calls < 3) sys.error("transient") else s"ok-$tryNo"
    }
    assert(out === "ok-2")
    assert(calls === 3)
    assert(delays.toSeq === Seq(100L, 200L))
  }

  test("withRetries: exhausted retries rethrow the last failure") {
    var calls = 0
    val e = intercept[RuntimeException] {
      ScheduledRunner.withRetries(2, 1L, _ => ()) { _ =>
        calls += 1; sys.error("boom")
      }
    }
    assert(calls === 3) // 1 attempt + 2 retries
    assert(e.getMessage === "boom")
  }

  test("runOnce: fixture JSON -> cleaned tables -> 9 results on disk") {
    val base = Files.createTempDirectory("graft_sched").toString
    def write(name: String, lines: Seq[String]): String = {
      val d = new java.io.File(s"$base/$name"); d.mkdirs()
      java.nio.file.Files.write(new java.io.File(d, "part-0.json").toPath,
        lines.mkString("\n").getBytes("UTF-8"))
      d.toString
    }
    def pin(i: Int) =
      s"""{"index": $i, "unique_id": "u$i", "title": "t$i", """ +
        s""""description": "d$i", "poster_name": "p$i", """ +
        s""""follower_count": "${i}k", "tag_list": "x", """ +
        s""""is_image_or_video": "image", "image_src": "http://i/$i", """ +
        s""""downloaded": "1", "save_location": "Local save in /d/$i", """ +
        s""""category": "art"}"""
    def geo(i: Int) =
      s"""{"ind": $i, "country": "C$i", "latitude": 1.0, """ +
        s""""longitude": 2.0, "timestamp": "2021-06-01T12:00:00"}"""
    def user(i: Int) =
      s"""{"ind": $i, "first_name": "F$i", "last_name": "L$i", """ +
        s""""age": ${20 + i}, "date_joined": "2019-03-01T00:00:00"}"""
    val pinDir = write("pin", (1 to 3).map(pin))
    val geoDir = write("geo", (1 to 3).map(geo))
    val userDir = write("user", (1 to 3).map(user))
    val outDir = s"$base/out"
    ScheduledRunner.runOnce(spark, pinDir, geoDir, userDir, outDir)
    (1 to 9).foreach { q =>
      val df = spark.read.parquet(s"$outDir/q$q")
      assert(df.count() > 0, s"q$q wrote no rows")
    }
  }
}
