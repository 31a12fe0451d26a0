package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MattrWindowSum

/** Pins the compiled sliding count-map ([[MattrWindowSum]]) to its HOF
  * spec twin (transform over 1-based slices → array_distinct → sum)
  * across random token arrays, window sizes, tie patterns, and nulls —
  * the integer the gated `txt_mattr` divides by its window count.
  */
class MattrWindowSumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def hofSum(w: Int) = expr(
    s"""aggregate(transform(sequence(1, size(ws) - $w + 1),
      i -> size(array_distinct(slice(ws, i, $w)))),
      0L, (acc, x) -> acc + x)""")

  test("compiled ≡ HOF twin over random frames × window sizes " +
      "(heavy ties, tiny vocab, nulls)") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val n = rnd.nextInt(200)
      val vocab = 1 + rnd.nextInt(12)
      val ws = (0 until n).map { _ =>
        if (rnd.nextInt(20) == 0) null
        else s"t${rnd.nextInt(vocab)}"
      }
      (i.toLong, ws)
    }
    val df = rows.toDF("id", "ws").repartition(5)
    Seq(1, 3, 50).foreach { w =>
      val got = df.filter(size(col("ws")) >= w)
        .select(col("id"),
          MattrWindowSum.mattrWindowSumCompiled(col("ws"), w).as("a"),
          hofSum(w).as("b"))
        .collect()
      assert(got.nonEmpty, s"w=$w generated no eligible rows")
      got.foreach(r => assert(r.getLong(1) === r.getLong(2),
        s"id=${r.getLong(0)} w=$w"))
    }
  }

  test("shorter-than-window arrays return 0 (callers take the plain-" +
      "TTR branch) and the expression stays inside whole-stage codegen") {
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "ws")
    val r = df.select(
      MattrWindowSum.mattrWindowSumCompiled(col("ws"), 5)).collect()(0)
    assert(r.getLong(0) === 0L)
    TestSpark.withConfs("spark.sql.adaptive.enabled" -> "false") {
      val p = graft.ops.TextOps.mattr(spark, TestSpark.sf0001)
        .queryExecution.executedPlan.toString
      val lines = p.linesIterator
        .filter(_.contains("mattrwindowsum")).toSeq
      assert(lines.nonEmpty, s"no mattrwindowsum in plan:\n$p")
      lines.filter(_.contains("Project")).foreach(l =>
        assert(l.contains("*("),
          s"mattrwindowsum projection fell out of codegen:\n$l"))
    }
  }
}
