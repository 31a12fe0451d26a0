package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VowelRunSum

/** Pins the compiled vowel-run scan ([[VowelRunSum]]) to its HOF/regex
  * spec twin across random tokens (runs at edges, all-vowel, no-vowel,
  * unicode, empty) — the syllable integer `txt_readability` divides.
  */
class VowelRunSumSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private val hofSum = expr(
    """aggregate(transform(ws,
      w -> size(regexp_extract_all(w, '[aeiouy]+', 0))),
      0L, (acc, x) -> acc + x)""")

  test("compiled ≡ regex twin over random token arrays (edge runs, " +
      "all-vowel, consonant-only, multi-byte unicode, empty strings)") {
    val rnd = new scala.util.Random(13)
    val alphabet = "aeiouy" + "bcdfgkz" + "éßñ日本" // vowels, consonants, unicode
    val rows = (0 until 300).map { i =>
      val nTok = rnd.nextInt(30)
      val ws = (0 until nTok).map { _ =>
        val len = rnd.nextInt(12)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length)))
          .mkString
      }
      (i.toLong, ws)
    } ++ Seq(
      (1000L, Seq("aeiouy")), (1001L, Seq("bcd")), (1002L, Seq("")),
      (1003L, Seq("yay", "oui", "rhythm", "xyzzy")),
      (1004L, Seq.empty[String]))
    val got = rows.toDF("id", "ws").repartition(4)
      .select(col("id"),
        VowelRunSum.vowelRunSumCompiled(col("ws")).as("a"),
        hofSum.as("b"))
      .collect()
    got.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"id=${r.getLong(0)}"))
  }

  test("readability's syllable projection stays inside whole-stage " +
      "codegen") {
    TestSpark.withConfs("spark.sql.adaptive.enabled" -> "false") {
      val p = graft.ops.TextOps.readability(spark, TestSpark.sf0001)
        .queryExecution.executedPlan.toString
      val lines = p.linesIterator
        .filter(_.contains("vowelrunsum")).toSeq
      assert(lines.nonEmpty, s"no vowelrunsum in plan:\n$p")
      lines.filter(_.contains("Project")).foreach(l =>
        assert(l.contains("*("),
          s"vowelrunsum projection fell out of codegen:\n$l"))
    }
  }
}
