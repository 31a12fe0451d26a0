package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Ranks

/** Direct property gate for [[graft.ops.Ranks]] — the distributed rank
  * helper five driver-gated queries stand on (txt_gini_tokens,
  * txt_quality_gate, txt_ccnet_buckets/_bigram, ev_gini_value) plus
  * txt_zipf_fit's global form. Its bit-identity claim was previously
  * verified only end-to-end (consuming oracles hash-exact vs DuckDB);
  * this spec pins the contract itself — random frames × partition
  * counts × tie patterns against the naive single-window rank — so a
  * refactor of the range-sort + offset scheme (or of the
  * localCheckpoint boundary-pinning it depends on) fails HERE, not
  * five oracles downstream.
  */
class RanksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  /** Random (key, v, id) frame: `keys` distinct keys, values drawn from
    * a domain of size `vDomain` (small domain ⇒ heavy ties — range
    * boundaries MUST not split them wrongly; id is the unique
    * tiebreak), pre-shuffled into `parts` input partitions.
    */
  private def frame(seed: Int, n: Int, keys: Int, vDomain: Int,
      parts: Int) = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      (s"k${rnd.nextInt(keys)}", rnd.nextInt(vDomain).toLong, i.toLong)
    }
    rows.toDF("key", "v", "id").repartition(parts)
  }

  private def collected(df: org.apache.spark.sql.DataFrame) =
    df.select("key", "v", "id", "r").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        r.getLong(3)).toMap

  test("perKeyRank ≡ naive per-key window row_number over random " +
      "frames × partition counts × tie patterns") {
    val cases = Seq(
      // (seed, n, keys, vDomain, input parts, shuffle parts)
      (1, 0, 3, 5, 2, 4),      // empty
      (2, 1, 1, 1, 1, 4),      // single row
      (3, 200, 1, 3, 7, 4),    // ONE giant key, heavy ties
      (4, 300, 4, 2, 3, 8),    // near-total ties within keys
      (5, 500, 5, 50, 9, 3),   // mixed
      (6, 50, 10, 1, 2, 16),   // all-tie values, many keys, tiny slices
      (7, 400, 2, 400, 5, 5))  // mostly unique values
    cases.foreach { case (seed, n, keys, vDomain, parts, shuffle) =>
      TestSpark.withConfs("spark.sql.shuffle.partitions" ->
          shuffle.toString) {
        val df = frame(seed, n, keys, vDomain, parts)
        val got = collected(Ranks.perKeyRank(df, "key",
          Seq(col("v"), col("id")), "r"))
        val want = collected(df.withColumn("r",
          row_number().over(Window.partitionBy("key")
            .orderBy("v", "id")).cast("long")))
        assert(got === want, s"case seed=$seed n=$n keys=$keys " +
          s"vDomain=$vDomain parts=$parts shuffle=$shuffle")
      }
    }
  }

  test("perKeyRank with descending order ≡ the naive desc window") {
    val df = frame(11, 300, 3, 4, 6)
    val got = collected(Ranks.perKeyRank(df, "key",
      Seq(col("v").desc, col("id")), "r"))
    val want = collected(df.withColumn("r",
      row_number().over(Window.partitionBy("key")
        .orderBy(col("v").desc, col("id"))).cast("long")))
    assert(got === want)
  }

  test("globalRank ≡ naive global window row_number (incl. desc order " +
      "and ties)") {
    Seq((21, 0, 1, 1, 2, 4), (22, 1, 1, 1, 1, 4), (23, 400, 1, 3, 7, 8),
        (24, 250, 1, 250, 4, 3)).foreach {
      case (seed, n, _, vDomain, parts, shuffle) =>
        TestSpark.withConfs("spark.sql.shuffle.partitions" ->
            shuffle.toString) {
          val df = frame(seed, n, 1, vDomain, parts)
          val got = collected(Ranks.globalRank(df,
            Seq(col("v").desc, col("id")), "r"))
          val want = collected(df.withColumn("r",
            row_number().over(Window.orderBy(col("v").desc, col("id")))
              .cast("long")))
          assert(got === want, s"case seed=$seed n=$n parts=$parts")
        }
    }
  }

  test("globalRank ≡ naive global window, ASCENDING order, random " +
      "frames × partition counts × tie patterns (the perKeyRank case " +
      "grid, keyless)") {
    val cases = Seq(
      // (seed, n, vDomain, input parts, shuffle parts)
      (41, 200, 3, 7, 4),   // heavy ties — boundaries must not split them
      (42, 300, 2, 3, 8),   // near-total ties
      (43, 500, 50, 9, 3),  // mixed
      (44, 50, 1, 2, 16),   // ALL-tie values, tiny slices, many parts
      (45, 400, 400, 5, 5)) // mostly unique values
    cases.foreach { case (seed, n, vDomain, parts, shuffle) =>
      TestSpark.withConfs("spark.sql.shuffle.partitions" ->
          shuffle.toString) {
        val df = frame(seed, n, 1, vDomain, parts)
        val got = collected(Ranks.globalRank(df,
          Seq(col("v"), col("id")), "r"))
        val want = collected(df.withColumn("r",
          row_number().over(Window.orderBy(col("v"), col("id")))
            .cast("long")))
        assert(got === want, s"case seed=$seed n=$n vDomain=$vDomain " +
          s"parts=$parts shuffle=$shuffle")
      }
    }
  }

  test("globalRank ranks are a permutation of 1..n (offsets stitch " +
      "slices with no gap or overlap across many partition counts)") {
    (1 to 9).foreach { parts =>
      val df = frame(30 + parts, 123, 1, 6, parts)
      val ranks = Ranks.globalRank(df, Seq(col("v"), col("id")), "r")
        .select("r").as[Long].collect().sorted.toSeq
      assert(ranks === (1L to 123L).toSeq, s"parts=$parts")
    }
  }

  test("ntileOfRank ≡ SQL NTILE for every (n, tiles) shape incl. " +
      "n < tiles") {
    Seq((1, 4), (3, 4), (4, 4), (5, 4), (17, 4), (100, 7), (99, 100))
      .foreach { case (n, tiles) =>
        val df = (1 to n).map(i => (i.toLong, n.toLong)).toDF("rank", "n")
        val got = df.select(col("rank"),
            Ranks.ntileOfRank("rank", "n", tiles).as("b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = (1 to n).map(_.toLong).toDF("rank")
          .withColumn("b", ntile(tiles).over(Window.orderBy("rank"))
            .cast("long"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === want, s"n=$n tiles=$tiles")
      }
  }
}
