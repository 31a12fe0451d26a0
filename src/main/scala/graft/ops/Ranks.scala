package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed per-key ranking — the scale-safe replacement for
  * `row_number()/ntile() OVER (PARTITION BY key ORDER BY ...)` when a
  * single key's group is data-sized (one language of a corpus, one
  * tenant of a log): the naive window plans ONE task that sorts the
  * whole group, which is exactly the "one task sorts all of English"
  * shape flagged at 100 TB.
  *
  * Shape here (the classic range-sort + per-partition offset scheme —
  * how Spark's own `zipWithIndex` assigns global indices):
  *
  *  1. `repartitionByRange(key, order...)` — the total (key, order)
  *     order is split across ALL shuffle partitions, so a giant key
  *     spans many partitions instead of collapsing into one task.
  *  2. `localCheckpoint()` — pins the sampled range boundaries: the
  *     offsets branch and the join branch must see the IDENTICAL
  *     partitioning (re-evaluating the range exchange re-samples with
  *     a fresh RDD id and could move boundaries between the two
  *     consumers, silently mis-keying offsets).
  *  3. Per-(partition, key) counts — a tiny (numPartitions × keys)
  *     frame; a cumulative window over it (bounded, never data-sized)
  *     yields each slice's global rank offset.
  *  4. Broadcast the offsets back; `row_number` within (partition,
  *     key) — every window group is at most one range-partition's
  *     slice of one key, bounded by partition size, not key size —
  *     plus the offset is the exact global per-key rank.
  *
  * Ranks are bit-identical to the single-window form for any total
  * `order` (callers include a unique tiebreak column, so range
  * boundaries can never split ties).
  *
  * Intended for LOW-cardinality keys whose groups are data-sized
  * (languages, event types, tenants): the offsets frame is
  * numPartitions × |keys| rows and must stay broadcastable. A
  * HIGH-cardinality key (per-user, per-document) means small groups —
  * there the plain hash-partitioned window is already the right plan
  * and this helper buys nothing.
  */
private[graft] object Ranks {

  /** Adds `rankName`: the 1-based rank of each row within its `key`
    * group under `order` (must be a total order within each key —
    * include a unique tiebreak). LONG, dense, exact.
    */
  def perKeyRank(df: DataFrame, key: String, order: Seq[Column],
      rankName: String): DataFrame = {
    val sorted = df
      .repartitionByRange((col(key) +: order): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val offsets = sorted
      .groupBy(col("__pid"), col(key))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset", coalesce(
        sum(col("__cnt")).over(Window.partitionBy(key).orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col(key), col("__offset"))
    sorted.join(broadcast(offsets), Seq("__pid", key))
      .withColumn(rankName,
        row_number().over(Window.partitionBy(col("__pid"), col(key))
          .orderBy(order: _*)).cast(LongType) + col("__offset"))
      .drop("__pid", "__offset")
  }

  /** Adds `rankName`: the 1-based GLOBAL rank of each row under `order`
    * (a total order — include a unique tiebreak), LONG and exact — the
    * keyless sibling of [[perKeyRank]] for ranks over a frame that is
    * itself data-sized (a web corpus's vocabulary has 10⁸–10⁹ terms:
    * "small next to facts" is still far too big for the one task a
    * global `row_number()` window plans).
    *
    * Same range-sort scheme, but the offsets are the per-partition row
    * counts cumulated — exactly how Spark's own `RDD.zipWithIndex`
    * assigns global indices: the counts frame is numPartitions rows
    * (bounded by CLUSTER size, not data), so it is collected to the
    * driver, prefix-summed, and shipped back as a literal pid→offset
    * map — no extra shuffle, no single-partition window anywhere. The
    * driver pull is whitelisted bounded state (CollectWhitelistSpec):
    * numPartitions longs.
    */
  def globalRank(df: DataFrame, order: Seq[Column],
      rankName: String): DataFrame = {
    val sorted = df
      .repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = sorted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init)
    sorted
      .withColumn(rankName,
        row_number().over(Window.partitionBy(col("__pid"))
          .orderBy(order: _*)).cast(LongType)
          + coalesce(element_at(
            typedLit(offsets.toMap), col("__pid")), lit(0L)))
      .drop("__pid")
  }

  /** NTILE(`tiles`) bucket from a per-key rank and group size — the
    * exact integer semantics of SQL NTILE (first `n mod tiles` buckets
    * get the extra row), computed arithmetically so no window is
    * needed once [[perKeyRank]] has run. Takes column NAMES because the
    * arithmetic must be integer `div` end to end (`/` on longs is
    * double true-division — a float must never decide a bucket
    * boundary; the [[TextOps.mixtureSampleFrom]] discipline). Result
    * is LONG in [1, tiles]. With n < tiles the ELSE branch (div by
    * q=0) is unreachable: every rank ≤ n = the THEN cutoff.
    */
  def ntileOfRank(rank: String, n: String, tiles: Int): Column = {
    val q = s"($n div $tiles)"
    val r = s"($n % $tiles)"
    val cut = s"($r * ($q + 1))" // rows in the oversized buckets
    expr(s"""CASE WHEN $rank <= $cut
      THEN ($rank + $q) div ($q + 1)
      ELSE $r + ($rank - $cut + $q - 1) div $q END""")
  }
}
