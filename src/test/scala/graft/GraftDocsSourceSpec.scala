package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 contract specs for the synthetic documents source:
  * pushdown reaches the source, pruning reaches the reader, generation
  * is deterministic and partition-parallel.
  */
class GraftDocsSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  private def read(rows: Long = 1000, partitions: Int = 4) =
    spark.read.format("graft.sources.v2.GraftDocsSource")
      .option("rows", rows.toString)
      .option("partitions", partitions.toString)
      .load()

  test("full read: exactly `rows` rows, doc_id dense 0..n-1, " +
      "spread over `partitions` input splits") {
    val df = read(rows = 1000, partitions = 4)
    assert(df.count() === 1000)
    assert(df.agg(min("doc_id"), max("doc_id"), countDistinct("doc_id"))
      .head().toSeq === Seq(0L, 999L, 1000L))
    assert(df.rdd.getNumPartitions === 4)
  }

  test("doc_id range filters are PUSHED (visible in the scan) and narrow " +
      "generation; non-id filters stay residual and still apply") {
    val df = read().filter(col("doc_id") >= 100 && col("doc_id") < 200)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedRange: [100, 200)"), plan)
    assert(df.count() === 100)
    // residual filter on a generated column composes with the pushed range
    val en = read().filter(col("doc_id") < 400 && col("lang") === "en")
    val rows = en.collect()
    assert(rows.nonEmpty && rows.forall(r =>
      r.getAs[Long]("doc_id") < 400 && r.getAs[String]("lang") == "en"))
  }

  test("column pruning reaches the reader (ReadSchema excludes text) " +
      "and values are deterministic across reruns and layouts") {
    val slim = read().select("doc_id", "lang")
    val plan = slim.queryExecution.executedPlan.toString
    assert(plan.contains("ReadColumns: [doc_id,lang]"), plan)
    // determinism: same rows regardless of partition layout or run
    val a = read(rows = 300, partitions = 2).collect()
      .map(_.toString).sorted.toSeq
    val b = read(rows = 300, partitions = 7).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b)
    // content is a pure function of doc_id: n_chars agrees with text
    val bad = read(rows = 300, partitions = 3)
      .filter(length(col("text")).cast("long") =!= col("n_chars")).count()
    assert(bad === 0)
  }

  private def readBucketed(rows: Long, bucketSize: Long) =
    spark.read.format("graft.sources.v2.GraftDocsSource")
      .option("rows", rows.toString)
      .option("bucketSize", bucketSize.toString)
      .load()

  test("storage-partitioned join (SupportsReportPartitioning): a doc_id-" +
      "range self-join of two bucketed graftdocs scans plans with ZERO " +
      "Exchange — the reported KeyGroupedPartitioning(identity(id_bucket" +
      ")) co-locates both sides — and returns the plain-join rows") {
    TestSpark.withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      // join keys (id_bucket, doc_id) are a SUPERSET of the partition
      // key — subset co-partitioning must be allowed for SPJ to engage
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false") {
      val a = readBucketed(1000, 125).as("a")
      val b = readBucketed(1000, 125).as("b")
      val j = a.join(b,
        col("a.id_bucket") === col("b.id_bucket") &&
          col("a.doc_id") === col("b.doc_id"))
        .select(col("a.doc_id"), col("a.n_chars"), col("b.lang"))
      val exec = j.queryExecution.executedPlan
      val shuffles = exec.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"storage-partitioned join still shuffles:\n$exec")
      assert(j.count() === 1000)
      // identical rows as the unbucketed self-join (bucketing is layout)
      val plainCnt = read(1000).as("x")
        .join(read(1000).as("y"), col("x.doc_id") === col("y.doc_id"))
        .count()
      assert(plainCnt === 1000)
    }
  }

  test("bucketed mode: id_bucket = doc_id / bucketSize, constant per " +
      "input split; unbucketed reads are unchanged (no id_bucket column)") {
    val df = readBucketed(1000, 125)
    assert(df.schema.fieldNames.contains("id_bucket"))
    assert(df.filter(col("id_bucket") =!= expr("doc_id div 125"))
      .count() === 0)
    assert(df.rdd.getNumPartitions === 8) // 1000/125 bucket-aligned splits
    // each split holds exactly one bucket value
    import spark.implicits._
    val perSplit = df.select(col("id_bucket"))
      .mapPartitions(it => Iterator(it.map(_.getLong(0)).toSet.size))
      .collect()
    assert(perSplit.forall(_ <= 1), perSplit.mkString(","))
    assert(!read(1000).schema.fieldNames.contains("id_bucket"))
  }

  test("micro-batch stream: offset-paced batches, exactly-once totals, " +
      "stream rows identical to the batch read") {
    val dir = java.nio.file.Files.createTempDirectory("graftdocs-stream")
    val stream = spark.readStream
      .format("graft.sources.v2.GraftDocsSource")
      .option("rows", "350").option("partitions", "3").load()
    val q = stream.writeStream.format("memory").queryName("gds_out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("gds_out")
      // drained to completion: every id exactly once (350 rows over
      // ceil(350/100)=4 offset-paced micro-batches)
      assert(out.count() === 350)
      assert(out.select("doc_id").distinct().count() === 350)
      // stream content ≡ batch content (same pure-function generation)
      val batch = read(rows = 350, partitions = 3)
      assert(out.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(out).count() === 0)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
        "expected ≥4 non-empty offset-paced micro-batches")
    } finally q.stop()
  }

  test("the source composes with engine operators (language histogram " +
      "over generated docs)") {
    val hist = read(rows = 2000, partitions = 8)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hist.keySet === Set("en", "de", "fr", "es"))
    assert(hist.values.sum === 2000L)
  }
}
