package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.GraftStore

/** The DSv2 write path: two-phase batch commit (append + truncating
  * overwrite), read-back through the same table, and the streaming
  * epoch-idempotence contract under replay.
  */
class GraftStoreSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val fmt = "graft.sources.v2.GraftStoreSink"

  test("batch append commits atomically and reads back; second append " +
      "accumulates") {
    import spark.implicits._
    GraftStore.drop("t_rt")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "tag", "v")
    df.write.format(fmt).option("table", "t_rt").mode("append").save()
    val back = spark.read.format(fmt).option("table", "t_rt").load()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(back === Set((1L, "a", 1.5), (2L, "b", 2.5)))
    Seq((3L, "c", 3.5)).toDF("id", "tag", "v")
      .write.format(fmt).option("table", "t_rt").mode("append").save()
    assert(GraftStore.rows("t_rt").size === 3)
  }

  test("complex-typed columns (array/struct) are deep-copied at the task " +
      "boundary — rows must NOT alias the last row's buffer bytes") {
    import spark.implicits._
    GraftStore.drop("t_cpx")
    // one partition, many rows: the same InternalRow buffer is reused
    // for every write() call, so a missing copy makes all rows read
    // back as the final row's values
    spark.range(0, 100, 1, 1)
      .selectExpr("id", "array(id, id + 1) AS arr",
        "named_struct('a', id, 'b', CAST(id AS STRING)) AS st")
      .write.format(fmt).option("table", "t_cpx").mode("append").save()
    val back = spark.read.format(fmt).option("table", "t_cpx").load()
      .selectExpr("id", "arr[0] AS a0", "arr[1] AS a1", "st.a", "st.b")
      .collect()
    assert(back.length === 100)
    back.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === id && r.getLong(2) === id + 1,
        s"array aliased for id=$id: $r")
      assert(r.getLong(3) === id && r.getString(4) === id.toString,
        s"struct aliased for id=$id: $r")
    }
  }

  test("overwrite truncates inside the same atomic commit") {
    import spark.implicits._
    GraftStore.drop("t_ow")
    Seq((1L, "old")).toDF("id", "tag")
      .write.format(fmt).option("table", "t_ow").mode("append").save()
    Seq((2L, "new"), (3L, "new")).toDF("id", "tag")
      .write.format(fmt).option("table", "t_ow").mode("overwrite").save()
    val back = spark.read.format(fmt).option("table", "t_ow").load()
      .collect().map(_.getLong(0)).toSet
    assert(back === Set(2L, 3L), "overwrite must replace, not append")
  }

  test("wide rows survive the task->driver round trip (repartitioned " +
      "write: many writers, one atomic install)") {
    import spark.implicits._
    GraftStore.drop("t_wide")
    val df = spark.range(0, 1000)
      .selectExpr("id", "CAST(id AS STRING) AS s", "id * 1.5 AS d")
      .repartition(8)
    df.write.format(fmt).option("table", "t_wide").mode("append").save()
    assert(GraftStore.rows("t_wide").size === 1000)
    val sum = spark.read.format(fmt).option("table", "t_wide").load()
      .selectExpr("sum(id)").collect().head.getLong(0)
    assert(sum === (0L until 1000L).sum)
  }

  test("streaming epochs install exactly once: a replayed epoch commit " +
      "is a no-op") {
    val schema = StructType(Seq(StructField("id", LongType)))
    GraftStore.drop("t_ep")
    assert(GraftStore.installEpoch("t_ep", schema, "qA", 0L,
      Seq(Array[Any](1L), Array[Any](2L))))
    assert(GraftStore.rows("t_ep").size === 2)
    // checkpoint-recovery replay of the same epoch: must not duplicate
    assert(!GraftStore.installEpoch("t_ep", schema, "qA", 0L,
      Seq(Array[Any](1L), Array[Any](2L))))
    assert(GraftStore.rows("t_ep").size === 2)
    assert(GraftStore.installEpoch("t_ep", schema, "qA", 1L,
      Seq(Array[Any](3L))))
    assert(GraftStore.rows("t_ep").size === 3)
    // a SECOND query (fresh checkpoint) restarts at epoch 0 — its first
    // epoch is NOT a replay of query A's epoch 0 and must install
    assert(GraftStore.installEpoch("t_ep", schema, "qB", 0L,
      Seq(Array[Any](4L))))
    assert(GraftStore.rows("t_ep").size === 4)
    // ... and query B's own replay of its epoch 0 is still a no-op
    assert(!GraftStore.installEpoch("t_ep", schema, "qB", 0L,
      Seq(Array[Any](4L))))
    assert(GraftStore.rows("t_ep").size === 4)
  }

  test("TableCatalog: pure-SQL DDL + DML round trip (CREATE / INSERT / " +
      "SELECT / DROP) through the same two-phase commit") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.v2.GraftCatalog].getName)
    GraftStore.drop("sqltab")
    spark.sql("CREATE TABLE graft.sqltab (id BIGINT, tag STRING)")
    assert(GraftStore.schemas.contains("sqltab"))
    spark.sql("INSERT INTO graft.sqltab VALUES (1, 'x'), (2, 'y')")
    val rows = spark.sql(
      "SELECT id, tag FROM graft.sqltab ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "x"), (2L, "y")))
    spark.sql("INSERT OVERWRITE graft.sqltab VALUES (9, 'z')")
    assert(spark.sql("SELECT count(*) FROM graft.sqltab")
      .collect().head.getLong(0) === 1L)
    spark.sql("DROP TABLE graft.sqltab")
    assert(!GraftStore.schemas.contains("sqltab"))
  }

  test("end-to-end streaming write: micro-batches land via epoch commits") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    GraftStore.drop("t_stream")
    val mem = MemoryStream[Long](spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graftstore_ckpt").toString
    val q = mem.toDF().toDF("id").writeStream.format(fmt)
      .option("table", "t_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      mem.addData(1L, 2L)
      q.processAllAvailable()
      mem.addData(3L)
      q.processAllAvailable()
      assert(GraftStore.rows("t_stream").map(_(0)).toSet
        === Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("clusterBy write: RequiresDistributionAndOrdering makes SPARK " +
      "cluster rows so each key reaches exactly one writer, as sorted " +
      "runs — the no-small-files contract of a real table format") {
    GraftStore.drop("t_clus")
    // 8 keys deliberately scattered across 6 input partitions: without
    // the sink-requested exchange, every writer would see most keys
    // numPartitions pins 4 writers: without it AQE correctly coalesces
    // this KB-sized exchange into one writer and the multi-writer claim
    // would be vacuous at test scale
    spark.range(0, 2000, 1, 6)
      .selectExpr("id % 8 AS k", "id AS v")
      .write.format(fmt).option("table", "t_clus")
      .option("clusterBy", "k").option("orderBy", "v")
      .option("numPartitions", "4")
      .mode("append").save()
    val layout = GraftStore.lastLayout("t_clus")
    assert(layout.nonEmpty, "no layout recorded")
    assert(layout.size > 1,
      "need >1 writer for the clustering claim to be non-vacuous")
    // every key's rows landed in exactly ONE writer partition
    val keyToWriters = layout.toSeq
      .flatMap { case (pid, rows) => rows.map(r => r(0) -> pid) }
      .groupBy(_._1).map { case (k, ps) => k -> ps.map(_._2).distinct }
    assert(keyToWriters.values.forall(_.size == 1),
      s"keys split across writers: ${keyToWriters.filter(_._2.size > 1)}")
    // within each writer: rows arrive sorted by (k, v) — contiguous
    // sorted runs per key, no writer-side re-buffering needed
    layout.values.foreach { rows =>
      val kv = rows.map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]))
      assert(kv.sameElements(kv.sortBy(identity)),
        "writer did not receive its rows as (k, v)-sorted runs")
    }
    // and nothing was lost or duplicated through the exchange
    assert(GraftStore.rows("t_clus").size === 2000)
    val back = spark.read.format(fmt).option("table", "t_clus").load()
    assert(back.selectExpr("sum(v)").collect().head.getLong(0)
      === (0L until 2000L).sum)
  }

  test("plain write (no clusterBy) is unchanged: no distribution " +
      "requested, input partitioning passes through") {
    GraftStore.drop("t_plain")
    spark.range(0, 100, 1, 4).selectExpr("id % 8 AS k", "id AS v")
      .write.format(fmt).option("table", "t_plain").mode("append").save()
    val layout = GraftStore.lastLayout("t_plain")
    // 4 input partitions → 4 writers, keys scattered (no exchange)
    assert(layout.size === 4)
    assert(GraftStore.rows("t_plain").size === 100)
  }
}
