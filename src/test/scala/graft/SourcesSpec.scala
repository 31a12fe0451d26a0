package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schemas.Schemas
import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session

  test("json: declared schema applied; malformed fields are null, not errors") {
    val dir = Files.createTempDirectory("graft_src").toString
    Files.write(java.nio.file.Paths.get(s"$dir/a.json"),
      Seq(
        """{"ind": 1, "country": "US", "latitude": 1.0, "longitude": 2.0, "timestamp": "2021-01-01T00:00:00"}""",
        """{"ind": 2, "country": "DE"}"""
      ).mkString("\n").getBytes)
    val df = Sources.json(spark, dir, Schemas.geoRaw)
    assert(df.schema === Schemas.geoRaw)
    assert(df.count() === 2)
    assert(df.filter(org.apache.spark.sql.functions.col("latitude").isNull)
      .count() === 1)
  }

  test("json: glob path (partition=0/*.json) reads like the reference") {
    val base = Files.createTempDirectory("graft_glob").toString
    val p = new java.io.File(s"$base/topics/pin/partition=0")
    p.mkdirs()
    Files.write(new java.io.File(p, "x.json").toPath,
      """{"ind": 7, "country": "FR", "latitude": 0.0, "longitude": 0.0, "timestamp": "2020-01-01T00:00:00"}"""
        .getBytes)
    val df = Sources.json(spark, s"$base/topics/pin/partition=0/*.json",
      Schemas.geoRaw)
    assert(df.count() === 1)
  }

  test("jsonInferred: reads with sampled schema and reports drift " +
      "against the declared contract") {
    val dir = Files.createTempDirectory("graft_infer").toString
    // age arrives as a bare integer -> inference yields long, while the
    // declared streaming contract says string (the reference's own
    // batch-vs-streaming divergence, KINESIS:92)
    Files.write(java.nio.file.Paths.get(s"$dir/u.json"),
      Seq(
        """{"ind": 1, "first_name": "A", "last_name": "B", "age": 30, "date_joined": "2020-01-01T00:00:00"}""",
        """{"ind": 2, "first_name": "C", "last_name": "D", "age": 40, "date_joined": "2021-01-01T00:00:00"}"""
      ).mkString("\n").getBytes)
    val (df, drift) = Sources.jsonInferred(spark, dir, Schemas.userRaw)
    assert(df.count() === 2)
    assert(df.schema("age").dataType === LongType)
    assert(drift.exists(_.startsWith("age:")),
      s"expected age drift to be reported, got $drift")
    // declared-mode read of the same files keeps the contract type
    val declared = Sources.json(spark, dir, Schemas.userRaw)
    assert(Sources.schemaMismatches(declared.schema, Schemas.userRaw).isEmpty)
  }

  test("jsonWithCorruptCapture: malformed lines quarantined intact, " +
      "good lines parse, declared read would null them silently") {
    val dir = Files.createTempDirectory("graft_corrupt").toString
    Files.write(java.nio.file.Paths.get(s"$dir/a.json"),
      Seq(
        """{"ind": 1, "country": "US", "latitude": 1.0, "longitude": 2.0, "timestamp": "2021-01-01T00:00:00"}""",
        """{"ind": 2, "country": "DE", THIS IS NOT JSON""",
      ).mkString("\n").getBytes)
    val df = Sources.jsonWithCorruptCapture(spark, dir, Schemas.geoRaw)
      .cache() // PERMISSIVE corrupt capture needs the raw line retained
    val bad = df.filter(org.apache.spark.sql.functions
      .col("_corrupt_record").isNotNull).collect()
    assert(bad.length === 1)
    assert(bad.head.getAs[String]("_corrupt_record")
      .contains("THIS IS NOT JSON"))
    val good = df.filter(org.apache.spark.sql.functions
      .col("_corrupt_record").isNull)
    assert(good.count() === 1)
    assert(good.head().getAs[Int]("ind") === 1)
    df.unpersist()
  }

  test("csv with header and declared schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.write(java.nio.file.Paths.get(s"$dir/c.csv"),
      "user,key\nalice,AK1\n".getBytes)
    val schema = StructType(Seq(StructField("user", StringType),
      StructField("key", StringType)))
    val df = Sources.csv(spark, dir, schema)
    assert(df.count() === 1)
    assert(df.head().getString(1) === "AK1")
  }

  test("orc round-trip: documents written as ORC read back identically") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val docs = Tables.documents(spark, TestSpark.sf0001)
    docs.write.mode("overwrite").orc(s"$dir/docs")
    val back = Sources.orc(spark, s"$dir/docs")
    assert(Sources.schemaMismatches(back.schema, docs.schema).isEmpty)
    assert(back.count() === docs.count())
    assert(back.orderBy("doc_id").head() === docs.orderBy("doc_id").head())
  }

  test("schemaMismatches detects missing/extra/mistyped columns") {
    val declared = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
    val actual = StructType(Seq(
      StructField("a", LongType), StructField("c", StringType)))
    val m = Sources.schemaMismatches(actual, declared)
    assert(m.exists(_.contains("a: expected int")))
    assert(m.exists(_.contains("missing column b")))
    assert(m.exists(_.contains("unexpected column c")))
    assert(Sources.schemaMismatches(declared, declared).isEmpty)
  }
}
