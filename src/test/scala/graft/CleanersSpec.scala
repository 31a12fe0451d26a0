package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cleaners
import graft.schemas.Schemas

/** Unit specs for the three reference cleaning transforms (SURVEY.md §2.2,
  * §2.3, §2.9) over dirty fixtures shaped per FIXTURES.md §1.
  */
class CleanersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def pinRaw(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Schemas.pinRaw)

  private def pinRow(index: Int, desc: String, followers: String,
      title: String = "t", tags: String = "a,b",
      saveLoc: String = "Local save in /data/art"): Row =
    Row(index, s"uuid-$index", title, desc, "poster", followers, tags,
      "image", "http://img", "1", saveLoc, "art")

  test("pinClean: follower_count suffix parsing — 25k/2M/plain/2.5k/garbage") {
    val df = pinRaw(Seq(
      pinRow(1, "d1", "25k"),
      pinRow(2, "d2", "2M"),
      pinRow(3, "d3", "532"),
      pinRow(4, "d4", "2.5k"),   // "2.5000" -> NULL (documented lossy rule)
      pinRow(5, "d5", "User Info Error"))) // sentinel -> NULL -> NULL
    val out = Cleaners.pinClean(df)
      .select("ind", "follower_count").collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(out === Map(1 -> Some(25000), 2 -> Some(2000000), 3 -> Some(532),
      4 -> None, 5 -> None))
  }

  test("pinClean: sentinel strings become NULL across string columns") {
    val df = pinRaw(Seq(
      pinRow(1, "d1", "1", title = "No Title Data Available",
        tags = "N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e")))
    val row = Cleaners.pinClean(df).select("title", "tag_list").head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("pinClean: save_location prefix stripped, downloaded dropped, " +
      "index renamed, column order fixed") {
    val out = Cleaners.pinClean(pinRaw(Seq(pinRow(7, "d", "1"))))
    assert(out.columns.toSeq === Schemas.pinClean.fieldNames.toSeq)
    assert(out.select("save_location").head().getString(0) === " /data/art")
  }

  test("pinClean: dedup on description keeps exactly one row per description") {
    val out = Cleaners.pinClean(pinRaw(Seq(
      pinRow(1, "same", "1"), pinRow(2, "same", "2"), pinRow(3, "other", "3"))))
    assert(out.count() === 2)
    assert(out.filter($"description" === "same").count() === 1)
  }

  test("geoClean: coordinates packed as array<float>, dedup on ind") {
    val raw = Seq(
      (1, "US", 1.5f, -2.5f, "2021-03-04T05:06:07"),
      (1, "US", 1.5f, -2.5f, "2021-03-04T05:06:07"),
      (2, "DE", 50.1f, 8.6f, "2019-01-01T00:00:00"))
      .toDF("ind", "country", "latitude", "longitude", "timestamp")
    val out = Cleaners.geoClean(raw)
    assert(out.count() === 2)
    assert(out.schema("coordinates").dataType.typeName === "array")
    val coords = out.filter($"ind" === 1).select("coordinates")
      .head().getSeq[Float](0)
    assert(coords === Seq(1.5f, -2.5f))
    val ts = out.filter($"ind" === 2).select("timestamp").head().getTimestamp(0)
    assert(ts.toInstant.toString === "2019-01-01T00:00:00Z")
  }

  test("userClean: name concat, originals dropped, dedup on ind") {
    val raw = Seq(
      (1, "Ada", "Lovelace", 28, "2017-05-01T10:00:00"),
      (1, "Ada", "Lovelace", 28, "2017-05-01T10:00:00"),
      (2, "Alan", "Turing", 41, "2015-02-02T00:00:00"))
      .toDF("ind", "first_name", "last_name", "age", "date_joined")
    val out = Cleaners.userClean(raw)
    assert(out.columns.toSeq === Seq("ind", "user_name", "age", "date_joined"))
    assert(out.count() === 2)
    assert(out.filter($"ind" === 1).select("user_name").head().getString(0)
      === "Ada Lovelace")
  }

  test("ageBucket: totality incl. reference quirk (under-18 lands in +50)") {
    val buckets = Seq(16, 18, 24, 25, 35, 36, 50, 51, 99)
      .toDF("age")
      .select(Cleaners.ageBucket($"age").as("b"))
      .collect().map(_.getString(0)).toSeq
    assert(buckets === Seq("+50", "18-24", "18-24", "25-35", "25-35",
      "36-50", "36-50", "+50", "+50"))
  }

  test("cleaners are idempotent on already-clean data (dedup stability)") {
    val df = pinRaw(Seq(pinRow(1, "a", "1k"), pinRow(2, "b", "2k")))
    val once = Cleaners.pinClean(df)
    // re-running the dedup-bearing tail of the cleaner changes nothing
    assert(once.dropDuplicates("description").count() === once.count())
  }
}
