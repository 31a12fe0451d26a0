package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{ExactMedian, MinHashSignature, ShingleHashes, SimHash64}
import graft.ops.{DedupOps, TextOps}
import graft.plans.GraftFunctions

/** The SQL registration path must expose exactly the expressions the
  * DataFrame API uses — every test cross-checks `spark.sql` output against
  * the Column entry point on the same data.
  */
class SqlFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = TestSpark.session
    GraftFunctions.register(s)
    s
  }

  test("graft_cosine from SQL equals the Column entry point") {
    import spark.implicits._
    Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)),
        (Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val viaSql = spark.sql("SELECT graft_cosine(a, b) AS c FROM vecs")
      .collect().map(_.getDouble(0)).toSeq
    val viaCol = spark.table("vecs")
      .select(graft.functions.CosineSimilarity.cosineSim(col("a"), col("b")))
      .collect().map(_.getDouble(0)).toSeq
    assert(viaSql == viaCol)
    assert(math.abs(viaSql(1) - 1.0) < 1e-12)
  }

  test("graft_simhash64 / graft_shingle_hashes / graft_minhash from SQL " +
      "match the expression entry points on real documents") {
    val docs = Tables.documents(spark, TestSpark.sf001).limit(50)
    docs.createOrReplaceTempView("docs_sql")
    val sql = spark.sql(
      """SELECT doc_id,
        |  graft_simhash64(graft_tokens) AS sh,
        |  graft_shingle_hashes(graft_tokens, 5) AS grams,
        |  graft_minhash(graft_tokens, 5, 64) AS sig
        |FROM (SELECT doc_id, split(trim(lower(text)), '\\s+')
        |        AS graft_tokens FROM docs_sql)
        |ORDER BY doc_id""".stripMargin).collect()
    val toks = TextOps.tokens(lower(col("text")))
    val api = docs.select(col("doc_id"),
        SimHash64.simhash64(toks).as("sh"),
        ShingleHashes.shingleHashes(toks, 5).as("grams"),
        MinHashSignature.minhashSignature(toks, 5,
          DedupOps.seeds(64).toArray).as("sig"))
      .orderBy("doc_id").collect()
    assert(sql.length == api.length && sql.nonEmpty)
    sql.zip(api).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getLong(1) == b.getLong(1), s"simhash differs @${a.getLong(0)}")
      assert(a.getSeq[Long](2) == b.getSeq[Long](2),
        s"shingles differ @${a.getLong(0)}")
      assert(a.getSeq[Long](3) == b.getSeq[Long](3),
        s"minhash differs @${a.getLong(0)}")
    }
  }

  test("graft_exact_median aggregates from SQL, grouped and global") {
    import spark.implicits._
    Seq(("a", 1.0), ("a", 2.0), ("a", 9.0), ("b", 5.0), ("b", 7.0))
      .toDF("g", "x").createOrReplaceTempView("med_in")
    val grouped = spark.sql(
      "SELECT g, graft_exact_median(x) AS m FROM med_in GROUP BY g ORDER BY g")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
    assert(grouped == Seq("a" -> 2.0, "b" -> 5.0))
    val global = spark.sql("SELECT graft_exact_median(x) AS m FROM med_in")
      .collect().head.getDouble(0)
    assert(global == 5.0)
  }

  test("graft_exact_quantile from SQL: grouped, integer rank rule") {
    import spark.implicits._
    (1 to 10).map(i => ("a", i.toDouble)).toDF("g", "x")
      .createOrReplaceTempView("qt_in")
    val row = spark.sql(
      """SELECT g, graft_exact_quantile(x, 25, 100) AS p25,
        |       graft_exact_quantile(x, 95, 100) AS p95
        |FROM qt_in GROUP BY g""".stripMargin).collect().head
    assert(row.getDouble(1) == 3.0 && row.getDouble(2) == 10.0)
    val multi = spark.sql(
      """SELECT g, graft_exact_quantiles(x, array(25, 95), 100) AS qs
        |FROM qt_in GROUP BY g""".stripMargin).collect().head
    assert(multi.getSeq[Double](1) == Seq(3.0, 10.0))
  }

  test("graft_quantize_int8 from SQL equals the Column entry point") {
    import spark.implicits._
    Seq(Array(0.5f, -1.0f, 0.25f), Array(0.0f, 0.0f, 0.0f))
      .toDF("v").createOrReplaceTempView("q8_in")
    val viaSql = spark.sql("SELECT graft_quantize_int8(v) AS q FROM q8_in")
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    val viaCol = spark.table("q8_in")
      .select(graft.functions.QuantizeInt8.quantizeInt8Compiled(col("v")))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    assert(viaSql == viaCol)
    assert(viaSql.head == Seq(64.0, -127.0, 32.0))
    assert(viaSql(1) == Seq(0.0, 0.0, 0.0))
  }

  test("literal-argument contract: non-literal size arguments are rejected " +
      "at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes(array('a'), doc_id) " +
        "FROM (SELECT 1L AS doc_id)").collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }
}
