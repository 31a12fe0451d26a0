package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Measure with a real sink: the noop datasource consumes every row and
    // column of the result (a bare .count() lets Spark skip materializing
    // projected columns entirely).
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Warm the session once (codegen, FS metadata, shuffle machinery) so
    // per-query numbers measure the queries, not JVM startup.
    try run(SparkEntry.entry(spark)) catch { case _: Throwable => }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { run(fn(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      // a failed query must not masquerade as a fast one: record -1
      val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      System.err.println(f"[bench] $name%-34s $sec%8.2f s")
      name -> sec
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
