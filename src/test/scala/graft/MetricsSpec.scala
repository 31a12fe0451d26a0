package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  test("pure scan+project action reads records and shuffles nothing") {
    val (_, p) = Metrics.profile(spark) {
      Tables.documents(spark, TestSpark.sf001)
        .select(col("doc_id"), length(col("text")))
        .write.format("noop").mode("overwrite").save()
    }
    assert(p.jobs >= 1 && p.tasks >= 1)
    assert(p.inputRecords === 500L)
    assert(p.shuffleWriteBytes === 0L,
      s"narrow pass should not shuffle: $p")
  }

  test("groupBy action shuffles; spill is zero at this scale") {
    val (_, p) = Metrics.profile(spark) {
      Tables.orders(spark, TestSpark.sf001)
        .groupBy("o_orderpriority").count()
        .write.format("noop").mode("overwrite").save()
    }
    assert(p.shuffleWriteBytes > 0L, s"groupBy must shuffle: $p")
    assert(p.spillBytes === 0L)
    assert(p.taskTimeMs >= 0L)
  }
}
