package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("bucketed join plans with zero shuffle exchanges") {
    import spark.implicits._
    val a = (0 until 1000).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (0 until 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "bv")
    Bucketing.writeBucketed(a, "bucketed_a", "k", 8)
    Bucketing.writeBucketed(b, "bucketed_b", "k", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force SMJ so the exchange-elimination is observable (broadcast
      // would hide it behind a BroadcastExchange)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "bucketed_a", "bucketed_b", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }
}
