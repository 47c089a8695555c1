package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the q287 scale claim: reading single leaves of a nested
  * document layout narrows the parquet ReadSchema to those leaves —
  * at 100 TB the scan reads bytes for the requested fields alone.
  */
class NestedPruningSpec extends AnyFunSuite with SparkSpec {

  test("nested-struct single-leaf read prunes the parquet ReadSchema") {
    import spark.implicits._
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_nested_spec"
    (1 to 100).map(i => (i.toLong, s"t$i", i * 7L, i % 5L)).toDF("id", "t", "c", "u")
      .select(col("id"), struct(col("t").as("type"), col("c").as("cents"),
        struct(col("u").as("user_id")).as("who")).as("meta"))
      .write.mode("overwrite").parquet(out)
    val narrow = spark.read.parquet(out).select(col("meta.cents"))
    val scan = narrow.queryExecution.executedPlan.toString
    // the pruned ReadSchema mentions cents but NOT the sibling leaves
    assert(scan.contains("cents"), scan)
    assert(!scan.contains("user_id"), scan)
    assert(!scan.contains("type"), scan)
    assert(narrow.agg(sum(col("cents"))).head.getLong(0) == (1 to 100).map(_ * 7L).sum)
  }
}
