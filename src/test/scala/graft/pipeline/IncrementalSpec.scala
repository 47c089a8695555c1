package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

class IncrementalSpec extends AnyFunSuite with SparkSpec {

  private val keys = Seq("k")
  private val sums = Seq("v")

  test("merge(agg(base), agg(delta)) == agg(base union delta); new and absent groups") {
    import spark.implicits._
    val base = Seq(("a", 1L), ("a", 2L), ("b", 5L)).toDF("k", "v")
    val delta = Seq(("a", 10L), ("c", 7L)).toDF("k", "v") // c: new group
    val merged = Incremental.merge(
      Incremental.countSumState(base, keys, sums),
      Incremental.countSumState(delta, keys, sums), keys, sums)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val onePass = Incremental.countSumState(base.union(delta), keys, sums)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(merged == onePass)
    assert(merged("c") == ((1L, 7L)) && merged("b") == ((1L, 5L)))
  }

  test("retractions: negative delta state subtracts; count can reach zero") {
    import spark.implicits._
    val state = Incremental.countSumState(
      Seq(("a", 3L), ("a", 4L), ("b", 1L)).toDF("k", "v"), keys, sums)
    // retract one 'a' row (n=-1, v=-3) and all of 'b'
    val retract = Seq(("a", -1L, -3L), ("b", -1L, -1L)).toDF("k", "n", "v")
    val got = Incremental.merge(state, retract, keys, sums)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a" -> ((1L, 4L)), "b" -> ((0L, 0L))))
  }
}
