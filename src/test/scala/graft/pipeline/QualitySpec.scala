package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class QualitySpec extends AnyFunSuite with SparkSpec {

  test("checkConstraints: violations, NULL-predicate rows, and uniqueness") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(5)), (2L, Some(60)), // 60 violates the range
      (3L, None),                    // NULL predicate counts as violation
      (3L, Some(7))                  // duplicate key
    ).toDF("id", "v")
    val got = Quality.checkConstraints(df,
      assertions = Seq("v_range" -> "v >= 0 AND v <= 50"),
      uniqueKeys = Seq("id_unique" -> Seq("id")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got("v_range") == ((4L, 2L, false))) // the 60 and the NULL
    assert(got("id_unique") == ((4L, 1L, false))) // one duplicated id
  }

  test("checkConstraints: all-pass table emits pass=true rows") {
    import spark.implicits._
    val df = Seq((1L, 5), (2L, 6)).toDF("id", "v")
    val got = Quality.checkConstraints(df,
      assertions = Seq("v_pos" -> "v > 0"),
      uniqueKeys = Seq("id_unique" -> Seq("id")))
      .collect()
    assert(got.length == 2 && got.forall(_.getBoolean(3)))
  }
}
