package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class ProfileSpec extends AnyFunSuite with SparkSpec {

  test("numericProfile: counts, nulls, ndv, min/max per column in one pass") {
    import spark.implicits._
    val df = Seq(
      (Some(1), Some(10.0)), (Some(2), None), (Some(2), Some(30.0)),
      (None, Some(10.0)))
      .toDF("a", "b")
    val got = Profile.numericProfile(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(got("a") == ((4L, 1L, 2L, 1.0, 2.0)))
    assert(got("b") == ((4L, 1L, 2L, 10.0, 30.0)))
  }
}
