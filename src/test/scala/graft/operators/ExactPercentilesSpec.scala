package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** ExactPercentiles claims bit-identity with Spark's built-in
  * `percentile` — prove it on randomized data, including NULLs and
  * single-row groups.
  */
class ExactPercentilesSpec extends AnyFunSuite with SparkSpec {

  private val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)

  private def builtin(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("g"))
      .agg(
        expr("percentile(v, 0.25)").as("p25"),
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.9)").as("p90"),
        expr("percentile(v, 0.99)").as("p99"))

  private def compare(rows: Seq[(String, java.lang.Double)]): Unit = {
    import spark.implicits._
    val df = rows.toDF("g", "v")
    val got = ExactPercentiles.exact(df, Seq("g"), "v", ps)
      .collect().map(r => r.getString(0) -> (1 to 4).map(r.getDouble)).toMap
    val want = builtin(df)
      .collect().map(r => r.getString(0) -> (1 to 4).map(r.getDouble)).toMap
    assert(got.keySet == want.keySet)
    for (g <- want.keySet)
      assert(got(g) == want(g), s"group $g: ${got(g)} vs builtin ${want(g)}")
  }

  test("matches builtin percentile bit-for-bit on random groups") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map(_ =>
      (s"g${rnd.nextInt(5)}", java.lang.Double.valueOf(rnd.nextDouble() * 1e6)))
    compare(rows)
  }

  test("matches builtin with NULLs present (ignored from rank and count)") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 2000).map { _ =>
      val v: java.lang.Double =
        if (rnd.nextInt(10) == 0) null else java.lang.Double.valueOf(rnd.nextGaussian())
      (s"g${rnd.nextInt(3)}", v)
    }
    compare(rows)
  }

  test("an all-NULL group emits a row with NULL percentiles, like the builtin") {
    import spark.implicits._
    val df = Seq(("g1", java.lang.Double.valueOf(1.0)),
      ("g2", null: java.lang.Double), ("g2", null: java.lang.Double)).toDF("g", "v")
    val got = ExactPercentiles.exact(df, Seq("g"), "v", ps).collect()
      .map(r => r.getString(0) -> (1 to 4).map(r.isNullAt)).toMap
    assert(got.keySet == Set("g1", "g2"))
    assert(got("g2").forall(identity) && got("g1").forall(n => !n))
  }

  test("matches builtin on single-row and duplicate-value groups") {
    compare(Seq(
      ("one", java.lang.Double.valueOf(42.0)),
      ("dup", java.lang.Double.valueOf(7.0)), ("dup", java.lang.Double.valueOf(7.0)),
      ("dup", java.lang.Double.valueOf(7.0)), ("two", java.lang.Double.valueOf(1.0)),
      ("two", java.lang.Double.valueOf(2.0))))
  }
}
