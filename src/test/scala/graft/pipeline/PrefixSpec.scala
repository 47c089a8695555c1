package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The distributed two-pass rank/prefix-sum must equal the naive
  * single-task global window on any input, including inputs wider than
  * the partition count and skewed key distributions.
  */
class PrefixSpec extends AnyFunSuite with SparkSpec {

  test("withGlobalPosition == global row_number, many partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1L to 5000L).map(i => (i, rnd.nextLong())).toDF("id", "k")
      .repartition(13)
    val got = Prefix.withGlobalPosition(df, Seq("k", "id"), partitions = 7)
      .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("pos",
        row_number().over(Window.orderBy(col("k"), col("id"))).cast("long") - 1L)
      .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("withPrefixSum == global exclusive running sum, skewed values") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val df = (1L to 3000L).map(i =>
      (i, if (i % 97 == 0) 100000L else rnd.nextInt(50).toLong)).toDF("id", "n")
      .repartition(9)
    val got = Prefix.withPrefixSum(df, Seq("id"), "n", partitions = 5)
      .select("id", "prefix").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("prefix", coalesce(sum(col("n")).over(w), lit(0L)))
      .select("id", "prefix").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("NULL values sum as 0 (all-null partitions included); reserved names rejected") {
    import spark.implicits._
    // ids 1..40 all-null n, 41..80 valued: the low id range partitions
    // to all-NULL partitions, which must not NPE and must offset as 0
    val df = (1L to 80L).map(i => (i, if (i <= 40) None else Some(i)))
      .toDF("id", "n")
    val got = Prefix.withPrefixSum(df, Seq("id"), "n", partitions = 4)
      .select("id", "prefix").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("prefix", coalesce(sum(col("n")).over(w), lit(0L)))
      .select("id", "prefix").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    intercept[IllegalArgumentException](
      Prefix.withGlobalPosition(df.withColumnRenamed("n", "pos"), Seq("id")))
  }

  test("withPrefixSums == per-column global exclusive running sums (incl. nulls), one shuffle") {
    import spark.implicits._
    // round-10: q431/q434 ride the multi-series variant — pin it
    // directly: three lockstep counters over one total order, one of
    // them nullable, against the naive single-task windows
    val rnd = new scala.util.Random(31)
    val df = (1L to 2000L).map { i =>
      (i, rnd.nextInt(9).toLong, rnd.nextInt(5).toLong,
        if (i % 11 == 0) None else Some(rnd.nextInt(3).toLong))
    }.toDF("id", "a", "b", "c").repartition(7)
    val got = Prefix.withPrefixSums(df, Seq("id"), Seq("a", "b", "c"),
        partitions = 5)
      .select("id", "prefix_a", "prefix_b", "prefix_c")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val w = Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, -1)
    val want = df
      .withColumn("pa", coalesce(sum(col("a")).over(w), lit(0L)))
      .withColumn("pb", coalesce(sum(col("b")).over(w), lit(0L)))
      .withColumn("pc", coalesce(sum(col("c")).over(w), lit(0L)))
      .select("id", "pa", "pb", "pc")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
  }

  test("empty input yields empty output, single row gets pos 0 / prefix 0") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "n")
    assert(Prefix.withGlobalPosition(empty, Seq("id")).count() == 0)
    assert(Prefix.withPrefixSum(empty, Seq("id"), "n").count() == 0)
    val one = Seq((7L, 42L)).toDF("id", "n")
    assert(Prefix.withGlobalPosition(one, Seq("id")).select("pos")
      .collect().head.getLong(0) == 0L)
    assert(Prefix.withPrefixSum(one, Seq("id"), "n").select("prefix")
      .collect().head.getLong(0) == 0L)
  }
}
