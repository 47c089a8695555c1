package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends AnyFunSuite with SparkSpec {

  test("banded interval join == naive range-filter join, incl. boundary rows") {
    import spark.implicits._
    val w = 30L * 86400
    // events placed ON both interval edges, just inside, just outside,
    // and mid-interval, across two users
    val left = Seq(
      (1L, 100L, 0L), (2L, 100L, 1L), (3L, 100L, w - 1), (4L, 100L, w),
      (5L, 100L, w + 12345), (6L, 200L, w / 2), (7L, 300L, w / 2),
    ).toDF("event_id", "user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val right = Seq(
      (10L, 100L, 0L), (11L, 100L, w / 2), // overlapping windows, same user
      (12L, 200L, 0L), (13L, 400L, 0L),
    ).toDF("o_orderkey", "user_id", "start_sec")
      .withColumn("o_orderdate", timestamp_seconds(col("start_sec")).cast("date"))
      .drop("start_sec")

    val banded = RangeJoin.intervalJoin(left, "ts", right, "o_orderdate", 30, Seq("user_id"))
      .select("event_id", "o_orderkey").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = left.join(right, Seq("user_id"))
      .filter(col("ts") >= col("o_orderdate").cast("timestamp") &&
        col("ts") < col("o_orderdate").cast("timestamp") + expr("INTERVAL 30 DAY"))
      .select("event_id", "o_orderkey").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == naive)
    // sanity of the fixture: start-edge in, end-edge out, overlap doubles
    assert(naive.contains((1L, 10L)) && !naive.contains((4L, 10L)))
    assert(naive.contains((5L, 11L)) && naive.contains((3L, 11L)))
    // each qualifying pair appears exactly once (no bucket-dup)
    val rows = RangeJoin.intervalJoin(left, "ts", right, "o_orderdate", 30, Seq("user_id"))
      .groupBy("event_id", "o_orderkey").count().filter(col("count") > 1).count()
    assert(rows == 0)
  }

  test("property: banded == naive on 400 random events x 120 random windows") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val horizon = 100L * 86400
    val left = (1L to 400L).map(i => (i, rnd.nextInt(20).toLong,
      (rnd.nextDouble() * horizon * 1000).toLong)).toDF("event_id", "user_id", "ms")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val right = (1L to 120L).map(i => (i, rnd.nextInt(20).toLong,
      rnd.nextInt(100).toLong)).toDF("o_orderkey", "user_id", "day")
      .withColumn("o_orderdate", date_add(lit("1970-01-01").cast("date"), col("day").cast("int")))
      .drop("day")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "o_orderkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val banded = pairs(RangeJoin.intervalJoin(left, "ts", right, "o_orderdate", 7, Seq("user_id")))
    val naive = pairs(left.join(right, Seq("user_id"))
      .filter(col("ts") >= col("o_orderdate").cast("timestamp") &&
        col("ts") < col("o_orderdate").cast("timestamp") + expr("INTERVAL 7 DAY")))
    assert(banded.size == banded.toSet.size) // exactly-once
    assert(banded.toSet == naive.toSet)
    assert(naive.nonEmpty) // fixture actually joins
  }

  test("sub-second timestamps stay in the right bucket") {
    import spark.implicits._
    val left = Seq((1L, 9L, "1970-01-30 23:59:59.750"), (2L, 9L, "1970-01-31 00:00:00.250"))
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val right = Seq((5L, 9L, "1970-01-01")).toDF("o_orderkey", "user_id", "d")
      .withColumn("o_orderdate", col("d").cast("date")).drop("d")
    val got = RangeJoin.intervalJoin(left, "ts", right, "o_orderdate", 30, Seq("user_id"))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L)) // .750 before the 30-day edge joins; .250 past it does not
  }
}
