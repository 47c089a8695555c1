package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import java.sql.Timestamp

class GapFillSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleFfill: latest-in-bucket pick, hole filling, per-key spans") {
    import spark.implicits._
    val df = Seq(
      // key 1: two obs in hour 10 (latest wins), hole at 11, obs at 12
      (1L, ts("2024-03-01 10:05:00"), 1.0, 100L),
      (1L, ts("2024-03-01 10:40:00"), 2.0, 101L),
      (1L, ts("2024-03-01 12:10:00"), 5.0, 102L),
      // key 2: single observation -> single-bucket grid
      (2L, ts("2024-03-01 23:59:00"), 7.0, 103L)
    ).toDF("k", "ts", "value", "event_id")
    val got = GapFill.resampleFfill(df, "k", "ts", "value", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getDouble(2)))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(
      (1L, "2024-03-01 10:00:00.0", 2.0), // latest of the two obs
      (1L, "2024-03-01 11:00:00.0", 2.0), // hole forward-filled
      (1L, "2024-03-01 12:00:00.0", 5.0),
      (2L, "2024-03-01 23:00:00.0", 7.0)))
  }

  test("resampleInterp: hand-computed anchors, exact-hit, and edge fallbacks") {
    import spark.implicits._
    val df = Seq(
      // key 1: obs at 10:30 (v=100) and 12:30 (v=300)
      (1L, ts("2024-03-01 10:30:00"), 100L, 1L),
      (1L, ts("2024-03-01 12:30:00"), 300L, 2L),
      // key 2: obs exactly ON a grid instant
      (2L, ts("2024-03-01 05:00:00"), 40L, 3L)
    ).toDF("k", "ts", "cents", "event_id")
    val got = GapFill.resampleInterp(df, "k", "ts", "cents", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(
      // 10:00 is before the first obs -> nearest-neighbor backfill
      (1L, "2024-03-01 10:00:00.0", 100000000L),
      // 11:00: 100 + 200 * (30min/120min) = 150 -> 150e6
      (1L, "2024-03-01 11:00:00.0", 150000000L),
      // 12:00: 100 + 200 * (90/120) = 250
      (1L, "2024-03-01 12:00:00.0", 250000000L),
      // grid instant == obs instant -> exact value
      (2L, "2024-03-01 05:00:00.0", 40000000L)))
  }

  test("resampleFfill: same-ts ties break by the tie column (highest wins)") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-03-01 10:00:00"), 1.0, 7L),
      (1L, ts("2024-03-01 10:00:00"), 9.0, 8L)
    ).toDF("k", "ts", "value", "event_id")
    val got = GapFill.resampleFfill(df, "k", "ts", "value", "event_id").collect()
    assert(got.length == 1 && got.head.getDouble(2) == 9.0)
  }
}
