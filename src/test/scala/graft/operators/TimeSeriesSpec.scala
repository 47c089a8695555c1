package graft.operators

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("ewmaFixed: hand-computed integer recurrence, floored division") {
    val df = Seq((1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 0L))
      .toDF("k", "o", "v")
    val got = TimeSeries.ewmaFixed(df, "k", "o", "o", "v", 3, 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // s1=100; s2=100+⌊3·100/10⌋=130; s3=130+⌊3·(−130)/10⌋=130−39=91
    assert(got == Map(1L -> 100L, 2L -> 130L, 3L -> 91L))
  }

  test("cusumFixed: climbs on sustained shift, clamps at zero") {
    val df = Seq(
      (1L, 1L, 4L), (1L, 2L, 3L),           // below target 5: clamp at 0
      (1L, 3L, 7L), (1L, 4L, 8L), (1L, 5L, 9L) // shift: 2, then 5, then 9
    ).toDF("k", "o", "v")
    val got = TimeSeries.cusumFixed(df, "k", "o", "o", "v", target = 5L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 2L, 4L -> 5L, 5L -> 9L))
  }
}
