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

  test("holtFixed: hand-computed two-state recurrence; perfect ramp tracked exactly") {
    // α=1/2, β=1/2, v = 10, 20, 8:
    //   t1: l=10 b=0
    //   t2: l=10+0+⌊(20−10)/2⌋=15, b=0+⌊(15−10−0)/2⌋=2
    //   t3: l=15+2+⌊(8−17)/2⌋=17−4=13, b=2+⌊(13−15−2)/2⌋=2−2=0
    val df = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 8L)).toDF("k", "o", "v")
    val got = TimeSeries.holtFixed(df, "k", "o", "o", "v", 1, 2, 1, 2)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(1L -> ((10L, 0L)), 2L -> ((15L, 2L)), 3L -> ((13L, 0L))))
    // on a linear ramp the trend estimate converges to the true slope
    // and the level tracks within a small truncation offset (integer
    // division keeps a persistent few-unit lag — it never diverges)
    val ramp = (1 to 10).map(i => (2L, i.toLong, 100L + 7L * i)).toDF("k", "o", "v")
    val r = TimeSeries.holtFixed(ramp, "k", "o", "o", "v", 1, 2, 1, 2)
      .collect().sortBy(_.getLong(1))
    val locked = r.dropWhile(_.getLong(3) != 7L)
    assert(locked.nonEmpty && locked.forall(_.getLong(3) == 7L))
    locked.foreach(row =>
      assert(math.abs(row.getLong(2) - (100L + 7L * row.getLong(1))) <= 5L))
  }

  test("cappedSessions: gap rule, duration cap, and their interaction") {
    // t = 0, 10, 25 | 40(gap>12) , 48, 55(cap: 55-40>14) ...
    val df = Seq((1L, 0L, 1L), (1L, 10L, 2L), (1L, 25L, 3L),
      (1L, 40L, 4L), (1L, 48L, 5L), (1L, 56L, 6L)).toDF("k", "t", "id")
    val got = TimeSeries.cappedSessions(df, "k", "t", "id",
        gapUs = 12L, capUs = 14L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // 0,10 in s1; 25: gap 15>12 -> s2; 40: gap 15>12 -> s3; 48 joins
    // s3 (gap 8, span 8); 56: gap 8 ok BUT span 16>14 -> s4
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 3L, 6L -> 4L))
    // without the cap the last three collapse into one session: the
    // cap is the thing the plain gap rule cannot express
    val nocap = TimeSeries.cappedSessions(df, "k", "t", "id", 12L, 1000000L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(nocap == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
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
