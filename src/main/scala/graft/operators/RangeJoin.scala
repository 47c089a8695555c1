package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded interval (range) join.
  *
  * `left.ts ∈ [right.start, right.start + length)` with optional equi
  * keys. The naive Spark plan for a range predicate without equi keys
  * is BroadcastNestedLoopJoin — O(|L|·|R|), impossible at scale; with
  * equi keys it degrades on hot keys. The banded form adds a time
  * bucket of width == the interval length to the join key: each right
  * interval overlaps at most TWO buckets (it is exactly one bucket
  * long), each left row belongs to exactly ONE, so every qualifying
  * pair meets in exactly one bucket — a plain equi-join (shuffle- or
  * broadcast-hash, AQE-splittable, salt-able) with per-pair fan-out ≤ 2
  * on the build side and no post-dedup.
  *
  * Reference scope: no range joins exist in the reference (SURVEY §2.4
  * "no hash/sort-merge/theta/as-of joins"); this is a beyond-parity
  * temporal operator alongside [[AsOfJoin]].
  */
object RangeJoin {

  /** Rows of `left` paired with every `right` row whose interval
    * `[startCol, startCol + lengthDays)` contains `left.tsCol`, both
    * sides also matched on `keys`. `startCol` may be a DATE (cast to
    * midnight-UTC timestamp — sessions run UTC, so this matches the
    * SQL `ts >= start::TIMESTAMP` semantics).
    */
  def intervalJoin(left: DataFrame, tsCol: String,
                   right: DataFrame, startCol: String, lengthDays: Int,
                   keys: Seq[String]): DataFrame = {
    require(lengthDays > 0, "interval length must be positive")
    val reserved = Seq("__b", "__s", "__start")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"input columns must not use the reserved intermediate names ${reserved.mkString(", ")}")
    val w = lengthDays.toLong * 86400L
    // bucketing uses whole seconds (floor); the exact containment
    // filter below compares full-precision timestamps. Sub-second ts
    // never crosses a bucket edge relative to its second, so the
    // bucket of ts always appears among the interval's two buckets.
    val lb = left.withColumn("__b", floor(unix_timestamp(col(tsCol)) / w))
    val rb = right
      .withColumn("__start", col(startCol).cast("timestamp"))
      .withColumn("__s", unix_timestamp(col("__start")))
      .withColumn("__b", explode(array(floor(col("__s") / w), floor(col("__s") / w) + 1)))
    lb.join(rb, keys :+ "__b")
      .filter(col(tsCol) >= col("__start") &&
        col(tsCol) < col("__start") + expr(s"INTERVAL $lengthDays DAY"))
      .drop("__b", "__s", "__start")
  }
}
