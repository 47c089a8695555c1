package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Per-key sequential time-series recurrences. Unlike the window-
  * function suite (q58) these are true RECURRENCES — each output
  * depends on the previous output, which no frame-based window can
  * express — so the engine shape is one shuffle on the key and a
  * per-key in-memory fold, the same contract as sessionization: a
  * key's series must fit an executor (time-bounded series do; shard
  * the key by epoch otherwise).
  */
object TimeSeries {

  /** Fixed-point exponential moving average, α = alphaNum/alphaDen:
    *
    *   s₁ = v₁;  sₜ = sₜ₋₁ + ⌊alphaNum·(vₜ − sₜ₋₁) / alphaDen⌋
    *
    * over INTEGER values (scale floats beforehand with a pure per-row
    * function, e.g. `floor(value·100 + 0.5)·100`). All arithmetic is
    * integer with JVM `/` (truncating toward zero, matching DuckDB's
    * integer `//`), so the
    * trajectory is exactly reproducible by a recursive-CTE oracle —
    * the float recurrence would drift by summation-order ulps and
    * could not be hash-gated (q135).
    *
    * Emits one row per input row: (key, orderTieId, ewma). One shuffle
    * on `keyCol`; the per-key sort is in-memory over that key's rows.
    */
  def ewmaFixed(df: DataFrame, keyCol: String, orderCol: String,
                tieCol: String, valueCol: String,
                alphaNum: Long, alphaDen: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(alphaDen > 0 && alphaNum >= 0 && alphaNum <= alphaDen,
      "alpha must be a rational in [0, 1]")
    df.select(col(keyCol).cast("long").as("k"),
        col(orderCol).cast("long").as("o"),
        col(tieCol).cast("long").as("tid"),
        col(valueCol).cast("long").as("v"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(r => (r._2, r._3))
        var s = 0L
        rows.iterator.zipWithIndex.map { case ((_, _, tid, v), i) =>
          s = if (i == 0) v else s + alphaNum * (v - s) / alphaDen
          (k, tid, s)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
      .toDF("k", "tid", "ewma")
  }

  /** Holt double exponential smoothing (level + trend), fixed-point:
    *
    *   l₁ = v₁, b₁ = 0
    *   lₜ = lₜ₋₁ + bₜ₋₁ + ⌊αN·(vₜ − lₜ₋₁ − bₜ₋₁) / αD⌋
    *   bₜ = bₜ₋₁ + ⌊βN·(lₜ − lₜ₋₁ − bₜ₋₁) / βD⌋
    *
    * — algebraically Holt's l = αv + (1−α)(l+b), b = β(Δl) + (1−β)b
    * rearranged into pure integer increments (JVM truncating division
    * = DuckDB `//`, the [[ewmaFixed]] contract), so the TWO mutually
    * recursive states replay exactly in one recursive CTE carrying
    * (l, b). Emits (key, orderTieId, level, trend) per row; one
    * shuffle on the key, per-key in-memory fold.
    */
  def holtFixed(df: DataFrame, keyCol: String, orderCol: String,
                tieCol: String, valueCol: String,
                alphaNum: Long, alphaDen: Long,
                betaNum: Long, betaDen: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(alphaDen > 0 && alphaNum >= 0 && alphaNum <= alphaDen,
      "alpha must be a rational in [0, 1]")
    require(betaDen > 0 && betaNum >= 0 && betaNum <= betaDen,
      "beta must be a rational in [0, 1]")
    df.select(col(keyCol).cast("long").as("k"),
        col(orderCol).cast("long").as("o"),
        col(tieCol).cast("long").as("tid"),
        col(valueCol).cast("long").as("v"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(r => (r._2, r._3))
        var l = 0L; var b = 0L
        rows.iterator.zipWithIndex.map { case ((_, _, tid, v), i) =>
          if (i == 0) { l = v; b = 0L }
          else {
            val prevL = l; val prevB = b
            l = prevL + prevB + alphaNum * (v - prevL - prevB) / alphaDen
            b = prevB + betaNum * (l - prevL - prevB) / betaDen
          }
          (k, tid, l, b)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong))
      .toDF("k", "tid", "level", "trend")
  }

  /** Duration-capped sessionization — the gap rule every sessionizer
    * has (new session when idle > `gapUs`) PLUS a hard cap on session
    * span (new session when the current one would exceed `capUs`).
    * The cap makes this a TRUE RECURRENCE — whether row t opens a
    * session depends on where the current session STARTED, which
    * depends on every prior decision — so no frame-based window can
    * express it (plain gap sessionization can: q23). Same engine
    * contract as [[ewmaFixed]]: one shuffle on the key, per-key fold,
    * exactly replayable by a recursive-CTE oracle carrying
    * (session_start, session_id).
    */
  def cappedSessions(df: DataFrame, keyCol: String, orderCol: String,
                     tieCol: String, gapUs: Long, capUs: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(gapUs > 0 && capUs > 0, "gap and cap must be positive")
    df.select(col(keyCol).cast("long").as("k"),
        col(orderCol).cast("long").as("o"),
        col(tieCol).cast("long").as("tid"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(r => (r._2, r._3))
        var start = Long.MinValue; var prev = Long.MinValue; var sid = 0L
        rows.iterator.map { case (_, t, tid) =>
          if (start == Long.MinValue || t - prev > gapUs || t - start > capUs) {
            sid += 1; start = t
          }
          prev = t
          (k, tid, sid)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
      .toDF("k", "tid", "session_id")
  }

  /** One-sided CUSUM (Page 1954) — the classic sequential
    * change-point statistic: S₁ = max(0, v₁ − target);
    * Sₜ = max(0, Sₜ₋₁ + vₜ − target). A sustained upward shift makes S
    * climb past its alarm threshold where per-point tests stay silent.
    * Pure integer recurrence over INTEGER values (same contract as
    * [[ewmaFixed]]: one shuffle on the key, per-key in-memory fold,
    * exactly replayable by a recursive-CTE oracle).
    */
  def cusumFixed(df: DataFrame, keyCol: String, orderCol: String,
                 tieCol: String, valueCol: String, target: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long").as("k"),
        col(orderCol).cast("long").as("o"),
        col(tieCol).cast("long").as("tid"),
        col(valueCol).cast("long").as("v"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(r => (r._2, r._3))
        var s = 0L
        rows.iterator.map { case (_, _, tid, v) =>
          s = math.max(0L, s + v - target)
          (k, tid, s)
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
      .toDF("k", "tid", "cusum")
  }
}
