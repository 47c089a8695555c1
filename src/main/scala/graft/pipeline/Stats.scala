package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level statistical operators. */
object Stats {

  /** Frequency spectrum (count-of-counts): how many keys occur exactly
    * r times, plus the Good–Turing adjusted count
    * r* = (r+1) · n_{r+1} / n_r (Good 1953 — the smoothing statistic
    * LM estimators build on; r* = 0 where n_{r+1} is absent).
    *
    * Scale shape: two partial-aggregated `groupBy`s (keys, then
    * counts) — the second input is at most one row per distinct
    * frequency, so the spectrum join is broadcast-trivial. No windows,
    * no collects.
    */
  def frequencySpectrum(df: DataFrame, keySql: String): DataFrame = {
    val tf = df.selectExpr(s"$keySql AS k")
      .groupBy("k").agg(count(lit(1)).as("r"))
    val spec = tf.groupBy("r").agg(count(lit(1)).as("n_r"))
    val next = spec.select((col("r") - 1).as("r"), col("n_r").as("n_r1"))
    spec.join(next, Seq("r"), "left")
      .select(col("r"), col("n_r"),
        round(((col("r") + 1) * coalesce(col("n_r1"), lit(0L)))
          .cast("double") / col("n_r"), 4).as("r_star"))
  }
}
