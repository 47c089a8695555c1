package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JVM-dumped per-event decay contributions for the q194 oracle.
  *
  * The libm-perturbation audit (`scripts/audit_libm_boundary.py`)
  * flagged q194 as the one gate whose output flips under a ±1-ulp
  * shift of its transcendental (`pow(0.5, age/6h)` lands within an
  * ulp of a floor boundary for some event at sf0.01) — the same
  * failure class that turned q139 driver-red in round 6. Same cure
  * ([[RetrievalFixture]], [[ZonalFixture]] planes): the JVM dumps the
  * per-event floored contribution — the ONLY transcendental output —
  * and the oracle equi-joins it against `events`, independently
  * verifying that every event appears exactly once, the user
  * attribution, and the grouped integer aggregation.
  */
object DecayFixture {

  def dir(sfDir: String): String = {
    val tag = new java.io.File(sfDir).getName
        val fp = EdgePlane.fingerprint(sfDir, Seq("events.parquet"))
    s"${System.getProperty("java.io.tmpdir")}/graft_decay_v2_${tag}_$fp"
  }

  /** (event_id, user_id, contrib) — contrib = ⌊cents · 2^(−age/6h) ·
    * 10⁶⌋ against the corpus max timestamp (one broadcast row).
    */
  def contribs(spark: SparkSession, sfDir: String): DataFrame = {
    val e = graft.Tables.events(spark, sfDir).select(col("event_id"),
      col("user_id"), unix_micros(col("ts")).as("tu"),
      expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val mx = e.agg(max(col("tu")).as("mx"))
    e.crossJoin(broadcast(mx))
      .select(col("event_id"), col("user_id"),
        expr("CAST(floor(cents * pow(0.5, (mx - tu) / 21600000000.0) " +
          "* 1000000.0) AS BIGINT)").as("contrib"))
  }

  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    val d = dir(sfDir)
    if (new java.io.File(s"$d/contrib.parquet/_SUCCESS").exists()) return d
    contribs(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$d/contrib.parquet")
    d
  }
}
