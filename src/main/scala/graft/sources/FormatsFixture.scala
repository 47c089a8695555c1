package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic multi-format / multi-generation dataset fixture for
  * the source-surface gates (q200–q202), derived purely from the
  * driver test tables (the ZonalFixture discipline: written once to a
  * deterministic tmpdir, `_SUCCESS`-guarded, oracle reads the same
  * files):
  *
  *  - `docs_gen1/` — documents with the ORIGINAL schema (doc_id, text)
  *  - `docs_gen2/` — a later "generation" adding a `quality` column —
  *    the schema-evolution case every long-lived lake hits
  *  - `events_bytype/` — events hive-partitioned by event_type (the
  *    partition-pruning layout)
  *  - `events_jsonl/` — the same rows as JSON lines (integer-encoded
  *    time so the text round-trip is exact)
  *  - `events_orc/` — the same rows as ORC, Spark's other columnar
  *    native format (binary-typed, so no text-encoding caveats)
  */
object FormatsFixture {

  /** 2024-01-01T00:00:00Z in micros — the fixture's `tu` origin. */
  val EpochUs: Long = 1704067200000000L

  def dir(sfDir: String): String = {
    val tag = new java.io.File(sfDir).getName
    // v2: `tu` became epoch-relative; the version bump invalidates any
    // _SUCCESS-guarded dump with the old absolute clock
        val fp = EdgePlane.fingerprint(sfDir, Seq("documents.parquet", "events.parquet"))
    s"${System.getProperty("java.io.tmpdir")}/graft_formats_v3_${tag}_$fp"
  }

  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    val d = dir(sfDir)
    val done = Seq("docs_gen1", "docs_gen2", "events_bytype", "events_jsonl",
        "events_csv", "events_orc", "events_avro")
      .forall(p => new java.io.File(s"$d/$p/_SUCCESS").exists())
    if (done) return d
    val docs = graft.Tables.load(spark, sfDir, "documents")
    docs.filter(col("doc_id") < 250)
      .select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(s"$d/docs_gen1")
    docs.filter(col("doc_id") >= 250)
      .select(col("doc_id"), col("text"), col("n_chars").as("quality"))
      .write.mode("overwrite").parquet(s"$d/docs_gen2")
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        // micros RELATIVE to 2024-01-01 UTC: absolute epoch micros are
        // ~1.7e15, so a 20k-row group SUM overflows Long at sf0.1 —
        // the relative clock keeps every aggregate in range
        (unix_micros(col("ts")) - lit(EpochUs)).as("tu"))
    ev.write.partitionBy("event_type").mode("overwrite")
      .parquet(s"$d/events_bytype")
    ev.write.mode("overwrite").json(s"$d/events_jsonl")
    ev.write.mode("overwrite").option("header", "true").csv(s"$d/events_csv")
    ev.write.mode("overwrite").orc(s"$d/events_orc")
    // Avro classes ship inside spark-sql here (no service entry, so
    // the fully-qualified provider) — the row-oriented format
    ev.write.mode("overwrite")
      .format("org.apache.spark.sql.avro.AvroFileFormat")
      .save(s"$d/events_avro")
    d
  }
}
