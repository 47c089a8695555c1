package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: flag training documents that
  * share any word n-gram with a held-out evaluation set — the standard
  * pre-training hygiene check (n-gram overlap, the GPT-3/PaLM report
  * methodology).
  *
  * Scale design: both sides reduce to distinct 60-bit shingle hashes
  * (md5-derived — portable, reproducible), so the overlap test is one
  * semi-join on a fixed-width key. The benchmark side is tiny by
  * construction (eval sets are thousands of docs, not billions) and
  * broadcasts; the corpus side never shuffles its text, only hashes.
  * Hash collisions (~|shingles|²/2⁶⁰) can only add a false positive —
  * for contamination screening a one-in-10¹² spurious flag is noise.
  */
object Contamination {

  /** (idCol, contaminated 0/1) for every corpus row: 1 iff the doc
    * shares ≥1 word n-gram with any benchmark doc.
    */
  def flagNgramOverlap(corpus: DataFrame, bench: DataFrame, idCol: String,
                       textCol: String, n: Int = 8): DataFrame = {
    val c = Par.spread(corpus)
      .select(col(idCol).as("doc"),
        explode(Dedup.hashedWordShingles(textCol, n)).as("h"))
    val b = bench
      .select(explode(Dedup.hashedWordShingles(textCol, n)).as("h")).distinct()
    val hits = c.join(broadcast(b), Seq("h"), "left_semi")
      .select(col("doc")).distinct()
      .withColumn("contaminated", lit(1L))
    corpus.select(col(idCol).as("doc"))
      .join(hits, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("contaminated"), lit(0L)).as("contaminated"))
  }
}
