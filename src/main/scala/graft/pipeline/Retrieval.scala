package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over a document corpus — the ranking half of a
  * training-data pipeline's contamination screens and quality filters
  * (find the corpus documents most similar to a benchmark prompt, rank
  * candidate sources for a query). The reference has no retrieval
  * surface; this is beyond-parity alongside the embedding-space ANN
  * family (`Similarity`): BM25 is the sparse/lexical complement to
  * dense ANN, and real screens run both.
  *
  * Scale shape: a pure inverted-index pipeline. Postings and
  * document-frequency both aggregate on the `term` key, the
  * query–posting match is a term equi-join (candidates = documents
  * sharing ≥1 term, never all pairs), per-document stats join on
  * `doc_id`, and corpus-level scalars (N, total length) broadcast as a
  * single row. Top-k is a per-query `row_number` window. Every shuffle
  * is keyed; nothing is quadratic in corpus size.
  *
  * Exactness (the oracle-gate discipline): scores are integer
  * MICRO-BM25. The only libm call (`ln`) is quantized immediately —
  * `idf6 = floor(ln(1 + (N − df + 0.5)/(df + 0.5)) · 1e6 + 0.5)`
  * (Lucene's +1-inside-the-log idf, non-negative by construction) —
  * and every arithmetic step after it is either an IEEE-exact double
  * chain evaluated in the same literal order on both engines or a
  * BIGINT. Per-term scores floor to integers BEFORE the per-document
  * sum, so aggregation order cannot move a rounding.
  */
object Retrieval {

  /** The quantized idf table: (term, idf6) with
    * `idf6 = floor(ln(1 + (N − df + 0.5)/(df + 0.5)) · 1e6 + 0.5)`.
    * Exposed separately so the oracle gate can read a JVM-dumped copy
    * (the q137/q138 fixture-plane pattern) instead of re-deriving `ln`
    * on a libm whose rounding may differ by one ulp at a floor
    * boundary — the cross-engine fragility that made q139's hash
    * driver-red in round 6.
    */
  def idf6Table(corpus: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = corpus.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val post = toks.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val stats = toks.agg(count(lit(1)).as("n"), sum(col("dl")).as("total"))
    idf6FromPostings(post, stats)
  }

  /** idf6 from pre-built postings + corpus stats (shared by
    * [[bm25TopK]] so the corpus is scanned once). */
  private def idf6FromPostings(post: DataFrame, stats: DataFrame): DataFrame =
    // explicit DOUBLE casts keep this off Spark's DECIMAL arithmetic
    // (a bare `n - df + 0.5` would scale-round divisions the oracle
    // computes in doubles)
    post.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .select(col("term"), expr(
        "CAST(floor(ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5)) * 1000000.0 + 0.5) AS BIGINT)")
        .as("idf6"))

  /** Top-`k` corpus documents per query by BM25 (k1 = 1.2, b = 0.75,
    * query terms as a SET). Output: (query_id, rank, doc_id,
    * score_micro, n_terms) with rank 1-based by (score desc, doc_id).
    */
  def bm25TopK(corpus: DataFrame, queries: DataFrame, idCol: String,
               textCol: String, k: Int = 5): DataFrame = {
    val toks = corpus.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    // dl rides the postings aggregation (one value per doc, `first` is
    // deterministic) — a separate doc_id join would be corpus-sized at
    // scale where every other join here is broadcast
    val post = toks.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val stats = toks.agg(count(lit(1)).as("n"), sum(col("dl")).as("total"))
    val idf = idf6FromPostings(post.drop("dl"), stats)
    val qt = queries
      .select(col(idCol).as("query_id"), explode(split(col(textCol), " ")).as("term"))
      .distinct()
    val scored = qt.join(post, "term").join(idf, "term")
      .crossJoin(broadcast(stats))
      // identical literal order to the DuckDB oracle: every double op
      // here is IEEE-exact-rounded, so same tree ⇒ same bits ⇒ floor
      // lands identically
      .withColumn("score_term", expr(
        "CAST(floor((idf6 * (tf * 2.2)) / " +
          "(tf + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total AS DOUBLE) / n)))) " +
          "+ 0.5) AS BIGINT)"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("score_term")).as("score_micro"), count(lit(1)).as("n_terms"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_micro"), col("n_terms"))
  }
}
