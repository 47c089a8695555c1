package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** JVM-dumped idf6 fixture for the BM25 oracle gates (q139, q199).
  *
  * Round-6 lesson: `floor(ln(x)·1e6 + 0.5)` computed independently by
  * JVM `Math.log` and the driver's DuckDB `ln` can differ by one ulp at
  * a floor boundary (the two libms round differently for some inputs),
  * which turned q139's hash red on the driver while being bit-exact on
  * this sandbox's DuckDB. Same cure as the q137/q138 trig planes
  * ([[ZonalFixture]]): dump the ONLY transcendental intermediate — the
  * per-term quantized idf table — from the JVM as a parquet fixture the
  * oracle equi-joins, and let the oracle independently recompute
  * everything else (tokenization, tf, dl, corpus stats, the IEEE-exact
  * score chain, top-k). The gate still verifies the whole inverted-index
  * pipeline; only the libm call is pinned to one engine.
  *
  * The corpus split here (doc_id % 100 <> 0 — q53's contamination
  * convention) must match the q139/q199 query defs exactly.
  */
object RetrievalFixture {

  def dir(sfDir: String): String = {
    val tag = new java.io.File(sfDir).getName
        val fp = EdgePlane.fingerprint(sfDir, Seq("documents.parquet"))
    s"${System.getProperty("java.io.tmpdir")}/graft_bm25_v2_${tag}_$fp"
  }

  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    val d = dir(sfDir)
    if (new java.io.File(s"$d/idf6.parquet/_SUCCESS").exists()) return d
    val corpus = graft.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 100 =!= 0)
    graft.pipeline.Retrieval.idf6Table(corpus, "doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/idf6.parquet")
    d
  }
}
