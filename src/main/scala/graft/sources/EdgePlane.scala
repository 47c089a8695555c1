package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized co-purchase edge plane: the distinct oriented pair
  * list (p < q of parts sharing an order) that EVERY graph gate used
  * to rebuild from lineitem — the same distinct-pairs self-join
  * repeated nine times per bench pass (triangles, k-core, k-truss,
  * LPA, Katz, PPR, BFS, assortativity, link prediction), ~2 s each at
  * sf0.1 and ~20 s at 10×.
  *
  * Built ONCE per fixture dir into tmp parquet (the
  * [[StatsFixture]]/[[ZonalFixture]] idempotency pattern: _SUCCESS
  * marker, `synchronized`, survives across JVMs), then every consumer
  * is a plain columnar scan. This is the production shape too: at
  * 100 TB the edge list is a curated TABLE built by one job and read
  * by every downstream graph algorithm — recomputing the
  * O(Σ per-order pairs) explode per algorithm is the anti-pattern.
  * Edge content is deterministic (distinct of exact longs), so the
  * materialization is bit-identical to the inline build every oracle
  * replays.
  *
  * Round-12 adds the per-edge triangle-SUPPORT plane
  * ([[graft.pipeline.Graph.edgeSupport]]) one level up the same reuse
  * ladder: q152 (triangle census) and q402 (k-truss round 1) each
  * re-enumerated the same ~10⁸-wedge stream over these edges — the
  * suite's two heaviest gates. The wedge join now runs once, here.
  */
object EdgePlane {

  /** Cache key: basename + a CONTENT fingerprint of the source tables
    * (canonical path, plus name/length/mtime of every parquet part the
    * plane derives from). Round-12 advisor item: a basename-only key
    * served stale planes when testdata was regenerated in place, and
    * would alias two fixture roots sharing a basename (/a/sf0.1 vs
    * /b/sf0.1) — and because the DuckDB oracle reads the SAME cached
    * file for fixture-derived gates, drift was invisible to the
    * correctness gate. Any source change now lands in a fresh dir.
    */
  private[graft] def fingerprint(sfDir: String, tables: Seq[String]): String = {
    val canon = new java.io.File(sfDir).getCanonicalPath
    val sb = new StringBuilder(canon)
    tables.foreach { t =>
      val d = new java.io.File(canon, t)
      // RECURSIVE walk (nested partition dirs contribute too), sorted
      // by relative path for a stable digest; a missing or file-less
      // table FAILS LOUDLY (round-13 advisor item) — silently hashing
      // nothing would mint a stable fingerprint for a typoed table
      // name or a not-yet-generated fixture, defeating the staleness
      // protection the fingerprint exists for.
      // visited-canonical-dir guard (round-13 advisor): a directory
      // symlink cycle inside a table dir would recurse forever, and a
      // symlinked subtree whose canonical path escapes `canon` would
      // embed a machine-absolute path in the digest — each dir is
      // entered once by canonical identity, and directory SYMLINKS are
      // skipped outright (parquet writers never create them; one that
      // appears is foreign to the table, not part of its content)
      val seen = scala.collection.mutable.HashSet.empty[String]
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) {
          if (java.nio.file.Files.isSymbolicLink(f.toPath) ||
              !seen.add(f.getCanonicalPath)) Seq.empty
          else Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
            .toIndexedSeq.flatMap(walk)
        }
        else if (f.isFile) Seq(f) else Seq.empty
      val fs = walk(d)
      require(fs.nonEmpty,
        s"EdgePlane.fingerprint: no files under $d — missing table " +
          s"'$t' in $canon (typo, or fixture not generated yet)")
      // getPath, not getCanonicalPath: the walk descends from `canon`,
      // so getPath is always canon-relative — a FILE symlink's
      // canonical path would resolve outside and embed an absolute
      // machine-specific path in the digest
      fs.sortBy(_.getPath.stripPrefix(canon)).foreach { f =>
        sb.append('|').append(f.getPath.stripPrefix(canon)).append(':')
          .append(f.length()).append(':').append(f.lastModified()): Unit
      }
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(sb.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
  }

  def dir(sfDir: String): String = {
    val tag = new java.io.File(sfDir).getName
    val fp = fingerprint(sfDir, Seq("lineitem.parquet", "documents.parquet"))
    s"${System.getProperty("java.io.tmpdir")}/graft_copurchase_v2_${tag}_$fp"
  }

  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    val d = dir(sfDir)
    if (new java.io.File(s"$d/copurchase.parquet/_SUCCESS").exists() &&
        new java.io.File(s"$d/lshpairs.parquet/_SUCCESS").exists() &&
        new java.io.File(s"$d/support.parquet/_SUCCESS").exists()) return d
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val po = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    po.join(po.withColumnsRenamed(Map("p" -> "q")), Seq("ok"))
      .filter(col("p") < col("q")).select("p", "q").distinct()
      .write.mode("overwrite").parquet(s"$d/copurchase.parquet")
    // per-edge triangle support over the just-written plane (reads the
    // parquet back so the wedge join never replays the lineitem
    // self-join): the shared intermediate of the triangle family —
    // q152 reads Σ supp/3, q402 starts its peel from it
    graft.pipeline.Graph.edgeSupport(
        spark.read.parquet(s"$d/copurchase.parquet"), "p", "q")
      .write.mode("overwrite").parquet(s"$d/support.parquet")
    // the document near-dup edge list (MinHash-LSH candidate pairs at
    // the suite's canonical n=3/12 hashes/4 bands): input edges for
    // the CC/star/survivor gates. The LSH OPERATOR gates (q13, the
    // verify composition) keep building it inline — they test the
    // operator; these consumers test what runs downstream of it.
    graft.pipeline.Dedup.minhashLshPairs(
        graft.Tables.load(spark, sfDir, "documents"), "doc_id", "text",
        n = 3, numHashes = 12, bands = 4)
      .write.mode("overwrite").parquet(s"$d/lshpairs.parquet")
    d
  }

  /** The distinct oriented co-purchase edges `(p, q)`, p < q. */
  def coPurchase(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${ensure(spark, sfDir)}/copurchase.parquet")

  /** The per-edge triangle support `(u, v, supp)` of the co-purchase
    * graph, supp-0 edges included ([[graft.pipeline.Graph.edgeSupport]]).
    */
  def support(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${ensure(spark, sfDir)}/support.parquet")

  /** The canonical MinHash-LSH candidate pairs `(doc_a, doc_b)`. */
  def lshPairs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${ensure(spark, sfDir)}/lshpairs.parquet")
}
