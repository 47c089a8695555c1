package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter corpus screen — the cheapest dedup-at-ingest gate: a
  * compact bit-array summary of the corpus keys that answers "possibly
  * seen before?" with NO false negatives and a tunable false-positive
  * rate. Rows flagged `maybe_member = 0` are definitely new and skip
  * the (much more expensive) exact or LSH confirmation joins
  * ([[Dedup.nearDupScreen]]); only the ~fpp fraction of survivors pays
  * them.
  *
  * Scale shape: the build is Spark's own distributed sketch aggregation
  * (`DataFrameStatFunctions.bloomFilter` — partition-local filters
  * OR-merged on the driver, a treeAggregate), and the probe side is a
  * broadcast of the finished filter. A 1 B-key corpus at 1 % fpp is a
  * ~1.2 GiB bitset — broadcastable; beyond that, shard the corpus by
  * key range and screen against per-shard filters (same code per
  * shard), or fall back to the LSH bucket screen which never
  * materializes a global structure.
  */
object Bloom {

  /** Build a Bloom filter over `keyCol` (use a STRING key — hashing is
    * over the UTF-8 bytes; hash a composite key into one string first,
    * e.g. `md5(text)`). Deterministic: Murmur3 hashing, and the bitset
    * OR-merge is order-independent.
    */
  def build(df: DataFrame, keyCol: String, expectedItems: Long,
            fpp: Double = 0.03): BloomFilter =
    df.stat.bloomFilter(keyCol, math.max(expectedItems, 1L), fpp)

  /** Flag incoming rows with `maybe_member` (1 = possibly in the
    * corpus, confirm with an exact join; 0 = guaranteed new). The
    * probe is a broadcast-closure UDF by necessity: no Catalyst
    * expression exposes the sketch probe, and inlining a multi-MB
    * bitset as a plan literal would bloat every task's plan — the
    * broadcast ships it once per executor instead.
    */
  def screen(incoming: DataFrame, keyCol: String, bf: BloomFilter): DataFrame = {
    val bcast = incoming.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((s: String) =>
      if (s != null && bcast.value.mightContainString(s)) 1 else 0)
    incoming.withColumn("maybe_member", mightContain(col(keyCol).cast("string")))
  }

  /** Sharded corpus filters — the documented fallback when one filter
    * outgrows broadcast size (object scaladoc): corpus keys partition
    * into `shards` disjoint subsets by Catalyst `hash` (Murmur3) mod
    * shards, one filter per shard. Because the shard is a pure function
    * of the key, a corpus key always lands in — and is always probed
    * against — exactly one filter, so the zero-false-negative guarantee
    * survives sharding. Each per-shard build is the same distributed
    * treeAggregate as [[build]]; the corpus is persisted across the
    * `shards` passes so the key projection is computed once.
    */
  def buildSharded(corpus: DataFrame, keyCol: String, shards: Int,
                   expectedItems: Long, fpp: Double = 0.03): Seq[BloomFilter] = {
    require(shards >= 1, "need at least one shard")
    val keyed = corpus.select(col(keyCol).cast("string").as("__k"))
      .withColumn("__shard", pmod(hash(col("__k")), lit(shards)))
      .persist()
    // bloomFilter is an action, so every filter is materialized before
    // the unpersist runs
    try (0 until shards).map(i =>
      build(keyed.filter(col("__shard") === i), "__k",
        math.max(expectedItems / shards, 1L), fpp))
    finally keyed.unpersist()
  }

  /** Probe the sharded filters: each row computes its key's shard with
    * the SAME Catalyst hash expression the build used and probes only
    * that shard's filter. Broadcast ships the filter array once per
    * executor; flags mean the same as [[screen]]'s.
    */
  def screenSharded(incoming: DataFrame, keyCol: String,
                    filters: Seq[BloomFilter]): DataFrame = {
    val bcast = incoming.sparkSession.sparkContext.broadcast(filters.toArray)
    val mightContain = udf((s: String, shard: Int) =>
      if (s != null && bcast.value(shard).mightContainString(s)) 1 else 0)
    val k = col(keyCol).cast("string")
    incoming.withColumn("maybe_member",
      mightContain(k, pmod(hash(k), lit(filters.size))))
  }

  /** Bloom-filtered join: pre-screen the fact side with a Bloom filter
    * of the dim keys BEFORE the shuffle join, so rows that cannot
    * match never enter the exchange — the classic shuffle reduction
    * for selective joins (the row-level analog of Spark's plan-side
    * runtime bloom pushdown). False positives only waste a probe; zero
    * false negatives means the result is EXACTLY the plain join, which
    * is what the q99 gate pins.
    */
  def bloomJoin(fact: DataFrame, dim: DataFrame, key: String,
                expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // build on the STRING form: screen() probes mightContainString, and
    // spark's bloomFilter on a numeric column hashes the numeric —
    // mixed types would never match
    val bf = build(dim.select(col(key).cast("string").as(key)), key,
      expectedItems, fpp)
    screen(fact, key, bf).filter(col("maybe_member") === 1)
      .drop("maybe_member")
      .join(dim, key)
  }
}
