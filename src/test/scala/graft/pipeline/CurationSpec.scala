package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Each curation stage must drop exactly the docs built to trip it:
  * language (doc 4), quality (doc 5), exact dup (doc 2), LSH near-dup
  * (doc 3), with docs 1 and 6 surviving.
  */
class CurationSpec extends AnyFunSuite with SparkSpec {

  private val base =
    "the quick brown fox jumps over a lazy dog near the data table key order line"

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, base),
      (2L, base), // exact duplicate of 1
      (3L, base + " appended"), // near-dup of 1: shingle superset
      (4L, "window group batch stream window group batch stream window group batch stream"),
      (5L, "the key order"), // en but under the 10-token floor
      (6L, "a data key order table the report shows a data key order trend clearly today"),
    ).toDF("doc_id", "text")
  }

  test("curate keeps exactly the clean unique English docs") {
    val out = Curation.curate(corpus, "doc_id", "text").orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 6L))
    assert(out.forall(_.getString(1) == "en"))
    assert(out.map(r => r.getLong(0) -> r.getLong(2)).toMap == Map(1L -> 16L, 6L -> 15L))
  }

  test("funnel counts each stage's survivors and matches curate") {
    val f = Curation.funnel(corpus, "doc_id", "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f == Map("1_raw" -> 6L, "2_lang" -> 5L, "3_quality" -> 4L,
      "4_exact" -> 3L, "5_neardup" -> 2L))
    assert(f("5_neardup") == Curation.curate(corpus, "doc_id", "text").count())
  }

  test("language parameter routes the pipeline") {
    // de: doc 4 passes language but fails the 10-token+stopword quality gate
    assert(Curation.curate(corpus, "doc_id", "text", lang = "de").count() == 0)
  }

  test("end-to-end: curate -> split -> epoch key -> partitioned sink -> read back") {
    val dir = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    try {
      val manifest = Curation.curate(corpus, "doc_id", "text")
      val shipped = Sampling.withEpochKey(
        Sampling.hashSplit(manifest, "doc_id", Seq("train" -> 0.5, "val" -> 0.5)),
        "doc_id", epoch = 1)
      CorpusSink.writePartitioned(shipped, dir, Seq("split"), "epoch_key", buckets = 2)
      val back = spark.read.parquet(dir)
      assert(back.count() == manifest.count())
      assert(back.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 6L))
      assert(back.columns.toSet ==
        Set("doc_id", "lang_pred", "ws_tokens", "split", "epoch_key"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("empty corpus: every funnel stage reports 0, not NULL") {
    val empty = corpus.filter(org.apache.spark.sql.functions.col("doc_id") < 0)
    val f = Curation.funnel(empty, "doc_id", "text").collect()
    assert(f.length == 5)
    assert(f.forall(r => !r.isNullAt(1) && r.getLong(1) == 0L))
    assert(Curation.curate(empty, "doc_id", "text").count() == 0)
  }
}
