package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class PipelineSpec extends AnyFunSuite with SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (2L, "completely different words about spark query engines and data processing"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    ).toDF("doc_id", "text")
  }

  test("exactGroups finds the planted exact dup (0 == 3)") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    val dup = g.find(_.getLong(1) == 2).get
    assert(dup.getLong(2) == 0L) // keep_id = min
    assert(g.map(_.getLong(1)).sum == 4)
  }

  test("ngramJaccardPairs ranks near-dup above non-dup") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 3L)) == 1.0) // identical docs
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) > 0.5) // near-dup
    assert(!pairs.keys.exists { case (a, b) => a == 2L || b == 2L }) // unrelated
  }

  test("minhashLshPairs surfaces identical docs as candidates") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("simhash: identical docs equal, near-dups close, distinct docs far") {
    val s = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(0L) == s(3L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(s(0L), s(1L)) < hamming(s(0L), s(2L)))
  }

  test("simhashBandPairs finds everything the exact pair join finds (≤3)") {
    val sims = Dedup.simhash(docs, "doc_id", "text")
    val exact = Dedup.simhashPairs(sims, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.simhashBandPairs(sims, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == exact)
  }

  test("cosine top-k: self excluded, nearest first, k bounded") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), "vec_id", "embedding", 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(top.toSeq == Seq((1L, 1L), (2L, 2L))) // rank1=closest (1), rank2=orthogonal (2)
  }

  test("languageId is deterministic and falls back to und") {
    import spark.implicits._
    val df = Seq((1L, "the a order key"), (2L, "window group batch"), (3L, "zzz qqq"))
      .toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.languageId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en" && got(2L) == "de" && got(3L) == "und")
  }

  test("qualityMetrics computes exact ratios") {
    import spark.implicits._
    val df = Seq((1L, "the cat sat on a mat, twice.")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityMetrics(df, "doc_id", "text").collect().head
    assert(r.getLong(1) == 7) // tokens
    assert(r.getLong(2) == 28) // chars
    assert(r.getDouble(5) == 0.0714) // 2 punct / 28 chars
  }

  test("vocabulary ranks by frequency then lexically, capped at maxSize") {
    import spark.implicits._
    val df = Seq("b b b a a c", "a d d", "e").toDF("text")
    val v = TextAnalysis.vocabulary(df, "text", maxSize = 3)
      .orderBy("token_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a:3 b:3 d:2 c:1 e:1 -> tie a/b lexical, cap drops c/e
    assert(v.toSeq == Seq(("a", 3L, 1L), ("b", 3L, 2L), ("d", 2L, 3L)))
  }

  test("redact replaces emails, IPv4s, and long digit runs, in rule order") {
    import spark.implicits._
    val out = Seq(
      "mail a.b+c@sub.example.org now",
      "from 192.168.0.1 port 8080",
      "card 4111111111111111 exp 12/26",
      "no pii here 123 12.5",
      "both bob@x.io at 10.0.0.7 acct 12345678901234567",
    ).toDF("t").select(TextAnalysis.redact($"t")).collect().map(_.getString(0))
    assert(out(0) == "mail <EMAIL> now")
    assert(out(1) == "from <IP> port 8080")
    assert(out(2) == "card <ID> exp 12/26")
    assert(out(3) == "no pii here 123 12.5") // short numbers untouched
    assert(out(4) == "both <EMAIL> at <IP> acct <ID>")
  }
}
