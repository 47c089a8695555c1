package graft.pipeline

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry durian"),
    (4L, "elderberry fig grape")
  ).toDF("doc_id", "text")

  test("bm25TopK ranks the term-bearing docs and respects k") {
    val queries = Seq((100L, "apple banana")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(corpus, queries, "doc_id", "text", k = 2)
      .collect().sortBy(_.getLong(1))
    assert(out.length == 2) // three docs match ≥1 term, k caps at 2
    val top = out.head
    // doc 1 carries both terms (apple tf=2, banana tf=1) — must rank 1
    assert(top.getLong(0) == 100L && top.getLong(2) == 1L && top.getLong(1) == 1L)
    assert(top.getLong(4) == 2L) // n_terms = both query terms matched
    // scores are positive micro-integers, strictly ordered
    assert(out.forall(_.getLong(3) > 0))
    assert(out(0).getLong(3) >= out(1).getLong(3))
  }

  test("bm25TopK: rarer term outweighs common term at equal tf") {
    // 'durian' df=1 vs 'banana' df=2: one-term queries, same doc len
    val qs = Seq((200L, "durian"), (201L, "banana")).toDF("doc_id", "text")
    val byQ = Retrieval.bm25TopK(corpus, qs, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(byQ(200L)._1 == 3L) // durian only in doc 3
    // idf(durian) > idf(banana): doc-3 hit scores above either banana hit
    assert(byQ(200L)._2 > byQ(201L)._2)
  }

  test("bm25TopK: query with no corpus terms returns nothing") {
    val qs = Seq((300L, "zucchini")).toDF("doc_id", "text")
    assert(Retrieval.bm25TopK(corpus, qs, "doc_id", "text").count() == 0)
  }

  test("bm25TopK: query-term SET semantics (repeated query term counts once)") {
    val q1 = Seq((400L, "cherry")).toDF("doc_id", "text")
    val q2 = Seq((400L, "cherry cherry cherry")).toDF("doc_id", "text")
    val a = Retrieval.bm25TopK(corpus, q1, "doc_id", "text").collect()
    val b = Retrieval.bm25TopK(corpus, q2, "doc_id", "text").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }
}
