package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class BloomSpec extends AnyFunSuite with SparkSpec {

  test("no false negatives: every inserted key is flagged maybe_member") {
    import spark.implicits._
    val keys = (0 until 2000).map(i => s"key_$i").toDF("k")
    val bf = Bloom.build(keys, "k", 2000, fpp = 0.03)
    val flagged = Bloom.screen(keys, "k", bf)
      .filter($"maybe_member" === 1).count()
    assert(flagged == 2000L)
  }

  test("disjoint probes mostly pass as definitely-new; fp rate near configured fpp") {
    import spark.implicits._
    val corpus = (0 until 2000).map(i => s"key_$i").toDF("k")
    val bf = Bloom.build(corpus, "k", 2000, fpp = 0.03)
    val probes = (0 until 2000).map(i => s"other_$i").toDF("k")
    val fp = Bloom.screen(probes, "k", bf).filter($"maybe_member" === 1).count()
    // expected ~60 at 3%; generous ceiling to stay non-flaky
    assert(fp < 2000 * 0.03 * 3, s"fp=$fp")
  }

  test("null keys screen as definitely-new, not a crash") {
    import spark.implicits._
    val corpus = Seq("a", "b").toDF("k")
    val bf = Bloom.build(corpus, "k", 2, fpp = 0.03)
    val got = Bloom.screen(Seq(Some("a"), None).toDF("k"), "k", bf)
      .collect().map(r => Option(r.getString(0)) -> r.getInt(1)).toMap
    assert(got(Some("a")) == 1 && got(None) == 0)
  }

  test("bloomJoin == plain join (numeric keys; zero false negatives)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat, lit}
    val fact = spark.range(5000).toDF("k").withColumn("v", col("k") * 2)
    val dim = spark.range(100).toDF("k").filter($"k" % 7 === 0)
      .withColumn("name", concat(lit("d"), $"k"))
    val got = Bloom.bloomJoin(fact, dim, "k", expectedItems = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = fact.join(dim, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(want.nonEmpty && got == want)
  }
}
