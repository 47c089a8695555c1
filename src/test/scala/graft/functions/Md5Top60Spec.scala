package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the native md5-half hashes to the SQL conv-chain they replaced:
  * the DuckDB oracles compute `('0x' || substr(md5(s), 1, 15))::BIGINT`,
  * so any drift here silently breaks every dedup gate query.
  */
class Md5Top60Spec extends AnyFunSuite with SparkSpec {

  private val hiChain = "CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)"
  private val loChain = "CAST(conv(substr(md5(s), 17, 15), 16, 10) AS BIGINT)"

  test("graft_md5hi60 / graft_md5lo60 are bit-identical to the conv chain") {
    import spark.implicits._
    // fallback=false: a codegen compile error in the expression (e.g. a
    // non-resolvable static kernel reference) must FAIL, not silently
    // run interpreted
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val samples = (Seq("", "a", "0:", "7:the", "hello world", "éü世界",
        "x" * 4096) ++ (0 until 500).map(i => s"shingle $i of doc ${i % 7}")).toDF("s")
      val mismatches = samples.selectExpr(
        s"$hiChain AS hi_chain", "graft_md5hi60(s) AS hi_native",
        s"$loChain AS lo_chain", "graft_md5lo60(s) AS lo_native")
        .where("hi_chain <> hi_native OR lo_chain <> lo_native")
      assert(mismatches.count() == 0, mismatches.collect().mkString("\n"))
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("known digest value") {
    // md5("abc") = 900150983cd24fb0 d6963f7d28e17f72
    val r = spark.sql("SELECT graft_md5hi60('abc') AS hi, graft_md5lo60('abc') AS lo")
      .collect().head
    assert(r.getLong(0) == java.lang.Long.parseUnsignedLong("900150983cd24fb", 16))
    assert(r.getLong(1) == java.lang.Long.parseUnsignedLong("d6963f7d28e17f7", 16))
  }

  test("null in, null out; values always in [0, 2^60)") {
    val r = spark.sql("SELECT graft_md5hi60(CAST(NULL AS STRING)) AS h").collect().head
    assert(r.isNullAt(0))
    import spark.implicits._
    val bounds = (0 until 200).map(_.toString).toDF("s")
      .selectExpr("graft_md5hi60(s) AS h", "graft_md5lo60(s) AS l")
      .where(s"h < 0 OR h >= ${1L << 60} OR l < 0 OR l >= ${1L << 60}")
    assert(bounds.count() == 0)
  }

  test("resolves inside higher-order lambdas (the withMinhashSignature shape)") {
    val r = spark.sql(
      "SELECT transform(array('a', 'b'), s -> graft_md5hi60(s)) AS hs").collect().head
    assert(r.getSeq[Long](0).forall(h => h >= 0 && h < (1L << 60)))
  }
}
