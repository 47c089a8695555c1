package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.pipeline.TextAnalysis

/** Specs for the codegen'd Unicode normalization expression
  * (`graft_nfc` / `graft_nfkc`). All non-ASCII content is written as
  * \u escapes so no tool in the edit chain can silently re-compose
  * the source literals.
  */
class NormalizeSpec extends AnyFunSuite with SparkSpec {

  test("NFC composes decomposed sequences; both spellings become one form") {
    import spark.implicits._
    val decomposed = "café Å"    // e + combining acute, A + combining ring
    val precomposed = "café Å"
    val got = Seq((decomposed, precomposed)).toDF("d", "p")
      .select(
        TextAnalysis.normalize($"d").as("nd"),
        TextAnalysis.normalize($"p").as("np"),
        length($"d").as("ld"), length(TextAnalysis.normalize($"d")).as("lnd"))
      .collect().head
    assert(got.getString(0) == got.getString(1))
    assert(got.getString(0) == precomposed)
    assert(got.getInt(2) == 8 && got.getInt(3) == 6)
  }

  test("NFKC folds compatibility forms (full-width, ligature); NFC does not") {
    import spark.implicits._
    val s = "Ｆｕｌｌ ﬁ"   // full-width 'Full', 'fi' ligature
    val got = Seq(s).toDF("s")
      .select(TextAnalysis.normalize($"s", "NFKC").as("k"),
        TextAnalysis.normalize($"s").as("c"))
      .collect().head
    assert(got.getString(0) == "Full fi")
    assert(got.getString(1) == s)
  }

  test("null passes through; pure ASCII is unchanged; SQL surface resolves") {
    import spark.implicits._
    val got = Seq(Some("plain ascii"), None).toDF("s")
      .selectExpr("graft_nfc(s) AS n").collect()
      .map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("plain ascii"), None))
    intercept[IllegalArgumentException] {
      TextAnalysis.normalize(lit("x"), "NFD")
    }
  }
}
