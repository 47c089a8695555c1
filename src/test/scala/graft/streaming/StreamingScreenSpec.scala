package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.TextAnalysis

/** The curation stage-1 columns (language ID, quality keep, redaction,
  * token count) are pure column expressions, so the same code screens
  * a STREAM at ingest — stateless map-only, no watermark, no state
  * store. This pins that property: batch and streaming evaluation of
  * identical rows produce identical decisions.
  */
class StreamingScreenSpec extends AnyFunSuite with SparkSpec {

  test("langid/quality/redact run map-only on a stream, equal to batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "the quick brown fox jumps over a lazy dog near the data table key order line"),
      (2L, "mail me at ana@example.org window group batch stream window group batch stream"),
      (3L, "too short"),
    )
    def screen(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      TextAnalysis.languageId(col("text")).as("lang"),
      TextAnalysis.keepFlag(col("text")).as("keep"),
      TextAnalysis.redact(col("text")).as("clean"),
      size(TextAnalysis.tokens(col("text"))).as("n_tok"))

    val mem = MemoryStream[(Long, String)]
    val q = screen(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curation_screen")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("curation_screen").collect()
        .map(r => r.getLong(0) -> r.toSeq.tail).toMap
      val batch = screen(rows.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(streamed == batch)
      assert(streamed(1L).head == "en" && streamed(2L).head == "de")
      assert(streamed(2L)(2).toString.contains("<EMAIL>"))
      assert(streamed(3L)(1) == 0) // fails the quality gate
    } finally q.stop()
  }
}
