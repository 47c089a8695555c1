package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All readers go through `spark.read.parquet` so Catalyst handles
  * column pruning and filter pushdown; no custom DataSource is needed
  * at this shape (cf. SURVEY.md §7 step 3).
  */
object Tables {

  /** Plain parquet table under `dir`. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` is written with parquet TIMESTAMP(NANOS) which Spark's
    * vectorized reader rejects outright. We read nanos as a raw long
    * (legacy conf, set in [[GraftSession]]) and truncate to
    * microsecond precision — exactly what DuckDB does when it loads
    * the same file, so oracle comparisons stay bit-identical.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
}

/** One SparkSession configuration for every graft entrypoint. */
object GraftSession {
  def builder(master: String = "local[*]", cpus: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")

  /** Apply graft-required runtime confs to an externally-built session
    * (e.g. the driver's): confs that are settable at runtime, plus the
    * graft function registry + optimizer rule (equivalent to the
    * `spark.sql.extensions` static conf, which cannot be set on a live
    * session — without this, every md5-hash-keyed pipeline operator
    * would fail to resolve `graft_md5hi60`).
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    org.apache.spark.sql.graft.GraftExtensions.install(spark)
    spark
  }

  /** Startup configuration echo (reference `printConfiguration`,
    * Utils.scala:250-264 / CHANGELOG.md:20-22).
    */
  def printConfiguration(spark: SparkSession): Unit = {
    val keys = Seq("spark.master", "spark.sql.shuffle.partitions",
      "spark.sql.adaptive.enabled", "spark.sql.session.timeZone",
      "spark.sql.legacy.parquet.nanosAsLong")
    val lines = keys.map(k => s"  $k = ${spark.conf.getOption(k).getOrElse("<unset>")}")
    // log4j is Spark's logger; println keeps the banner visible in any
    // driver harness
    println(("graft configuration:" +: lines).mkString("\n"))
  }
}
