package graft

import org.apache.spark.sql.DataFrame

/** Measures the /multi shared-scan property the reference claims
  * ("almost an order of magnitude" for 61 shapes × 7 ops via
  * fetch-tiles-once — CHANGELOG.md:82-91) on THIS engine: the same
  * shapes × ops workload as gate query q34 run (a) as one
  * [[graft.operators.Zonal.multiBatch]] plan with scans shared across
  * all shapes and ops, and (b) naively — one job per (shape, op), each
  * re-scanning the tile catalog cropped to its own shape, i.e. the
  * per-shape `/run` loop the reference's batch endpoint replaced.
  *
  * Prints ONE JSON line with both times and the ratio. Not part of the
  * driver's Bench contract; run ad hoc:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ScanShareBench"`.
  */
object ScanShareBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.Zonal
    import graft.sources.{TileCatalog, ZonalFixture}
    import graft.geom.GeomOps

    val path = ZonalFixture.ensureMasks(spark, sfDir)
    val spec = ZonalFixture.specFor(sfDir)
    val metas = TileCatalog.readMeta(path)
    val layout = metas("nlcd").layout
    val shapes = ZonalFixture.subShapes(spec)
    val lines = ZonalFixture.streamLines(spec)

    def layer(id: String, geom: org.locationtech.jts.geom.Geometry) =
      Zonal.Layer(metas(id), TileCatalog.readLayer(spark, path, metas(id), geom))
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // (a) the q34 shape: one plan, scans cropped once to the union AOI
    def runBatch(): Unit = {
      val union = GeomOps.unionAll(shapes)
      val shared = Seq("nlcd", "soil", "slope").map(id => id -> layer(id, union)).toMap
      sink(Zonal.multiBatch(spark, layout, shared, shapes, lines, Seq(
        Zonal.BatchCount("nlcd_soil", Seq("nlcd", "soil")),
        Zonal.BatchAverage("avg_slope", Seq("soil"), "slope"),
        Zonal.BatchLines("nlcd_streams", Seq("nlcd")))))
    }

    // (b) the per-shape /run loop: |shapes| × |ops| jobs, each with its
    // own catalog scan cropped to just that shape
    def runNaive(): Unit = shapes.foreach { shape =>
      sink(Zonal.groupedCount(spark, layout,
        Seq(layer("nlcd", shape), layer("soil", shape)), shape))
      sink(Zonal.groupedAverage(spark, layout,
        Seq(layer("soil", shape)), layer("slope", shape), shape))
      sink(Zonal.linesJoin(spark, layout,
        Seq(layer("nlcd", shape)), GeomOps.clipLines(lines, shape)))
    }

    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    runBatch() // warmup: codegen, parquet footers, JIT
    val batch = math.min(time(() => runBatch()), time(() => runBatch()))
    val naive = math.min(time(() => runNaive()), time(() => runNaive()))
    println(s"""{"metric":"scan_share","batch_sec":$batch,"naive_sec":$naive,""" +
      s""""ratio":${naive / batch},"shapes":${shapes.size},"ops":3,"sf_dir":"$sfDir"}""")
    spark.stop()
  }
}
