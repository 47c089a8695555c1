package graft

import graft.sources.TileCatalog
import graft.sources.TileCatalog.RasterMeta

/** Build the small demo catalog used by the CLI walkthrough in
  * README/USAGE (2×2 tiles of 4×4 cells; nlcd/soil int layers + a
  * slope double layer):
  * {{{ sbt "runMain graft.MakeFixture /tmp/graft_cat" }}}
  */
object MakeFixture {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    // layer writers use parquet append mode — re-running on an existing
    // catalog would silently double every tile (ZonalFixture.ensure
    // guards the same way). Only delete a directory that actually IS a
    // graft catalog (has the meta file): a mistyped path must not wipe
    // unrelated data.
    val target = new java.io.File(dir)
    if (target.exists()) {
      // delete only what is safe: a DIRECTORY that is a complete
      // catalog (meta.json), a partial build (tiles/ but no meta — a
      // crash between layer writes and writeMeta must stay
      // re-runnable), or empty. A regular file or any dir with other
      // contents is someone's unrelated data.
      require(target.isDirectory,
        s"refusing to delete $dir: not a directory")
      val contents = Option(target.list()).getOrElse(Array.empty[String])
      val looksLikeCatalog = contents.isEmpty ||
        contents.forall(n => n == "meta.json" || n == "tiles")
      require(looksLikeCatalog,
        s"refusing to delete $dir: not a graft catalog (contains ${contents.take(3).mkString(", ")})")
      org.apache.commons.io.FileUtils.deleteQuietly(target)
    }
    def m(id: String, ct: String) = RasterMeta(id, 0, "ConusAlbers", ct, 0, 0, 8, 8, 4, 4, 2, 2)
    def tiles(f: (Int, Int) => Int) =
      for (kc <- 0 to 1; kr <- 0 to 1)
        yield (kc, kr, Array.tabulate(16)(i => f(kc * 4 + i % 4, kr * 4 + i / 4)))
    def dtiles(f: (Int, Int) => Double) =
      for (kc <- 0 to 1; kr <- 0 to 1)
        yield (kc, kr, Array.tabulate(16)(i => f(kc * 4 + i % 4, kr * 4 + i / 4)))
    TileCatalog.writeIntLayer(spark, dir, m("nlcd", "int"), tiles((gc, _) => gc / 2))
    TileCatalog.writeIntLayer(spark, dir, m("soil", "int"), tiles((_, gr) => gr / 4))
    TileCatalog.writeDoubleLayer(spark, dir, m("slope", "double"), dtiles((gc, _) => gc * 1.0))
    TileCatalog.writeMeta(dir, Seq(m("nlcd", "int"), m("soil", "int"), m("slope", "double")))
    println(s"catalog written to $dir")
    spark.stop()
  }
}
