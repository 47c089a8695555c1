package graft.api

import graft.GraftSession

/** Request-file CLI — the parity transport for the reference's HTTP
  * endpoints (SURVEY §7 step 7: "a main that reads request JSON
  * suffices for parity testing").
  *
  * Usage: graft.api.Cli <run|multi> <catalogPath> <requestJsonFile>
  * Prints the response JSON on stdout. Errors map to the reference's
  * typed messages on stderr with exit 1 (HTTP 400 analog).
  */
object Cli {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: Cli <run|multi> <catalogPath> <requestFile>")
    val Array(mode, catalogPath, requestFile) = args
    val spark = GraftSession.builder("local[*]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cat = Service.Catalog(spark, catalogPath)
    val request = java.nio.file.Files.readString(java.nio.file.Paths.get(requestFile))
    try {
      val response = mode match {
        case "run" => Service.run(cat, request)
        case "multi" => Service.runMulti(cat, request)
        case other => throw new IllegalArgumentException(s"unknown mode: $other")
      }
      println(response)
    } catch {
      // reference error surface (ErrorHandler.scala:8-46), shared with
      // the HTTP transport via Service.errorMessage
      case scala.util.control.NonFatal(e) =>
        Service.errorMessage(e) match {
          case Some(msg) => System.err.println(s"Bad Request: $msg"); sys.exit(1)
          case None => throw e
        }
    } finally {
      spark.stop()
    }
  }
}
