package graft.api

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.geom.GeoJson

/** Wire-schema parity against the reference's OWN shipped request
  * corpus (`/root/reference/examples`, `scripts/benchmarking_input_data`):
  * every request the reference service accepts must deserialize into
  * our request model, and every embedded GeoJSON string must parse
  * into non-degenerate geometry. (The S3 raster catalogs behind them
  * aren't available, so execution is out of scope here — the contract
  * under test is the schema.)
  */
class ReferenceSchemaSpec extends AnyFunSuite {

  private implicit val fmts: Formats = DefaultFormats
  private val examples = new java.io.File("/root/reference/examples")

  private def readJson(f: java.io.File): JValue =
    JsonMethods.parse(java.nio.file.Files.readString(f.toPath))

  test("every /run example request deserializes into PostRequest") {
    assume(examples.isDirectory)
    val runRequests = examples.listFiles()
      .filter(f => f.getName.endsWith(".json"))
      .filter(f => f.getName.startsWith("MapshedJob") ||
        f.getName.startsWith("TR55") || f.getName == "EmptyTileRequest.json")
    assert(runRequests.nonEmpty)
    runRequests.foreach { f =>
      val req = readJson(f).extract[Service.PostRequest]
      assert(req.input.operationType.nonEmpty, f.getName)
      // polygons embedded as GeoJSON strings parse to polygonal geometry
      req.input.polygon.getOrElse(Nil).foreach { gj =>
        assert(!GeoJson.parseMultiPolygon(gj).isEmpty, s"${f.getName}: empty AOI")
      }
      // vectors (LinesJoin requests) parse to line geometry
      req.input.vector.getOrElse(Nil).foreach { gj =>
        assert(!GeoJson.parseMultiLineString(gj).isEmpty, s"${f.getName}: empty vector")
      }
    }
  }

  test("every /multi example request deserializes into MultiInput") {
    assume(examples.isDirectory)
    val multiRequests = examples.listFiles()
      .filter(_.getName.startsWith("MultiOperationRequest"))
    assert(multiRequests.nonEmpty)
    multiRequests.foreach { f =>
      val req = readJson(f).extract[Service.MultiInput]
      assert(req.shapes.nonEmpty && req.operations.nonEmpty, f.getName)
      assert(req.crs.isEmpty, s"${f.getName}: reference requests carry no crs field")
      req.shapes.foreach(s =>
        assert(!GeoJson.parseMultiPolygon(s.shape).isEmpty, s"${f.getName}: ${s.id}"))
      req.streamLines.foreach(sl =>
        assert(!GeoJson.parseMultiLineString(sl).isEmpty, f.getName))
      // every operation name is one the batch planner dispatches
      val known = Set("RasterGroupedCount", "RasterGroupedAverage", "RasterLinesJoin")
      req.operations.foreach(op => assert(known(op.name), s"${f.getName}: ${op.name}"))
    }
  }

  test("benchmark input corpus deserializes too") {
    val dir = new java.io.File("/root/reference/scripts/benchmarking_input_data")
    assume(dir.isDirectory)
    // the corpus symlinks into examples/; one target is absent in the
    // reference checkout — skip dangling links
    val files = dir.listFiles().filter(f => f.getName.endsWith(".json") && f.exists())
    assert(files.nonEmpty)
    files.foreach { f =>
      val j = readJson(f)
      (j \ "input") match {
        case JNothing =>
          if ((j \ "shapes") != JNothing) {
            val req = j.extract[Service.MultiInput]
            assert(req.shapes.nonEmpty, f.getName)
          } // else: bare geojson fixtures — not request files
        case _ =>
          val req = j.extract[Service.PostRequest]
          assert(req.input.operationType.nonEmpty, f.getName)
      }
    }
  }
}
