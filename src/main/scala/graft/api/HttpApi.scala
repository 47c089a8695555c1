package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.GraftSession

/** The reference's HTTP transport, on the JDK's built-in server (zero
  * extra dependencies): `GET /ping` → `"pong"`, `POST /run`,
  * `POST /multi` — same JSON contracts as [[Service.run]]/
  * [[Service.runMulti]], same error surface as the reference
  * (ErrorHandler.scala:8-46): typed errors → 400 with the reference's
  * message, anything else → 500.
  *
  * A user of the reference can point their client at this port and run
  * every request they run today (`WebServer.scala:64-101` routes).
  */
object HttpApi {

  /** Reference request-duration ceiling: 120 s
    * (application.conf:12-15 `idle-timeout`/`request-timeout`;
    * CHANGELOG.md:35-38 — raised precisely so hi-res LinesJoin jobs
    * finish while runaway requests still die). On expiry the Spark
    * job group backing the request is CANCELLED (not just abandoned —
    * the cluster stops burning executors on it) and the client gets a
    * typed 503.
    */
  private[api] val RequestTimeoutMillis: Long = 120 * 1000L

  /** Start serving `catalogPath` on `port` (0 = ephemeral; the chosen
    * port is in the returned server's address). Non-blocking.
    * `timeoutMillis` bounds every /run and /multi request end-to-end.
    */
  def start(cat: Service.Catalog, port: Int,
            timeoutMillis: Long = RequestTimeoutMillis): HttpServer = {
    val srv = HttpServer.create(new InetSocketAddress(port), 0)
    // JDK contexts are longest-PREFIX matched: each handler checks the
    // exact path so /pingfoo or /run/extra 404 like a route table would
    srv.createContext("/ping", exact("/ping") { ex =>
      respond(ex, 200, "\"pong\"")
    })
    srv.createContext("/run",
      exact("/run")(timedHandler(cat.spark, timeoutMillis)(ex => Service.run(cat, body(ex)))))
    srv.createContext("/multi",
      exact("/multi")(timedHandler(cat.spark, timeoutMillis)(ex => Service.runMulti(cat, body(ex)))))
    // the default single-thread dispatcher would serialize every
    // request behind a long Spark job (a health-check /ping must not
    // wait on a 30 s /run); the reference serves concurrently too
    srv.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    srv.start()
    srv
  }

  private def exact(path: String)(f: HttpExchange => Unit)(ex: HttpExchange): Unit =
    if (ex.getRequestURI.getPath == path) f(ex)
    else respond(ex, 404, err(s"No route: ${ex.getRequestURI.getPath}"))

  /** Reference payload ceiling: 50 MB, sized for HUC-8 multipolygon
    * GeoJSON (application.conf:16-18, CHANGELOG.md:5-8). A declared
    * Content-Length above the limit gets 413 before any body read;
    * chunked/undeclared bodies are read up to limit+1 and rejected on
    * overflow — like the reference (Akka buffers up to its limit too),
    * so worst-case transient heap per request is the limit itself.
    * Int by construction: the value is also the bounded-read length.
    */
  private[api] val MaxRequestBytes: Int = 50 * 1024 * 1024

  private final class PayloadTooLargeException extends RuntimeException

  private def body(ex: HttpExchange): String = {
    val declared = Option(ex.getRequestHeaders.getFirst("Content-Length"))
      .flatMap(v => scala.util.Try(v.toLong).toOption)
    if (declared.exists(_ > MaxRequestBytes)) throw new PayloadTooLargeException
    val bytes = ex.getRequestBody.readNBytes(MaxRequestBytes + 1)
    if (bytes.length > MaxRequestBytes) throw new PayloadTooLargeException
    new String(bytes, UTF_8)
  }

  private def respond(ex: HttpExchange, status: Int, payload: String): Unit = {
    val bytes = payload.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private final class RequestTimeoutException extends RuntimeException

  /** One worker pool for request bodies: the dispatch thread only
    * waits (bounded) on the future, so a hung Spark job can never pin
    * the HTTP dispatcher itself.
    */
  private val workers = java.util.concurrent.Executors.newCachedThreadPool()

  /** Reference error mapping (ErrorHandler.scala:8-46; same messages
    * as [[Cli]]'s stderr surface): typed → 400, unknown → 500 — plus
    * the duration ceiling: the request body runs inside a per-request
    * Spark job group on a worker thread; if it exceeds `timeoutMs` the
    * job group is cancelled (`interruptOnCancel = true`, so even a
    * task stuck in a blocking call dies) and the client gets 503 with
    * a typed message — the Akka-HTTP request-timeout analog.
    */
  private[api] def timedHandler(spark: org.apache.spark.sql.SparkSession,
      timeoutMs: Long)(f: HttpExchange => String)(ex: HttpExchange): Unit =
    try {
      if (ex.getRequestMethod != "POST") respond(ex, 405, "\"POST only\"")
      else {
        val group = "graft-http-" + java.util.UUID.randomUUID()
        // latch = "the worker has left f": jobs are only submitted
        // inside f, so once this fires no new job can carry the group
        val done = new java.util.concurrent.CountDownLatch(1)
        val fut = workers.submit(new java.util.concurrent.Callable[String] {
          def call(): String = {
            // job-group tagging is thread-local: every Spark job this
            // request launches becomes cancellable as one unit
            spark.sparkContext.setJobGroup(group, "graft http request",
              interruptOnCancel = true)
            try f(ex) finally {
              spark.sparkContext.clearJobGroup(); done.countDown()
            }
          }
        })
        val out =
          try fut.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
          catch {
            case _: java.util.concurrent.TimeoutException =>
              // cancel the group FIRST (kills jobs already running),
              // then interrupt the worker so it unblocks between
              // actions. A job submitted in the window between this
              // cancel and the worker's exit would escape it —
              // cancelJobGroup only hits jobs that exist at call time —
              // so re-issue the cancel once the worker has observably
              // left the body (bounded, off the dispatch thread).
              spark.sparkContext.cancelJobGroup(group)
              fut.cancel(true)
              workers.submit(new Runnable {
                def run(): Unit = {
                  done.await(30, java.util.concurrent.TimeUnit.SECONDS)
                  spark.sparkContext.cancelJobGroup(group)
                }
              })
              throw new RequestTimeoutException
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
        respond(ex, 200, out)
      }
    } catch {
      case _: RequestTimeoutException =>
        respond(ex, 503,
          err(s"Request timed out after ${timeoutMs} ms"))
      case _: PayloadTooLargeException =>
        respond(ex, 413,
          err(s"Request entity too large: limit $MaxRequestBytes bytes"))
      case e: Throwable =>
        Service.errorMessage(e) match {
          case Some(msg) => respond(ex, 400, err(msg))
          case None => respond(ex, 500, err(s"Internal error: ${e.getClass.getSimpleName}"))
        }
    }

  private def err(msg: String): String =
    org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(
      org.json4s.JObject("error" -> org.json4s.JString(msg))))

  /** Standalone server main:
    * {{{ sbt "runMain graft.api.HttpApi <catalogPath> [port]" }}}
    */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: HttpApi <catalogPath> [port]")
    val port = if (args.length > 1) args(1).toInt else 8090
    val spark = GraftSession.builder("local[*]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srv = start(Service.Catalog(spark, args(0)), port)
    println(s"graft serving ${args(0)} on port ${srv.getAddress.getPort} (/ping /run /multi)")
    Thread.currentThread().join()
  }
}
