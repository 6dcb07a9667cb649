package graft.api

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** C1–C3 as a real HTTP surface over [[JobRegistry]], mirroring the
  * reference's REST layer (`internal/api/server.go:25-46`,
  * `internal/api/handlers.go:55-198`):
  *
  *   - `POST /jobs`      — validate (rpc_url present, ≥1 contract),
  *                         register, run async, `202 {"job_id": …}`
  *   - `GET /jobs/{id}`  — `{"job_id","status","error?",…}` or 404
  *   - `DELETE /jobs/{id}` — cancel (cooperative, via Spark job group),
  *                         204, or 404 for an unknown id
  *   - anything else     — 405, like the reference's method switch
  *
  * JDK `com.sun.net.httpserver` — no dependencies; Spark work stays in
  * the registry's pool threads (the handler thread only parses and
  * registers, the reference's `go s.runJob(...)` shape). The request
  * body is the reference's `JobRequest` JSON; it parses through
  * `Config.load` (the YAML mapper accepts JSON), so validation and
  * defaulting are identical between the CLI config path and this API.
  * `runJob` is injected — production passes the Indexer; tests pass a
  * probe.
  */
class JobServer(registry: JobRegistry, readAbi: String => String,
                runJob: Config.Job => Unit, port: Int = 0) {

  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  server.createContext("/jobs", (ex: HttpExchange) => {
    try route(ex)
    catch { // the reference's recovery middleware: panic → 500
      case e: Exception => plain(ex, 500, "internal server error")
    } finally ex.close()
  })
  server.start()

  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)

  private def route(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val id = path.stripPrefix("/jobs").stripPrefix("/")
    (ex.getRequestMethod, id) match {
      // "/jobs/" (trailing slash, no id) routes to the reference's
      // handleJobByID whose empty-id guard fires BEFORE the method
      // switch (handlers.go:38-41) — any method gets 400 there
      case (_, "") if path.endsWith("/") => plain(ex, 400, "job id missing")
      case ("POST", "") => createJob(ex)
      case ("GET", i) if i.nonEmpty => getJob(ex, i)
      case ("DELETE", i) if i.nonEmpty => cancelJob(ex, i)
      case _ => plain(ex, 405, "method not allowed")
    }
  }

  /** POST /jobs — handlers.go:55-95. */
  private def createJob(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    val root: JsonNode =
      try mapper.readTree(body)
      catch { case e: Exception => plain(ex, 400, e.getMessage); return }
    if (root == null || !root.isObject) { plain(ex, 400, "invalid body"); return }
    // the reference's two explicit validations, same messages
    if (root.path("rpc_url").asText("").isEmpty) {
      plain(ex, 400, "rpc_url is required"); return
    }
    if (!root.path("contracts").isArray || root.path("contracts").size() == 0) {
      plain(ex, 400, "at least one contract must be provided"); return
    }
    val job =
      try Config.load(body, readAbi) // YAML mapper parses JSON verbatim
      catch { case e: Exception => plain(ex, 400, e.getMessage); return }
    val jobId = registry.submit(s"http:${job.contracts.head.name}")(_ => runJob(job))
    val resp = mapper.createObjectNode()
    resp.put("job_id", jobId)
    json(ex, 202, mapper.writeValueAsString(resp))
  }

  /** GET /jobs/{id} — handlers.go:166-178. */
  private def getJob(ex: HttpExchange, id: String): Unit =
    registry.status(id) match {
      case None => plain(ex, 404, "job not found")
      case Some(info) =>
        val o = mapper.createObjectNode()
        o.put("job_id", info.id)
        o.put("status", info.state match {
          case registry.Queued => "queued"
          case registry.Running => "running"
          case registry.Finished => "finished"
          case registry.Cancelled => "cancelled"
          case registry.Failed(_) => "error"
        })
        info.state match {
          case registry.Failed(err) => o.put("error", err)
          case _ =>
        }
        info.startedAt.foreach(t => o.put("started_at", t))
        info.finishedAt.foreach(t => o.put("finished_at", t))
        json(ex, 200, mapper.writeValueAsString(o))
    }

  /** DELETE /jobs/{id} — handlers.go:181-198 (404 unknown, else 204;
    * cancellation is cooperative through the Spark job group). */
  private def cancelJob(ex: HttpExchange, id: String): Unit =
    registry.status(id) match {
      case None => plain(ex, 404, "job not found")
      case Some(_) =>
        registry.cancel(id)
        ex.sendResponseHeaders(204, -1)
    }

  private def plain(ex: HttpExchange, code: Int, msg: String): Unit = {
    val b = (msg + "\n").getBytes(UTF_8)
    ex.getResponseHeaders.add("Content-Type", "text/plain; charset=utf-8")
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
  }

  private def json(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
  }
}
