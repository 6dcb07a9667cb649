package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.api.{Config, JobRegistry, JobServer}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.CountDownLatch

/** C1–C3 over real HTTP: POST/GET/DELETE /jobs against the reference's
  * `internal/api/handlers.go:55-198` semantics (202 + job_id, status
  * JSON, 400 validations with the same messages, 404 unknown id, 204
  * cancel, 405 method switch). */
class JobServerSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newHttpClient()

  private val tokenAbi =
    """[{"type":"event","name":"Transfer","inputs":[
        {"indexed":true,"name":"from","type":"address"},
        {"indexed":true,"name":"to","type":"address"},
        {"indexed":false,"name":"value","type":"uint256"}]}]"""

  private def jobJson(rpcUrl: String = "http://node", contracts: String =
      """[{"name":"TokenA","address":"0xAA","abi":"token.json","events":["Transfer"]}]""") =
    s"""{"rpc_url":"$rpcUrl","start_block":0,"chunk_size":100,
        "contracts":$contracts,
        "storage":{"type":"csv","csv":{"output_dir":"/tmp/unused"}}}"""

  private def send(req: HttpRequest): HttpResponse[String] =
    http.send(req, HttpResponse.BodyHandlers.ofString())
  private def post(url: String, body: String) = send(
    HttpRequest.newBuilder(URI.create(s"$url/jobs"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build())
  private def get(url: String, id: String) = send(
    HttpRequest.newBuilder(URI.create(s"$url/jobs/$id")).GET.build())
  private def delete(url: String, id: String) = send(
    HttpRequest.newBuilder(URI.create(s"$url/jobs/$id")).DELETE().build())

  private def withServer[T](run: Config.Job => Unit)(f: JobServer => T): T = {
    val reg = new JobRegistry(spark)
    val srv = new JobServer(reg, _ => tokenAbi, run)
    try f(srv) finally { srv.stop(); reg.shutdown() }
  }

  private def awaitStatus(srv: JobServer, id: String, want: String): String = {
    val deadline = System.currentTimeMillis() + 30000
    var s = ""
    while (s != want && System.currentTimeMillis() < deadline) {
      s = mapper.readTree(get(srv.url, id).body()).path("status").asText()
      if (s != want) Thread.sleep(50)
    }
    s
  }

  test("POST /jobs: 202 + job_id, job runs and finishes (C1/C2)") {
    val ran = new CountDownLatch(1)
    withServer(job => {
      assert(job.rpcUrl == "http://node" && job.contracts.head.name == "TokenA")
      assert(job.contracts.head.parsedAbi.head.name == "Transfer")
      ran.countDown()
    }) { srv =>
      val resp = post(srv.url, jobJson())
      assert(resp.statusCode() == 202)
      assert(resp.headers().firstValue("Content-Type").orElse("").contains("json"))
      val id = mapper.readTree(resp.body()).path("job_id").asText()
      assert(id.nonEmpty)
      assert(awaitStatus(srv, id, "finished") == "finished")
      assert(ran.getCount == 0)
      val st = mapper.readTree(get(srv.url, id).body())
      assert(st.path("job_id").asText() == id && st.has("finished_at"))
    }
  }

  test("POST validation: missing rpc_url / empty contracts → 400 (reference messages)") {
    withServer(_ => ()) { srv =>
      val noRpc = post(srv.url, jobJson(rpcUrl = ""))
      assert(noRpc.statusCode() == 400 && noRpc.body().contains("rpc_url is required"))
      val noContracts = post(srv.url, jobJson(contracts = "[]"))
      assert(noContracts.statusCode() == 400 &&
        noContracts.body().contains("at least one contract must be provided"))
      val badJson = post(srv.url, "{not json")
      assert(badJson.statusCode() == 400)
    }
  }

  test("GET/DELETE unknown id → 404; bare-collection verbs → 405") {
    withServer(_ => ()) { srv =>
      assert(get(srv.url, "nope").statusCode() == 404)
      assert(get(srv.url, "nope").body().contains("job not found"))
      assert(delete(srv.url, "nope").statusCode() == 404)
      val put = send(HttpRequest.newBuilder(URI.create(s"${srv.url}/jobs"))
        .PUT(HttpRequest.BodyPublishers.ofString("{}")).build())
      assert(put.statusCode() == 405)
      val getBare = send(HttpRequest.newBuilder(
        URI.create(s"${srv.url}/jobs")).GET.build())
      assert(getBare.statusCode() == 405)
      // trailing slash, empty id: the reference's handleJobByID guard
      // fires before its method switch → 400 "job id missing"
      val slashEmpty = send(HttpRequest.newBuilder(
        URI.create(s"${srv.url}/jobs/")).GET.build())
      assert(slashEmpty.statusCode() == 400)
      assert(slashEmpty.body().contains("job id missing"))
    }
  }

  test("DELETE /jobs/{id}: 204, job ends cancelled (C3)") {
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    withServer(_ => {
      entered.countDown()
      // park until cancel lands (registry marks cancelled on completion)
      release.await()
    }) { srv =>
      val id = mapper.readTree(post(srv.url, jobJson()).body())
        .path("job_id").asText()
      entered.await()
      val resp = delete(srv.url, id)
      assert(resp.statusCode() == 204)
      release.countDown()
      assert(awaitStatus(srv, id, "cancelled") == "cancelled")
    }
  }
}
