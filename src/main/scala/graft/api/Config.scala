package graft.api

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import graft.evm.AbiSchema
import scala.jdk.CollectionConverters._

/** YAML-compatible job configuration, mirroring the reference's
  * `config.yaml` shape and validation/defaulting behavior
  * (`internal/config/config.go:54-156`): contracts (name / address /
  * abi path / event filter) with ABIs parsed eagerly, storage selector,
  * retry (default 3 × 1500 ms), chunk_size (default 1000), workers
  * (default = available processors). Unlike the reference, `mysql` is a
  * working JDBC path here (Sinks.jdbcWriter), not a stub.
  */
object Config {

  case class Retry(attempts: Int = 3, delayMs: Long = 1500L)
  case class Contract(name: String, address: String, abiPath: String,
                      events: Seq[String],
                      parsedAbi: Seq[AbiSchema.Event]) {
    /** Plan-time topic0 set for the configured event filter; unknown
      * event names are skipped with the indexer's warn semantics
      * (`indexer.go:70-77`). */
    def topic0s: Seq[String] = {
      val byName = parsedAbi.map(e => e.name -> e).toMap
      events.flatMap(byName.get).map(_.topic0)
    }
  }
  case class Job(rpcUrl: String, startBlock: Long, chunkSize: Long,
                 workers: Int, contracts: Seq[Contract],
                 storageType: String, csvOutputDir: Option[String],
                 mysqlDsn: Option[String], retry: Retry)

  private val mapper = new ObjectMapper(new YAMLFactory())

  def load(yamlText: String, readAbi: String => String): Job = {
    val root = mapper.readTree(yamlText)
    def req(field: String): String = {
      val n = root.path(field)
      if (n.isMissingNode || n.asText().isEmpty)
        throw new IllegalArgumentException(s"config: missing $field")
      n.asText()
    }
    val contracts = root.path("contracts").elements().asScala.map { c =>
      val abiPath = c.path("abi").asText()
      Contract(
        c.path("name").asText(),
        c.path("address").asText().toLowerCase,
        abiPath,
        c.path("events").elements().asScala.map(_.asText()).toSeq,
        AbiSchema.parse(readAbi(abiPath)))
    }.toSeq
    if (contracts.isEmpty)
      throw new IllegalArgumentException("config: no contracts")
    val storage = root.path("storage")
    val retryN = root.path("retry")
    Job(
      rpcUrl = req("rpc_url"),
      startBlock = root.path("start_block").asLong(0L),
      chunkSize = math.max(1L, root.path("chunk_size").asLong(1000L)),
      workers = {
        val w = root.path("workers").asInt(0)
        if (w > 0) w else Runtime.getRuntime.availableProcessors()
      },
      contracts = contracts,
      storageType = storage.path("type").asText("csv"),
      csvOutputDir = Option(storage.path("csv").path("output_dir").asText(null)),
      mysqlDsn = Option(storage.path("mysql").path("dsn").asText(null)),
      retry = Retry(
        math.max(1, retryN.path("attempts").asInt(3)),
        math.max(0L, retryN.path("delay_ms").asLong(1500L))))
  }
}
