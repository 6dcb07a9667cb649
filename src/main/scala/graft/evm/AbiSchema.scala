package graft.evm

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** ABI JSON → event schema compiler. Replaces the reference's first-row
  * header inference (`internal/sink/csv.go:84-99`, a schema-drift
  * hazard) with a principled ABI-derived StructType per event, the
  * plan-time topic0 set (`internal/indexer/indexer.go:54-88`), and the
  * fixed metadata columns every decoded row carries
  * (`internal/parser/parser.go:45-52`).
  */
object AbiSchema {

  case class Param(name: String, abiType: String, indexed: Boolean)

  case class Event(name: String, params: Seq[Param]) {
    /** Canonical signature, e.g. "Transfer(address,address,uint256)". */
    def signature: String = s"$name(${params.map(_.abiType).mkString(",")})"
    /** Plan-time topic hash (the indexer's event-ID filter set). */
    def topic0: String = Keccak.eventTopic0(signature)
    def indexedParams: Seq[Param] = params.filter(_.indexed)
    def dataParams: Seq[Param] = params.filterNot(_.indexed)

    private def sparkType(t: String): DataType = AbiCodec.arrayOf(t) match {
      case Some((elem, _)) => ArrayType(sparkType(elem))
      case None => AbiCodec.tupleOf(t) match {
        case Some(cs) => StructType(cs.zipWithIndex.map { case (c, i) =>
          StructField(s"f$i", sparkType(c)) // canonical strings drop names
        })
        case None => t match {
          case x if x.startsWith("uint") || x.startsWith("int") =>
            DecimalType(38, 0)
          case "bool" => BooleanType
          case _ => StringType // address, bytesN, string, bytes → hex/utf8
        }
      }
    }

    /** Decoded-row schema: fixed metadata columns + typed params. An
      * INDEXED reference-type param (array/tuple/string/bytes) is its
      * keccak hash word in the topic → StringType, not the value's
      * shape. */
    def structType: StructType = StructType(
      Seq(
        StructField("tx_hash", StringType),
        StructField("block_number", LongType),
        StructField("contract", StringType),
        StructField("contract_name", StringType),
        StructField("event_name", StringType),
        StructField("chain_id", StringType)) ++
      params.map { p =>
        val hashed = p.indexed &&
          (AbiCodec.arrayOf(p.abiType).isDefined ||
            AbiCodec.tupleOf(p.abiType).isDefined ||
            !AbiCodec.isStatic(p.abiType))
        StructField(p.name, if (hashed) StringType else sparkType(p.abiType))
      })
  }

  private val mapper = new ObjectMapper()

  /** The ABI JSON spells tuples as `"type":"tuple…"` plus a
    * `components` array; the canonical signature (and our codec) wants
    * `(T1,T2,…)…` — recurse through components, keeping any `[k]`/`[]`
    * suffix. */
  private def canonicalType(p: com.fasterxml.jackson.databind.JsonNode): String = {
    val t = p.path("type").asText()
    if (!t.startsWith("tuple")) t
    else {
      val inner = p.path("components").elements().asScala
        .map(canonicalType).mkString(",")
      "(" + inner + ")" + t.substring("tuple".length)
    }
  }

  /** Parse an ABI JSON document (the standard solc output array),
    * keeping the event definitions. */
  def parse(json: String): Seq[Event] = {
    val root = mapper.readTree(json)
    root.elements().asScala
      .filter(n => n.path("type").asText() == "event")
      .map { n =>
        Event(
          n.path("name").asText(),
          n.path("inputs").elements().asScala.map { p =>
            Param(p.path("name").asText(), canonicalType(p),
              p.path("indexed").asBoolean(false))
          }.toSeq)
      }.toSeq
  }

  /** topic0 → event lookup across many ABIs (the indexer's dispatch map,
    * `internal/parser/parser.go:64-69`). */
  def topicIndex(events: Seq[Event]): Map[String, Event] =
    events.map(e => e.topic0 -> e).toMap
}
