package graft.evm

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import java.util
import scala.jdk.CollectionConverters._

/** `evm-logs` DataSource V2 (SURVEY.md §2.1 S1 + §2.2 P1/P2, §4):
  * the reference's chunked `eth_getLogs` scan re-expressed as a Spark
  * source. One InputPartition per block window (chunk_size, default
  * 1000 — `internal/indexer/indexer.go:23,172-189`; the worker pool C4
  * becomes Spark's task scheduler), with address/topic0 predicates
  * pushed INTO the source (the node-side filter of
  * `indexer.go:209-235`).
  *
  * Two interchangeable endpoints behind the same plan shape, pushdown
  * and partitioning: `path` replays JSON-lines log dumps, `url` issues
  * one live `eth_getLogs` RPC per block window (`RpcPartitionReader` +
  * `RpcClient`, retry per `internal/rpc/client.go`).
  *
  * Usage:
  * {{{
  * spark.read.format("graft.evm.LogSourceProvider")
  *   .option("path", dir).option("startBlock", 0)
  *   .option("endBlock", 999).option("chunkSize", 100)
  *   .load().filter($"topic0" === lit(t0))   // pushed to the source
  * }}}
  */
class LogSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new LogTable(properties.asScala.toMap)
}

/** Where a block window's logs come from: the replay dump directory or
  * a live JSON-RPC endpoint. Carried inside each `InputPartition`, so
  * the scan/pushdown/partitioning machinery is identical for both —
  * only the per-window fetch differs (S3). */
sealed trait LogEndpoint extends Serializable
case class DumpEndpoint(path: String) extends LogEndpoint
case class RpcEndpoint(cfg: RpcConfig) extends LogEndpoint

object LogSource {
  /** S2: latest-height probe — the replay equivalent of
    * `eth_blockNumber` (`internal/rpc/client.go:153-177`): max block in
    * the dump, used to bound a scan before planning it. */
  def latestBlock(spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    import org.apache.spark.sql.functions.max
    spark.read.json(path).agg(max("block_number")).head().getLong(0)
  }

  /** S2 live: `eth_blockNumber` against a real endpoint. */
  def latestBlock(cfg: RpcConfig): Long = new RpcClient(cfg).blockNumber()

  /** Option-map → endpoint. `url` selects the live RPC path (with the
    * reference's retry defaults, overridable via `rpcAttempts` /
    * `rpcDelayMs`); otherwise `path` selects dump replay. */
  def endpoint(props: Map[String, String]): LogEndpoint =
    props.get("url") match {
      case Some(u) => RpcEndpoint(RpcConfig(u,
        props.getOrElse("rpcAttempts", "3").toInt,
        props.getOrElse("rpcDelayMs", "1500").toLong))
      case None => DumpEndpoint(props.getOrElse("path",
        throw new IllegalArgumentException(
          "evm-logs: either url or path option required")))
    }

  val schema: StructType = StructType(Seq(
    StructField("block_number", LongType),
    StructField("tx_hash", StringType),
    StructField("address", StringType),
    StructField("topic0", StringType),
    StructField("topic1", StringType),
    StructField("topic2", StringType),
    StructField("topic3", StringType),
    StructField("data", StringType)))
}

class LogTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"evm_logs(${props.getOrElse("path", "?")})"
  override def schema(): StructType = LogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LogScanBuilder(props ++ options.asScala)
}

/** Pushdown contract (P1/P2): EqualTo / In on `address` and `topic0`
  * are consumed by the source (the "node" evaluates them); everything
  * else is left for Spark to evaluate after the scan. */
class LogScanBuilder(props: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  import org.apache.spark.sql.sources.{GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
  private var addressSet: Option[Set[String]] = None
  private var topic0Set: Option[Set[String]] = None
  private var blockLo: Option[Long] = None
  private var blockHi: Option[Long] = None
  private var pushed: Array[Filter] = Array.empty
  private var aggOps: Option[Seq[String]] = None

  /** Aggregate pushdown (the "latest-height probe" as a plan shape):
    * ungrouped MIN/MAX over `block_number` and COUNT(*) collapse to ONE
    * row per block-window partition at the source — the executor scans
    * its window, hands Spark 8 bytes, and the final merge is a
    * partition-count-sized aggregate instead of a row-stream one.
    * Partial pushdown only (`supportCompletePushDown` = false): Spark
    * re-aggregates the per-partition rows, which is exactly the right
    * split — the source knows its window, Spark knows the union. */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = false

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    if (agg.groupByExpressions.nonEmpty) return false
    def op(f: org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc)
        : Option[String] = f match {
      case m: Max => m.column match {
        case nr: NamedReference
          if nr.fieldNames.toSeq == Seq("block_number") => Some("max")
        case _ => None
      }
      case m: Min => m.column match {
        case nr: NamedReference
          if nr.fieldNames.toSeq == Seq("block_number") => Some("min")
        case _ => None
      }
      case _: CountStar => Some("count")
      case _ => None
    }
    val ops = agg.aggregateExpressions.toSeq.map(op)
    if (ops.isEmpty || !ops.forall(_.isDefined)) return false
    aggOps = Some(ops.flatten)
    true
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    import org.apache.spark.sql.sources.IsNotNull
    // columns whose equality/membership filters the source consumes —
    // an IsNotNull on the SAME column is implied by that filter (the
    // readers drop null-column rows when a value set is pushed), so it
    // can be consumed too; this matters because any residual filter
    // node between scan and aggregate blocks aggregate pushdown
    val eqCols = filters.collect {
      case EqualTo(a, _: String) if a == "address" || a == "topic0" => a
      case In(a, vs) if vs.forall(_.isInstanceOf[String])
        && (a == "address" || a == "topic0") => a
    }.toSet
    val (accepted, rejected) = filters.partition {
      case EqualTo(a, _: String) => a == "address" || a == "topic0"
      case In(a, vs) if vs.forall(_.isInstanceOf[String]) =>
        a == "address" || a == "topic0"
      case IsNotNull(a) => eqCols.contains(a) || a == "block_number"
      // block-range predicates prune whole chunk partitions (the
      // reference's [start_block, end_block] scan bounds)
      case GreaterThan("block_number", _: java.lang.Long) => true
      case GreaterThanOrEqual("block_number", _: java.lang.Long) => true
      case LessThan("block_number", _: java.lang.Long) => true
      case LessThanOrEqual("block_number", _: java.lang.Long) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo("address", v: String) => addressSet = Some(Set(v))
      case EqualTo("topic0", v: String) => topic0Set = Some(Set(v))
      case In("address", vs) => addressSet = Some(vs.map(_.toString).toSet)
      case In("topic0", vs) => topic0Set = Some(vs.map(_.toString).toSet)
      case GreaterThan("block_number", v: java.lang.Long) =>
        blockLo = Some(blockLo.fold(v + 1L)(math.max(_, v + 1L)))
      case GreaterThanOrEqual("block_number", v: java.lang.Long) =>
        blockLo = Some(blockLo.fold(v.toLong)(math.max(_, v.toLong)))
      case LessThan("block_number", v: java.lang.Long) =>
        blockHi = Some(blockHi.fold(v - 1L)(math.min(_, v - 1L)))
      case LessThanOrEqual("block_number", v: java.lang.Long) =>
        blockHi = Some(blockHi.fold(v.toLong)(math.min(_, v.toLong)))
      case _ =>
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new LogScan(props, addressSet, topic0Set, blockLo, blockHi, aggOps)
}

class LogScan(props: Map[String, String], addresses: Option[Set[String]],
              topics: Option[Set[String]], blockLo: Option[Long],
              blockHi: Option[Long],
              aggOps: Option[Seq[String]] = None) extends Scan with Batch {
  override def readSchema(): StructType = aggOps match {
    case Some(ops) => StructType(ops.zipWithIndex.map { case (o, i) =>
      org.apache.spark.sql.types.StructField(s"${o}_$i",
        org.apache.spark.sql.types.LongType, nullable = o != "count")
    })
    case None => LogSource.schema
  }
  override def description(): String =
    s"evm-logs addresses=${addresses.map(_.size).getOrElse(-1)} " +
      s"topics=${topics.map(_.size).getOrElse(-1)} " +
      s"blocks=[${blockLo.getOrElse("-")},${blockHi.getOrElse("-")}]" +
      aggOps.fold("")(ops => s" aggPushed=[${ops.mkString(",")}]")
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new LogMicroBatchStream(props, addresses, topics)

  /** S1: one partition per chunk_size block window, pruned by any
    * pushed block_number bounds (partition pruning at the source). In
    * RPC mode an absent `endBlock` is resolved by probing the chain
    * tip once at plan time (`eth_blockNumber`), the reference's
    * bound-then-chunk shape (`indexer.go:172-189`). */
  override def planInputPartitions(): Array[InputPartition] = {
    val ep = LogSource.endpoint(props)
    val start = math.max(props.getOrElse("startBlock", "0").toLong,
      blockLo.getOrElse(Long.MinValue))
    val declaredEnd = props.get("endBlock").map(_.toLong).getOrElse {
      ep match {
        case RpcEndpoint(cfg) => LogSource.latestBlock(cfg)
        case DumpEndpoint(_) => 0L
      }
    }
    val end = math.min(declaredEnd, blockHi.getOrElse(Long.MaxValue))
    val chunk = props.getOrElse("chunkSize", "1000").toLong
    (start to end by chunk).map { lo =>
      LogRangePartition(ep, lo, math.min(lo + chunk - 1, end))
        .asInstanceOf[InputPartition]
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new LogReaderFactory(addresses, topics, aggOps)
}

case class LogRangePartition(endpoint: LogEndpoint, fromBlock: Long,
                             toBlock: Long) extends InputPartition

/** Block-height offset for the streaming source: "everything up to and
  * including block `block` has been emitted". */
case class LogOffset(block: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"block":$block}"""
}

/** Chain-tip following (the reference's roadmap promise, README.md:202-
  * 208, never implemented there): each trigger scans the dump for the
  * latest block height — the replay stand-in for `eth_blockNumber`
  * (`internal/rpc/client.go:153-177`) — and emits the new block window
  * as chunked partitions, exactly the batch scan's shape. Offsets are
  * block heights, so restart/recovery replays from the last committed
  * block; `maxBlocksPerTrigger` rate-limits catch-up (the chunked
  * backfill the reference does with its worker pool).
  *
  * Logs arrive in block order per chain, so late data cannot occur;
  * reorgs are out of scope, as in the reference (SURVEY.md §7.4). */
class LogMicroBatchStream(props: Map[String, String],
                          addresses: Option[Set[String]],
                          topics: Option[Set[String]])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private val ep = LogSource.endpoint(props)
  private val chunk = props.getOrElse("chunkSize", "1000").toLong
  private val startBlock = props.getOrElse("startBlock", "0").toLong
  private val maxPerTrigger = props.get("maxBlocksPerTrigger").map(_.toLong)
  private val mapper = new ObjectMapper()

  /** Latest height: one `eth_blockNumber` in RPC mode, a dump scan in
    * replay mode. */
  private def tip(): Long = ep match {
    case RpcEndpoint(cfg) => LogSource.latestBlock(cfg)
    case DumpEndpoint(path) => dumpTip(path)
  }

  /** Max block over the dump via the per-file index — unchanged files
    * cost a cache hit, so the per-trigger poll only re-reads files
    * that appeared or changed since the last trigger. */
  private def dumpTip(path: String): Long = {
    val dir = new java.io.File(path)
    val fs = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".")
        && !f.getName.startsWith("_"))
    fs.flatMap(f => DumpIndex.blockRange(f).map(_._2))
      .foldLeft(startBlock - 1)(math.max)
  }

  override def initialOffset(): Offset = LogOffset(startBlock - 1)
  override def deserializeOffset(json: String): Offset =
    LogOffset(mapper.readTree(json).path("block").asLong())
  /** Rate limiting goes through SupportsAdmissionControl: the cap is
    * computed from the START offset Spark hands us, so it is stateless
    * and restart-safe (a mutable "last planned" height here desyncs
    * from the checkpoint on recovery and regresses offsets). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[LogOffset].block
    val t = tip()
    val capped = maxPerTrigger.fold(t)(m => math.min(t, from + m))
    LogOffset(math.max(capped, from))
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used via SupportsAdmissionControl")
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[LogOffset].block + 1
    val hi = end.asInstanceOf[LogOffset].block
    (lo to hi by chunk).map { l =>
      LogRangePartition(ep, l, math.min(l + chunk - 1, hi))
        .asInstanceOf[InputPartition]
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new LogReaderFactory(addresses, topics)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class LogReaderFactory(addresses: Option[Set[String]],
                       topics: Option[Set[String]],
                       aggOps: Option[Seq[String]] = None)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[LogRangePartition]
    val base = part.endpoint match {
      case DumpEndpoint(path) =>
        new LogPartitionReader(path, part, addresses, topics)
      case RpcEndpoint(cfg) =>
        new RpcPartitionReader(cfg, part, addresses, topics)
    }
    aggOps.fold(base: PartitionReader[InternalRow])(
      ops => new AggPartitionReader(base, ops))
  }
}

/** Executes a pushed ungrouped aggregate AT the source: drains the
  * window's row stream locally (pushed filters already applied) and
  * emits exactly one partial-aggregate row — `block_number` min/max
  * and the row count — for Spark's final merge. An empty window still
  * emits (count 0, null extrema), so the merge never depends on which
  * partitions happened to hold rows. */
class AggPartitionReader(base: PartitionReader[InternalRow],
                         ops: Seq[String])
    extends PartitionReader[InternalRow] {
  private var done = false
  private var row: InternalRow = _
  override def next(): Boolean = {
    if (done) return false
    var cnt = 0L
    var mx = Long.MinValue
    var mn = Long.MaxValue
    while (base.next()) {
      val b = base.get().getLong(AggPartitionReader.BlockNumberIdx)
      cnt += 1
      if (b > mx) mx = b
      if (b < mn) mn = b
    }
    row = InternalRow.fromSeq(ops.map {
      case "count" => cnt
      case "max" => if (cnt > 0) mx else null
      case "min" => if (cnt > 0) mn else null
    })
    done = true
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = base.close()
}

object AggPartitionReader {
  /** Resolved against the source schema, not a bare literal — stays
    * correct if the schema order ever changes or column pruning is
    * added (the reader consumes the FULL source schema today). */
  val BlockNumberIdx: Int = LogSource.schema.fieldIndex("block_number")
}

/** S3 live: one `eth_getLogs(fromBlock, toBlock, {address, topics})`
  * call per block-window partition — the pushed predicates travel to
  * the node inside the filter object, so the executor receives only
  * matching rows (no client-side re-filter, trusting the node exactly
  * as the reference's `FilterLogs` does, `client.go:93-118`). Retries
  * happen inside `RpcClient`; a task that exhausts them fails and is
  * re-scheduled by Spark — the layered retry the reference gets from
  * worker-level re-queueing. */
class RpcPartitionReader(cfg: RpcConfig, part: LogRangePartition,
                         addresses: Option[Set[String]],
                         topics: Option[Set[String]])
    extends PartitionReader[InternalRow] {
  // fetched on first next(): constructing the reader must stay cheap
  private var it: Iterator[RpcLog] = null
  private var current: InternalRow = _

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  override def next(): Boolean = {
    if (it == null)
      it = new RpcClient(cfg)
        .getLogs(part.fromBlock, part.toBlock, addresses, topics).iterator
    if (!it.hasNext) return false
    val l = it.next()
    current = InternalRow(l.blockNumber, utf8(l.txHash), utf8(l.address),
      utf8(l.topic0), utf8(l.topic1), utf8(l.topic2), utf8(l.topic3),
      utf8(l.data))
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Executor-side per-file block-range index for dump replay: each dump
  * file is scanned ONCE per JVM (keyed by path + mtime + size, so an
  * appended/rewritten file re-indexes) to learn its [min, max] block
  * span; partition readers then skip files that cannot intersect their
  * window. Replay cost drops from O(partitions × dump bytes) to
  * O(dump bytes + Σ intersecting reads) — the live RPC path needs none
  * of this (one ranged call per window). */
private[graft] object DumpIndex {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long),
      Option[(Long, Long)]]()
  /** Files scanned for indexing (test observability). */
  val scans = new java.util.concurrent.atomic.AtomicLong(0)

  def blockRange(f: java.io.File): Option[(Long, Long)] =
    cache.computeIfAbsent((f.getAbsolutePath, f.lastModified(), f.length()),
      _ => scan(f))

  private def scan(f: java.io.File): Option[(Long, Long)] = {
    scans.incrementAndGet()
    val mapper = new ObjectMapper()
    var lo = Long.MaxValue
    var hi = Long.MinValue
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().foreach { line =>
      if (line.nonEmpty) {
        // malformed lines don't poison the index (P7)
        val b = try {
          val n = mapper.readTree(line)
          if (n != null && n.isObject && n.has("block_number"))
            n.path("block_number").asLong(Long.MinValue)
          else Long.MinValue
        } catch {
          case _: com.fasterxml.jackson.core.JacksonException => Long.MinValue
        }
        if (b != Long.MinValue) { if (b < lo) lo = b; if (b > hi) hi = b }
      }
    } finally src.close()
    if (lo == Long.MaxValue) None else Some((lo, hi))
  }
}

/** Replays JSON-lines dumps for one block window, applying the pushed
  * address/topic0 sets — exactly what the node does for one
  * `eth_getLogs(fromBlock, toBlock, {address, topics})` call. */
class LogPartitionReader(path: String, part: LogRangePartition,
                         addresses: Option[Set[String]],
                         topics: Option[Set[String]])
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val files: Iterator[java.io.File] = {
    val dir = new java.io.File(path)
    val fs = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".")
        && !f.getName.startsWith("_"))
    fs.sortBy(_.getName).iterator
      // block-range pruning via the per-JVM file index: only files
      // whose span intersects this partition's window are opened
      .filter(f => DumpIndex.blockRange(f).exists { case (lo, hi) =>
        lo <= part.toBlock && hi >= part.fromBlock
      })
  }
  private var lines: Iterator[String] = Iterator.empty
  private var source: scala.io.Source = null
  private var current: InternalRow = _

  private def closeSource(): Unit = {
    if (source != null) { source.close(); source = null }
  }

  /** P7 at the source: a malformed dump line is dropped, the scan
    * survives — the reference logs at debug and continues
    * (`internal/indexer/indexer.go:253-259`). */
  private def parse(line: String): Option[InternalRow] = {
    if (line.isEmpty) return None
    val n = try mapper.readTree(line)
            catch { case _: com.fasterxml.jackson.core.JacksonException => return None }
    if (n == null || !n.isObject) return None
    val blk = n.path("block_number").asLong()
    if (blk < part.fromBlock || blk > part.toBlock) return None
    val addr = n.path("address").asText(null)
    if (addresses.exists(s => addr == null || !s.contains(addr))) return None
    val t0 = n.path("topic0").asText(null)
    if (topics.exists(s => t0 == null || !s.contains(t0))) return None
    def str(f: String): UTF8String = {
      val v = n.path(f)
      if (v.isMissingNode || v.isNull) null else UTF8String.fromString(v.asText())
    }
    Some(InternalRow(blk, str("tx_hash"), str("address"), str("topic0"),
      str("topic1"), str("topic2"), str("topic3"), str("data")))
  }

  override def next(): Boolean = {
    while (true) {
      while (lines.hasNext) {
        parse(lines.next()) match {
          case Some(r) => current = r; return true
          case None =>
        }
      }
      closeSource() // previous file's lines are exhausted — release the fd
      if (!files.hasNext) return false
      source = scala.io.Source.fromFile(files.next(), "UTF-8")
      lines = source.getLines()
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = closeSource()
}
