package graft.streaming

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 micro-batch source over a NEAR-Lake-style block store —
  * the REAL adapter shape for the reference's streamer loop
  * (indexer_app/tasks.py:28-111), with the store access behind the
  * [[BlockFetcher]] seam. [[LakeFsBlockFetcher]] speaks the real lake
  * key layout through the Hadoop FileSystem API (file:// in tests,
  * s3a:// in production — pure configuration); [[DirBlockFetcher]] is
  * the flat single-object fixture layout.
  *
  * Offsets ARE block heights: the stored offset replaces the reference's
  * Postgres BlockHeight cursor one-for-one, so a restart resumes exactly
  * after the last committed block. Unlike the reference's strictly
  * sequential asyncio loop, a micro-batch plans its height range across
  * `fetchPartitions` input partitions — block fetch+parse parallelizes
  * over executors, and ordering is recovered downstream by the
  * ingest-seq LWW merge (SURVEY §2.9), not by serial execution.
  *
  * Admission control: `maxBlocksPerTrigger` bounds a batch (the
  * backfill-vs-latency knob); Trigger.AvailableNow pins the target
  * height at start and drains to exactly there.
  *
  * Options: `fetcher.class` (default [[DirBlockFetcher]]; set to
  * [[LakeFsBlockFetcher]] with `fetcher.url` + optional
  * `fetcher.hadoop.*` for a real lake store),
  * `fetcher.dir`, `startHeight` (first block to read, default 0),
  * `maxBlocksPerTrigger` (default 1000), `fetchPartitions` (default 4),
  * `fetchRetries` (default 3), `fetchBackoffMs` (default 100).
  */
object LakeSource {
  val schema: StructType = StructType(Seq(
    StructField("block_height", LongType, nullable = false),
    StructField("value", StringType))) // raw block-message JSON

  private[streaming] def fetcherClass(opts: JMap[String, String]): String =
    Option(opts.get("fetcher.class")).getOrElse(classOf[DirBlockFetcher].getName)
  private[streaming] def longOpt(opts: JMap[String, String], key: String,
      default: Long): Long =
    Option(opts.get(key)).map(_.toLong).getOrElse(default)
}

class LakeSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LakeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new LakeTable(properties)
}

class LakeTable(properties: JMap[String, String]) extends Table with SupportsRead {
  override def name(): String = "near_lake"
  override def schema(): StructType = LakeSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // table properties + read options, reads taking precedence
    val merged = new java.util.HashMap[String, String](properties)
    merged.putAll(options)
    () => new LakeScan(merged)
  }
}

class LakeScan(options: JMap[String, String]) extends Scan {
  override def readSchema(): StructType = LakeSource.schema
  override def description(): String = "near_lake block stream"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new LakeMicroBatchStream(options)
}

/** Offset = last block height INCLUDED in the stream so far. */
case class LakeOffset(height: Long) extends Offset {
  override def json(): String = height.toString
}

class LakeMicroBatchStream(options: JMap[String, String])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val fetcherClassName = LakeSource.fetcherClass(options)
  private val startHeight = LakeSource.longOpt(options, "startHeight", 0L)
  private val maxPerTrigger = LakeSource.longOpt(options, "maxBlocksPerTrigger", 1000L)
  private val fetchPartitions =
    LakeSource.longOpt(options, "fetchPartitions", 4L).toInt
  private val retries = LakeSource.longOpt(options, "fetchRetries", 3L).toInt
  private val backoffMs = LakeSource.longOpt(options, "fetchBackoffMs", 100L)

  // Driver-side fetcher for offset probing; partition readers build their
  // own from the serializable (class name, options) spec.
  private lazy val driverFetcher = BlockFetcher.instantiate(fetcherClassName, options)
  // AvailableNow contract: pin the drain target when the query starts so
  // the run ends at a fixed height even while the lake keeps growing.
  @volatile private var availableNowTarget: Option[Long] = None

  override def initialOffset(): Offset = LakeOffset(startHeight - 1)
  override def deserializeOffset(json: String): Offset = LakeOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxPerTrigger)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = driverFetcher.latestHeight()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val base = start.asInstanceOf[LakeOffset].height
    val avail = availableNowTarget.orElse(driverFetcher.latestHeight()).getOrElse(base)
    val capped = limit match {
      case r: ReadMaxRows => math.min(avail, base + r.maxRows())
      case _ => avail
    }
    LakeOffset(math.max(base, capped))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) drives this source (admission control)")

  override def reportLatestOffset(): Offset =
    driverFetcher.latestHeight().map(LakeOffset).orNull

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[LakeOffset].height + 1
    val hi = end.asInstanceOf[LakeOffset].height
    if (hi < lo) return Array.empty
    val n = hi - lo + 1
    val slices = math.min(fetchPartitions.toLong, n)
    // contiguous height ranges, sizes differing by at most one
    (0L until slices).map { s =>
      val from = lo + s * n / slices
      val until = lo + (s + 1) * n / slices // exclusive
      LakeInputPartition(from, until - 1): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val opts = new java.util.HashMap[String, String](options)
    LakeReaderFactory(fetcherClassName, opts, retries, backoffMs)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = driverFetcher.close()
}

/** Inclusive height range fetched by one task. */
case class LakeInputPartition(lo: Long, hi: Long) extends InputPartition

case class LakeReaderFactory(fetcherClassName: String,
    options: java.util.HashMap[String, String], retries: Int, backoffMs: Long)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LakeInputPartition]
    new LakePartitionReader(fetcherClassName, options, p.lo, p.hi, retries, backoffMs)
  }
}

/** Walks its height range in order: chain gaps (fetch → None) are
  * skipped; transient fetch failures retry with linear backoff and the
  * last failure fails the TASK (Spark re-runs it) — a silently skipped
  * block would be data loss. */
class LakePartitionReader(fetcherClassName: String,
    options: java.util.HashMap[String, String],
    lo: Long, hi: Long, retries: Int, backoffMs: Long)
    extends PartitionReader[InternalRow] {

  private val fetcher = BlockFetcher.instantiate(fetcherClassName, options)
  private var height = lo - 1
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (height < hi) {
      height += 1
      BlockFetcher.fetchWithRetry(fetcher, height, retries, backoffMs) match {
        case Some(json) =>
          current = new GenericInternalRow(
            Array[Any](height, UTF8String.fromString(json)))
          return true
        case None => // skipped height — normal chain gap
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = fetcher.close()
}
