package graft.streaming

/** The lake-adapter seam of [[LakeSource]]: everything the streaming
  * source needs from a NEAR-Lake-style block store, reduced to two
  * operations (reference indexer_app/tasks.py:28-93 — the streamer's
  * S3 list + fetch loop).
  *
  * Implementations are constructed REFLECTIVELY from the source options
  * (`fetcher.class` + the full option map), because a DataSource V2
  * source can only carry strings across the driver/executor boundary —
  * each partition reader instantiates its own fetcher from the spec.
  * [[LakeFsBlockFetcher]] implements the real lake key layout
  * (`{height:012d}/block.json` + shard objects) over the Hadoop
  * `FileSystem` API — `file://` in tests, `s3a://` in production as
  * pure configuration; [[DirBlockFetcher]] serves a flattened
  * single-object layout for fixtures and backfill drops.
  */
trait BlockFetcher extends AutoCloseable {
  /** Highest block height currently available, if any block exists. */
  def latestHeight(): Option[Long]

  /** The block-message JSON for `height`; None = the chain SKIPPED this
    * height (gaps are normal on NEAR — the reference tolerates missing
    * heights, tasks.py:60-66). Transient infrastructure failures must
    * THROW instead — the reader retries throws, never Nones. */
  def fetch(height: Long): Option[String]

  override def close(): Unit = ()
}

object BlockFetcher {
  /** Instantiate a fetcher from its class name and the source options
    * (the constructor contract: one `java.util.Map[String, String]`). */
  def instantiate(className: String,
      options: java.util.Map[String, String]): BlockFetcher =
    Class.forName(className)
      .getDeclaredConstructor(classOf[java.util.Map[String, String]])
      .newInstance(options)
      .asInstanceOf[BlockFetcher]

  /** Bounded-retry wrapper for `fetch`: a transient throw is retried
    * with linear backoff; `None` (a genuine chain gap) is returned
    * as-is. The LAST failure propagates — a lake outage must fail the
    * micro-batch (Spark retries the task), never silently skip blocks:
    * a skipped block is data loss, a failed batch is a retry. */
  def fetchWithRetry(f: BlockFetcher, height: Long,
      attempts: Int, backoffMs: Long): Option[String] = {
    var attempt = 1
    while (true) {
      try return f.fetch(height)
      catch {
        case e: Throwable if attempt < attempts =>
          Thread.sleep(backoffMs * attempt)
          attempt += 1
      }
    }
    None // unreachable
  }
}

/** Filesystem lake landing zone: one `%012d.json` object per block
  * height (the reference's S3 key layout, flattened). Doubles as the
  * test/backfill fetcher and as the contract template for an S3
  * implementation. */
final class DirBlockFetcher(options: java.util.Map[String, String])
    extends BlockFetcher {
  private val dir = {
    val d = options.get("fetcher.dir")
    require(d != null && d.nonEmpty, "DirBlockFetcher needs fetcher.dir")
    java.nio.file.Paths.get(d)
  }

  override def latestHeight(): Option[Long] = {
    val s = java.nio.file.Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      val hs = s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".json"))
        .flatMap(n => n.stripSuffix(".json").toLongOption)
        .toSeq
      if (hs.isEmpty) None else Some(hs.max)
    } finally s.close()
  }

  override def fetch(height: Long): Option[String] = {
    val p = dir.resolve(f"$height%012d.json")
    if (java.nio.file.Files.exists(p))
      Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    else None
  }
}
