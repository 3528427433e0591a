package graft.streaming

/** Test-only fault injector for the S3-semantics suite: delegates to the
  * fetcher named by `flaky.delegate` and throws a retryable IOException
  * for the first `flaky.failures` fetch attempts PER HEIGHT — an object
  * store's throttling storm (HTTP 503 / SlowDown) as the reader sees it.
  * Attempt counts live in a JVM-wide map so the partition readers the
  * source constructs reflectively all observe the same storm; call
  * [[FlakyBlockFetcher.reset]] between scenarios. */
final class FlakyBlockFetcher(options: java.util.Map[String, String])
    extends BlockFetcher {
  private val delegate = BlockFetcher.instantiate(
    options.get("flaky.delegate"), options)
  private val failures = options.get("flaky.failures").toInt

  override def latestHeight(): Option[Long] = delegate.latestHeight()

  override def fetch(height: Long): Option[String] = {
    val n = FlakyBlockFetcher.attempts.merge(height, java.lang.Long.valueOf(1L),
      (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))
    if (n.longValue() <= failures)
      throw new java.io.IOException(
        s"simulated throttle for height $height (attempt $n)")
    delegate.fetch(height)
  }

  override def close(): Unit = delegate.close()
}

object FlakyBlockFetcher {
  val attempts =
    new java.util.concurrent.ConcurrentHashMap[Long, java.lang.Long]()
  def reset(): Unit = attempts.clear()
}
