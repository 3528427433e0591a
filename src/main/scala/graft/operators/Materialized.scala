package graft.operators

import org.apache.spark.sql.DataFrame

/** A result frame plus the persisted intermediates it depends on — the
  * managed form of the "returned frame stays persisted" contract the
  * iterative operators (PageRank, k-core, connected components) need.
  *
  * Those operators persist their final state deliberately: the iteration
  * chain behind the result has been unpersisted round by round, so the
  * returned frame MUST stay cached or its first use re-runs the whole
  * loop. Before this handle existed the caller had to know to call
  * `spark.catalog.clearCache()` (fine for the bench harness that defined
  * the contract, a footgun for any other consumer — composing two graph
  * calls doubled resident caches). Now the operator returns the handle
  * and the caller releases exactly the blocks that operator owns:
  *
  * {{{
  *   val pr = GraphFunctions.pageRank(nodes, edges, iters = 5)
  *   val top = pr.df.orderBy(desc("rank")).limit(100).collect()
  *   pr.release() // the operator's caches, nothing else's
  * }}}
  *
  * `release()` is idempotent and releases ONLY the caches this operator
  * created — never the session-wide cache. Releasing before the frame is
  * consumed is safe (lineage is intact, so the frame recomputes) but
  * defeats the point; release after the result is consumed or copied.
  *
  * `info` carries small operator-run facts (e.g. k-core's
  * `rounds_run` / `converged`) that callers would otherwise have to
  * re-derive with extra actions.
  */
final class Materialized(
    val df: DataFrame,
    cached: Seq[DataFrame],
    val info: Map[String, Long] = Map.empty) {

  private val released = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Unpersist every intermediate this operator cached. Idempotent. */
  def release(): Unit =
    if (released.compareAndSet(false, true)) cached.foreach(_.unpersist())
}

object Materialized {
  def apply(df: DataFrame, cached: Seq[DataFrame],
      info: Map[String, Long] = Map.empty): Materialized =
    new Materialized(df, cached, info)
}
