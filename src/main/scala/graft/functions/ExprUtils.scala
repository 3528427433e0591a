package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression-level utilities. */
object ExprUtils {

  /** Evaluate `e` exactly once per row and feed the result to `f`.
    *
    * Spark evaluates non-lambda sub-expressions referenced inside a
    * higher-order-function lambda once per lambda *invocation*, and
    * CollapseProject can inline a withColumn alias back into its consumers.
    * Both silently turn O(n) pipelines into O(n²). Binding the value as the
    * argument of a single-element `transform` makes it a lambda variable —
    * guaranteed single evaluation, optimizer-proof.
    */
  def evalOnce(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)

  /** Rows-per-partition heuristic shared by the iterative operators
    * (pageRank, BPE merge loop, duplicateClusters): size a cached loop's
    * per-round map parallelism to the DATA, not the session. Each round
    * re-scans a small cached table, and scheduling a full session's worth
    * of tasks over it costs more than the per-row arithmetic; large
    * inputs keep full parallelism through `cap`, so cluster-scale plans
    * are unchanged. 20k rows/partition is the measured local-mode
    * break-even for these loops' cheap per-row work (r15: gr1 at sf0.1
    * runs 2.6 s on 8 cores vs 4.8 s on 32 — scheduling-bound); floor 2
    * keeps every loop genuinely parallel. */
  val LoopRowsPerPartition = 20000L
  def loopParallelism(rows: Long, cap: Int,
      rowsPerPartition: Long = LoopRowsPerPartition): Int =
    math.max(2, math.min(cap, (rows / rowsPerPartition).toInt))

  /** The session's shuffle parallelism as an Int, tolerating non-numeric
    * values ("auto" under some deployments): falls back to
    * `defaultParallelism`, so library use outside the harness session
    * never throws on the conf read. */
  def shufflePartitions(spark: org.apache.spark.sql.SparkSession): Int =
    scala.util.Try(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
}
