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
}
