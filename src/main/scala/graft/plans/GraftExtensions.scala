package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the native expressions, two ways:
  *
  *  - config-time: `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (the standard extension-jar deployment path);
  *  - runtime: `expressionsRegistry.registerAll(spark)` on a live session.
  *
  * After registration the kernels are callable from SQL strings:
  * `SELECT graft_cosine_similarity(a, b)`, `graft_minhash_signature(sh, 16)`,
  * `graft_simhash64(words)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import expressionsRegistry._

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object expressionsRegistry {
  import expressions._

  type Builder = Seq[Expression] => Expression

  val functions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_cosine_similarity",
      new ExpressionInfo(classOf[ArrayCosineSimilarity].getName, "graft_cosine_similarity"),
      (es: Seq[Expression]) => ArrayCosineSimilarity(es(0), es(1))),
    ("graft_minhash_signature",
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash_signature"),
      (es: Seq[Expression]) => MinHashSignature(es(0),
        es(1).eval().asInstanceOf[Number].intValue())),
    ("graft_simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (es: Seq[Expression]) => SimHash64(es(0))))

  /** Register on a live session (tests, notebooks). */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
