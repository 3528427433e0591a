package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the harness tables (TESTDATA.md). One parquet file per
  * table; schemas are fixed by the driver's generator, so we read the
  * parquet footer schema as-is (no inference beyond the footer).
  *
  * At 100 TB these would be partitioned directories (e.g. donations
  * partitioned by date) — the loaders keep a single entry point so the
  * query layer never hard-codes paths.
  */
final class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")

  /** `events.ts` is nanosecond-precision parquet, which Spark 4 refuses as
    * TimestampType. We read it as a raw long (legacy nanosAsLong) and
    * normalize ns → microsecond TimestampType — the same ns→ts conversion
    * the reference applies to NEAR block-header timestamps
    * (indexer_app/handler.py:50-52). Truncation is exact here: the
    * generator emits µs-precision values.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  /** documents/embeddings ship as a single parquet row group, which would
    * pin every CPU-heavy per-row operator (shingling, minhash, cosine) to
    * ONE task. Repartition to the session's parallelism on load — the rows
    * are few but each carries heavy compute. On a real 100 TB corpus the
    * scan parallelizes by file split and this becomes a no-op-cost round
    * robin. */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)

  def documents: DataFrame = spread(t("documents"))
  def embeddings: DataFrame = spread(t("embeddings"))
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
