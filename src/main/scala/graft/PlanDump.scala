package graft

import org.apache.spark.sql.SparkSession

/** Debug surface for the bench fingerprint mechanism: prints a named
  * query's NORMALIZED physical-plan string (same normalization as
  * Bench.fingerprintOf), so an unstable fingerprint can be diffed to
  * the exact run-varying token instead of guessed at. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      // naive parquet timestamps (timestamp[us], no UTC flag) read as
      // TIMESTAMP (session-local, pinned UTC) — matching DuckDB and the
      // watermark/unix_micros surfaces, not TIMESTAMP_NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
      .replaceAll("#\\d+", "#")
      .replaceAll("plan_id=\\d+", "plan_id=")
      .replaceAll("@[0-9a-f]+", "@")
      .replaceAll("\\$Lambda[$/][\\d$/]*0x[0-9a-f]+", "\\$Lambda\\$0x")
      .replaceAll("QueryStage \\d+", "QueryStage")
    println("===PLAN START===")
    println(p)
    println("===PLAN END===")
    spark.stop()
  }
}
