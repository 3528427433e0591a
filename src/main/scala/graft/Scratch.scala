package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for optimization work (not part of the driver
  * contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, "/root/testdata/sf0.1")
    import graft.functions.DedupFunctions._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val base = t.documents
      .select(col("doc_id").as("id"), shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles only")(base.select(sum(size(col("sh")))).collect())

    val withSig = base.withColumn("sig", minHashSignature(col("sh"), 16))
    time("sig compute")(withSig.select(sum(size(col("sig")))).collect())

    val bandRows = withSig
      .select(col("id"), explode(lshBandKeys(col("sig"), 4, 4)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    time("band rows")(println("bands=" + bandRows.count()))

    val pairs = bandRows.alias("a")
      .join(bandRows.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    time("candidate pairs")(println("pairs=" + pairs.count()))

    time("full dd3")(println("rows=" + minHashNearDupPairs(
      t.documents, "doc_id", "text", 3, 16, 4, 0.2).count()))
    spark.stop()
  }
}
