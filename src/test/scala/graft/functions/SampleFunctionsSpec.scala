package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic sampling/splitting: stability under repartition, split
  * proportions, per-stratum fractions, seed independence. */
class SampleFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (0L until 2000L).toDF("id")

  test("split is deterministic and stable under repartitioning") {
    def labels(parts: Int) = ids.repartition(parts)
      .select(col("id"), SampleFunctions.splitLabel(col("id"), 0.8, "s").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(labels(1) == labels(13))
  }

  test("split proportions land near the requested fraction") {
    val train = ids
      .filter(SampleFunctions.splitLabel(col("id"), 0.8, "s") === "train")
      .count()
    // 2000 draws at p=0.8: ±5 sigma ≈ ±90
    assert(train > 1510 && train < 1690, s"train=$train")
  }

  test("different seeds give independent draws") {
    val both = ids.filter(
      SampleFunctions.splitLabel(col("id"), 0.5, "a") === "train" &&
        SampleFunctions.splitLabel(col("id"), 0.5, "b") === "train")
      .count()
    // independent halves overlap on ~25%; identical draws would give ~50%
    assert(both > 350 && both < 650, s"overlap=$both")
  }

  test("stratified sample applies per-stratum fractions and the default") {
    val rows = ids.withColumn("s",
      when(col("id") % 2 === 0, "keep_all").otherwise("rare"))
    val kept = SampleFunctions.stratifiedSample(rows, col("id"), col("s"),
      Map("keep_all" -> 0.999999999, "rare" -> 0.1), default = 0.5, seed = "z")
    val byStratum = kept.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("keep_all") == 1000L)
    val rare = byStratum.getOrElse("rare", 0L)
    assert(rare > 50 && rare < 160, s"rare=$rare") // 1000 draws at p=0.1
  }

  test("hexThreshold endpoints and width") {
    assert(SampleFunctions.hexThreshold(0.0) == "00000000")
    assert(SampleFunctions.hexThreshold(1.0) == "ffffffff")
    assert(SampleFunctions.hexThreshold(0.8) == "cccccccc")
    assert(SampleFunctions.hexThreshold(0.5) == "80000000")
  }
}
