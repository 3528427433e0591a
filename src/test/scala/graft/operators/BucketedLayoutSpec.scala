package graft.operators

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketed layout's one property: equal-bucket tables join with no
  * exchange on either key — plus the negative control proving the
  * assertion pattern actually detects exchanges when co-location is
  * broken. */
class BucketedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def writePair(buckets: (Int, Int)): Unit = {
    val dir = tmpDir("bucketed")
    BucketedLayout.writeBucketed(
      (1L to 100L).toDF("k_left").withColumn("a", col("k_left") * 2),
      "spec_b_left", s"$dir/l", "k_left", buckets._1)
    BucketedLayout.writeBucketed(
      (1L to 300L).map(i => (i % 100 + 1, i)).toDF("k_right", "b"),
      "spec_b_right", s"$dir/r", "k_right", buckets._2)
  }

  test("equal bucket counts: join plans with zero exchange on the keys") {
    writePair((4, 4))
    val p = plan(BucketedLayout.cooperativeJoin(spark, "spec_b_left",
      "spec_b_right", "k_left", "k_right"))
    assert("SortMergeJoin".r.findFirstIn(p).isDefined, p)
    assert("hashpartitioning\\(k_left".r.findFirstIn(p).isEmpty, p)
    assert("hashpartitioning\\(k_right".r.findFirstIn(p).isEmpty, p)
  }

  test("negative control: mismatched bucket counts force an exchange") {
    writePair((4, 8))
    val p = plan(BucketedLayout.cooperativeJoin(spark, "spec_b_left",
      "spec_b_right", "k_left", "k_right"))
    // one side must re-shuffle to align — proving the positive test's
    // absent-pattern assertion is detecting a real property, not a
    // pattern that can never match
    assert(("hashpartitioning\\(k_left".r.findFirstIn(p).isDefined ||
      "hashpartitioning\\(k_right".r.findFirstIn(p).isDefined), p)
  }

  test("join result matches the unbucketed equivalent") {
    writePair((4, 4))
    val bucketed = BucketedLayout.cooperativeJoin(spark, "spec_b_left",
        "spec_b_right", "k_left", "k_right")
      .groupBy("k_left").agg(count(lit(1)).as("n"), sum("b").as("sb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val l = (1L to 100L).toDF("k_left").withColumn("a", col("k_left") * 2)
    val r = (1L to 300L).map(i => (i % 100 + 1, i)).toDF("k_right", "b")
    val plainJ = l.join(r, l("k_left") === r("k_right"))
      .groupBy("k_left").agg(count(lit(1)).as("n"), sum("b").as("sb"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(bucketed == plainJ)
  }
}
