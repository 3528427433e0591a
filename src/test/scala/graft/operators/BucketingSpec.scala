package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed-table co-located join: both sides bucketed+sorted on the join
  * key ⇒ the sort-merge join runs with NO shuffle Exchange — the layout
  * strategy for the recurring big-fact joins at 100 TB (SURVEY §4:
  * "indexes → partition/sort layout"). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle Exchange") {
    val facts = (1 to 10000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "v")
    val dims = (0L to 96L).map(k => (k, s"name$k")).toDF("k", "name")

    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_dims")
    facts.write.bucketBy(4, "k").sortBy("k").saveAsTable("b_facts")
    dims.write.bucketBy(4, "k").sortBy("k").saveAsTable("b_dims")

    val joined = spark.table("b_facts")
      .hint("merge")
      .join(spark.table("b_dims"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(joined.count() == 10000)
  }
}
