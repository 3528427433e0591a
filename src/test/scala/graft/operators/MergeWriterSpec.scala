package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition-scoped merge: only partitions present in the batch are
  * rewritten; untouched partition files stay byte-identical; semantics
  * match the whole-table merge. */
class MergeWriterSpec extends SparkSpec {
  import spark.implicits._

  test("mergePartitioned rewrites only affected partitions, LWW + backfill hold") {
    val path = tmpDir("pmerge") + "/donations"

    val b1 = Seq(
      ("k1", "2024-06-01", 1L, "v1", "x"),
      ("k2", "2024-06-01", 1L, "v2", null.asInstanceOf[String]),
      ("k3", "2024-06-02", 1L, "v3", "z")
    ).toDF("key", "day", "seqno", "value", "extra")
    MergeWriter.mergePartitioned(spark, b1, path, Seq("key"), Seq("seqno"), "day")

    val day2FilesBefore = Files.list(Paths.get(path, "day=2024-06-02"))
      .toArray.map(_.toString).sorted.toSeq

    // Batch 2 touches only day=2024-06-01: k1 updated (null extra must
    // backfill from v1's "x"), k4 new.
    val b2 = Seq(
      ("k1", "2024-06-01", 2L, "v1b", null.asInstanceOf[String]),
      ("k4", "2024-06-01", 1L, "v4", "w")
    ).toDF("key", "day", "seqno", "value", "extra")
    MergeWriter.mergePartitioned(spark, b2, path, Seq("key"), Seq("seqno"), "day")

    val out = spark.read.parquet(path)
    assert(out.count() == 4)
    val k1 = out.filter(col("key") === "k1").head()
    assert(k1.getAs[String]("value") == "v1b")
    assert(k1.getAs[String]("extra") == "x") // backfilled across versions

    // day=2024-06-02 untouched: same files on disk.
    val day2FilesAfter = Files.list(Paths.get(path, "day=2024-06-02"))
      .toArray.map(_.toString).sorted.toSeq
    assert(day2FilesAfter == day2FilesBefore)

    // Replay idempotence holds for the partitioned path too.
    val n = MergeWriter.mergePartitioned(spark, b2, path, Seq("key"), Seq("seqno"), "day")
    assert(n == 4)
  }

  test("flat table migrates wholesale to partitioned layout on first scoped merge") {
    val path = tmpDir("pmig") + "/t"
    // Legacy flat layout (or the empty-batch bootstrap): plain merge.
    val flat = Seq(
      ("k1", "2024-06-01", 1L, "v1"),
      ("k2", "2024-06-02", 1L, "v2")
    ).toDF("key", "day", "seqno", "value")
    MergeWriter.merge(spark, flat, path, Seq("key"), Seq("seqno"))
    assert(Files.list(Paths.get(path)).toArray.map(_.toString)
      .exists(_.endsWith(".parquet"))) // root data files = flat layout

    // First partition-scoped merge migrates everything — including rows in
    // partitions the batch does NOT touch — and dedups as usual.
    val b = Seq(("k1", "2024-06-01", 2L, "v1b")).toDF("key", "day", "seqno", "value")
    val n = MergeWriter.mergePartitioned(spark, b, path, Seq("key"), Seq("seqno"), "day")
    assert(n == 2)
    val out = spark.read.parquet(path)
    assert(out.filter(col("key") === "k1").head().getAs[String]("value") == "v1b")
    assert(out.filter(col("key") === "k2").count() == 1) // untouched day survived
    // Layout is now partitioned: no root data files, per-day dirs present.
    val entries = Files.list(Paths.get(path)).toArray.map(_.toString)
    assert(!entries.exists(_.endsWith(".parquet")))
    assert(entries.exists(_.contains("day=2024-06-02")))
  }
}
