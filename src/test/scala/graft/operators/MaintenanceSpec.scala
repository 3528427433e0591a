package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Maintenance plane: small-file compaction preserves rows, layout
  * contracts, and the counts sidecar; vacuum removes only crash-stranded
  * swap artifacts past the grace period. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .map(_.getName).toSeq

  test("flat compact: many fragments fold to the byte-sized file count, rows identical, rerun no-op") {
    val path = tmpDir("cflat") + "/t"
    val df = spark.range(0, 1000).select(col("id"),
      (col("id") % 7).as("v"))
    df.repartition(16).write.parquet(path)
    assert(dataFiles(path).size == 16)

    val r = Maintenance.compact(spark, path) // 1000 tiny rows ≪ 128 MB → 1 file
    assert(r.rewritten == 1 && r.filesBefore == 16 && r.filesAfter == 1)
    val out = spark.read.parquet(path)
    assert(out.count() == 1000)
    assert(out.agg(sum(col("id") * col("v"))).head().getLong(0) ==
      df.agg(sum(col("id") * col("v"))).head().getLong(0))

    val r2 = Maintenance.compact(spark, path) // already compact
    assert(r2.rewritten == 0 && r2.filesAfter == 1)
  }

  test("flat compact honors targetFileBytes: stays above one file when bytes demand it") {
    val path = tmpDir("ctgt") + "/t"
    spark.range(0, 20000).select(col("id"),
        concat(lit("x" * 50), col("id")).as("pad"))
      .repartition(12).write.parquet(path)
    val bytes = Option(new java.io.File(path).listFiles()).get
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).map(_.length()).sum
    val target = bytes / 3 // force need ≈ 3-4 files
    val r = Maintenance.compact(spark, path, targetFileBytes = target)
    assert(r.rewritten == 1)
    assert(r.filesAfter >= 3 && r.filesAfter < 12,
      s"expected a 3-4 file layout, got ${r.filesAfter}")
    assert(spark.read.parquet(path).count() == 20000)
  }

  test("partitioned compact rewrites only over-fragmented partitions; sidecar stays valid (no heal rescan)") {
    val path = tmpDir("cpart") + "/t"
    val b1 = (1 to 40).map(i => (s"k$i", f"2024-06-${i % 2 + 1}%02d", 1L, i))
      .toDF("key", "day", "seqno", "v")
    MergeWriter.mergePartitioned(spark, b1, path, Seq("key"), Seq("seqno"), "day")
    Maintenance.compact(spark, path) // normalize both partitions first
    val sidecarUid = Files.readAllBytes(Paths.get(s"$path.swapuid"))

    // Fragment ONE partition out-of-band (a bulk backfill written by
    // another engine): same rows, 8 files.
    val hot = s"$path/day=2024-06-01"
    val hotRows = spark.read.parquet(hot).persist()
    assert(hotRows.count() == 20)
    hotRows.repartition(8).write.mode("overwrite").parquet(hot)
    hotRows.unpersist()
    val coldFiles = dataFiles(s"$path/day=2024-06-02").toSet
    assert(dataFiles(hot).size == 8)

    val r = Maintenance.compact(spark, path)
    assert(r.examined == 2 && r.rewritten == 1, s"got $r")
    assert(dataFiles(hot).size == 1)
    // Cold partition untouched — same physical files.
    assert(dataFiles(s"$path/day=2024-06-02").toSet == coldFiles)
    assert(spark.read.parquet(path).count() == 40)
    // Compaction never touches the sidecar/marker pair.
    assert(Files.readAllBytes(Paths.get(s"$path.swapuid"))
      .sameElements(sidecarUid))

    // The counts sidecar survives compaction (rows moved, not changed):
    // the next merge must trust it — total correct without a heal rescan.
    val b2 = Seq(("k2", "2024-06-01", 2L, 999)).toDF("key", "day", "seqno", "v")
    val total = MergeWriter.mergePartitioned(spark, b2, path,
      Seq("key"), Seq("seqno"), "day")
    assert(total == 40)
  }

  test("bucketed layouts are never rewritten (flat and per-partition)") {
    val flat = tmpDir("cbflat") + "/t"
    val rows = (1 to 30).map(i => (s"k$i", f"2024-06-${i % 2 + 1}%02d", 1L, i))
      .toDF("key", "day", "seqno", "v")
    MergeWriter.mergeBucketed(spark, rows, flat, Seq("key"), Seq("seqno"),
      "key", 4)
    val before = dataFiles(flat).toSet
    val r = Maintenance.compact(spark, flat, targetFileBytes = 1L)
    assert(r.rewritten == 0 && r.skippedBucketed == 1)
    assert(dataFiles(flat).toSet == before)

    val part = tmpDir("cbpart") + "/t"
    MergeWriter.mergePartitioned(spark, rows, part, Seq("key"), Seq("seqno"),
      "day", bucket = Some(("key", 4)))
    val beforeP = dataFiles(s"$part/day=2024-06-01").toSet
    val rp = Maintenance.compact(spark, part, targetFileBytes = 1L)
    assert(rp.rewritten == 0 && rp.skippedBucketed == 2, s"got $rp")
    assert(dataFiles(s"$part/day=2024-06-01").toSet == beforeP)
  }

  test("vacuum removes stranded swap artifacts past grace, spares fresh and live") {
    val dir = tmpDir("vac")
    val path = s"$dir/t"
    Seq(("k1", 1L)).toDF("key", "seqno")
      .write.parquet(path)

    // Stranded artifacts of every species the swap protocol can leave.
    Files.createDirectories(Paths.get(s"$path.tmp-dead0001"))
    Files.createDirectories(Paths.get(s"$path.old-dead0002"))
    Files.createDirectories(Paths.get(s"$path.old-dead0003-day=2024-06-01"))
    Files.write(Paths.get(s"$path.counts.json.tmp"), "torn".getBytes)
    // A DIFFERENT table's tmp dir must not match t's patterns.
    Files.createDirectories(Paths.get(s"$dir/t2.tmp-alive01"))

    val now = System.currentTimeMillis()
    // Grace larger than the artifacts' age → in-flight-safe, nothing dies.
    assert(Maintenance.vacuum(path, graceMs = 3600 * 1000L, nowMs = now).isEmpty)
    // Grace 0 → all four of t's artifacts die; t itself and t2's live.
    val removed = Maintenance.vacuum(path, graceMs = 0L, nowMs = now)
    assert(removed.size == 4, s"removed $removed")
    assert(Files.exists(Paths.get(path)))
    assert(Files.exists(Paths.get(s"$dir/t2.tmp-alive01")))
    assert(!Files.exists(Paths.get(s"$path.tmp-dead0001")))
    assert(!Files.exists(Paths.get(s"$path.counts.json.tmp")))
    assert(spark.read.parquet(path).count() == 1)
  }

  test("compact leftover tmp (kill mid-compaction) never shadows reads; vacuum clears it") {
    val path = tmpDir("ckill") + "/t"
    val b = (1 to 20).map(i => (s"k$i", "2024-06-01", 1L, i))
      .toDF("key", "day", "seqno", "v")
    MergeWriter.mergePartitioned(spark, b, path, Seq("key"), Seq("seqno"), "day")
    // Simulate a compaction killed after its tmp write, before the swap.
    spark.read.parquet(s"$path/day=2024-06-01").coalesce(1)
      .write.parquet(s"$path.tmp-kill0001/day=2024-06-01")
    assert(spark.read.parquet(path).count() == 20) // reads see only `path`
    val removed = Maintenance.vacuum(path, graceMs = 0L)
    assert(removed == Seq(s"$path.tmp-kill0001"))
    // And a rerun completes the job the kill interrupted.
    val r = Maintenance.compact(spark, path)
    assert(spark.read.parquet(path).count() == 20 && r.examined == 1)
  }
}
