package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}

import graft.ingest.{Schemas, SilverStore}

/** Driver-pressure audit: counts Spark JOBS and STAGES submitted by the
  * ingest + gold-beat planes, grouped by call site. The DAGScheduler's
  * single event-loop thread serializes a task-binary broadcast per
  * stage submission — at high stage rates that thread becomes the
  * whole-process bottleneck (measured in the round-14 soak: serve-plane
  * count jobs queued 30-40 s behind ingest stage submissions while
  * executor slots sat idle). This audit is the measurement side of that
  * budget: which plane submits how many stages per block.
  *
  * Usage: `runMain graft.JobAudit [nBlocks] [workDir]` (default 2000,
  * /tmp/graft_jobaudit). Prints a jobs/stages-by-callsite table for the
  * backfill mega-batch, the streamed tail, and one incremental beat.
  */
object JobAudit {
  private final class Counter extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val bySite =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(): Unit
      val site = Option(j.properties)
        .flatMap(p => Option(p.getProperty("callSite.short")))
        .getOrElse("(unknown)")
      bySiteAdd(site, 1L, 0L, 0L)
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet(): Unit
      tasks.addAndGet(s.stageInfo.numTasks.toLong): Unit
      bySiteAdd(Option(s.stageInfo.details).map(_.linesIterator
        .nextOption().getOrElse("(unknown)")).getOrElse("(unknown)")
        .take(90), 0L, 1L, s.stageInfo.numTasks.toLong)
    }
    private def bySiteAdd(site: String, j: Long, st: Long, t: Long): Unit = {
      bySite.compute(site, (_, prev) => {
        val a = if (prev == null) Array(0L, 0L, 0L) else prev
        a(0) += j; a(1) += st; a(2) += t
        a
      }): Unit
    }
    def snapshotAndReset(): (Long, Long, Long, Seq[(String, Long, Long, Long)]) = {
      import scala.jdk.CollectionConverters._
      val rows = bySite.asScala.toSeq
        .map { case (k, a) => (k, a(0), a(1), a(2)) }
        .sortBy(-_._3)
      val r = (jobs.get, stages.get, tasks.get, rows)
      jobs.set(0); stages.set(0); tasks.set(0); bySite.clear()
      r
    }
  }

  def main(args: Array[String]): Unit = {
    val nBlocks = args.headOption.map(_.toInt).getOrElse(2000)
    val workDir = args.lift(1).getOrElse("/tmp/graft_jobaudit")
    val spark = HarnessSession.local()
    val base = new java.io.File(workDir)
    if (base.exists()) IngestBench.deleteRecursively(base)
    val lake = s"$workDir/lake"
    val silver = s"$workDir/silver"
    Files.createDirectories(Paths.get(lake))
    val h0 = 100000000L
    (0 until nBlocks).foreach { i =>
      val h = h0 + i
      Files.write(Paths.get(lake, f"$h%012d.json"),
        IngestBench.blockJson(h).getBytes("UTF-8")): Unit
    }
    val counter = new Counter
    spark.sparkContext.addSparkListener(counter)

    def phase(name: String, perUnit: Long)(body: => Unit): Unit = {
      counter.snapshotAndReset(): Unit
      val t0 = System.nanoTime()
      body
      // Listener-bus drain: poll the counters until still (the bus is
      // private[spark]; stability across two 100 ms samples suffices).
      // Bounded total wait, matching ShuffleAudit.quiesce: a source
      // still emitting job/stage events at sub-100 ms cadence (e.g. a
      // running streaming query) must not spin the audit forever —
      // attribute whatever has landed by the cap.
      var prev = (-1L, -1L)
      var stable = 0
      val drainDeadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stable < 2 && System.nanoTime() < drainDeadline) {
        Thread.sleep(100)
        val cur = (counter.jobs.get, counter.stages.get)
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val (j, st, t, rows) = counter.snapshotAndReset()
      println(f"\n=== $name: $j%,d jobs, $st%,d stages, $t%,d tasks in $wall%.1f s" +
        f" (${j.toDouble / math.max(1L, perUnit)}%.2f jobs/unit, ${st.toDouble / math.max(1L, perUnit)}%.2f stages/unit)")
      rows.take(18).foreach { case (site, jj, ss, tt) =>
        println(f"  $jj%6d jobs $ss%6d stages $tt%8d tasks  $site")
      }
    }

    // Phase 1: backfill mega-batch (the bulk path).
    val store = new SilverStore(spark, silver)
    phase(s"backfill mega-batch ($nBlocks blocks)", 1) {
      store.applyBatch(
        spark.read.schema(Schemas.blockMessage).json(lake)): Unit
    }
    // Phase 2: one gold beat over the fresh store (the serve plane's
    // swap source).
    phase("gold refresh (incremental, first run = full)", 1) {
      graft.gold.GoldRefresh.refresh(spark, silver): Unit
    }
    // Phase 3: streamed tail — 4 micro-batches of 250 through the
    // production stream path, no beats (isolate the merge cost).
    val lake2 = s"$workDir/lake2"
    Files.createDirectories(Paths.get(lake2))
    (0 until 1000).foreach { i =>
      val h = h0 + nBlocks + i
      Files.write(Paths.get(lake2, f"$h%012d.json"),
        IngestBench.blockJson(h).getBytes("UTF-8")): Unit
    }
    phase("streamed tail (1000 blocks, 4 micro-batches of 250)", 4) {
      val q = graft.streaming.StreamIngest.startFromLake(spark,
        Map("fetcher.dir" -> lake2,
          "startHeight" -> (h0 + nBlocks).toString,
          "maxBlocksPerTrigger" -> "250",
          "fetchPartitions" -> "8"),
        silver, s"$workDir/ckpt", availableNow = true)
      q.awaitTermination()
    }
    // Phase 4: one incremental beat after the tail.
    phase("gold refresh (incremental, post-tail)", 1) {
      graft.gold.GoldRefresh.refresh(spark, silver): Unit
    }
    spark.stop()
  }
}
