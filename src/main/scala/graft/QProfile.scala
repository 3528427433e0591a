package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage profile of one declared query — the measurement tool of the
  * optimization rounds (guide §1: find WHERE the time goes before
  * touching anything). Runs a named query like the bench does (count
  * action, same session semantics) under a stage listener and prints,
  * per pass, every completed stage with wall, executor-run, task count,
  * shuffle bytes and the first line of its call site.
  *
  * Usage: runMain graft.QProfile <sfDir> <name> [passes]
  */
object QProfile {
  private final case class StageRow(id: Int, name: String, tasks: Int,
    wallMs: Long, runMs: Long, cpuMs: Long, shRead: Long, shWrite: Long,
    inBytes: Long)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QProfile <sfDir> <name> [passes]")
    val sfDir = args(0)
    val name = args(1)
    val passes = if (args.length >= 3) args(2).toInt else 2
    val spark = HarnessSession.local()
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(0L)
        rows.add(StageRow(i.stageId,
          i.details.linesIterator.nextOption().getOrElse("?").take(120),
          i.numTasks, wall, m.executorRunTime, m.executorCpuTime / 1000000L,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.bytesRead)): Unit
      }
    })
    (1 to passes).foreach { p =>
      SparkEntry.releaseTracked(); spark.catalog.clearCache()
      rows.clear()
      System.gc()
      import scala.jdk.CollectionConverters._
      def gcMs: Long = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
      val gc0 = gcMs
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val built = (System.nanoTime() - t0) / 1e9
      df.count()
      val total = (System.nanoTime() - t0) / 1e9
      val gcDelta = gcMs - gc0
      // Snapshot the timed pass's stages BEFORE the metric-walk execution
      // below (ADVICE r15): toLocalIterator() is a SECOND execution whose
      // stages would otherwise land in the same queue and desync the
      // stage-wall sum from the reported `total`.
      Thread.sleep(500) // let the listener bus drain
      import scala.jdk.CollectionConverters._
      val rs = rows.asScala.toSeq.sortBy(-_.wallMs)
      // On the last pass, execute the df's OWN plan (toLocalIterator, so
      // this QueryExecution finalizes) and print the adaptive plan with
      // per-operator metrics — rows out and codegen/op durations.
      if (p == passes) {
        df.toLocalIterator().forEachRemaining(_ => ())
        def walk(n: org.apache.spark.sql.execution.SparkPlan,
            depth: Int): Unit = {
          val interesting = Seq("numOutputRows", "duration", "aggTime",
            "sortTime", "collectTime", "buildTime", "shuffleBytesWritten",
            "dataSize", "elapsed")
          val ms = n.metrics.toSeq
            .filter { case (k, v) => interesting.exists(k.startsWith) && v.value > 0 }
            .map { case (k, v) => s"$k=${v.value}" }.mkString(" ")
          println(s"[plan] ${"  " * depth}${n.nodeName} $ms")
          val kids = n.children ++ (n match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              Seq(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              Seq(q.plan)
            case _ => Nil
          })
          kids.foreach(walk(_, depth + 1))
        }
        walk(df.queryExecution.executedPlan, 0)
      }
      val sumWall = rs.map(_.wallMs).sum
      println(f"\n=== pass $p: $name total $total%.2f s (build $built%.2f s, " +
        f"gc $gcDelta ms), ${rs.size} stages, ${rs.map(_.tasks).sum} tasks, " +
        f"stage-wall sum ${sumWall / 1e3}%.2f s")
      rs.take(30).foreach { r =>
        println(f"  stage ${r.id}%4d wall ${r.wallMs}%6d ms run ${r.runMs}%6d ms " +
          f"cpu ${r.cpuMs}%6d ms tasks ${r.tasks}%3d shR ${r.shRead / 1024}%7d K " +
          f"shW ${r.shWrite / 1024}%7d K in ${r.inBytes / 1024}%7d K  ${r.name}")
      }
    }
    SparkEntry.releaseTracked()
    spark.stop()
  }
}
