package graft

import graft.queries.{QueryServer, QueryService, ResultCache}

/** Cold-route floors vs STORE SIZE — the serving claim ServeBench alone
  * argues but does not measure: its cold table is taken at ONE store
  * size, so "the floors rest on bucket-pruned scans staying flat as the
  * store grows" was an assertion about plan shape, not a number. This
  * sweep builds the same production-layout store (same generator, same
  * mega-batch backfill, same gold beat) at several block counts, starts
  * the same cold-tier server (result cache TTL 0, gold counters wired)
  * over each, measures the SAME route table, and publishes per-route
  * cold p50 across sizes — a route whose p50 grows with store size is
  * either honestly size-coupled (page-1 over a dimension that itself
  * grows: more rows to rank) or a pruning bug; the table names which.
  *
  * Usage: `runMain graft.ColdScaleBench [reportPath] [workDir] [sizes]`
  * (defaults: ./SERVE_BENCH.md — the sweep section is spliced between
  * its markers — /tmp/graft_cold_scale, sizes "20000,100000,500000").
  */
object ColdScaleBench {
  private val SectionStart = "<!-- cold-scale-sweep:start -->"
  private val SectionEnd = "<!-- cold-scale-sweep:end -->"

  def main(args: Array[String]): Unit = {
    val reportPath = args.headOption.getOrElse("SERVE_BENCH.md")
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_cold_scale"
    val sizes: Seq[Int] = (if (args.length > 2) args(2)
      else "20000,100000,500000").split(",").map(_.trim.toInt).toSeq
    val spark = HarnessSession.local()
    val reps = 7

    // Generator id shapes (IngestBench): donor ids cycle mod 5000 and
    // recipients mod 800, so donor0/proj0 carry real traffic AT EVERY
    // SIZE — the measured ids' per-entity row counts GROW with the
    // store, which is exactly the floor the bucket-pruned claim is
    // about (same account, 8× the donations behind it).
    val donor = "donor0.near"
    val recipient = "proj0.near"

    final case class Sized(nBlocks: Int, nDonations: Long, nAccounts: Long,
        tBuild: Double, rows: Seq[ServeBench.R],
        hotRows: Long)
    val results: Seq[Sized] = sizes.map { n =>
      val built = ServeBench.buildStore(spark, s"$workDir/sf$n", n)
      val potId = built.store.table("pots")
        .orderBy("account").head().getAs[String]("account")
      val qs = new QueryService(
        QueryServer.memoizedServingLoader(spark, built.silver))
      val gc = new graft.gold.GoldCounts(spark, built.silver)
      val srv = new QueryServer(qs, built.silver, goldCounts = Some(gc),
        cache = new ResultCache(ttlMs = 0))
      val http = srv.start(0)
      val port = http.getAddress.getPort
      val paths = ServeBench.coldRoutePaths(donor, recipient, potId)
      val rows = paths.map { case (name, p) =>
        ServeBench.measureRoute(name, port, p, reps) }
      http.stop(0)
      import org.apache.spark.sql.functions.col
      val hot = built.store.table("donations")
        .filter(col("recipient") === recipient).count()
      println(f"[cold-scale] $n%,d blocks: ${built.nDonations}%,d donations, " +
        f"hot recipient carries $hot%,d; build ${built.tBuild}%.1f s")
      Sized(n, built.nDonations, built.nAccounts, built.tBuild, rows, hot)
    }

    // ---- report: per-route cold p50 across sizes + growth ratio.
    val sb = new StringBuilder
    sb ++= s"$SectionStart\n"
    sb ++= "## Cold-route floors vs store size (ColdScaleBench)\n\n"
    sb ++= s"Same store generator, backfill ingest, gold beat, cold tier " +
      s"(cache TTL 0, gold counters) and route table as the cold table " +
      s"above, swept across store sizes — does each route's cold p50 " +
      s"stay FLAT as the store grows? Sizes: ${
        sizes.map(n => f"$n%,d").mkString(" / ")} blocks (" +
      results.map(r => f"${r.nDonations}%,d").mkString(" / ") +
      " donations; the measured hot recipient's own feed grows " +
      results.map(r => f"${r.hotRows}%,d").mkString(" / ") + " rows).\n\n"
    sb ++= "| route | " + results.map(r =>
      f"p50 @ ${r.nBlocks / 1000}k blk").mkString(" | ") +
      " | growth (last/first) |\n"
    sb ++= "|---|" + results.map(_ => "---|").mkString + "---|\n"
    val names = results.head.rows.map(_.name)
    var worst: (String, Double) = ("", 0.0)
    names.zipWithIndex.foreach { case (name, i) =>
      val p50s = results.map(_.rows(i).p50)
      val ratio = p50s.last.toDouble / math.max(1L, p50s.head)
      if (ratio > worst._2) worst = (name, ratio)
      sb ++= s"| $name | " + p50s.map(v => f"$v%,d ms").mkString(" | ") +
        f" | ${ratio}%.2f× |\n"
    }
    sb ++= f"\nStore grew ${sizes.last.toDouble / sizes.head}%.0f× " +
      f"(${results.last.nDonations.toDouble / results.head.nDonations}%.1f× " +
      f"donations); worst route growth: ${worst._1} at ${worst._2}%.2f×. " +
      "Routes reading a FIXED page over bucket-pruned point lookups " +
      "(detail, FK feeds, keyset first pages) should hold flat; page-1 " +
      "list routes over a dimension that itself grows pay the count job " +
      "on more rows — that growth is the data's, not a pruning bug.\n"
    sb ++= s"$SectionEnd\n"

    // Splice between markers (fresh section appended if absent) so the
    // per-round ServeBench rewrite and this sweep can coexist in one
    // artifact.
    val p = java.nio.file.Paths.get(reportPath)
    val prior =
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.readString(p)
      else ""
    val next =
      if (prior.contains(SectionStart) && prior.contains(SectionEnd)) {
        val pre = prior.substring(0, prior.indexOf(SectionStart))
        val post = prior.substring(
          prior.indexOf(SectionEnd) + SectionEnd.length)
        pre + sb.toString + post
      } else prior + (if (prior.endsWith("\n") || prior.isEmpty) "" else "\n") +
        "\n" + sb.toString
    java.nio.file.Files.writeString(p, next)
    println(s"[cold-scale] wrote sweep section to $reportPath")
    spark.stop()
  }
}
