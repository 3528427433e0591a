package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = HarnessSession.local(cpus)
    // Warm-up: touch every table and exercise codegen/JIT once so timings
    // measure steady-state throughput, not first-query compilation.
    val warm = Tables(spark, sfDir)
    Seq(warm.region, warm.nation, warm.customer, warm.supplier, warm.part,
      warm.orders, warm.lineitem, warm.events, warm.documents, warm.embeddings)
      .foreach(df => df.limit(1).count())
    Seq("q_a3_conditional_agg", "q_txt3_fingerprint", "q_sim1_cosine_topk")
      .foreach { name =>
        SparkEntry.queries.get(name).foreach { fn =>
          try fn(spark, sfDir).limit(1).count() catch { case _: Throwable => () }
        }
      }
    // Deterministic (sorted) execution order so per-query timings are
    // comparable across rounds. Each query runs 3 times and reports the
    // minimum: the box is shared, and a contention spike during a single
    // pass must not be able to fail the round.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    // A failed pass must NOT produce a timing (a query that throws
    // instantly would otherwise record a tiny min and read as a speedup);
    // only successful passes enter the min, and a query with zero
    // successful passes reports a null time plus its error.
    // Optional comma-separated allowlist for targeted perf work
    // (e.g. SPARK_GRAFT_BENCH_ONLY=q_sim3_ivf_ann,q_dd6_dup_clusters);
    // absent = full suite, which is what the driver runs.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // A typo'd allowlist must fail loud, not print a clean zero-query run.
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown queries: ${unknown.mkString(", ")}")
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Plan fingerprint: md5 of the OPERATOR-TOKEN TREE — one
    // `depth:NodeName` line per physical operator — not the full plan
    // string. A changed fingerprint between rounds means the plan SHAPE
    // changed (join strategy, an extra Exchange, aggregate mode — the
    // things the plan audits pin), which turns an unexplained timing
    // delta into a diffable regression. The full string is NOT stable
    // run-to-run even after id-stripping: JVM lambda identities
    // (MapPartitions closures), AQE stage numbers, the materialization
    // state of shared cached relations, and Spark's hash-set-ordered
    // Expand keys (RewriteDistinctAggregates) all vary without the plan
    // meaningfully changing — round 7 measured 6/89 queries flapping.
    // Cached-relation INNER plans are excluded for the same reason: the
    // stored subtree reflects whether/how the cache materialized, not
    // what this query will do. Captured from queryExecution.sparkPlan —
    // the pre-AQE physical plan — because executedPlan's toString swaps
    // in QueryStage wrappers for any exchange a SHARED persisted input
    // already materialized, so its shape depends on execution history
    // even before this query runs.
    // Debug surface: SPARK_GRAFT_PLAN_DUMP_DIR=<dir> writes the token
    // tree per query, so an unstable fingerprint diffs to the exact
    // run-varying token (tools/fpdiff.py flags, this locates).
    // Gold gate, timed EXPLICITLY: the q_gold_* rows in the sweep read
    // the gate's memoized output (goldRunCache builds the silver store +
    // runs the production refresh chain ONCE per process), so their
    // per-query timings are cached-read costs (~0.1 s) — NOT the refresh
    // cost. Build the gate here, once, and report its wall time as its
    // own JSON field so nobody mistakes the cached rows for the job.
    val goldGateSec: Option[Double] =
      if (selected.exists(_._1 == "q_gold_refresh")) {
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries("q_gold_refresh")(spark, sfDir).limit(1).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          // NonFatal only: an OOM/VM error must crash the bench, not
          // publish gold_gate_build_sec:null beside sub-second cached
          // q_gold_* rows — the exact confusion this field prevents.
          case scala.util.control.NonFatal(e) =>
            println(s"[bench] gold gate build failed: ${e.getMessage}")
            None
        }
      } else None
    val planDumpDir = sys.env.get("SPARK_GRAFT_PLAN_DUMP_DIR")
    def fingerprintOf(df: org.apache.spark.sql.DataFrame,
        name: String): Option[String] =
      try {
        val tok = "^([\\s:+|\\-]*)(?:\\*\\(\\d+\\)\\s*)?([A-Za-z][A-Za-z0-9_.$]*)".r
        val sb = new StringBuilder
        var skipDeeperThan = -1
        df.queryExecution.sparkPlan.toString.linesIterator.foreach { ln =>
          tok.findFirstMatchIn(ln).foreach { m =>
            val depth = m.group(1).length
            val op = m.group(2)
            if (skipDeeperThan >= 0 && depth > skipDeeperThan) ()
            else {
              skipDeeperThan = -1
              sb.append(depth).append(':').append(op).append('\n')
              if (op == "InMemoryRelation") skipDeeperThan = depth
            }
          }
        }
        val p = sb.toString
        planDumpDir.foreach { dir =>
          new java.io.File(dir).mkdirs()
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$dir/$name.plan.txt"), p)
        }
        Some(java.security.MessageDigest.getInstance("MD5")
          .digest(p.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12))
      } catch { case _: Throwable => None }
    val results = selected.map { case (name, fn) =>
      var err: Option[String] = None
      var fp: Option[String] = None
      // Release cache blocks left by the PREVIOUS QUERY — persisted
      // intermediates from its builder (dd3/dd8/mm5/…) otherwise
      // accumulate across the 100-query sweep (memory pressure, GC
      // pauses inside timed work). Deliberately NOT between passes of
      // the same query: the CacheManager's plan-matched reuse across
      // passes is part of the measured semantics every round has used
      // (min-of-3 reads pass 1 cold, passes 2-3 cache-warm), and
      // clearing per-pass inflates the whole board ~1.4× against prior
      // rounds' numbers.
      SparkEntry.releaseTracked(); spark.catalog.clearCache()
      val times = (1 to passes).flatMap { _ =>
        // Outside the timed region: let the ContextCleaner release
        // dropped RDDs before the next timed pass.
        System.gc()
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          // Fingerprint from the SAME DataFrame the timed pass runs:
          // re-invoking the builder afterwards would re-run the
          // driver-side fit/sample work of sim3/sim5/sim6/dd11 just to
          // stringify a plan. Planning is cached on queryExecution, so
          // count() below reuses it — no extra timed work beyond the md5.
          if (fp.isEmpty) fp = fingerprintOf(df, name)
          df.count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          // strip quotes, backslashes and ALL control chars (\b, \f,
          // U+0000-001F would otherwise still produce invalid JSON)
          err = Some((e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("")).take(160)
            .replaceAll("[\"\\\\\\p{Cntrl}]", " "))
          None
        }
      }
      (name, if (times.nonEmpty) Some(times.min) else None, err, fp)
    }
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + v.fold("null")(_.toString) }
      .mkString("{", ",", "}")
    val errs = results.map { case (k, t, e, _) =>
      s"\"" + k + "\":" + (if (t.isDefined) "null" else e.fold("null")("\"" + _ + "\""))
    }.mkString("{", ",", "}")
    val failed = results.count(_._2.isEmpty)
    val total = results.flatMap(_._2).sum
    val plans = results.map { case (name, _, _, fp) =>
      s"\"" + name + "\":" + fp.fold("null")("\"" + _ + "\"")
    }.mkString("{", ",", "}")
    val goldGate = goldGateSec.fold("null")(_.toString)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"gold_gate_build_sec":$goldGate,"cached_gate_queries":["q_gold_refresh","q_gold_pot_stats"],"queries":$qs,"errors":$errs,"plans":$plans,"sf":"$sfDir"}"""
    println(line)
    // Persist the full per-query JSON as an artifact: the driver retains
    // only a truncated stdout tail, which makes round-over-round timing
    // diffs impossible for most queries. The file survives in the repo
    // checkout (committed per round) so every query is diffable.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_results.json")), line)
    catch { case e: Throwable =>
      System.err.println(s"[bench] artifact write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
