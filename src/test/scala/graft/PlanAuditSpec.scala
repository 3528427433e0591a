package graft

import graft.SparkSpec

/** Plan-shape regression gate: the PlanAudit assertions run as part of
  * `sbt test`, so a change that silently degrades a headline query's
  * physical plan (lost pushdown, a broadcast turning into a shuffle, a
  * bounded top-k becoming a global window) fails the suite, not just the
  * out-of-band audit run. */
class PlanAuditSpec extends SparkSpec {

  test("headline query plans keep their scale-critical shapes") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    // AQE hides codegen annotations in pre-execution plans; audit on a
    // sibling session with it off (same SparkContext, separate SQL conf),
    // exactly like the standalone PlanAudit main.
    val session = spark.newSession()
    session.conf.set("spark.sql.adaptive.enabled", "false")
    session.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val misses = PlanAudit.audit(session, sfDir)
    assert(misses.isEmpty, misses.map { case (n, ps, excerpt) =>
      s"$n missing: ${ps.mkString("; ")}\n$excerpt"
    }.mkString("\n"))
  }

  test("skew-path queries keep their guards in the FINAL adaptive plan (AQE on)") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    // the shared suite session already runs AQE on — execute and check
    // the finalized adaptive plans (salt spread survives AQE; bucket
    // joins never degrade to nested loops)
    val misses = PlanAudit.auditAdaptive(spark, sfDir)
    assert(misses.isEmpty, misses.map { case (n, ps, excerpt) =>
      s"$n missing: ${ps.mkString("; ")}\n$excerpt"
    }.mkString("\n"))
  }
}
