package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fixed-point PageRank: hand-computed small-graph values (the integer
  * update is exactly reproducible on paper), invariants, and the
  * per-round physical plan shape. */
class GraphFunctionsSpec extends SparkSpec {
  import spark.implicits._

  // nodes {0,1,2}; edges 0→1, 0→2, 1→2, 2→0; scale 1000, damping 85.
  // base = 1000*15/300 = 50, r0 = 333 each.
  private def tiny = (
    Seq(0L, 1L, 2L).toDF("v"),
    Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)).toDF("src", "dst"))

  test("one damped round matches the hand computation") {
    val (nodes, edges) = tiny
    val r = GraphFunctions.pageRank(nodes, edges, iters = 1, scale = 1000L)
      .df.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // contribs: v1 ← 333 div 2 = 166; v2 ← 166 + 333 = 499; v0 ← 333
    assert(r == Map(0L -> (50 + 85 * 333 / 100),
      1L -> (50 + 85 * 166 / 100), 2L -> (50 + 85 * 499 / 100)))
    assert(r == Map(0L -> 333L, 1L -> 191L, 2L -> 474L))
  }

  test("two rounds keep compounding the integer update exactly") {
    val (nodes, edges) = tiny
    val r = GraphFunctions.pageRank(nodes, edges, iters = 2, scale = 1000L)
      .df.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // round 2 contribs: v1 ← 333 div 2 = 166; v2 ← 166 + 191; v0 ← 474
    assert(r == Map(0L -> 452L, 1L -> 191L, 2L -> 353L))
  }

  test("rank mass never exceeds the scale (dangling-free graph)") {
    val (nodes, edges) = tiny
    val total = GraphFunctions.pageRank(nodes, edges, iters = 5,
      scale = 1000000L).df.agg(sum("rank")).as[Long].head()
    // integer truncation only ever loses mass
    assert(total <= 1000000L && total > 900000L)
  }

  test("triangleCounts: K4 has 4 triangles, 3 per node") {
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("v")
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L)).toDF("a", "b")
    val r = GraphFunctions.triangleCounts(nodes, edges)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSet == Set((0L, 3L, 3L), (1L, 3L, 3L), (2L, 3L, 3L),
      (3L, 3L, 3L)))
  }

  test("triangleCounts: star + one closing edge, isolated node is zeroed") {
    // hub 0 — {1,2,3}; extra edge 1—2 closes exactly one triangle
    // (0,1,2); node 4 is isolated.
    val nodes = Seq(0L, 1L, 2L, 3L, 4L).toDF("v")
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L)).toDF("a", "b")
    val r = GraphFunctions.triangleCounts(nodes, edges)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r == Map(0L -> (3L, 1L), 1L -> (2L, 1L), 2L -> (2L, 1L),
      3L -> (1L, 0L), 4L -> (0L, 0L)))
  }

  test("triangleCounts: hub out-degree is bounded by the orientation") {
    // A 1-hub star with 50 leaves: the hub's (deg,id) is the LARGEST,
    // so every edge orients leaf→hub and the hub's OUT-degree is 0 —
    // the wedge self-join fans out from leaves (out-degree 1), never
    // from the hub. Asserted on the orientation itself: a reversed
    // ordering (hub out-degree 50 ⇒ quadratic wedge fan-out) fails
    // here even though the star is triangle-free either way.
    val nodes = (0L to 50L).toDF("v")
    val edges = (1L to 50L).map(i => (0L.min(i), 0L.max(i)))
      .toDF("a", "b")
    val deg = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val outDeg = GraphFunctions.orientByDegree(edges, deg)
      .groupBy("src").agg(count(lit(1)).as("od"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!outDeg.contains(0L)) // the hub emits NO wedge-side edges
    assert(outDeg.values.forall(_ == 1L)) // every leaf emits exactly one
    val r = GraphFunctions.triangleCounts(nodes, edges)
    assert(r.agg(sum("n_triangles")).as[Long].head() == 0L)
    assert(r.filter(col("v") === 0L).select("degree").as[Long].head() == 50L)
  }

  test("kCore: pendant chain peels in a cascade, K4 core survives") {
    // K4 on {0,1,2,3} + chain 3—4—5—6. Round 1 peels 6 (deg 1) and 5
    // (deg 2) and 4 (deg 2): all chain nodes die the SAME round because
    // degrees are measured before any removal. K4 keeps degree 3.
    // Node 3 has degree 4 in round 1 (K4 + chain edge), 3 afterwards.
    val nodes = (0L to 6L).toDF("v")
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val r = GraphFunctions.kCore(nodes, edges, k = 3, rounds = 5)
      .df.collect().map(x => x.getLong(0) -> (x.getBoolean(1), x.getLong(2)))
      .toMap
    assert(r == Map(0L -> (true, 3L), 1L -> (true, 3L), 2L -> (true, 3L),
      3L -> (true, 3L), 4L -> (false, 0L), 5L -> (false, 0L),
      6L -> (false, 0L)))
  }

  test("kCore: multi-round cascade — survivor of round 1 dies in round 2") {
    // Triangle {0,1,2} with 3 attached to all of {0,1,2} (K4 again),
    // plus 4 attached to {3, 5, 6} and 5—6 edge: 4 has degree 3 in
    // round 1 (3, 5, 6), but 5 (deg 2) and 6 (deg 2) peel in round 1,
    // so 4 drops to degree 1 and peels in round 2 — proving the
    // iteration is load-bearing.
    val nodes = (0L to 6L).toDF("v")
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    val one = GraphFunctions.kCore(nodes, edges, k = 3, rounds = 1)
      .df.filter(col("v") === 4L).select("in_core").collect()(0).getBoolean(0)
    val two = GraphFunctions.kCore(nodes, edges, k = 3, rounds = 2)
      .df.filter(col("v") === 4L).select("in_core").collect()(0).getBoolean(0)
    assert(one && !two)
  }

  test("kCore: convergence exit on a deep peel chain (empty core)") {
    // Path 0—1—…—11 with k = 2: each round peels exactly the two current
    // endpoints, so the cascade needs 6 rounds to empty the set — a peel
    // DEPTH far beyond the old fixed default. With a generous cap the
    // loop must stop right after the emptying round (an empty set is
    // trivially the fixpoint) and report convergence, not run to the cap.
    val nodes = (0L to 11L).toDF("v")
    val edges = (0L until 11L).map(i => (i, i + 1)).toDF("a", "b")
    val m = GraphFunctions.kCore(nodes, edges, k = 2, rounds = 64)
    assert(m.df.filter(col("in_core")).count() == 0L)
    assert(m.info("converged") == 1L)
    assert(m.info("rounds_run") == 6L)
    m.release()
  }

  test("kCore: fixpoint exit fires only at the true fixpoint; cap truncates") {
    // K4 {0,1,2,3} + node 4 on {3,5,6} + edge 5—6: round 1 peels 5,6
    // (deg 2), round 2 peels 4 (only neighbor 3 left), round 3 peels
    // nothing — the exit must fire at round 3 exactly, leaving the K4.
    val nodes = (0L to 6L).toDF("v")
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    val m = GraphFunctions.kCore(nodes, edges, k = 3, rounds = 64)
    assert(m.info("converged") == 1L)
    assert(m.info("rounds_run") == 3L)
    assert(m.df.filter(col("in_core")).collect().map(_.getLong(0)).toSet ==
      Set(0L, 1L, 2L, 3L))
    m.release()
    // A cap below the peel depth returns the partially-peeled set and
    // says so: node 4 survives round 1 only because 5/6 peel in the same
    // round it is measured — and converged = 0 flags the truncation.
    val capped = GraphFunctions.kCore(nodes, edges, k = 3, rounds = 1)
    assert(capped.info("converged") == 0L)
    assert(capped.df.filter(col("v") === 4L).select("in_core")
      .head().getBoolean(0))
    capped.release()
  }

  test("harmonicR2: path graph hand values; isolated node zeroed; triangle has no distance-2") {
    // Path 1-2-3-4-5 plus isolated 6 (canonical a < b edges).
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("v")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val r = GraphFunctions.harmonicR2(nodes, edges).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    // v=3: n1 = {2,4}, n2 = {1,5}; ends: n1 = 1, n2 = 1.
    assert(r(3L) == ((2L, 2L, 2L * 840 + 2L * 420)))
    assert(r(1L) == ((1L, 1L, 840L + 420L)) && r(1L) == r(5L))
    assert(r(2L) == ((2L, 1L, 2L * 840 + 420L)) && r(2L) == r(4L))
    assert(r(6L) == ((0L, 0L, 0L))) // isolated: no neighborhood at all

    // Triangle: every non-self pair is at distance 1 — the wedge pairs
    // must all be swallowed by the distance-1 anti-join, never double
    // counted at distance 2.
    val tri = GraphFunctions.harmonicR2(Seq(0L, 1L, 2L).toDF("v"),
        Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("a", "b")).collect()
      .map(x => (x.getLong(1), x.getLong(2))).toSet
    assert(tri == Set((2L, 0L)))
  }

  test("kmvNeighborhood: below-k sketches are exact ball sizes; estimates land in the KMV error band") {
    // Path 1-2-3: every ball is far below k=16, so the sketch IS the
    // distinct-hash set and the estimate the exact ball size.
    val nodes = Seq(1L, 2L, 3L).toDF("v")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val r = GraphFunctions.kmvNeighborhood(nodes, edges, k = 16, seed = "t")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2))))
      .toMap
    assert(r(1L) == ((2L, 3L))) // ball1 {1,2}, ball2 {1,2,3}
    assert(r(2L) == ((3L, 3L)))
    assert(r(3L) == ((2L, 3L)))

    // Star K1,200: the hub's ball1 is 201 nodes — well above k, so the
    // estimate path runs. KMV with k=16 has σ ≈ (k−2)^(−1/2) ≈ 27%;
    // a [1/2, 2×] band is ~3.7σ. Determinism: two runs bit-equal.
    val hubNodes = (0L to 200L).toDF("v")
    val hubEdges = (1L to 200L).map(i => (0L, i)).toDF("a", "b")
    def hubRun() = GraphFunctions
      .kmvNeighborhood(hubNodes, hubEdges, k = 16, seed = "t")
      .filter(col("v") === 0L).collect().map(x => x.getLong(1)).head
    val est = hubRun()
    assert(est >= 100L && est <= 402L, s"hub ball1 estimate $est off band")
    assert(hubRun() == est) // deterministic draw: replayable
  }

  test("KMinDistinct: buffer stays ≤ k through a 10⁶-degree hub; result is exactly sorted-distinct-take-k; any merge tree agrees") {
    val k = 16
    val agg = GraphFunctions.KMinDistinct(k)
    // A million distinct hash draws into ONE group — the hub shape the
    // old collect_set formulation materialized in full. The buffer must
    // never exceed k entries at ANY point in the fold.
    def mix(i: Long): Long = {
      val x = (i + 1L) * 0x9E3779B97F4A7C15L
      (x ^ (x >>> 31)) & 0xFFFFFFFFL // 32-bit domain like the md5 draw
    }
    var buf = agg.zero
    var i = 0L
    var maxLen = 0
    while (i < 1000000L) {
      buf = agg.reduce(buf, mix(i))
      if (buf.length > maxLen) maxLen = buf.length
      i += 1
    }
    assert(maxLen <= k, s"buffer grew to $maxLen > k=$k")
    // Exactness: the fold's answer IS the k smallest distinct values.
    val expect = (0L until 1000000L).map(mix).distinct.sorted.take(k)
    assert(buf.toSeq == expect)

    // Merge-tree invariance (the mergeable-summary contract): fold the
    // same stream in 7 chunks with duplicates across chunks, merge
    // left-to-right and as a balanced tree — both equal the flat fold.
    val stream = (0L until 5000L).map(j => mix(j % 1700L)) // heavy dupes
    val flat = stream.foldLeft(agg.zero)(agg.reduce)
    val chunks = stream.grouped(715).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val leftFold = chunks.reduce(agg.merge)
    val tree = chunks.grouped(2).toSeq
      .map(g => if (g.size == 2) agg.merge(g(0), g(1)) else g(0))
      .reduce(agg.merge)
    assert(leftFold.toSeq == flat.toSeq)
    assert(tree.toSeq == flat.toSeq)
    assert(flat.length <= k)
  }

  test("a round plans as src-keyed equi-joins + one dst aggregation") {
    val (nodes, edges) = tiny
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val rank = nodes.select(col("v"), lit(333L).as("r"))
    val plan = GraphFunctions.round(nodes, edges, deg, rank,
        base = 50L, dampingPct = 85)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findFirstIn(plan).isDefined, plan)
    assert("HashAggregate".r.findFirstIn(plan).isDefined, plan)
    assert("CartesianProduct".r.findFirstIn(plan).isEmpty, plan)
    assert("Window".r.findFirstIn(plan).isEmpty, plan)
  }
}
