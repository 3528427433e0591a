package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.Materialized

/** Iterative graph analytics over edge tables — the authority/centrality
  * leg of corpus curation (CommonCrawl-style harmonic/PageRank
  * centrality is a published quality signal for web corpora; the
  * reference's account graph is the same shape at protocol scale).
  *
  * All arithmetic is integer fixed-point so results are bit-identical
  * across engines and partition orders: per-edge contributions are
  * integer-divided BEFORE the sum (each `r/deg` term is exact), and the
  * damped update is one integer expression per node. Long sums are
  * order-independent, so the shuffle schedule cannot perturb results.
  */
object GraphFunctions {

  /** Fixed-point PageRank.
    *
    * `nodes`: one column `v` (distinct node ids). `edges`: `src`,`dst`
    * (distinct directed edges; every src must appear in `nodes`).
    * Returns (`v`, `rank` at `scale` fixed-point) after `iters` damped
    * rounds: r'(v) = scale·(100−d)/(100·n) + d·Σ_{u→v} (r(u) div
    * deg(u)) div 100, with d the damping numerator (85 ⇒ 0.85).
    * Dangling mass is dropped (every generator node here has out-edges;
    * documented contract, identical in the oracle replay).
    *
    * Scale design (100 TB): each round is one co-partitioned equi-join
    * (rank ⋈ edges on the source key) and one aggregation by `dst` —
    * the canonical distributed PageRank data flow. Edges and the degree
    * table are hash-repartitioned on `src` ONCE and persisted; every
    * iteration's join then reuses that layout (exchange on the rank
    * side only, which is the small per-node table). Ranks persist at
    * MEMORY_AND_DISK with lineage intact (executor-loss safe) and the
    * previous round is unpersisted as soon as the next materializes, so
    * peak footprint is two rank tables regardless of iteration count.
    *
    * The returned [[Materialized]] keeps the final rank table persisted
    * (the iteration chain behind it has been unpersisted round by round,
    * so an eager release would force a full recompute on first use);
    * the caller consumes `.df` and then calls `.release()` — no
    * session-wide `clearCache()` needed for hygiene.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
      scale: Long = 1000000000000L, dampingPct: Int = 85): Materialized = {
    val spark = nodes.sparkSession
    // n is a 1-row aggregate: driver-side scalar, not row data.
    val n = nodes.count()
    // Per-round layout parallelism sized to the GRAPH, not the session
    // (r15 optimization; duplicateClusters precedent): each of the
    // `iters` rounds shuffles Θ(n + m) rows, and for the bounded-degree
    // graphs this operator documents m = O(n) — so node count is the
    // right size driver. A session's full shuffle-partition count over a
    // small graph costs more per round in task scheduling than the
    // join-aggregate arithmetic; big graphs keep full parallelism via
    // the cap, so cluster-scale plans are unchanged.
    val parts = ExprUtils.loopParallelism(n, ExprUtils.shufflePartitions(spark))

    val e = edges.repartition(parts, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = scale * (100L - dampingPct) / (100L * n)

    // The node list is consumed by EVERY round's left join plus the rank
    // init — un-persisted, each of the `iters` rounds re-ran the caller's
    // node plan (a parquet scan + exchange per round at sf0.1; r16,
    // guide §5 persist-vs-recompute). Hash-repartitioned on v so the
    // per-round join keys the cached layout at loop parallelism instead
    // of the source scan's partitioning.
    val nd = nodes.select(col("v")).repartition(parts, col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var rank = nd.select(col("v"), lit(scale / n).as("r"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    rank.count()
    var i = 0
    while (i < iters) {
      val next = round(nd, e, deg, rank, base, dampingPct)
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      rank.unpersist()
      rank = next
      i += 1
    }
    val out = rank.select(col("v"), col("r").as("rank"))
    e.unpersist(); deg.unpersist(); nd.unpersist()
    Materialized(out, Seq(rank), Map("iters_run" -> iters.toLong))
  }

  /** Per-node triangle counts over an undirected simple graph — the
    * clustering-coefficient / community-density leg of graph analytics
    * (triangle density is a standard spam/link-farm signal for web-graph
    * corpus curation, the same curation family as gr1's PageRank).
    *
    * `nodes`: one column `v`. `edges`: canonical undirected edges
    * (`a` < `b`, distinct, no self-loops). Returns (`v`, `degree`,
    * `n_triangles`) with zeros for isolated/triangle-free nodes.
    *
    * Scale design (100 TB): the classic degree-ordered orientation.
    * Each undirected edge is directed from its (degree, id)-smaller
    * endpoint to the larger; every triangle then has exactly one pivot
    * whose two out-edges form the wedge, so each triangle is enumerated
    * exactly once, and — the load-bearing property — every out-degree
    * is O(√m) on ANY graph, so the wedge self-join's fan-out is bounded
    * even when a hub holds half the edges. A naive src-src self-join
    * without the orientation is quadratic in the hub degree; this is
    * the standard distributed formulation (Suri & Vassilvitskii's MR
    * triangle counting). Data flow: two hash joins to attach endpoint
    * degrees, one self-equi-join on the pivot, one equi-join to close
    * the wedge, one hash aggregation — no window, no cartesian.
    * Everything is count arithmetic on Longs: bit-identical across
    * engines and shuffle orders.
    */
  def triangleCounts(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val oriented = orientByDegree(edges, deg)
    // Wedges at the pivot: two out-edges, ordered by the same total
    // order so (v, w) is emitted once and, if connected, the closing
    // edge is oriented v→w.
    val w1 = oriented.select(col("src"), col("dst").as("tv"),
      col("ddeg").as("tvdeg"))
    val w2 = oriented.select(col("src"), col("dst").as("tw"),
      col("ddeg").as("twdeg"))
    val wedges = w1.join(w2, Seq("src"))
      .filter(struct(col("tvdeg"), col("tv")) < struct(col("twdeg"), col("tw")))
    val closing = oriented.select(col("src").as("tv"), col("dst").as("tw"))
    val tri = wedges.join(closing, Seq("tv", "tw"))
      .select(col("src").as("u"), col("tv"), col("tw"))
    val perNode = tri.select(explode(array(col("u"), col("tv"), col("tw")))
        .as("v"))
      .groupBy("v").agg(count(lit(1)).as("nt"))
    nodes.select(col("v"))
      .join(deg, Seq("v"), "left")
      .join(perNode, Seq("v"), "left")
      .select(col("v"), coalesce(col("deg"), lit(0L)).as("degree"),
        coalesce(col("nt"), lit(0L)).as("n_triangles"))
  }

  /** Exact radius-2 truncated harmonic centrality over an undirected
    * simple graph (canonical `(a, b)` edges, a < b): per node,
    * `h(v) = Σ_{u : 0 < dist(u,v) ≤ 2} 1 / dist(u,v)` — the centrality
    * the web-corpus-quality literature actually uses (harmonic, not
    * closeness, because it is defined on disconnected graphs; the
    * radius-2 truncation is what makes the EXACT form computable —
    * distance-1 is the adjacency, distance-2 is one wedge join).
    * Output is integer fixed-point in 1/840ths (840 = lcm(1..8), so
    * the per-distance division is exact): `harmonic_x840 =
    * n1 * 840 + n2 * 420` with the per-radius neighbor counts
    * alongside — bit-identical across engines and shuffle orders.
    *
    * Scale shape: the wedge join's output is the distance-≤2 pair set
    * itself — inherently Σ deg(w)² over pivots, so the exact form is
    * for graphs with bounded degree (the generator graphs here) or as
    * the CALIBRATION ground truth for a sketch-based neighborhood
    * function (HyperBall-style) on hub-heavy graphs, the same
    * exact-vs-approx pairing sim8/dd17 use. Both joins are equi-joins
    * on node ids; the distinct and the anti-join (drop pairs already at
    * distance 1) shuffle the pair set once each. */
  def harmonicR2(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // Adjacency in both directions; rows unique because canonical
    // (a < b) edges are.
    val adj = edges.select(col("a").as("v"), col("b").as("u"))
      .unionAll(edges.select(col("b").as("v"), col("a").as("u")))
    val d2 = adj.select(col("v"), col("u").as("w"))
      .join(adj.select(col("v").as("w"), col("u")), "w")
      .filter(col("v") =!= col("u"))
      .select(col("v"), col("u")).distinct()
      .join(adj, Seq("v", "u"), "left_anti") // exactly distance 2
    val n1 = adj.groupBy("v").agg(count(lit(1)).as("n1"))
    val n2 = d2.groupBy("v").agg(count(lit(1)).as("n2"))
    nodes.select(col("v"))
      .join(n1, Seq("v"), "left")
      .join(n2, Seq("v"), "left")
      .select(col("v"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"))
      .withColumn("harmonic_x840",
        col("n1") * lit(840L) + col("n2") * lit(420L))
  }

  /** Bounded k-minimum-values buffer: the k smallest DISTINCT Longs seen,
    * kept as a sorted ascending array that NEVER exceeds k entries —
    * insert is a binary search + bounded copy, merge is a linear k-min
    * of two already-k-bounded sorted arrays (the Misra-Gries /
    * topKByScore bounded-state discipline). This is what makes
    * [[kmvNeighborhood]]'s per-group state O(k) even at a 10⁷-degree
    * hub: an unbounded `collect_set` would materialize the hub's entire
    * neighbor hash set on one reducer before truncating. k-min is
    * associative and commutative over distinct values, so any merge
    * tree yields byte-identical sketches — hash-gate safe. */
  final case class KMinDistinct(k: Int)
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(k >= 1, "k-min capacity must be positive")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present — KMV is over distinct values
      else {
        val ins = -pos - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins < k) { // displaces the current max
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        } else buf // not among the k smallest
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val take =
          if (j >= b.length) { val x = a(i); i += 1; x }
          else if (i >= a.length) { val x = b(j); j += 1; x }
          else if (a(i) < b(j)) { val x = a(i); i += 1; x }
          else if (b(j) < a(i)) { val x = b(j); j += 1; x }
          else { val x = a(i); i += 1; j += 1; x } // same hash in both
        out(n) = take; n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(buf: Array[Long]): Seq[Long] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(buf)

    override def bufferEncoder: Encoder[Array[Long]] =
      Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Sketch-based neighborhood function (HyperBall's data flow with a
    * KMV distinct-count sketch instead of HyperLogLog): per node, the
    * estimated |ball(v, r)| for r = 1, 2 over an undirected simple
    * graph, where ball includes the node itself. The KMV sketch of a
    * set is its k smallest md5-derived 32-bit hashes — MERGEABLE
    * (kmin(A ∪ B) = kmin(kmin(A) ∪ kmin(B))), so round r is one
    * edge join + a k-min re-aggregation of round r−1's sketches:
    * per-round state is O(nodes · k) regardless of how large the balls
    * grow, which is the whole point at 100 TB (the exact form's state
    * is the ball pair set itself — [[harmonicR2]]). The k-min itself is
    * the bounded [[KMinDistinct]] aggregator, so even a single hub
    * node's aggregation buffer holds at most k hashes at any moment —
    * partial (map-side) combines already run k-bounded before the
    * exchange. Estimates are
    * deterministic integers: a sketch smaller than k IS the exact
    * count; a full sketch estimates (k−1) · 2³² div (kth-min + 1)
    * (+1 so a zero hash cannot divide by zero) — the md5 draw and the
    * integer arithmetic replay bit-identically in the oracle, the
    * sampling ops' engine-portable-draw discipline.
    *
    * Output: (v, ball1_est, ball2_est). Calibration against the exact
    * radius-2 truth is the companion query's job (gr5 joins
    * [[harmonicR2]]'s counts — the sim8/dd17 exact-vs-approx pairing).
    */
  def kmvNeighborhood(nodes: DataFrame, edges: DataFrame, k: Int,
      seed: String): DataFrame = {
    require(k >= 2 && k <= 1024, s"kmv k $k outside [2, 1024]")
    val adjS = edges.select(col("a").as("v"), col("b").as("u"))
      .unionAll(edges.select(col("b").as("v"), col("a").as("u")))
      .unionAll(nodes.select(col("v"), col("v").as("u"))) // self: ball ∋ v
    val h = conv(substring(
        md5(concat(lit(seed + ":"), col("u").cast("string"))), 1, 8),
      16, 10).cast("long")
    val kminAgg = udaf(KMinDistinct(k), Encoders.scalaLong)
    def kmin(df: DataFrame): DataFrame = df.groupBy("v")
      .agg(kminAgg(col("h")).as("sk"))
    val s1 = kmin(adjS.select(col("v"), h.as("h")))
    val s2 = kmin(adjS
      .join(s1.select(col("v").as("u"), col("sk")), "u")
      .select(col("v"), explode(col("sk")).as("h")))
    val num = (k - 1).toLong * 4294967296L
    // `div` (not `/`) keeps the estimate in exact integer arithmetic.
    def est(skName: String): Column =
      when(size(col(skName)) < k, size(col(skName)).cast("long"))
        .otherwise(expr(
          s"CAST(${num}L div (element_at($skName, $k) + 1L) AS BIGINT)"))
    s1.withColumn("ball1_est", est("sk")).drop("sk")
      .join(s2.withColumn("ball2_est", est("sk")).drop("sk"), "v")
  }

  /** The load-bearing step of [[triangleCounts]], exposed so its
    * defining property — every out-degree O(√m) on ANY graph — is
    * directly testable: each canonical edge (a < b) is directed from
    * its (degree, id)-SMALLER endpoint to the larger, carrying the
    * destination's degree for the wedge ordering. */
  private[functions] def orientByDegree(edges: DataFrame,
      deg: DataFrame): DataFrame = {
    val withDeg = edges
      .join(deg.select(col("v").as("a"), col("deg").as("dega")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("degb")), "b")
    val aFirst = struct(col("dega"), col("a")) < struct(col("degb"), col("b"))
    withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("degb")).otherwise(col("dega")).as("ddeg"))
  }

  /** k-core peeling TO CONVERGENCE, `rounds`-capped: each round removes
    * every node whose degree within the surviving subgraph is < k; the
    * loop exits as soon as a round peels nothing — at that point the
    * alive set IS the k-core (peeling is monotone: a round that removes
    * no node proves every survivor has degree ≥ k among survivors, the
    * k-core's defining fixpoint; extra rounds are no-ops). `rounds`
    * stays as a CAP bounding how deep a peeling cascade may propagate —
    * a cap below the graph's peel depth returns the partially-peeled
    * set, NOT the k-core (the `info` fields below make that observable
    * instead of silent). The fixpoint exit costs nothing extra: the
    * per-round count was already paid to materialize the alive set.
    *
    * The dense backbone this extracts (link-farm/community cores) is
    * the complement of PageRank's authority view and gr2's triangle
    * density.
    *
    * Returns (v, in_core, core_degree): membership in the converged
    * (or cap-truncated) surviving set and the degree within that FINAL
    * subgraph (0 for peeled/isolated nodes). `info("rounds_run")`
    * counts executed rounds INCLUDING the final nothing-peeled probe
    * round; `info("converged")` is 1 iff the fixpoint was reached
    * within the cap. Scale shape per round: two semi-join-like
    * equi-joins restricting the edge list to survivors + one hash
    * aggregation — alive sets persist(MEMORY_AND_DISK) and ping-pong
    * like pageRank's ranks, so peak footprint is two alive tables.
    * All-integer counts: engine-exact. */
  def kCore(nodes: DataFrame, edges: DataFrame, k: Int,
      rounds: Int): Materialized = {
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    var alive = nodes.select(col("v")).persist(StorageLevel.MEMORY_AND_DISK)
    var aliveCount = alive.count()
    def degreesWithin(a: DataFrame): DataFrame = e
      .join(a.select(col("v").as("a")), "a")
      .join(a.select(col("v").as("b")), "b")
      .select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    var i = 0
    var converged = false
    while (i < rounds && !converged) {
      val next = degreesWithin(alive).filter(col("deg") >= k)
        .select("v").persist(StorageLevel.MEMORY_AND_DISK)
      val c = next.count()
      i += 1
      if (c == aliveCount) {
        // next ⊆ alive by construction, so equal counts ⇒ equal sets:
        // nothing peeled, fixpoint reached. Keep the CURRENT alive set
        // (identical contents, already persisted) and drop the probe.
        converged = true
        next.unpersist()
      } else {
        alive.unpersist()
        alive = next
        aliveCount = c
        // An emptied alive set is trivially the fixpoint — no probe
        // round needed (nothing can reappear to peel).
        if (aliveCount == 0L) converged = true
      }
    }
    val finalDeg = degreesWithin(alive)
    // `e` and the final `alive` stay persisted: the returned frame's
    // final-degree computation reads BOTH, so an eager unpersist here
    // would force the edge build to re-execute on the caller's first
    // action. The Materialized handle owns their release.
    val out = nodes.select(col("v"))
      .join(alive.withColumn("in_core", lit(true)), Seq("v"), "left")
      .join(finalDeg, Seq("v"), "left")
      .select(col("v"), coalesce(col("in_core"), lit(false)).as("in_core"),
        coalesce(col("deg"), lit(0L)).as("core_degree"))
    Materialized(out, Seq(e, alive),
      Map("rounds_run" -> i.toLong, "converged" -> (if (converged) 1L else 0L)))
  }

  /** One damped round (lazy — exposed so specs can pin the iteration's
    * physical plan: equi-joins on `src`, one hash aggregation on `dst`,
    * no nested loop, no window). */
  def round(nodes: DataFrame, edges: DataFrame, deg: DataFrame,
      rank: DataFrame, base: Long, dampingPct: Int): DataFrame = {
    val contrib = edges
      .join(deg, "src")
      .join(rank.withColumnRenamed("v", "src"), "src")
      .select(col("dst").as("v"), expr("r div deg").as("c"))
      .groupBy("v").agg(sum("c").as("cs"))
    nodes.select(col("v"))
      .join(contrib, Seq("v"), "left")
      .select(col("v"),
        (lit(base) +
          expr(s"($dampingPct * coalesce(cs, 0L)) div 100")).as("r"))
  }
}
