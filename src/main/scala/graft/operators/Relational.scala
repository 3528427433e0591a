package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational building blocks shared by the query layer.
  *
  * These reproduce the query idioms of the reference
  * (/root/reference/accounts/api.py, pots/api.py, lists/api.py): semi-join
  * via EXISTS, distinct-project-then-IN, latest-per-group, last-writer-wins
  * dedup, page slicing. All are expressed on the DataFrame API so Catalyst
  * keeps predicate pushdown / column pruning / join strategy selection.
  */
object Relational {

  /** EXISTS-style semi join (reference: accounts/api.py:82-83 `Exists`
    * subquery — "accounts having at least one donation").
    * Catalyst plans a LeftSemi hash join; at scale the right side is
    * pre-projected to the key column only, so the shuffle carries keys, not
    * rows.
    */
  def semiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  /** NOT EXISTS / set-difference on key (reference: ignore_conflicts insert,
    * utils.py:97-99 and new-account discovery utils.py:892-918).
    */
  def antiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  /** Latest row per group, with a total-order tie-break so results are
    * deterministic (reference: tokens/models.py:56-57 latest price).
    * One shuffle on the group keys; at 100 TB prefer pre-bucketed layout on
    * the same keys so the window is shuffle-free.
    */
  def latestPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Last-writer-wins dedup on a natural key — the core of the upsert
    * semantics (reference: update_or_create keyed on natural keys,
    * utils.py:978-982; conditional unique constraints
    * donations/models.py:188-200). `seq` columns define "later": in ingest
    * they are (block_height, shard_index, receipt_index, action_index).
    */
  def lwwDedup(df: DataFrame, keys: Seq[String], seq: Seq[Column]): DataFrame =
    latestPerGroup(df, keys, seq.map(_.desc))

  /** Deterministic page slice (reference: PageNumberPagination,
    * api/pagination.py:8-24; default page_size 30). `order` must be a
    * total order (include a unique tie-break) for stable pages.
    *
    * Implemented as sort + offset + limit, which Catalyst plans as ONE
    * `TakeOrderedAndProject(limit = page·size, offset)` — each partition
    * keeps a bounded top-(page·size) heap and the driver merges those
    * few rows. No global row_number window (the previous shape), which
    * funneled the ENTIRE input through a single-partition sort: offset
    * pagination stays O(page·size) per partition at any table size.
    * Deep offsets still pay page·size heap entries everywhere — that is
    * inherent to offset semantics; [[keysetSlice]] is the constant-cost
    * scale path.
    */
  def pageSlice(df: DataFrame, order: Seq[Column], page: Int, pageSize: Int): DataFrame = {
    require(page >= 1, s"page $page must be >= 1")
    require(pageSize >= 1, s"pageSize $pageSize must be >= 1")
    // Long arithmetic, not multiplyExact: a large-but-valid page number
    // (?page=100000000 over HTTP) used to overflow Int here and surface
    // as a 500, where the route contract is "past the end" (DRF answers
    // 404 Invalid page.). The bound is offset + LIMIT: Spark rejects
    // limit+offset sums above Int.MaxValue at analysis
    // (SUM_OF_LIMIT_AND_OFFSET_EXCEEDS_MAX_INT), so guarding the offset
    // alone still 500s on the last representable pages. An unaddressable
    // slice fails LOUD with the typed [[PageOffsetOverflow]] — a library
    // caller must never mistake "offset beyond Spark's Int ceiling" for
    // "genuinely empty page". The serving layer (QueryService/
    // QueryServer) catches it and keeps the document semantics: 404
    // past-the-end first, typed 400 pointing at keyset for a
    // within-range-but-unaddressable page on a >2.1B-row set.
    val lo = (page.toLong - 1L) * pageSize
    if (lo > Int.MaxValue.toLong - pageSize)
      throw new PageOffsetOverflow(page, pageSize)
    df.orderBy(order: _*).offset(lo.toInt).limit(pageSize)
  }

  /** Thrown by [[pageSlice]] when (page-1)·pageSize + pageSize exceeds
    * Spark's Int-bounded offset+limit ceiling. */
  final class PageOffsetOverflow(page: Int, pageSize: Int)
    extends RuntimeException(
      s"page $page at pageSize $pageSize exceeds the addressable offset range")

  /** Keyset (seek) pagination — the scale path that replaces pageSlice's
    * global row_number window. `order` is (column, ascending) pairs that
    * must form a total order (include a unique tie-break); `after` carries
    * the previous page's last row's values for those columns. The
    * continuation predicate is the lexicographic "row > after" —
    * (k1 > v1) OR (k1 = v1 AND k2 > v2) … with comparisons flipped on
    * descending keys — which Catalyst pushes into the scan; the sort+limit
    * then plans as TakeOrderedAndProject (per-partition top-k, k-row
    * driver merge). No global window, no single-partition shuffle: page N
    * costs the same as page 1 at any table size.
    */
  def keysetSlice(
      df: DataFrame,
      order: Seq[(Column, Boolean)],
      after: Option[Seq[Any]],
      pageSize: Int): DataFrame = {
    val filtered = after match {
      case None => df
      case Some(vals) =>
        require(vals.length == order.length,
          s"after must carry one value per order key (${order.length})")
        // Null-aware lexicographic continuation. Spark sorts nulls FIRST
        // on asc and LAST on desc, so "beyond a non-null value" must admit
        // null keys on desc (they sort after every value), and "beyond a
        // null value" on asc is simply "is not null". Strict comparisons
        // alone would silently drop null-keyed rows from every later page.
        val continue = order.zip(vals).foldRight(lit(false): Column) {
          case (((c, asc), v), rest) =>
            val beyond =
              if (v == null) { if (asc) c.isNotNull else lit(false) }
              else { if (asc) c > lit(v) else (c < lit(v) || c.isNull) }
            beyond || (c <=> lit(v) && rest)
        }
        df.filter(continue)
    }
    filtered
      .orderBy(order.map { case (c, asc) => if (asc) c.asc else c.desc }: _*)
      .limit(pageSize)
  }

  /** Top-k with deterministic tie-break. Catalyst plans sort+limit as
    * TakeOrderedAndProject — per-partition top-k then a k-row merge on the
    * driver; no global shuffle, safe at 100 TB.
    */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Skew-resistant equi-join: salt the skewed (left) side's key into
    * `salts` sub-keys and explode the build (right) side to match, so one
    * hot key spreads over `salts` reducers. AQE's skew-join handles most
    * cases at runtime; explicit salting is for the pathological keys known
    * in advance (e.g. a mega-donor account at 100 TB). */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      salts: Int, joinType: String = "inner",
      saltCols: Seq[Column] = Nil): DataFrame = {
    // Right/full outer would emit `salts` null-padded copies of every
    // unmatched right key (the right side is exploded) — reject upfront.
    require(Set("inner", "left", "left_outer", "left_semi", "cross").contains(joinType),
      s"saltedJoin supports left-preserving joins only, got $joinType")
    // The salt is CONTENT-DETERMINISTIC (xxhash64 over every left column,
    // or the caller's `saltCols`), NOT monotonically_increasing_id/rand:
    // those mark the map stage INDETERMINATE, and on a fetch failure at
    // cluster scale Spark must rerun indeterminate stages wholesale —
    // aborting the job outright when already-committed result partitions
    // depend on one (the SPARK-23207 class). The join result never
    // depends on the salt value (the dim side carries every salt), so
    // determinism costs nothing semantically; the one trade-off is that
    // byte-identical duplicate left rows share a salt — spreading is then
    // bounded by full-row duplicate multiplicity, and a caller whose skew
    // IS identical rows passes a discriminating column set via saltCols.
    val spread = if (saltCols.nonEmpty) saltCols
                 else left.columns.toIndexedSeq.map(col)
    val l = left.withColumn("__salt",
      pmod(xxhash64(spread: _*), lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"), joinType)
      .drop("__salt")
  }

  /** Seeded pseudo-random single pick per group (reference:
    * lists/api.py:216-223 `random_registration`). Instead of `rand()` —
    * which is per-run nondeterministic and breaks replay/caching — we order
    * by md5 of the key: stable across runs and engines, uniformly
    * distributed over the key space.
    */
  def pseudoRandomPickPerGroup(df: DataFrame, group: Seq[String], key: Column): DataFrame =
    latestPerGroup(df, group, Seq(md5(key.cast("binary")).asc, key.asc))

  /** EXACT per-group percentiles for discrete value domains (token
    * counts, lengths, scores quantized to integers) — the scale-correct
    * alternative to `percentile()`: a counting construction whose state
    * is bounded by DISTINCT values per group, not rows per group, so a
    * billion-row group costs the same as a thousand-row one. The value
    * picked is the smallest v whose cumulative count reaches ⌈p·n⌉ (the
    * lower / "type 1" quantile — no interpolation). The rank threshold
    * is computed in EXACT decimal arithmetic on the shortest decimal
    * representation of `p` (p = 0.07 means exactly 7/100 — never the
    * 0.07000…01 of its binary double), so the contract holds at any n
    * and any engine reproduces it bit-for-bit (DuckDB's literal math is
    * already decimal-exact; a double-typed ceil would drift from it on
    * boundary-crossing n·p).
    *
    * NULL values carry no rank information and are excluded — every
    * percentile is over the non-null values (a NULL would otherwise sort
    * first and shift every rank).
    *
    * Plan shape: one (group, value) pre-aggregation (map-side combined;
    * nothing is keyed by value alone), a cumulative window over the
    * distinct-value table (bounded, never the raw rows), one final
    * per-group fold. `ps` maps output column name → percentile.
    * `totals` optionally names two extra output columns — non-null row
    * count and value sum per group — derived from the counts table for
    * free, saving callers a second full scan of the input. */
  def discretePercentiles(df: DataFrame, keys: Seq[String], valueCol: String,
      ps: Seq[(String, Double)],
      totals: Option[(String, String)] = None): DataFrame = {
    require(ps.nonEmpty, "no percentiles requested")
    require(ps.forall { case (_, p) => p > 0.0 && p <= 1.0 },
      s"percentiles must be in (0,1]: $ps")
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val wt = Window.partitionBy(keys.map(col): _*)
    val cum = counts
      .withColumn("__cum", sum("__c").over(w))
      .withColumn("__tot", sum("__c").over(wt))
    val aggs = ps.map { case (name, p) =>
      // BigDecimal.valueOf uses the double's shortest decimal form —
      // exact decimal multiply + ceil, matching DuckDB's literal typing.
      val threshold = ceil(col("__tot") * lit(java.math.BigDecimal.valueOf(p)))
      min(when(col("__cum") >= threshold, col(valueCol))).as(name)
    } ++ totals.toSeq.flatMap { case (nRowsCol, sumCol) =>
      Seq(sum("__c").as(nRowsCol),
        sum(col(valueCol) * col("__c")).as(sumCol))
    }
    cum.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
