package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Operator-level semantics: the ±24h as-of boundary (FIXTURES §2 price
  * fixture: rows at +1h/+23h/+25h), LWW ordering, pagination windows. */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("asof join: nearest within ±24h, outside-window rows excluded (J6)") {
    val donations = Seq(
      ("d1", "near", java.sql.Timestamp.valueOf("2024-06-10 00:00:00"))
    ).toDF("id", "token", "ts")
    val prices = Seq(
      ("near", java.sql.Timestamp.valueOf("2024-06-10 01:00:00"), 1.0), // +1h
      ("near", java.sql.Timestamp.valueOf("2024-06-10 23:00:00"), 2.0), // +23h
      ("near", java.sql.Timestamp.valueOf("2024-06-11 01:00:00"), 3.0), // +25h
      ("other", java.sql.Timestamp.valueOf("2024-06-10 00:00:00"), 9.0)
    ).toDF("token", "pts", "price")

    val out = AsOfJoin.nearest(donations, prices,
      Seq("token"), Seq("token"), "ts", "pts",
      tolerance = 86400, leftId = "id", rightTieBreak = "pts")
    val rows = out.select(col("l.id"), col("r.price"), col("__delta_us")).collect()
    assert(rows.length == 1)
    assert(rows(0).getDouble(1) == 1.0) // nearest, not just any in window
    assert(rows(0).getLong(2) == 3600L * 1000000)
  }

  test("asof join: no price within window -> row absent (enrichment skips)") {
    val donations = Seq(("d1", "near",
      java.sql.Timestamp.valueOf("2024-06-20 00:00:00"))).toDF("id", "token", "ts")
    val prices = Seq(("near",
      java.sql.Timestamp.valueOf("2024-06-10 00:00:00"), 1.0)).toDF("token", "pts", "price")
    assert(AsOfJoin.nearest(donations, prices, Seq("token"), Seq("token"),
      "ts", "pts", 86400, "id", "pts").count() == 0)
  }

  test("asof left join keeps unmatched fact rows with null lookup (enrichment contract)") {
    val donations = Seq(
      ("d1", "near", java.sql.Timestamp.valueOf("2024-06-10 00:00:00")),
      ("d2", "unknown.token", java.sql.Timestamp.valueOf("2024-06-10 00:00:00"))
    ).toDF("id", "token", "ts")
    val prices = Seq(("near",
      java.sql.Timestamp.valueOf("2024-06-10 01:00:00"), 1.5)).toDF("token", "pts", "price")
    val out = AsOfJoin.nearest(donations, prices, Seq("token"), Seq("token"),
      "ts", "pts", 86400, "id", "pts", joinType = "left")
      .select(col("l.id"), col("r.price")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out == Map("d1" -> Some(1.5), "d2" -> None)) // no row vanished
  }

  test("asof before: latest at-or-before within lookback; future rows never match (J13)") {
    val donations = Seq(
      ("d1", "near", java.sql.Timestamp.valueOf("2024-06-10 12:00:00"))
    ).toDF("id", "token", "ts")
    val prices = Seq(
      ("near", java.sql.Timestamp.valueOf("2024-06-10 11:00:00"), 1.0), // -1h  <- latest before
      ("near", java.sql.Timestamp.valueOf("2024-06-10 02:00:00"), 2.0), // -10h
      ("near", java.sql.Timestamp.valueOf("2024-06-10 12:30:00"), 3.0), // +30m: AFTER, excluded
      ("near", java.sql.Timestamp.valueOf("2024-06-09 11:00:00"), 4.0)  // -25h: beyond lookback
    ).toDF("token", "pts", "price")
    val rows = AsOfJoin.before(donations, prices,
        Seq("token"), Seq("token"), "ts", "pts",
        lookback = 86400, leftId = "id", rightTieBreak = "pts")
      .select(col("l.id"), col("r.price"), col("__lag_us")).collect()
    assert(rows.length == 1)
    assert(rows(0).getDouble(1) == 1.0) // -1h beats -10h; +30m and -25h excluded
    assert(rows(0).getLong(2) == 3600L * 1000000)
  }

  test("asof before: exact-timestamp row matches at lag 0; left keeps unmatched") {
    val donations = Seq(
      ("d1", "near", java.sql.Timestamp.valueOf("2024-06-10 12:00:00")),
      ("d2", "cold", java.sql.Timestamp.valueOf("2024-06-10 12:00:00"))
    ).toDF("id", "token", "ts")
    val prices = Seq(
      ("near", java.sql.Timestamp.valueOf("2024-06-10 12:00:00"), 5.0), // lag 0 admitted
      ("cold", java.sql.Timestamp.valueOf("2024-06-10 13:00:00"), 9.0)  // future only
    ).toDF("token", "pts", "price")
    val out = AsOfJoin.before(donations, prices, Seq("token"), Seq("token"),
        "ts", "pts", 86400, "id", "pts", joinType = "left")
      .select(col("l.id"), col("r.price")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out == Map("d1" -> Some(5.0), "d2" -> None))
  }

  test("asof with zero tolerance/lookback matches exact timestamps only") {
    // The degenerate bound can't form time buckets (bucket width 0), so
    // it must route around the hot-key guard instead of silently losing
    // every match to a null bucket key.
    val donations = Seq(
      ("d1", "near", java.sql.Timestamp.valueOf("2024-06-10 12:00:00")),
      ("d2", "near", java.sql.Timestamp.valueOf("2024-06-10 12:00:01"))
    ).toDF("id", "token", "ts")
    val prices = Seq(
      ("near", java.sql.Timestamp.valueOf("2024-06-10 12:00:00"), 5.0)
    ).toDF("token", "pts", "price")
    val near = AsOfJoin.nearest(donations, prices, Seq("token"), Seq("token"),
        "ts", "pts", tolerance = 0, leftId = "id", rightTieBreak = "pts")
      .select(col("l.id"), col("r.price")).collect()
    assert(near.map(r => r.getString(0) -> r.getDouble(1)).toMap ==
      Map("d1" -> 5.0)) // d2 is 1s off: excluded at tolerance 0
    val bef = AsOfJoin.before(donations, prices, Seq("token"), Seq("token"),
        "ts", "pts", lookback = 0, leftId = "id", rightTieBreak = "pts")
      .select(col("l.id"), col("r.price")).collect()
    assert(bef.map(r => r.getString(0) -> r.getDouble(1)).toMap ==
      Map("d1" -> 5.0))
  }

  test("mergePartitioned rejects partition values needing Hive escaping") {
    val df = Seq(("k", "2024-06-01 00:00:00", 1L)).toDF("key", "day", "seqno")
    val e = intercept[IllegalArgumentException] {
      MergeWriter.mergePartitioned(spark, df, tmpDir("pm") + "/t",
        Seq("key"), Seq("seqno"), "day")
    }
    assert(e.getMessage.contains("Hive escaping"))
  }

  test("lwwDedup keeps greatest seq; pageSlice window matches limit/offset") {
    val df = Seq(("k", 1, "old"), ("k", 2, "new"), ("j", 5, "only"))
      .toDF("key", "seq", "v")
    val lww = Relational.lwwDedup(df, Seq("key"), Seq(col("seq"))).collect()
    assert(lww.map(r => r.getString(0) -> r.getString(2)).toMap ==
      Map("k" -> "new", "j" -> "only"))

    val nums = (1 to 100).toDF("n")
    val paged = Relational.pageSlice(nums, Seq(col("n").asc), page = 4, pageSize = 10)
    assert(paged.collect().map(_.getInt(0)).toSeq == (31 to 40))
    // the slice must plan as one bounded TakeOrderedAndProject, not a
    // global row_number window through a single reducer
    val plan = paged.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Window"), plan)
    // a page past the end is empty, a ragged last page is partial
    assert(Relational.pageSlice(nums, Seq(col("n").asc), 11, 10).isEmpty)
    assert(Relational.pageSlice(nums, Seq(col("n").asc), 7, 15)
      .collect().map(_.getInt(0)).toSeq == (91 to 100))
    // an offset beyond Spark's Int-bounded offset+limit ceiling fails
    // LOUD with the typed overflow — a library caller must never read
    // "unaddressable" as "empty page" (the serving layer alone degrades)
    intercept[Relational.PageOffsetOverflow] {
      Relational.pageSlice(nums, Seq(col("n").asc), Int.MaxValue, 10000)
    }
  }

  test("saltedJoin equals plain join under skew") {
    val facts = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i)).toDF("key", "v")
    val dims = Seq(("hot", "H"), ("k950", "X")).toDF("dkey", "name")
    val plain = facts.join(dims, facts("key") === dims("dkey")).count()
    val salted = Relational.saltedJoin(facts, dims, "key", "dkey", salts = 8).count()
    assert(salted == plain && plain == 901)
  }

  test("pseudoRandomPickPerGroup is deterministic across runs (O5)") {
    val df = (1 to 50).map(i => (i % 3, i)).toDF("g", "id")
    val pick1 = Relational.pseudoRandomPickPerGroup(df, Seq("g"), col("id").cast("string"))
      .orderBy("g").collect().map(_.getInt(1)).toSeq
    val pick2 = Relational.pseudoRandomPickPerGroup(df, Seq("g"), col("id").cast("string"))
      .orderBy("g").collect().map(_.getInt(1)).toSeq
    assert(pick1 == pick2 && pick1.size == 3)
  }

  test("keysetSlice: null order keys survive the continuation (desc sorts nulls last)") {
    val df = Seq(
      (java.lang.Long.valueOf(3L), "a"), (java.lang.Long.valueOf(2L), "b"),
      (null.asInstanceOf[java.lang.Long], "c"),
      (null.asInstanceOf[java.lang.Long], "d")
    ).toDF("k", "id")
    val order = Seq((col("k"), false), (col("id"), true))
    def ids(after: Option[Seq[Any]]) =
      Relational.keysetSlice(df, order, after, 2)
        .select("id").collect().map(_.getString(0)).toSeq
    assert(ids(None) == Seq("a", "b"))
    // continuing past the last non-null key must reach the null-key rows
    assert(ids(Some(Seq(2L, "b"))) == Seq("c", "d"))
    // continuing FROM a null key walks the null-key tie-break correctly
    assert(ids(Some(Seq(null, "c"))) == Seq("d"))
  }

  test("discretePercentiles: lower quantile by counting, per group, hand-checked") {
    // g=a values: 1,2,2,3,10 (n=5): p50 → ceil(2.5)=3rd smallest = 2;
    //                               p90 → ceil(4.5)=5th smallest = 10.
    // g=b values: 7 (n=1): every percentile is 7.
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 3L), ("a", 10L),
      ("b", 7L)).toDF("g", "v")
    val out = Relational.discretePercentiles(df, Seq("g"), "v",
        Seq("p50" -> 0.5, "p90" -> 0.9))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("a") == ((2L, 10L)))
    assert(out("b") == ((7L, 7L)))
  }

  test("discretePercentiles: decimal-exact threshold, null exclusion, totals rider") {
    // p = 0.07 over 100 rows must mean rank ceil(7) = 7, not the
    // ceil(7.000000000000001) = 8 of double arithmetic: values 1..100,
    // p07 = 7.
    val hundred = (1L to 100L).map(("g", _)).toDF("g", "v")
    val p07 = Relational.discretePercentiles(hundred, Seq("g"), "v",
      Seq("p07" -> 0.07)).head().getLong(1)
    assert(p07 == 7L)
    // nulls carry no rank: percentiles are over the non-null values, and
    // the totals rider counts/sums only those
    val withNull = Seq(("g", Some(1L)), ("g", Some(2L)), ("g", Some(3L)),
      ("g", None)).toDF("g", "v")
    val r = Relational.discretePercentiles(withNull, Seq("g"), "v",
      Seq("p75" -> 0.75), totals = Some(("n", "s"))).head()
    assert(r.getLong(1) == 3L) // ceil(0.75·3)=3rd of [1,2,3]
    assert(r.getLong(2) == 3L && r.getLong(3) == 6L)
  }
}
