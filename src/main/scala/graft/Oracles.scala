package graft

/** DuckDB oracle SQL for [[SparkEntry.queries]] (driver runs these on the
  * same parquet tables at sf0.01 and hash-compares). Engine-parity notes:
  * regexp_replace needs the 'g' flag in DuckDB (Spark replaces all by
  * default); SUM/COUNT are cast to pin DuckDB's HUGEINT widening back to
  * BIGINT/DOUBLE; double sums run through exact DECIMAL(18,2) on both
  * sides. Queries without an entry here (minhash/simhash/LSH-ANN) are
  * non-SQL-expressible and get the driver's rows-only check.
  */
object Oracles {

  private val norm = raw"lower(regexp_replace(trim(text), '\s+', ' ', 'g'))"

  /** Placeholder Verify substitutes with the run's output directory.
    * Signature-replay oracles read an engine-specific intermediate
    * (minhash/simhash signatures, IVF centroids, k-gram hashes) back from
    * the query's OWN parquet output — those values are trusted input
    * (covered by bit-parity specs) — and independently re-derive
    * everything downstream of them, so the derived rows hash-mismatch on
    * any divergence in band logic, candidate generation, verification
    * arithmetic, ranking or clustering. */
  private val OUT = "$" + "{OUT}"

  /** Word 3-gram shingle set per document — the DuckDB replay of
    * DedupFunctions.shingles(text, 3) (normalize → split → n-grams →
    * distinct), shared by the minhash-verify oracles. */
  private val shingles3Sql: String =
    raw"""SELECT doc_id, list_distinct(list_transform(
      |          generate_series(1, greatest(len(w) - 2, 0)),
      |          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
      |        FROM (SELECT doc_id, string_split($norm, ' ') AS w
      |              FROM documents)""".stripMargin

  /** Inner-product of two DOUBLE[] as a strictly left-to-right fold —
    * bit-compatible with Spark's aggregate(zip_with(...)) evaluation. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> $a[i] * $b[i]), (x, y) -> x + y)"
  private def normSql(a: String): String =
    s"sqrt(list_reduce(list_transform($a, x -> x * x), (x, y) -> x + y))"
  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"

  /** Squared L2 of two DOUBLE[] as a strictly left-to-right fold —
    * bit-compatible with Similarity.l2Sq's aggregate(zip_with(...)). */
  private def l2Sql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (x, y) -> x + y)"

  private val langProfiles = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " de "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "))

  private def occSql(padded: String, w: String): String =
    s"CAST((length($padded) - length(replace($padded, '$w', ''))) / ${w.length} AS BIGINT)"

  private val langScoreCols: String = langProfiles.map { case (lang, ws) =>
    ws.map(w => occSql("p", w)).mkString("(", " + ", s") AS s_$lang")
  }.mkString(", ")

  val sql: Map[String, String] = Map(
    "q_p1_distinct_project" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_p2_eq_filter" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin,

    "q_p4_null_predicate" ->
      """SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_nn FROM orders
        |WHERE NULLIF(o_orderstatus, 'O') IS NOT NULL ORDER BY o_orderkey""".stripMargin,

    "q_p5_disjunctive" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
        |WHERE l_returnflag = 'R' OR l_discount > 0.09 OR l_quantity >= 49
        |   OR l_tax < 0.001 OR l_shipdate >= TIMESTAMP '2001-06-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_p6_interval" ->
      """SELECT o_orderkey, o_orderdate FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate <= TIMESTAMP '1997-12-31'
        |ORDER BY o_orderkey""".stripMargin,

    "q_p7_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
        |  AND CAST(json_extract_string(props, '$.k') AS BIGINT) >= 10
        |  AND CAST(json_extract_string(props, '$.k') AS BIGINT) < 50
        |ORDER BY event_id""".stripMargin,

    "q_p8_regex_dispatch" ->
      """SELECT route, CAST(COUNT(*) AS BIGINT) AS n_docs FROM (
        |  SELECT CASE WHEN regexp_matches(source, '^src[0-2]$') THEN 'primary'
        |              WHEN regexp_matches(source, '^src[0-9]+$') THEN 'secondary'
        |              ELSE 'unrouted' END AS route
        |  FROM documents)
        |GROUP BY route ORDER BY route""".stripMargin,

    "q_p11_base64" ->
      """SELECT doc_id, to_base64(encode(substr(text, 1, 16))) AS b64,
        |       CAST(length(decode(from_base64(to_base64(encode(substr(text, 1, 16)))))) AS BIGINT)
        |         AS roundtrip_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_f1_amount_scale" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice / power(10, l_linenumber % 3) AS scaled
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_f2_fee_math" ->
      """SELECT o_orderkey,
        |       CAST(total - pf - COALESCE(rf, 0) AS DOUBLE) AS net_usd,
        |       CAST(pf AS DOUBLE) AS protocol_fee_usd
        |FROM (SELECT o_orderkey,
        |             CAST(o_totalprice AS DECIMAL(18,2)) AS total,
        |             CAST(o_totalprice AS DECIMAL(18,2)) * CAST(0.05 AS DECIMAL(3,2)) AS pf,
        |             CASE WHEN o_orderstatus = 'F'
        |                  THEN CAST(o_totalprice AS DECIMAL(18,2)) * CAST(0.01 AS DECIMAL(3,2))
        |             END AS rf
        |      FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q_f4_ts_convert" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms,
        |       make_timestamp(epoch_ms(ts) * 1000) AS ts_rebuilt
        |FROM events ORDER BY event_id""".stripMargin,

    "q_f5_date_key" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%d-%m-%Y') AS date_key
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_f6_digit_guard" ->
      """SELECT c_custkey,
        |       CAST(NULLIF(regexp_extract(c_name, '([0-9]+)', 1), '') AS BIGINT) AS cust_num
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_f9_slugify" ->
      raw"""SELECT p_partkey,
        |       regexp_replace(lower(concat_ws(' ', p_brand, p_type, p_name)),
        |                      '[^a-z0-9]+', '-', 'g') AS slug
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_j1_fk_expand" ->
      """SELECT o_orderkey, c_name, n_name, r_name
        |FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_j2_exists_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_j4_distinct_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_custkey IN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q_j5_global_stats" ->
      """SELECT * FROM
        |(SELECT CAST(COUNT(*) AS BIGINT) AS orders_count,
        |        CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS unique_customers,
        |        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_usd
        | FROM orders) a,
        |(SELECT CAST(COUNT(*) AS BIGINT) AS lineitem_count,
        |        CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS unique_parts
        | FROM lineitem) b""".stripMargin,

    "q_j6_asof_join" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT * FROM events WHERE event_type = 'view'),
        |     j AS (SELECT p.event_id AS purchase_id, v.event_id AS view_id,
        |                  abs(epoch_us(p.ts) - epoch_us(v.ts)) AS delta_us,
        |                  p.value * v.value AS usd_value,
        |                  ROW_NUMBER() OVER (PARTITION BY p.event_id
        |                    ORDER BY abs(epoch_us(p.ts) - epoch_us(v.ts)) ASC,
        |                             v.event_id ASC) AS rn
        |           FROM p JOIN v ON p.user_id = v.user_id
        |            AND abs(epoch_us(p.ts) - epoch_us(v.ts)) <= 86400000000)
        |SELECT purchase_id, view_id, delta_us, usd_value FROM j WHERE rn = 1
        |ORDER BY purchase_id""".stripMargin,

    "q_j13_asof_before" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |     v AS (SELECT * FROM events WHERE event_type = 'view'),
        |     j AS (SELECT p.event_id AS purchase_id, v.event_id AS view_id,
        |                  epoch_us(p.ts) - epoch_us(v.ts) AS lag_us,
        |                  p.value * v.value AS usd_value,
        |                  ROW_NUMBER() OVER (PARTITION BY p.event_id
        |                    ORDER BY (epoch_us(p.ts) - epoch_us(v.ts)) ASC NULLS LAST,
        |                             v.event_id ASC NULLS LAST) AS rn
        |           FROM p LEFT JOIN v ON p.user_id = v.user_id
        |            AND epoch_us(p.ts) - epoch_us(v.ts) BETWEEN 0 AND 86400000000)
        |SELECT purchase_id, view_id, lag_us, usd_value FROM j WHERE rn = 1
        |ORDER BY purchase_id""".stripMargin,

    "q_j7_latest_per_group" ->
      """SELECT user_id, event_id, ts, event_type FROM
        |(SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_j8_anti_discover" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_quantity >= 48)
        |ORDER BY p_partkey""".stripMargin,

    // The gold-refresh gate: the Spark side runs the PRODUCTION
    // GoldRefresh job (silver merges → bootstrap full → incremental with
    // late prices) over donations deterministically mapped from `orders`;
    // DuckDB replays the final stats directly off `orders` — amounts are
    // whole NEAR, price is an exact integer function of the calendar day,
    // and every donation's as-of price lands at delta 0.
    "q_gold_refresh" ->
      """WITH don AS (
        |  SELECT 'c' || CAST(o_custkey % 200 AS VARCHAR) AS donor,
        |         'r' || CAST(o_orderkey % 97 AS VARCHAR) AS recipient,
        |         (o_orderkey % 4 = 0) AS matching_pool,
        |         CAST(CAST((o_orderkey % 1000) + 1 AS DECIMAL(18,0)) *
        |              ((EXTRACT(day FROM o_orderdate) % 5) + 1)
        |              AS DECIMAL(20,2)) AS usd
        |  FROM orders),
        |ids AS (SELECT DISTINCT donor AS id FROM don
        |        UNION SELECT DISTINCT recipient FROM don),
        |recv AS (SELECT recipient AS id, COUNT(DISTINCT donor) AS dc,
        |                SUM(usd) AS in_usd FROM don GROUP BY 1),
        |sent AS (SELECT donor AS id, SUM(usd) AS out_usd FROM don GROUP BY 1),
        |mat  AS (SELECT donor AS id, SUM(usd) AS m_usd FROM don
        |         WHERE matching_pool GROUP BY 1),
        |paid AS (SELECT 'r' || CAST(r AS VARCHAR) AS id,
        |                CAST((r % 90) + 10 AS DECIMAL(20,2)) AS p_usd
        |         FROM (SELECT DISTINCT o_orderkey % 97 AS r FROM orders) t
        |         WHERE r % 3 = 0)
        |SELECT ids.id,
        |       CAST(COALESCE(recv.dc, 0) AS BIGINT) AS donors_count,
        |       CAST(recv.in_usd AS DOUBLE) AS in_usd,
        |       CAST(sent.out_usd AS DOUBLE) AS out_usd,
        |       CAST(mat.m_usd AS DOUBLE) AS matching_usd,
        |       CAST(paid.p_usd AS DOUBLE) AS payouts_usd
        |FROM ids LEFT JOIN recv ON ids.id = recv.id
        |         LEFT JOIN sent ON ids.id = sent.id
        |         LEFT JOIN mat  ON ids.id = mat.id
        |         LEFT JOIN paid ON ids.id = paid.id
        |ORDER BY ids.id""".stripMargin,

    "q_gold_pot_stats" ->
      """WITH don AS (
        |  SELECT 'pot' || CAST(o_orderkey % 7 AS VARCHAR) AS pot,
        |         (o_orderkey % 4 = 0) AS matching_pool,
        |         CAST((o_orderkey % 1000) + 1 AS BIGINT) AS whole,
        |         CAST(CAST((o_orderkey % 1000) + 1 AS DECIMAL(18,0)) *
        |              ((EXTRACT(day FROM o_orderdate) % 5) + 1)
        |              AS DECIMAL(20,2)) AS usd
        |  FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT pot,
        |       CAST(SUM(whole) FILTER (WHERE matching_pool) AS BIGINT)
        |         AS matching_near,
        |       CAST(SUM(usd) FILTER (WHERE matching_pool) AS DOUBLE)
        |         AS matching_usd,
        |       CAST(COUNT(*) FILTER (WHERE matching_pool) AS BIGINT)
        |         AS matching_n,
        |       CAST(SUM(whole) FILTER (WHERE NOT matching_pool) AS BIGINT)
        |         AS public_near,
        |       CAST(SUM(usd) FILTER (WHERE NOT matching_pool) AS DOUBLE)
        |         AS public_usd,
        |       CAST(COUNT(*) FILTER (WHERE NOT matching_pool) AS BIGINT)
        |         AS public_n
        |FROM don GROUP BY pot ORDER BY pot""".stripMargin,

    "q_a2_account_rollup" ->
      """SELECT c_custkey,
        |       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
        |       CAST(COALESCE(total_usd, 0.0) AS DOUBLE) AS total_usd,
        |       CAST(COALESCE(n_priorities, 0) AS BIGINT) AS n_priorities
        |FROM customer LEFT JOIN
        |(SELECT o_custkey, COUNT(*) AS n_orders,
        |        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_usd,
        |        COUNT(DISTINCT o_orderpriority) AS n_priorities
        | FROM orders GROUP BY o_custkey) ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q_a3_conditional_agg" ->
      """SELECT l_returnflag,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_o,
        |       CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS n_f,
        |       CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS n_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_a5_lww_upsert" ->
      """SELECT user_id, event_type, event_id, value FROM
        |(SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |           ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q_a6_rollup" ->
      """SELECT l_returnflag,
        |       l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_a10_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,

    // Pivot replayed as pinned conditional aggregation — the same
    // single-pass plan shape the Spark side compiles to.
    "q_a11_pivot" ->
      """SELECT user_id,
        |       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        |       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        |       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        |       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        |       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_a8_median" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.5) AS median_qty,
        |       quantile_cont(l_extendedprice, 0.5) AS median_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_o2_topk" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 25""".stripMargin,

    "q_o3_page_slice" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |ORDER BY o_orderkey LIMIT 30 OFFSET 60""".stripMargin,

    // Keyset page 2 must equal offset page 2 on a static table — the
    // oracle states the contract in its simplest form.
    "q_o6_keyset_page" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        |ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 25 OFFSET 25""".stripMargin,

    "q_o5_random_pick" ->
      """SELECT c_mktsegment, c_custkey FROM
        |(SELECT c_mktsegment, c_custkey,
        |        ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |          ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn
        | FROM customer)
        |WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin,

    "q_w1_hourly_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_w2_running_sum" ->
      """SELECT user_id, event_id,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |         PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q_set_union_except" ->
      """SELECT * FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q_txt1_quality" ->
      raw"""SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS n_chars_calc,
        |       CAST(toks AS BIGINT) AS n_tokens,
        |       CAST(length(text) AS DOUBLE) / CAST(toks AS DOUBLE) AS avg_token_len,
        |       CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
        |         / CAST(length(text) AS DOUBLE) AS punct_ratio,
        |       CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
        |         / CAST(length(text) AS DOUBLE) AS digit_ratio
        |FROM (SELECT *, CASE WHEN length(trim(text)) = 0 THEN 0
        |                     ELSE len(string_split_regex(trim(text), '\s+')) END AS toks
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_txt2_langid" ->
      s"""SELECT doc_id,
         |       CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
         |            WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
         |            WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
         |            WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
         |            ELSE 'fr' END AS predicted_lang,
         |       s_en AS en_score
         |FROM (SELECT doc_id, $langScoreCols
         |      FROM (SELECT doc_id, concat(' ', lower(text), ' ') AS p FROM documents))
         |ORDER BY doc_id""".stripMargin,

    "q_txt3_fingerprint" ->
      s"""SELECT doc_id, md5($norm) AS fp FROM documents ORDER BY doc_id""",

    "q_txt4_bpe_tokens" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +')) AS BIGINT)
        |         AS bpeish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_txt6_pii_redact" ->
      raw"""WITH w AS (SELECT doc_id,
        |         text || ' contact user' || CAST(doc_id AS VARCHAR)
        |              || '@example.com or +1 555 123 4'
        |              || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        |              || ' at 10.0.0.' || CAST(doc_id % 255 AS VARCHAR) AS text
        |       FROM documents),
        |  e AS (SELECT doc_id, text,
        |          regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |        FROM w),
        |  i AS (SELECT doc_id, text, t1,
        |          regexp_replace(t1, '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS t2
        |        FROM e)
        |SELECT doc_id,
        |       regexp_replace(t2, '\+?[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g') AS redacted,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |       CAST(len(regexp_extract_all(t1, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
        |       CAST(len(regexp_extract_all(t2, '\+?[0-9][0-9 -]{6,}[0-9]')) AS BIGINT) AS n_phones
        |FROM i ORDER BY doc_id""".stripMargin,

    "q_dd1_exact_dedup" ->
      s"""SELECT md5($norm) AS fp,
         |       CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

    "q_dd2_jaccard_pairs" ->
      raw"""WITH l AS (SELECT doc_id AS id_a, text AS ta, lang FROM documents WHERE doc_id % 50 = 0),
        |     r AS (SELECT doc_id AS id_b, text AS tb, lang FROM documents),
        |     p AS (SELECT id_a, id_b,
        |                  list_distinct(string_split(lower(regexp_replace(trim(ta), '\s+', ' ', 'g')), ' ')) AS wa,
        |                  list_distinct(string_split(lower(regexp_replace(trim(tb), '\s+', ' ', 'g')), ' ')) AS wb
        |           FROM l JOIN r USING (lang) WHERE id_b > id_a),
        |     s AS (SELECT id_a, id_b,
        |                  CAST(len(list_intersect(wa, wb)) AS DOUBLE)
        |                    / CAST(len(list_distinct(list_concat(wa, wb))) AS DOUBLE) AS jaccard_sim
        |           FROM p)
        |SELECT id_a, id_b, jaccard_sim FROM s WHERE jaccard_sim >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // Signature replay (same trusted-input scheme as q_dd3) + recursive
    // CTE connected components: candidates from band-slice equality,
    // exact 3-gram Jaccard verify from the documents table, min-label
    // components — the full cluster derivation is re-computed.
    "q_dd6_dup_clusters" ->
      s"""WITH RECURSIVE
         |  o AS (SELECT * FROM read_parquet('$OUT/q_dd6_dup_clusters/*.parquet')),
         |  s AS (SELECT doc_id, sig, CAST(sig AS BIGINT[]) AS sa
         |        FROM o WHERE section = 'sig'),
         |  cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |           FROM s a JOIN s b ON a.doc_id < b.doc_id
         |            AND (a.sa[1:4] = b.sa[1:4] OR a.sa[5:8] = b.sa[5:8]
         |                 OR a.sa[9:12] = b.sa[9:12] OR a.sa[13:16] = b.sa[13:16])),
         |  sh AS ($shingles3Sql),
         |  ver AS (SELECT id_a, id_b FROM cand
         |          JOIN sh x ON x.doc_id = cand.id_a
         |          JOIN sh y ON y.doc_id = cand.id_b
         |          WHERE CAST(len(list_intersect(x.g, y.g)) AS DOUBLE)
         |            / CAST(len(x.g) + len(y.g) - len(list_intersect(x.g, y.g)) AS DOUBLE)
         |            >= 0.5),
         |  edges AS (SELECT id_a AS src, id_b AS dst FROM ver
         |            UNION SELECT id_b, id_a FROM ver),
         |  cc(node, label) AS (
         |    SELECT src, src FROM (SELECT DISTINCT src FROM edges) t0
         |    UNION
         |    SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.node = e.src),
         |  cl AS (SELECT node AS member, CAST(MIN(label) AS BIGINT) AS cluster_id
         |         FROM cc GROUP BY node)
         |SELECT 'sig' AS section, doc_id, sig, CAST(NULL AS BIGINT) AS member,
         |       CAST(NULL AS BIGINT) AS cluster_id
         |FROM s
         |UNION ALL
         |SELECT 'cluster', NULL, NULL, member, cluster_id FROM cl
         |ORDER BY section, doc_id, member""".stripMargin,

    "q_txt7_contamination" ->
      raw"""WITH nd AS (SELECT doc_id,
        |              list_distinct(list_transform(
        |                generate_series(1, greatest(len(w) - 2, 0)),
        |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS ngrams
        |            FROM (SELECT doc_id,
        |                    string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS w
        |                  FROM documents)),
        |  b AS (SELECT DISTINCT unnest(ngrams) AS ngram FROM nd WHERE doc_id % 97 = 0),
        |  d AS (SELECT doc_id, unnest(ngrams) AS ngram FROM nd),
        |  agg AS (SELECT d.doc_id, count(*) AS total, count(b.ngram) AS hit
        |          FROM d LEFT JOIN b USING (ngram) GROUP BY d.doc_id)
        |SELECT doc_id,
        |       CASE WHEN coalesce(total, 0) > 0
        |            THEN CAST(hit AS DOUBLE) / CAST(total AS DOUBLE)
        |            ELSE 0.0 END AS contamination
        |FROM documents LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // The split threshold hex literals are floor(frac·2³²) in 8 lowercase
    // hex chars — the exact strings SampleFunctions.hexThreshold produces
    // (0.8→cccccccc, 0.5→80000000, 0.75→c0000000, 0.25→40000000);
    // fixed-width hex comparison ≡ numeric comparison in both engines.
    "q_samp1_train_test_split" ->
      """SELECT doc_id,
        |       CASE WHEN substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 8)
        |                 < 'cccccccc'
        |            THEN 'train' ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_samp2_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5('s2:' || CAST(doc_id AS VARCHAR)), 1, 8)
        |      < CASE lang WHEN 'en' THEN '80000000'
        |                  WHEN 'es' THEN 'c0000000'
        |                  ELSE '40000000' END
        |ORDER BY doc_id""".stripMargin,

    "q_samp3_pack_sequences" ->
      raw"""WITH t AS (SELECT doc_id,
        |              CASE WHEN length(trim(text)) = 0 THEN 0
        |                   ELSE len(string_split_regex(trim(text), '\s+')) END AS tok,
        |              doc_id % 8 AS shard
        |            FROM documents),
        |  s AS (SELECT doc_id, shard,
        |               sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |                 - tok AS st
        |        FROM t)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
        |       CAST(floor(st / 512) AS BIGINT) AS seq,
        |       CAST(st % 512 AS BIGINT) AS seq_offset
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_txt8_repetition" ->
      raw"""WITH nw AS (SELECT doc_id,
        |              string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS w
        |            FROM documents),
        |  wc AS (SELECT doc_id, g, count(*) AS c
        |         FROM (SELECT doc_id, unnest(w) AS g FROM nw) GROUP BY 1, 2),
        |  ws AS (SELECT doc_id, sum(c) AS tw, count(*) AS uw, max(c) AS tc
        |         FROM wc GROUP BY 1),
        |  bc AS (SELECT doc_id, g, count(*) AS c
        |         FROM (SELECT doc_id,
        |                 unnest(list_transform(
        |                   generate_series(1, greatest(len(w) - 1, 0)),
        |                   i -> w[i] || ' ' || w[i+1])) AS g
        |               FROM nw) GROUP BY 1, 2),
        |  bs AS (SELECT doc_id, sum(c) AS tb, count(*) AS ub FROM bc GROUP BY 1)
        |SELECT d.doc_id,
        |       1.0 - CAST(uw AS DOUBLE) / CAST(tw AS DOUBLE) AS dup_word_frac,
        |       CAST(tc AS DOUBLE) / CAST(tw AS DOUBLE) AS top_word_frac,
        |       COALESCE(1.0 - CAST(ub AS DOUBLE) / CAST(tb AS DOUBLE), 0.0)
        |         AS dup_bigram_frac
        |FROM documents d LEFT JOIN ws USING (doc_id) LEFT JOIN bs USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // Line-dedup: the 3-word line synthesis regex is the same pattern the
    // Spark query runs (Java regex $1 ↔ RE2 \1 replacement syntax; both
    // engines replace globally with the flag/default). Zipped unnests give
    // (line, position) pairs; doc-frequency by the line itself groups
    // identically to the engine's 128-bit line fingerprint.
    "q_txt9_line_dedup" ->
      raw"""WITH w AS (SELECT doc_id,
        |              regexp_replace(text, '((\S+ ){3})', '\1' || chr(10), 'g') AS t2
        |            FROM documents),
        |  e AS (SELECT doc_id,
        |          unnest(string_split(t2, chr(10))) AS line,
        |          unnest(generate_series(1, len(string_split(t2, chr(10))))) AS pos
        |        FROM w),
        |  f AS (SELECT line, count(DISTINCT doc_id) AS df FROM e GROUP BY 1),
        |  k AS (SELECT doc_id, pos, line FROM e JOIN f USING (line) WHERE df <= 2),
        |  r AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
        |               count(*) AS n_kept
        |        FROM k GROUP BY doc_id)
        |SELECT w.doc_id,
        |       COALESCE(text_dedup, '') AS text_dedup,
        |       CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_lines_kept,
        |       CAST(len(string_split(t2, chr(10))) - COALESCE(n_kept, 0) AS BIGINT)
        |         AS n_lines_dropped
        |FROM w LEFT JOIN r USING (doc_id) ORDER BY doc_id""".stripMargin,

    // Surprisal is integer-exact by design (whole bits from binary-string
    // lengths, exact integer sum, one final double division) — that is
    // what lets this oracle hash-match: a cross-engine ln()/log2() is not
    // guaranteed bit-identical.
    "q_txt10_surprisal" ->
      s"""WITH nw AS (SELECT doc_id, string_split($norm, ' ') AS w FROM documents),
         |  wc AS (SELECT doc_id, g, count(*) AS c
         |         FROM (SELECT doc_id, unnest(w) AS g FROM nw) GROUP BY 1, 2),
         |  fq AS (SELECT g, CAST(sum(c) AS BIGINT) AS cw FROM wc GROUP BY 1),
         |  tt AS (SELECT CAST(sum(cw) AS BIGINT) AS n FROM fq),
         |  sc AS (SELECT doc_id,
         |           CAST(sum(c * ((length(bin(n)) - 1) - (length(bin(cw)) - 1))) AS DOUBLE)
         |             / CAST(sum(c) AS DOUBLE) AS surprisal_bits
         |         FROM wc JOIN fq USING (g) CROSS JOIN tt
         |         GROUP BY doc_id)
         |SELECT doc_id, surprisal_bits
         |FROM documents LEFT JOIN sc USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // Keep fractions derive from per-domain supply with the exact same
    // IEEE operation order as SampleFunctions.targetMixture (n/t → min →
    // scale·t/n → min(1, ·) → floor(frac·2³²) → 8-hex threshold), so the
    // kept set matches row-for-row.
    "q_samp4_target_mixture" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents
        |           WHERE lang IN ('en', 'es', 'de') GROUP BY 1),
        |  s AS (SELECT min(n / t) AS scale
        |        FROM (SELECT n, CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.3
        |                        ELSE 0.2 END AS t FROM c)),
        |  f AS (SELECT lang,
        |          least(1.0, scale * CASE lang WHEN 'en' THEN 0.5 WHEN 'es' THEN 0.3
        |                             ELSE 0.2 END / n) AS frac
        |        FROM c CROSS JOIN s),
        |  th AS (SELECT lang,
        |           CASE WHEN frac >= 1.0 THEN 'g'
        |                ELSE lower(lpad(hex(CAST(floor(frac * 4294967296) AS BIGINT)), 8, '0'))
        |           END AS threshold
        |         FROM f)
        |SELECT doc_id, lang FROM documents JOIN th USING (lang)
        |WHERE substr(md5('s4:' || CAST(doc_id AS VARCHAR)), 1, 8) < threshold
        |ORDER BY doc_id""".stripMargin,

    // Quantization parity: floor(x+0.5) rounding is spelled out on both
    // sides (Spark round() is HALF_UP, DuckDB's rounds half away from
    // zero — an implicit round() would diverge); every other step is one
    // IEEE double op in the same order. Spark floor() returns BIGINT and
    // DuckDB's returns DOUBLE — both re-promote to double in the
    // following least(), same value.
    "q_sim4_quantize" ->
      """WITH v AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |           FROM embeddings),
        |  m AS (SELECT vec_id, e, list_min(e) AS mn,
        |               (list_max(e) - list_min(e)) / 255.0 AS sc FROM v),
        |  c AS (SELECT vec_id, e, mn, sc,
        |          list_transform(e, x -> CAST(CASE WHEN sc = 0 THEN -128
        |              ELSE least(floor((x - mn) / sc + 0.5), 255.0) - 128
        |            END AS BIGINT)) AS codes
        |        FROM m),
        |  r AS (SELECT vec_id, sc, codes,
        |          list_transform(codes, cc -> mn + (CAST(cc AS DOUBLE) + 128.0) * sc) AS recon,
        |          e
        |        FROM c)
        |SELECT vec_id, sc AS scale,
        |       CAST(codes[1] AS BIGINT) AS code0,
        |       list_max(list_transform(generate_series(1, len(e)),
        |         i -> abs(recon[i] - e[i]))) AS max_abs_err
        |FROM r ORDER BY vec_id""".stripMargin,

    // Card redaction: candidates are bound to (original, digits-only)
    // struct pairs so the Luhn fold reads each digit string once; the
    // checksum arithmetic is pure integers, the conditional redaction is
    // a fold of exact-string replaces — both engines leftmost-greedy
    // match the same RE2-safe candidate pattern. The fold order is made
    // explicit on BOTH sides (longest first, ties lexicographic): DuckDB's
    // list_distinct does not guarantee element order, so an implicit order
    // could diverge when one validated candidate contains another.
    "q_txt11_card_redact" ->
      raw"""WITH w AS (SELECT doc_id,
        |              CASE WHEN doc_id % 2 = 0 THEN ' ' ELSE '-' END AS sep,
        |              text FROM documents),
        |  x AS (SELECT doc_id,
        |          text || ' card 4111' || sep || '1111' || sep || '1111' || sep || '1111'
        |               || ' ref 1234' || sep || '5678' || sep || '9012' || sep || '3456' AS t2
        |        FROM w),
        |  c AS (SELECT doc_id, t2,
        |          list_transform(
        |            list_sort(list_transform(
        |              list_filter(
        |                list_transform(
        |                  list_distinct(regexp_extract_all(t2, '[0-9](?:[ -]?[0-9]){12,18}')),
        |                  s -> struct_pack(orig := s, ds := regexp_replace(s, '[^0-9]', '', 'g'))),
        |                p -> list_sum(list_transform(generate_series(1, length(p.ds)),
        |                       i -> CASE WHEN i % 2 = 0
        |                            THEN CASE WHEN CAST(p.ds[length(p.ds)-i+1] AS INT) * 2 > 9
        |                                 THEN CAST(p.ds[length(p.ds)-i+1] AS INT) * 2 - 9
        |                                 ELSE CAST(p.ds[length(p.ds)-i+1] AS INT) * 2 END
        |                            ELSE CAST(p.ds[length(p.ds)-i+1] AS INT) END)) % 10 = 0),
        |              p -> struct_pack(k := -length(p.orig), o := p.orig))),
        |            s -> s.o) AS valid
        |        FROM x)
        |SELECT doc_id,
        |       list_reduce(list_prepend(t2, valid),
        |         (acc, v) -> replace(acc, v, '<CARD>')) AS redacted,
        |       CAST(len(valid) AS BIGINT) AS n_cards
        |FROM c ORDER BY doc_id""".stripMargin,

    // The report's percentiles use the counting ("type 1" / lower
    // quantile) construction — smallest value whose cumulative count
    // reaches ceil(p·n) — which is integer-exact on both engines, unlike
    // interpolated percentile()/quantile_cont whose float interpolation
    // is not guaranteed bit-identical. Window peers don't matter: the
    // cumulative sum runs over the DISTINCT (lang, tok) table.
    "q_rep1_corpus_report" ->
      s"""WITH b AS (SELECT lang,
         |             CASE WHEN length(trim(text)) = 0 THEN 0
         |                  ELSE len(string_split_regex(trim(text), '\\s+')) END AS tok,
         |             md5($norm) AS fp
         |           FROM documents),
         |  c AS (SELECT lang, tok, count(*) AS c FROM b GROUP BY 1, 2),
         |  cc AS (SELECT lang, tok,
         |           sum(c) OVER (PARTITION BY lang ORDER BY tok
         |             ROWS UNBOUNDED PRECEDING) AS cum,
         |           sum(c) OVER (PARTITION BY lang) AS tot
         |         FROM c),
         |  p AS (SELECT lang,
         |          CAST(min(CASE WHEN cum >= ceil(tot * 0.5) THEN tok END) AS BIGINT)
         |            AS median_tokens,
         |          CAST(min(CASE WHEN cum >= ceil(tot * 0.9) THEN tok END) AS BIGINT)
         |            AS p90_tokens
         |        FROM cc GROUP BY 1),
         |  a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |          CAST(sum(tok) AS BIGINT) AS total_tokens,
         |          CAST(count(DISTINCT fp) AS BIGINT) AS n_unique
         |        FROM b GROUP BY 1)
         |SELECT a.lang, n_docs, total_tokens, median_tokens, p90_tokens, n_unique,
         |       CAST(n_docs - n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_frac
         |FROM a JOIN p USING (lang) ORDER BY lang""".stripMargin,

    // The funnel's stages reuse the exact formulations proven by
    // q_txt1 (token count), q_txt8 (dup_word_frac), q_txt7
    // (contamination), q_dd1 (fingerprint) and q_samp1 (split draw);
    // fingerprint dedup runs WITHIN the filtered set, matching the
    // engine's latestPerGroup over the already-filtered frame.
    "q_cur1_curation_funnel" ->
      raw"""WITH nw AS (SELECT doc_id,
        |              string_split($norm, ' ') AS w
        |            FROM documents),
        |  wc AS (SELECT doc_id, g, count(*) AS c
        |         FROM (SELECT doc_id, unnest(w) AS g FROM nw) GROUP BY 1, 2),
        |  ws AS (SELECT doc_id,
        |           1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dwf
        |         FROM wc GROUP BY 1),
        |  nd AS (SELECT doc_id, list_distinct(list_transform(
        |           generate_series(1, greatest(len(w) - 2, 0)),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS ngrams
        |         FROM nw),
        |  b AS (SELECT DISTINCT unnest(ngrams) AS ngram FROM nd WHERE doc_id % 97 = 0),
        |  d AS (SELECT doc_id, unnest(ngrams) AS ngram FROM nd),
        |  agg AS (SELECT d.doc_id, count(*) AS total, count(b.ngram) AS hit
        |          FROM d LEFT JOIN b USING (ngram) GROUP BY d.doc_id),
        |  cont AS (SELECT doc_id,
        |             CASE WHEN coalesce(total, 0) > 0
        |                  THEN CAST(hit AS DOUBLE) / CAST(total AS DOUBLE)
        |                  ELSE 0.0 END AS contamination
        |           FROM documents LEFT JOIN agg USING (doc_id)),
        |  base AS (SELECT doc_id, md5($norm) AS fp
        |           FROM documents JOIN ws USING (doc_id) JOIN cont USING (doc_id)
        |           WHERE lang = 'en'
        |             AND (CASE WHEN length(trim(text)) = 0 THEN 0
        |                       ELSE len(string_split_regex(trim(text), '\s+'))
        |                  END) BETWEEN 20 AND 80
        |             AND dwf <= 0.6 AND contamination < 0.5),
        |  uniq AS (SELECT doc_id,
        |             ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
        |           FROM base)
        |SELECT doc_id FROM uniq
        |WHERE rk = 1
        |  AND substr(md5('cur:' || CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc'
        |ORDER BY doc_id""".stripMargin,

    // Same signature replay + CC as q_dd6, then the keep-one decision is
    // re-derived: longest text first, lowest id on ties, one row per
    // cluster (singletons represent themselves).
    "q_dd7_dedup_corpus" ->
      s"""WITH RECURSIVE
         |  o AS (SELECT * FROM read_parquet('$OUT/q_dd7_dedup_corpus/*.parquet')),
         |  s AS (SELECT doc_id, sig, CAST(sig AS BIGINT[]) AS sa
         |        FROM o WHERE section = 'sig'),
         |  cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |           FROM s a JOIN s b ON a.doc_id < b.doc_id
         |            AND (a.sa[1:4] = b.sa[1:4] OR a.sa[5:8] = b.sa[5:8]
         |                 OR a.sa[9:12] = b.sa[9:12] OR a.sa[13:16] = b.sa[13:16])),
         |  sh AS ($shingles3Sql),
         |  ver AS (SELECT id_a, id_b FROM cand
         |          JOIN sh x ON x.doc_id = cand.id_a
         |          JOIN sh y ON y.doc_id = cand.id_b
         |          WHERE CAST(len(list_intersect(x.g, y.g)) AS DOUBLE)
         |            / CAST(len(x.g) + len(y.g) - len(list_intersect(x.g, y.g)) AS DOUBLE)
         |            >= 0.5),
         |  edges AS (SELECT id_a AS src, id_b AS dst FROM ver
         |            UNION SELECT id_b, id_a FROM ver),
         |  cc(node, label) AS (
         |    SELECT src, src FROM (SELECT DISTINCT src FROM edges) t0
         |    UNION
         |    SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.node = e.src),
         |  lab AS (SELECT node, MIN(label) AS cluster_id FROM cc GROUP BY node),
         |  labeled AS (SELECT d.doc_id,
         |                     CAST(COALESCE(lab.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
         |                     length(d.text) AS q
         |              FROM documents d LEFT JOIN lab ON d.doc_id = lab.node),
         |  ranked AS (SELECT doc_id, cluster_id,
         |                    ROW_NUMBER() OVER (PARTITION BY cluster_id
         |                      ORDER BY q DESC, doc_id ASC) AS rk
         |             FROM labeled)
         |SELECT 'sig' AS section, doc_id, sig, CAST(NULL AS BIGINT) AS cluster_id
         |FROM s
         |UNION ALL
         |SELECT 'rep', doc_id, NULL, cluster_id FROM ranked WHERE rk = 1
         |ORDER BY section, doc_id""".stripMargin,

    "q_dd5_embed_neardup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
         |           FROM embeddings WHERE vec_id % 5 = 0),
         |     pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |                   ${cosSql("a.v", "b.v")} AS cos_sim
         |            FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cos_sim FROM pr WHERE cos_sim >= 0.25
         |ORDER BY id_a, id_b""".stripMargin,

    "q_sim1_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |           FROM embeddings WHERE vec_id < 8),
         |     c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
         |           FROM embeddings),
         |     s AS (SELECT query_id, neighbor_id, ${cosSql("qv", "cv")} AS cos_sim
         |           FROM q, c WHERE neighbor_id != query_id),
         |     r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |             ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM s)
         |SELECT query_id, neighbor_id, rank, cos_sim FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // MIPS: raw inner product (left-fold, bit-compatible with Spark's
    // aggregate(zip_with)), top-5 per query with (score desc, id asc).
    "q_sim7_mips" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |           FROM embeddings WHERE vec_id < 8),
         |     c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
         |           FROM embeddings),
         |     s AS (SELECT query_id, neighbor_id, ${dotSql("qv", "cv")} AS dot
         |           FROM q, c WHERE neighbor_id != query_id),
         |     r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |             ORDER BY dot DESC, neighbor_id ASC) AS rank FROM s)
         |SELECT query_id, neighbor_id, rank, dot FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // The oracle reconstructs the SAME real PNG/JPEG header bytes from
    // doc_id arithmetic and emits the dimensions that were encoded into
    // them — a single misread byte in the pure-JVM header parser (or a
    // byte-construction divergence) mismatches width/height/n_bytes/hash.
    // Text rows replay the documented fake-codec arithmetic.
    // Frame dedup: clip synthesis, frame segmentation, the boilerplate
    // guard, bucket pairing and the majority-share flag all replay.
    "q_mm5_frame_dedup" ->
      raw"""WITH clips AS (SELECT doc_id, text FROM documents
        |              UNION ALL
        |              SELECT doc_id + 3000000, text FROM documents
        |              WHERE doc_id % 10 = 2),
        |  g AS (SELECT doc_id, text,
        |          CAST(1 + length(text) % 13 AS BIGINT) AS nf,
        |          greatest(length(text) // CAST(1 + length(text) % 13 AS BIGINT), 1) AS stride
        |        FROM clips),
        |  fr AS (SELECT DISTINCT doc_id,
        |           md5(substr(text, CAST(i * stride + 1 AS INT), CAST(stride AS INT))) AS fh
        |         FROM g, unnest(generate_series(0, nf - 1)) AS u(i)),
        |  common AS (SELECT fh FROM fr GROUP BY fh HAVING count(DISTINCT doc_id) > 50),
        |  kept AS (SELECT doc_id, fh FROM fr ANTI JOIN common USING (fh)),
        |  cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nfd
        |          FROM kept GROUP BY doc_id),
        |  p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |          CAST(count(*) AS BIGINT) AS n_shared
        |        FROM kept a JOIN kept b ON a.fh = b.fh AND a.doc_id < b.doc_id
        |        GROUP BY 1, 2)
        |SELECT 'clip' AS section, doc_id, nfd AS n_frames,
        |       CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
        |       CAST(NULL AS BIGINT) AS n_shared, CAST(NULL AS BOOLEAN) AS is_dup
        |FROM cnt
        |UNION ALL
        |SELECT 'pair', NULL, NULL, p.id_a, p.id_b, p.n_shared,
        |       p.n_shared * 2 >= ca.nfd + cb.nfd
        |FROM p JOIN cnt ca ON ca.doc_id = p.id_a
        |       JOIN cnt cb ON cb.doc_id = p.id_b
        |ORDER BY section, doc_id, id_a, id_b""".stripMargin,

    "q_mm1_binary_meta" ->
      """WITH d AS (SELECT doc_id, text, doc_id % 3 AS m,
        |             100 + doc_id % 500 AS pw, 80 + doc_id % 400 AS ph,
        |             64 + doc_id % 1000 AS jw, 48 + doc_id % 600 AS jh,
        |             strlen(text) AS n
        |           FROM documents),
        |  p AS (SELECT doc_id, m, pw, ph, jw, jh, n,
        |          CASE WHEN m = 0 THEN from_hex(
        |                 '89504e470d0a1a0a0000000d49484452'
        |                 || lpad(lower(hex(pw)), 8, '0')
        |                 || lpad(lower(hex(ph)), 8, '0')
        |                 || '080600000000000000')
        |               WHEN m = 1 THEN from_hex(
        |                 'ffd8ffe000104a46494600010100004800480000ffc0001108'
        |                 || lpad(lower(hex(jh)), 4, '0')
        |                 || lpad(lower(hex(jw)), 4, '0')
        |                 || '03012200021101031101')
        |               ELSE encode(text) END AS payload
        |        FROM d)
        |SELECT doc_id,
        |       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
        |       md5(lower(hex(payload))) AS content_hash,
        |       CAST(CASE m WHEN 0 THEN pw WHEN 1 THEN jw
        |                 ELSE 64 + (n % 577) END AS BIGINT) AS width,
        |       CAST(CASE m WHEN 0 THEN ph WHEN 1 THEN jh
        |                 ELSE 64 + ((n // 7) % 421) END AS BIGINT) AS height,
        |       CASE WHEN m = 0 THEN 'image/png'
        |            WHEN m = 1 THEN 'image/jpeg'
        |            WHEN n % 2 = 0 THEN 'fake/png' ELSE 'fake/jpeg' END AS format
        |FROM p ORDER BY doc_id""".stripMargin,

    // The fake codec derives n_frames/width/height from the byte length
    // alone (BinaryPipeline.FakeCodec): frames = 1 + n%13, w = 64 + n%577,
    // h = 64 + (n/7)%421 — integer-exact, so the oracle replays the decode
    // arithmetic and checks the sampling grid / resize planning bit-for-bit.
    "q_mm2_frame_sample" ->
      """WITH m AS (SELECT doc_id, 1 + (coalesce(strlen(text), 0) % 13) AS frames
        |           FROM documents)
        |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx
        |FROM (SELECT doc_id,
        |        unnest(list_distinct(list_transform(generate_series(0, 3),
        |          i -> (i * frames) // 4))) AS f
        |      FROM m)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "q_mm3_resize_meta" ->
      """WITH d AS (SELECT doc_id,
        |             64 + (coalesce(strlen(text), 0) % 577) AS w,
        |             64 + ((coalesce(strlen(text), 0) // 7) % 421) AS h
        |           FROM documents)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |       CAST(CASE WHEN w <= 256 AND h <= 256 THEN w
        |                 WHEN w * 256 >= h * 256 THEN 256
        |                 ELSE greatest(1, (w * 256) // h) END AS BIGINT)
        |         AS resize_w,
        |       CAST(CASE WHEN w <= 256 AND h <= 256 THEN h
        |                 WHEN w * 256 >= h * 256
        |                   THEN greatest(1, (h * 256) // w)
        |                 ELSE 256 END AS BIGINT) AS resize_h
        |FROM d ORDER BY doc_id""".stripMargin,

    // HLL estimates are inherently approximate; the oracle echoes the
    // Spark value iff it is within a relative-error gate of DuckDB's
    // EXACT distinct count (3σ of the default 5% rsd), else it emits the
    // exact count and forces a hash mismatch.
    "q_a7_approx_distinct" ->
      s"""WITH s AS (SELECT approx_parts, approx_orders
         |           FROM read_parquet('$OUT/q_a7_approx_distinct/*.parquet')),
         |  x AS (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS np,
         |               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS no
         |        FROM lineitem)
         |SELECT CASE WHEN abs(approx_parts - np) <= 0.15 * np
         |            THEN approx_parts ELSE np END AS approx_parts,
         |       CASE WHEN abs(approx_orders - no) <= 0.15 * no
         |            THEN approx_orders ELSE no END AS approx_orders
         |FROM s, x""".stripMargin,

    // Same echo-iff-within contract as q_a7: the merged-sketch estimate
    // must sit within the HLL error bracket of the exact distinct count
    // (a mismatch echoes the exact count instead → hash mismatch).
    "q_inc2_sketch_merge" ->
      s"""WITH s AS (SELECT approx_users
         |           FROM read_parquet('$OUT/q_inc2_sketch_merge/*.parquet')),
         |  x AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM events)
         |SELECT CASE WHEN abs(approx_users - nu) <= greatest(0.05 * nu, 3)
         |            THEN approx_users ELSE nu END AS approx_users
         |FROM s, x""".stripMargin,

    // Signature replay: minhash signatures (k=16, 4 bands of 4) are
    // trusted input read back from the Spark output; candidates are
    // re-derived via band-SLICE equality (equal slices ⇔ equal band keys)
    // and re-verified with exact 3-gram Jaccard computed from the raw
    // documents table — candidate completeness, the verify join and the
    // similarity arithmetic are all independently checked.
    "q_dd3_minhash_lsh" ->
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_dd3_minhash_lsh/*.parquet')),
         |  s AS (SELECT doc_id, sig, CAST(sig AS BIGINT[]) AS sa
         |        FROM o WHERE section = 'sig'),
         |  cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |           FROM s a JOIN s b ON a.doc_id < b.doc_id
         |            AND (a.sa[1:4] = b.sa[1:4] OR a.sa[5:8] = b.sa[5:8]
         |                 OR a.sa[9:12] = b.sa[9:12] OR a.sa[13:16] = b.sa[13:16])),
         |  sh AS ($shingles3Sql),
         |  p AS (SELECT id_a, id_b,
         |          CAST(len(list_intersect(x.g, y.g)) AS DOUBLE)
         |            / CAST(len(x.g) + len(y.g) - len(list_intersect(x.g, y.g)) AS DOUBLE)
         |            AS jaccard_sim
         |        FROM cand JOIN sh x ON x.doc_id = cand.id_a
         |                  JOIN sh y ON y.doc_id = cand.id_b)
         |SELECT 'sig' AS section, doc_id, sig, CAST(NULL AS BIGINT) AS id_a,
         |       CAST(NULL AS BIGINT) AS id_b, CAST(NULL AS DOUBLE) AS jaccard_sim
         |FROM s
         |UNION ALL
         |SELECT 'pair', NULL, NULL, id_a, id_b, jaccard_sim
         |FROM p WHERE jaccard_sim >= 0.2
         |ORDER BY section, doc_id, id_a, id_b""".stripMargin,

    // Band keys and the anchor Hamming distance are derived from the
    // echoed signature with engine-portable bit arithmetic (arithmetic
    // shift + mask extracts the same 16-bit fields as Spark's unsigned
    // shift; the fill bits die under the mask).
    "q_dd4_simhash" ->
      s"""SELECT doc_id, simhash,
         |       CAST((simhash >> 0) & 65535 AS BIGINT) AS band0,
         |       CAST((simhash >> 16) & 65535 AS BIGINT) AS band1,
         |       CAST((simhash >> 32) & 65535 AS BIGINT) AS band2,
         |       CAST((simhash >> 48) & 65535 AS BIGINT) AS band3,
         |       CAST(bit_count(xor(simhash, 25214903917)) AS BIGINT) AS anchor_dist
         |FROM read_parquet('$OUT/q_dd4_simhash/*.parquet')
         |ORDER BY doc_id""".stripMargin,

    // The oracle brute-forces ALL Hamming<=3 pairs from the echoed
    // signatures (feasible at fixture scale) — by the pigeonhole
    // guarantee the banded equi-join must find exactly this set, so this
    // checks the banding's completeness, not just its soundness.
    "q_dd8_simhash_pairs" ->
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_dd8_simhash_pairs/*.parquet')),
         |  s AS (SELECT doc_id, simhash FROM o WHERE section = 'sig'),
         |  p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |          CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |        FROM s a JOIN s b ON a.doc_id < b.doc_id
         |        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3)
         |SELECT 'sig' AS section, doc_id, simhash, CAST(NULL AS BIGINT) AS id_a,
         |       CAST(NULL AS BIGINT) AS id_b, CAST(NULL AS BIGINT) AS hamming
         |FROM s
         |UNION ALL
         |SELECT 'pair', NULL, NULL, id_a, id_b, hamming FROM p
         |ORDER BY section, doc_id, id_a, id_b""".stripMargin,

    // Ensemble consensus: both detection families replay independently
    // from their echoed signatures (band-slice candidates + exact
    // Jaccard; banded Hamming brute force), then intersect.
    // Star-join replay — decimal-pinned revenue, same date interval and
    // region filter; join order is the optimizer's business on both
    // engines, the result is order-independent.
    "q_j12_star_join" ->
      """SELECT n.n_name,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |         (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
        |         AS DECIMAL(30,4))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Lag-delta replay: identical per-type frame, truncating // for the
    // basis-point change (negative deltas agree — verified).
    "q_w7_lag_delta" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |                  CAST(floor(SUM(CAST(value AS DECIMAL(18,2)))) AS BIGINT) AS x
        |           FROM events GROUP BY 1, 2)
        |SELECT event_type, hour, x,
        |       lag(x) OVER w AS prev,
        |       x - lag(x) OVER w AS delta,
        |       CASE WHEN lag(x) OVER w > 0
        |            THEN (10000 * (x - lag(x) OVER w)) // (lag(x) OVER w)
        |            ELSE NULL END AS delta_bp
        |FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hour)
        |ORDER BY event_type, hour""".stripMargin,

    // Layout-independent replay of the bucketed join: a plain
    // join-aggregate — bucketing changes WHERE bytes move, never what
    // the join computes.
    "q_j11_bucketed_join" ->
      """SELECT o.o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // KL-drift replay: same per-language unigram counts, same add-one
    // smoothing, same fixed-point log2 and final truncating
    // normalization. Batch-only languages (no corpus reference)
    // excluded on both engines.
    "q_txt18_kl_drift" ->
      s"""WITH tm AS (SELECT doc_id, lang,
         |              unnest(string_split($norm, ' ')) AS t
         |            FROM documents),
         |  cb AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS c
         |         FROM tm WHERE doc_id % 10 = 3 GROUP BY 1, 2),
         |  cc AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS c
         |         FROM tm WHERE doc_id % 10 <> 3 GROUP BY 1, 2),
         |  np AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS np FROM cb GROUP BY 1),
         |  nqv AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS nq,
         |            CAST(count(*) AS BIGINT) AS v FROM cc GROUP BY 1),
         |  sc AS (SELECT np.lang, np.np, nqv.nq, nqv.v
         |         FROM np JOIN nqv USING (lang) WHERE nqv.nq > 0),
         |  j AS (SELECT cb.lang, sc.np, sc.nq, sc.v,
         |          cb.c * (${ilSql("(cb.c * (sc.nq + sc.v))")}
         |            - ${ilSql("((COALESCE(cc.c, 0) + 1) * sc.np)")}) AS term_kl
         |        FROM cb JOIN sc ON sc.lang = cb.lang
         |        LEFT JOIN cc ON cc.lang = cb.lang AND cc.t = cb.t)
         |SELECT lang, np AS n_batch_tokens, nq AS n_corpus_tokens,
         |       v AS corpus_vocab,
         |       CAST(SUM(term_kl) AS BIGINT) AS kl_num_1024,
         |       (1000 * CAST(SUM(term_kl) AS BIGINT)) // (1024 * np)
         |         AS kl_milli_bits
         |FROM j GROUP BY 1, 2, 3, 4 ORDER BY lang""".stripMargin,

    // Full Zipf-fit replay: same term counts, same (count DESC, term)
    // rank, same fixed-point log2, same milli-pinned OLS with the
    // two-step intercept from the already-truncated slope. Truncating
    // division on both engines, negative slopes included.
    "q_txt17_zipf" ->
      s"""WITH tm AS (SELECT lang AS grp, unnest(string_split($norm, ' ')) AS t
         |            FROM documents),
         |  tc AS (SELECT grp, t, CAST(count(*) AS BIGINT) AS cnt
         |         FROM tm GROUP BY 1, 2),
         |  rk AS (SELECT grp, cnt,
         |           row_number() OVER (PARTITION BY grp
         |             ORDER BY cnt DESC, t) AS rank
         |         FROM tc),
         |  pt AS (SELECT grp, ${ilSql("rank")} AS x, ${ilSql("cnt")} AS y
         |         FROM rk WHERE rank <= 500),
         |  m AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
         |          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |          CAST(SUM(x * x) AS BIGINT) AS sxx,
         |          CAST(SUM(x * y) AS BIGINT) AS sxy
         |        FROM pt GROUP BY 1),
         |  sl AS (SELECT *, CASE WHEN n * sxx - sx * sx = 0 THEN NULL
         |           ELSE (1000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
         |         END AS slope_milli FROM m)
         |SELECT grp AS lang, n AS n_terms, sx, sy, sxx, sxy, slope_milli,
         |       CASE WHEN slope_milli IS NULL THEN NULL
         |            ELSE (1000 * sy - slope_milli * sx) // n
         |       END AS intercept_milli
         |FROM sl ORDER BY lang""".stripMargin,

    // INDEPENDENT brute-force gold standard for the prefix-filter join:
    // every within-language pair is scanned and exact-verified — no
    // prefix trick on this side — so a hash match proves the AllPairs
    // completeness theorem held on the data (no missed pair, none
    // invented). Same truncating-division ppm pin as the Spark side.
    "q_dd15_allpairs" ->
      s"""WITH d AS (SELECT doc_id, lang,
         |             list_distinct(string_split($norm, ' ')) AS ws
         |           FROM documents),
         |  p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |          CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) AS inter,
         |          CAST(len(a.ws) AS BIGINT) AS na, CAST(len(b.ws) AS BIGINT) AS nb
         |        FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, inter, (na + nb - inter) AS uni,
         |       (1000000 * inter) // (na + nb - inter) AS jac_ppm
         |FROM p WHERE inter * 5 >= (na + nb - inter) * 4
         |ORDER BY id_a, id_b""".stripMargin,

    // Calibration: exact pairs re-derived from raw text by brute force
    // (dd15's independence standard); estimates re-derived from the
    // ECHOED signatures with an explicit 16-term match count.
    "q_dd17_minhash_calibration" -> {
      val matchSum = (1 to 16)
        .map(i => s"(CASE WHEN x.sa[$i] = y.sa[$i] THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_dd17_minhash_calibration/*.parquet')),
         |  s AS (SELECT doc_id, sig, CAST(sig AS BIGINT[]) AS sa
         |        FROM o WHERE section = 'sig'),
         |  d AS (SELECT doc_id, lang,
         |          list_distinct(string_split($norm, ' ')) AS ws
         |        FROM documents),
         |  ex AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |           CAST(len(list_intersect(a.ws, b.ws)) AS BIGINT) AS inter,
         |           CAST(len(a.ws) AS BIGINT) AS na, CAST(len(b.ws) AS BIGINT) AS nb
         |         FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id),
         |  exq AS (SELECT id_a, id_b,
         |            (1000000 * inter) // (na + nb - inter) AS jac_ppm
         |          FROM ex WHERE inter * 5 >= (na + nb - inter) * 4),
         |  p AS (SELECT exq.id_a, exq.id_b, exq.jac_ppm,
         |          CAST($matchSum AS BIGINT) AS matches
         |        FROM exq JOIN s x ON x.doc_id = exq.id_a
         |                 JOIN s y ON y.doc_id = exq.id_b)
         |SELECT 'sig' AS section, doc_id, sig, CAST(NULL AS BIGINT) AS id_a,
         |       CAST(NULL AS BIGINT) AS id_b, CAST(NULL AS BIGINT) AS jac_ppm,
         |       CAST(NULL AS BIGINT) AS matches, CAST(NULL AS BIGINT) AS est_ppm,
         |       CAST(NULL AS BIGINT) AS err_ppm
         |FROM s
         |UNION ALL
         |SELECT 'pair', NULL, NULL, id_a, id_b, jac_ppm, matches,
         |       matches * 62500, matches * 62500 - jac_ppm
         |FROM p
         |ORDER BY section, doc_id, id_a, id_b""".stripMargin
    },

    // Independent brute force for the incremental prefix-filter probe:
    // full batch × corpus within-language scan, exact-verified.
    "q_dd16_incremental_allpairs" ->
      s"""WITH d AS (SELECT doc_id, lang,
         |             list_distinct(string_split($norm, ' ')) AS ws
         |           FROM documents),
         |  b AS (SELECT * FROM d WHERE doc_id % 10 = 3),
         |  c AS (SELECT * FROM d WHERE doc_id % 10 <> 3),
         |  p AS (SELECT b.doc_id AS id_new, c.doc_id AS id_corpus,
         |          CAST(len(list_intersect(b.ws, c.ws)) AS BIGINT) AS inter,
         |          CAST(len(b.ws) AS BIGINT) AS na, CAST(len(c.ws) AS BIGINT) AS nb
         |        FROM b JOIN c ON b.lang = c.lang)
         |SELECT id_new, id_corpus, inter, (na + nb - inter) AS uni,
         |       (1000000 * inter) // (na + nb - inter) AS jac_ppm
         |FROM p WHERE inter * 5 >= (na + nb - inter) * 4
         |ORDER BY id_new, id_corpus""".stripMargin,

    "q_dd14_ensemble_consensus" ->
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_dd14_ensemble_consensus/*.parquet')),
         |  ms AS (SELECT doc_id, mh_sig, CAST(mh_sig AS BIGINT[]) AS sa
         |         FROM o WHERE section = 'mh'),
         |  ss AS (SELECT doc_id, simhash FROM o WHERE section = 'sh'),
         |  cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |           FROM ms a JOIN ms b ON a.doc_id < b.doc_id
         |            AND (a.sa[1:4] = b.sa[1:4] OR a.sa[5:8] = b.sa[5:8]
         |                 OR a.sa[9:12] = b.sa[9:12] OR a.sa[13:16] = b.sa[13:16])),
         |  shg AS ($shingles3Sql),
         |  mp AS (SELECT id_a, id_b,
         |           CAST(len(list_intersect(x.g, y.g)) AS DOUBLE)
         |             / CAST(len(x.g) + len(y.g) - len(list_intersect(x.g, y.g)) AS DOUBLE)
         |             AS jaccard_sim
         |         FROM cand JOIN shg x ON x.doc_id = cand.id_a
         |                   JOIN shg y ON y.doc_id = cand.id_b),
         |  sp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |         FROM ss a JOIN ss b ON a.doc_id < b.doc_id
         |         WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |  cons AS (SELECT mp.id_a, mp.id_b, mp.jaccard_sim, sp.hamming
         |           FROM mp JOIN sp ON sp.id_a = mp.id_a AND sp.id_b = mp.id_b
         |           WHERE mp.jaccard_sim >= 0.5)
         |SELECT 'mh' AS section, doc_id, mh_sig, CAST(NULL AS BIGINT) AS simhash,
         |       CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
         |       CAST(NULL AS DOUBLE) AS jaccard_sim, CAST(NULL AS BIGINT) AS hamming
         |FROM ms
         |UNION ALL
         |SELECT 'sh', doc_id, NULL, simhash, NULL, NULL, NULL, NULL FROM ss
         |UNION ALL
         |SELECT 'pair', NULL, NULL, NULL, id_a, id_b, jaccard_sim, hamming
         |FROM cons
         |ORDER BY section, doc_id, id_a, id_b""".stripMargin,

    // Same replay as q_dd3 with batch/corpus roles re-derived from the
    // doc_id split (new = doc_id%10=7), candidates crossing roles only.
    "q_dd9_incremental_neardup" ->
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_dd9_incremental_neardup/*.parquet')),
         |  s AS (SELECT doc_id, sig, CAST(sig AS BIGINT[]) AS sa
         |        FROM o WHERE section = 'sig'),
         |  n AS (SELECT * FROM s WHERE doc_id % 10 = 7),
         |  c AS (SELECT * FROM s WHERE doc_id % 10 <> 7),
         |  cand AS (SELECT n.doc_id AS id_new, c.doc_id AS id_corpus
         |           FROM n JOIN c ON
         |             (n.sa[1:4] = c.sa[1:4] OR n.sa[5:8] = c.sa[5:8]
         |              OR n.sa[9:12] = c.sa[9:12] OR n.sa[13:16] = c.sa[13:16])),
         |  sh AS ($shingles3Sql),
         |  p AS (SELECT id_new, id_corpus,
         |          CAST(len(list_intersect(x.g, y.g)) AS DOUBLE)
         |            / CAST(len(x.g) + len(y.g) - len(list_intersect(x.g, y.g)) AS DOUBLE)
         |            AS jaccard_sim
         |        FROM cand JOIN sh x ON x.doc_id = cand.id_new
         |                  JOIN sh y ON y.doc_id = cand.id_corpus)
         |SELECT 'sig' AS section, doc_id, sig, CAST(NULL AS BIGINT) AS id_new,
         |       CAST(NULL AS BIGINT) AS id_corpus, CAST(NULL AS DOUBLE) AS jaccard_sim
         |FROM s
         |UNION ALL
         |SELECT 'pair', NULL, NULL, id_new, id_corpus, jaccard_sim
         |FROM p WHERE jaccard_sim >= 0.5
         |ORDER BY section, doc_id, id_new, id_corpus""".stripMargin,

    // Repeated-span dedup: only the per-doc k-gram hash sequences are
    // trusted input. DuckDB replays the leftmost window-min position
    // selection, both deterministic skew caps (10 smallest positions per
    // (doc, hash); hash document-frequency 2..50), the exact substring
    // verify against the raw documents table, and the per-pair counts.
    "q_dd12_substring_dup" ->
      s"""WITH o AS (SELECT doc_id, kgram_hashes,
         |             CAST(kgram_hashes AS BIGINT[]) AS kh
         |           FROM read_parquet('$OUT/q_dd12_substring_dup/*.parquet')
         |           WHERE section = 'sig'),
         |  d AS (SELECT doc_id,
         |          lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm
         |        FROM documents),
         |  selpos AS (SELECT doc_id, kh, list_distinct(list_transform(
         |               generate_series(1, greatest(len(kh) - 15, 1)),
         |               j -> j - 1 + list_position(kh[j:j+15], list_min(kh[j:j+15])))) AS ps
         |             FROM o),
         |  sel0 AS (SELECT doc_id AS id, kh, unnest(ps) AS p FROM selpos),
         |  sel AS (SELECT s.id, s.p, s.kh[s.p] AS h, substr(d.norm, s.p, 20) AS gram
         |          FROM sel0 s JOIN d ON d.doc_id = s.id),
         |  keep AS (SELECT id, h, (list_sort(list(p)))[1:10] AS pk
         |           FROM sel GROUP BY id, h),
         |  capped AS (SELECT s.id, s.h, s.p, s.gram
         |             FROM sel s JOIN keep k2 ON s.id = k2.id AND s.h = k2.h
         |             WHERE list_contains(k2.pk, s.p)),
         |  shared AS (SELECT h FROM (SELECT h, count(DISTINCT id) AS nd
         |                            FROM capped GROUP BY h)
         |             WHERE nd BETWEEN 2 AND 50),
         |  cs AS (SELECT c.* FROM capped c JOIN shared USING (h)),
         |  p2 AS (SELECT x.id AS id_a, y.id AS id_b,
         |           CAST(count(*) AS BIGINT) AS n_shared
         |         FROM cs x JOIN cs y
         |           ON x.h = y.h AND x.id < y.id AND x.gram = y.gram
         |         GROUP BY 1, 2)
         |SELECT 'sig' AS section, doc_id, kgram_hashes,
         |       CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
         |       CAST(NULL AS BIGINT) AS n_shared
         |FROM o
         |UNION ALL
         |SELECT 'pair', NULL, NULL, id_a, id_b, n_shared FROM p2
         |ORDER BY section, doc_id, id_a, id_b""".stripMargin,

    // CDC chunk dedup: only the boundary positions are trusted input.
    // DuckDB rebuilds each chunk (start/length/substring), fingerprints
    // it with md5, and re-derives the cross-doc sharing stats.
    "q_dd13_cdc_chunks" ->
      s"""WITH o AS (SELECT doc_id, bounds, CAST(bounds AS INTEGER[]) AS bs
         |           FROM read_parquet('$OUT/q_dd13_cdc_chunks/*.parquet')
         |           WHERE section = 'bounds'),
         |  d AS (SELECT doc_id,
         |          lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm
         |        FROM documents),
         |  j AS (SELECT o.doc_id, o.bs, d.norm, length(d.norm) AS L
         |        FROM o JOIN d USING (doc_id)),
         |  e AS (SELECT doc_id, norm, bs,
         |          CASE WHEN L = 0 THEN bs
         |               WHEN len(bs) > 0 AND bs[-1] = L THEN bs
         |               ELSE list_append(bs, L) END AS ends
         |        FROM j),
         |  cl AS (SELECT doc_id, norm, list_transform(range(1, len(ends)+1),
         |           i -> struct_pack(idx := i,
         |                  st := CASE WHEN i = 1 THEN 1 ELSE bs[i-1] + 1 END,
         |                  en := ends[i])) AS chs
         |         FROM e),
         |  u AS (SELECT doc_id, norm, unnest(chs) AS ch FROM cl),
         |  ch AS (SELECT doc_id, CAST(ch.idx AS BIGINT) AS chunk_idx,
         |           CAST(ch.st AS BIGINT) AS start,
         |           CAST(ch.en - ch.st + 1 AS BIGINT) AS chunk_len,
         |           md5(substr(norm, ch.st, ch.en - ch.st + 1)) AS chunk_md5
         |         FROM u),
         |  sh AS (SELECT chunk_md5,
         |           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |           CAST(count(*) AS BIGINT) AS n_occ
         |         FROM ch GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2)
         |SELECT 'bounds' AS section, doc_id, bounds,
         |       CAST(NULL AS BIGINT) AS chunk_idx, CAST(NULL AS BIGINT) AS start,
         |       CAST(NULL AS BIGINT) AS chunk_len, CAST(NULL AS VARCHAR) AS chunk_md5,
         |       CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS BIGINT) AS n_occ
         |FROM o
         |UNION ALL
         |SELECT 'chunk', doc_id, NULL, chunk_idx, start, chunk_len, chunk_md5,
         |       NULL, NULL FROM ch
         |UNION ALL
         |SELECT 'share', NULL, NULL, NULL, NULL, NULL, chunk_md5, n_docs, n_occ
         |FROM sh
         |ORDER BY section, doc_id, chunk_idx, chunk_md5""".stripMargin,

    // Product quantization: only the codebooks are trusted input; codes
    // (per-subspace argmin with lowest-cell ties) and reconstruction
    // errors (the ADC distance) re-derive from the embeddings table by
    // slice + left-fold replay.
    "q_sim5_pq" ->
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_sim5_pq/*.parquet')),
         |  cb AS (SELECT sub, cell, centroid, CAST(centroid AS DOUBLE[]) AS cv
         |         FROM o WHERE section = 'codebook'),
         |  sd AS (SELECT len(cv) AS w FROM cb LIMIT 1),
         |  e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |  sl AS (SELECT e.vec_id, cb.sub, cb.cell, cb.cv,
         |           list_slice(e.v, CAST(cb.sub * sd.w + 1 AS BIGINT),
         |             CAST((cb.sub + 1) * sd.w AS BIGINT)) AS sv
         |         FROM e CROSS JOIN cb CROSS JOIN sd),
         |  d AS (SELECT vec_id, sub, cell, ${l2Sql("sv", "cv")} AS dist
         |        FROM sl),
         |  asg AS (SELECT vec_id, sub, cell FROM (
         |            SELECT vec_id, sub, cell, ROW_NUMBER() OVER (
         |              PARTITION BY vec_id, sub ORDER BY dist ASC, cell ASC) AS rn
         |            FROM d)
         |          WHERE rn = 1),
         |  codes AS (SELECT vec_id, list(cell ORDER BY sub) AS codes
         |            FROM asg GROUP BY 1),
         |  recon AS (SELECT a.vec_id, flatten(list(c2.cv ORDER BY a.sub)) AS r
         |            FROM asg a JOIN cb c2 ON a.sub = c2.sub AND a.cell = c2.cell
         |            GROUP BY 1),
         |  errs AS (SELECT e.vec_id, ${l2Sql("e.v", "recon.r")} AS err
         |           FROM e JOIN recon USING (vec_id))
         |SELECT 'codebook' AS section, sub, cell, centroid,
         |       CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS VARCHAR) AS codes,
         |       CAST(NULL AS DOUBLE) AS err
         |FROM cb
         |UNION ALL
         |SELECT 'vec', NULL, NULL, NULL, c.vec_id, to_json(c.codes)::VARCHAR, errs.err
         |FROM codes c JOIN errs USING (vec_id)
         |ORDER BY section, sub, cell, vec_id""".stripMargin,

    // Sessionization replays exactly: integer-microsecond gaps, a
    // unique (us, event_id) window order on both engines, explicit ROWS
    // frame for the running session index.
    "q_w3_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |  l AS (SELECT user_id, event_id, us,
        |          LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
        |        FROM e),
        |  n AS (SELECT user_id, event_id, us,
        |          CASE WHEN prev IS NULL OR us - prev > 86400000000 THEN 1
        |               ELSE 0 END AS nw
        |        FROM l),
        |  s AS (SELECT user_id, us,
        |          SUM(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS session_idx
        |        FROM n)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(MIN(us) AS BIGINT) AS start_us,
        |       CAST(MAX(us) AS BIGINT) AS end_us,
        |       CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
        |FROM s GROUP BY 1, 2
        |ORDER BY user_id, session_idx""".stripMargin,

    // PQ ANN: codebooks echoed; codes, reconstructions, every asymmetric
    // distance and the full ranking re-derive by the same slice/argmin/
    // left-fold replay as q_sim5 (ties to the lower neighbor id).
    "q_sim6_pq_ann" ->
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_sim6_pq_ann/*.parquet')),
         |  cb AS (SELECT sub, cell, centroid, CAST(centroid AS DOUBLE[]) AS cv
         |         FROM o WHERE section = 'codebook'),
         |  sd AS (SELECT len(cv) AS w FROM cb LIMIT 1),
         |  e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |  sl AS (SELECT e.vec_id, cb.sub, cb.cell, cb.cv,
         |           list_slice(e.v, CAST(cb.sub * sd.w + 1 AS BIGINT),
         |             CAST((cb.sub + 1) * sd.w AS BIGINT)) AS sv
         |         FROM e CROSS JOIN cb CROSS JOIN sd),
         |  d AS (SELECT vec_id, sub, cell, ${l2Sql("sv", "cv")} AS dist
         |        FROM sl),
         |  asg AS (SELECT vec_id, sub, cell FROM (
         |            SELECT vec_id, sub, cell, ROW_NUMBER() OVER (
         |              PARTITION BY vec_id, sub ORDER BY dist ASC, cell ASC) AS rn
         |            FROM d)
         |          WHERE rn = 1),
         |  recon AS (SELECT a.vec_id, flatten(list(c2.cv ORDER BY a.sub)) AS r
         |            FROM asg a JOIN cb c2 ON a.sub = c2.sub AND a.cell = c2.cell
         |            GROUP BY 1),
         |  qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
         |  dist AS (SELECT qs.query_id, r.vec_id AS neighbor_id,
         |             ${l2Sql("qs.qv", "r.r")} AS dist
         |           FROM qs CROSS JOIN recon r),
         |  rk AS (SELECT query_id, neighbor_id, dist, ROW_NUMBER() OVER (
         |           PARTITION BY query_id ORDER BY dist ASC, neighbor_id ASC) AS rn
         |         FROM dist)
         |SELECT 'codebook' AS section, sub, cell, centroid,
         |       CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS "rank",
         |       CAST(NULL AS BIGINT) AS neighbor_id, CAST(NULL AS DOUBLE) AS dist
         |FROM cb
         |UNION ALL
         |SELECT 'topk', NULL, NULL, NULL, query_id, rn, neighbor_id, dist
         |FROM rk WHERE rn <= 5
         |ORDER BY section, sub, cell, query_id, "rank"""".stripMargin,

    // Audio header decode: every field (rate, channels, declared sample
    // count, integer-division duration) re-derives from the doc_id
    // arithmetic that built the WAV header bytes — a single misread
    // little-endian byte in the parser mismatches. Non-WAV rows must
    // come back NULL, never invented.
    "q_mm4_audio_meta" ->
      """WITH d AS (SELECT doc_id, text, doc_id % 3 AS m,
        |            8000 + (doc_id % 5) * 4000 AS rate,
        |            1 + doc_id % 2 AS ch
        |          FROM documents),
        |  e AS (SELECT doc_id, text, m, rate, ch, ch * 2 AS ba,
        |          ((doc_id % 1000) + 1) * 100 * (ch * 2) AS data_size
        |        FROM d)
        |SELECT doc_id,
        |       CAST(CASE WHEN m <> 2 THEN 44 ELSE strlen(text) END AS BIGINT) AS n_bytes,
        |       CAST(CASE WHEN m <> 2 THEN rate END AS BIGINT) AS sample_rate,
        |       CAST(CASE WHEN m <> 2 THEN ch END AS BIGINT) AS channels,
        |       CAST(CASE WHEN m <> 2 THEN data_size // ba END AS BIGINT) AS n_samples,
        |       CAST(CASE WHEN m <> 2 THEN ((data_size // ba) * 1000) // rate END AS BIGINT) AS duration_ms,
        |       CASE WHEN m <> 2 THEN 'audio/x-wav'
        |            ELSE 'application/octet-stream' END AS format
        |FROM e ORDER BY doc_id""".stripMargin,

    // k-per-group sampling replays exactly: the rank is the md5-hex draw
    // (fixed-width hex orders like the 48-bit number it encodes), ties
    // break to the lower id on both engines.
    "q_samp5_group_sample" ->
      """WITH d AS (SELECT lang, doc_id,
        |            substr(md5('s5:' || CAST(doc_id AS VARCHAR)), 1, 12) AS draw
        |          FROM documents),
        |  r AS (SELECT lang, doc_id,
        |          ROW_NUMBER() OVER (PARTITION BY lang ORDER BY draw, doc_id) AS rn
        |        FROM d)
        |SELECT lang, doc_id AS sample_id FROM r WHERE rn <= 3
        |ORDER BY lang, sample_id""".stripMargin,

    // Temperature mixture: the whole weight chain replays — sqrt is
    // IEEE-exact, weights are integer-quantized BEFORE the sum, and the
    // keep decision is an integer threshold compare on the md5 draw.
    // Double ops appear in the identical order as the Spark plan.
    "q_samp7_temperature_mix" ->
      raw"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |           FROM documents GROUP BY lang),
        |  t AS (SELECT CAST(count(*) AS BIGINT) AS big_n FROM documents),
        |  d AS (SELECT lang, n, big_n,
        |          CAST(floor(sqrt(CAST(n AS DOUBLE) / big_n) * 1e9) AS BIGINT) AS w
        |        FROM c CROSS JOIN t),
        |  ws AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM d),
        |  d3 AS (SELECT lang, n, w,
        |           CAST(floor(least(1.0,
        |             ((CAST(w AS DOUBLE) / wsum) * CAST(big_n * 3 // 5 AS DOUBLE)) / n)
        |             * 4294967296.0) AS BIGINT) AS thresh
        |         FROM d CROSS JOIN ws),
        |  k AS (SELECT doc_id, doc.lang FROM documents doc JOIN d3 USING (lang)
        |        WHERE CAST(('0x' || substr(md5('t7:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |              < thresh)
        |SELECT 'doc' AS section, doc_id, lang,
        |       CAST(NULL AS BIGINT) AS n, CAST(NULL AS BIGINT) AS w,
        |       CAST(NULL AS BIGINT) AS thresh
        |FROM k
        |UNION ALL
        |SELECT 'lang', NULL, lang, n, w, thresh FROM d3
        |ORDER BY section, doc_id, lang""".stripMargin,

    // Shard manifest: assignment (md5 mod), token counts, and the
    // order-independent fingerprint xor all re-derive exactly — a
    // dropped/duplicated doc or a divergent checksum hash-mismatches.
    "q_txt19_bpe_merges" -> bpeMergesSql(6),
    "q_txt20_bpe_vocab" -> bpeVocabSql(6),
    "q_txt21_byte_bpe_merges" -> byteBpeMergesSql(6),
    "q_txt22_byte_bpe_vocab" -> byteBpeVocabSql(6),

    // Token-budget shard cutting: the same md5-draw corpus order and
    // start-offset rule; the engine's two-level distributed prefix sum
    // collapses to ONE global running-sum window on a single node —
    // identical arithmetic, so the replay is exact.
    "q_samp10_token_shards" ->
      raw"""WITH a AS (SELECT doc_id,
        |            CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |                 ELSE len(string_split_regex(trim(text), '\s+')) END
        |              AS BIGINT) AS n_tokens,
        |            substr(md5('samp10:' || CAST(doc_id AS VARCHAR)), 1, 8)
        |              AS draw
        |          FROM documents),
        |  c AS (SELECT doc_id, n_tokens,
        |          CAST(COALESCE(SUM(n_tokens) OVER (
        |            ORDER BY draw, doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |            AS BIGINT) AS offset_tokens
        |        FROM a)
        |SELECT doc_id, n_tokens, offset_tokens,
        |       CAST(offset_tokens // 4096 AS BIGINT) AS shard
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_samp6_shard_manifest" ->
      raw"""WITH a AS (SELECT doc_id,
        |            CAST(('0x' || substr(md5('shard16:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS shard,
        |            CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |                 ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS tok,
        |            md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |          FROM documents),
        |  m AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |          CAST(sum(tok) AS BIGINT) AS sum_tokens,
        |          bit_xor(CAST(('0x' || substr(fp, 1, 15)) AS BIGINT)) AS content_xor,
        |          min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |        FROM a GROUP BY shard)
        |SELECT 'doc' AS section, doc_id, shard,
        |       CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS BIGINT) AS sum_tokens,
        |       CAST(NULL AS BIGINT) AS content_xor,
        |       CAST(NULL AS BIGINT) AS min_doc, CAST(NULL AS BIGINT) AS max_doc
        |FROM a
        |UNION ALL
        |SELECT 'shard', NULL, shard, n_docs, sum_tokens, content_xor,
        |       min_doc, max_doc
        |FROM m
        |ORDER BY section, doc_id, shard""".stripMargin,

    // GK-sketch percentiles: the approximate value is echoed iff it lies
    // inside the exact quantile bracket [q(p-0.02), q(p+0.02)] — the
    // sketch's rank-error guarantee (1/accuracy = 0.01) with margin.
    "q_a9_approx_percentile" ->
      s"""WITH o AS (SELECT event_type, p50, p95
         |           FROM read_parquet('$OUT/q_a9_approx_percentile/*.parquet')),
         |  x AS (SELECT event_type,
         |          quantile_disc(value, 0.48) AS q50lo, quantile_disc(value, 0.52) AS q50hi,
         |          quantile_disc(value, 0.93) AS q95lo, quantile_disc(value, 0.97) AS q95hi,
         |          quantile_disc(value, 0.50) AS e50, quantile_disc(value, 0.95) AS e95
         |        FROM events GROUP BY 1)
         |SELECT o.event_type,
         |       CASE WHEN o.p50 BETWEEN x.q50lo AND x.q50hi THEN o.p50 ELSE x.e50 END AS p50,
         |       CASE WHEN o.p95 BETWEEN x.q95lo AND x.q95hi THEN o.p95 ELSE x.e95 END AS p95
         |FROM o JOIN x USING (event_type) ORDER BY event_type""".stripMargin,

    // Profiler: exact per-column replay; min/max render through
    // portably-stringified types only (ints, strings, dates).
    "q_prof1_table_profile" -> {
      def one(c: String, expr: String): String =
        s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
           |       CAST(count(*) - count($expr) AS BIGINT) AS n_nulls,
           |       CAST(count(DISTINCT $expr) AS BIGINT) AS n_distinct,
           |       CAST(min($expr) AS VARCHAR) AS min_value,
           |       CAST(max($expr) AS VARCHAR) AS max_value
           |FROM lineitem""".stripMargin
      Seq("l_orderkey" -> "l_orderkey", "l_partkey" -> "l_partkey",
        "l_suppkey" -> "l_suppkey", "l_returnflag" -> "l_returnflag",
        "l_linestatus" -> "l_linestatus",
        "l_shipdate_d" -> "CAST(l_shipdate AS DATE)")
        .map { case (c, e) => one(c, e) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },

    // Skew planner: pure integer arithmetic (ppm share, ceil-division
    // salt factor); the top-20 cut tie-breaks on user_id so both
    // engines select the identical row set.
    "q_prof2_skew_salt" ->
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        |           FROM events GROUP BY 1),
        |  n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events)
        |SELECT user_id, cnt,
        |       CAST(cnt * 1000000 // n.n AS BIGINT) AS share_ppm,
        |       CAST(greatest(1, (cnt + 63) // 64) AS BIGINT) AS salt
        |FROM c CROSS JOIN n
        |ORDER BY cnt DESC, user_id LIMIT 20""".stripMargin,

    // NFC canonicalization: both engines implement the standard Unicode
    // composition algorithm — outputs must match byte-for-byte, and the
    // two combining marks vanish from the character count.
    "q_txt12_nfc_normalize" ->
      s"""WITH d AS (SELECT doc_id,
         |             text || ' cafe' || chr(769) || ' u' || chr(776) || 'ber' AS raw
         |           FROM documents)
         |SELECT doc_id, nfc_normalize(raw) AS nfc_text,
         |       CAST(length(raw) AS BIGINT) AS len_raw,
         |       CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc
         |FROM d ORDER BY doc_id""".stripMargin,

    // HTML synthesis AND extraction both replay: the page skeleton is
    // pure doc_id string arithmetic and every extraction regex is
    // RE2-safe (lazy [\s\S]*? spans, no lookaround), so DuckDB runs the
    // identical patterns with the 'g' flag.
    "q_txt14_html_extract" ->
      raw"""WITH h AS (SELECT doc_id,
        |            '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
        |            || '</title><style>body{margin:0}</style><script>var v='
        |            || CAST(doc_id % 97 AS VARCHAR)
        |            || ';</script></head><body><nav><a href="/home">Home</a> <a href="/about">About</a></nav><div id="main"><p>'
        |            || text || '</p><p>5 &lt; 6 &amp; 7 &gt; 4</p>'
        |            || CASE WHEN doc_id % 3 = 0
        |                    THEN '<a href="/more">see more</a>' ELSE '' END
        |            || '</div><footer>&copy; site '
        |            || CAST(doc_id % 10 AS VARCHAR)
        |            || '</footer></body></html>' AS html
        |          FROM documents),
        |  m AS (SELECT doc_id, html,
        |          trim(regexp_replace(
        |            regexp_replace(regexp_replace(regexp_replace(
        |            regexp_replace(regexp_replace(regexp_replace(
        |              regexp_replace(
        |                regexp_replace(regexp_replace(regexp_replace(
        |                regexp_replace(regexp_replace(regexp_replace(
        |                regexp_replace(html,
        |                  '(?i)<head(\s[^>]*)?>[\s\S]*?</head\s*>', ' ', 'g'),
        |                  '(?i)<script(\s[^>]*)?>[\s\S]*?</script\s*>', ' ', 'g'),
        |                  '(?i)<style(\s[^>]*)?>[\s\S]*?</style\s*>', ' ', 'g'),
        |                  '(?i)<nav(\s[^>]*)?>[\s\S]*?</nav\s*>', ' ', 'g'),
        |                  '(?i)<header(\s[^>]*)?>[\s\S]*?</header\s*>', ' ', 'g'),
        |                  '(?i)<footer(\s[^>]*)?>[\s\S]*?</footer\s*>', ' ', 'g'),
        |                  '(?i)<aside(\s[^>]*)?>[\s\S]*?</aside\s*>', ' ', 'g'),
        |                '<[^>]*>', ' ', 'g'),
        |              '&lt;', '<', 'g'), '&gt;', '>', 'g'),
        |              '&quot;', '"', 'g'), '&#39;', '''', 'g'),
        |              '&nbsp;', ' ', 'g'), '&amp;', '&', 'g'),
        |            '\s+', ' ', 'g')) AS main_text
        |        FROM h)
        |SELECT doc_id,
        |       regexp_extract(html, '(?i)<title[^>]*>([\s\S]*?)</title>', 1) AS title,
        |       main_text,
        |       CAST(len(regexp_extract_all(html, '(?i)<a\s[^>]*href')) AS BIGINT) AS n_links,
        |       CAST(length(main_text) * 100 // length(html) AS BIGINT) AS content_pct
        |FROM m ORDER BY doc_id""".stripMargin,

    // Domain-level curation is fully re-derivable: stats, verdicts and
    // survivors all recompute from the documents table (exact bigint
    // sums; ratios are single double divisions — bit-equal cross-engine).
    "q_cur2_source_filter" ->
      raw"""WITH t AS (SELECT doc_id, source,
        |            CASE WHEN length(trim(text)) = 0 THEN 0
        |                 ELSE len(string_split_regex(trim(text), '\s+')) END AS tok
        |          FROM documents),
        |  s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |          CAST(SUM(CASE WHEN tok < 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
        |          CAST(SUM(tok) AS BIGINT) AS sum_tok
        |        FROM t GROUP BY source),
        |  s2 AS (SELECT source, n_docs, n_short,
        |           CAST(n_short AS DOUBLE) / CAST(n_docs AS DOUBLE) AS short_frac,
        |           CAST(sum_tok AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avg_tokens
        |         FROM s)
        |SELECT 'src' AS section, source, n_docs, n_short, short_frac,
        |       avg_tokens, CAST(NULL AS BIGINT) AS doc_id
        |FROM s2
        |UNION ALL
        |SELECT 'doc', t.source, NULL, NULL, NULL, NULL, t.doc_id
        |FROM t JOIN s2 ON t.source = s2.source
        |WHERE s2.short_frac <= 0.22
        |ORDER BY section, source, doc_id""".stripMargin,

    // Keyword search replays exactly: the fixed-point log2 (msb position
    // from bin() length + linear interpolation on the next ten bits) is
    // pure 64-bit integer multiply/shift, scores are bigint sums, and
    // the rank tie-break (score DESC, doc ASC) is total — no
    // transcendentals, no float comparisons anywhere.
    "q_srch1_keyword_topk" ->
      raw"""WITH q AS (SELECT doc_id AS qid,
        |            array_to_string((string_split($norm, ' '))[1:5], ' ') AS qt
        |          FROM documents WHERE doc_id % 100 = 3),
        |  qterm AS (SELECT DISTINCT qid, unnest(string_split(qt, ' ')) AS t FROM q),
        |  w AS (SELECT doc_id AS d, unnest(string_split($norm, ' ')) AS t
        |        FROM documents),
        |  tf AS (SELECT d, t, CAST(count(*) AS BIGINT) AS tf FROM w
        |         WHERE t IN (SELECT t FROM qterm) GROUP BY 1, 2),
        |  dft AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |  n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |  il AS (SELECT dft.t, dft.df,
        |           (1024 * (length(bin(n.n)) - 1)
        |              + ((n.n * 1024) >> (length(bin(n.n)) - 1)) - 1024)
        |           - (1024 * (length(bin(dft.df)) - 1)
        |              + ((dft.df * 1024) >> (length(bin(dft.df)) - 1)) - 1024)
        |           AS idf
        |         FROM dft CROSS JOIN n),
        |  sc AS (SELECT qterm.qid, tf.d,
        |           CAST(SUM(tf.tf * il.idf) AS BIGINT) AS s
        |         FROM tf JOIN qterm USING (t) JOIN il USING (t)
        |         GROUP BY 1, 2),
        |  rk AS (SELECT qid, d, s,
        |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, d ASC) AS rn
        |         FROM sc WHERE s > 0)
        |SELECT qid AS query_id, CAST(rn AS BIGINT) AS "rank", d AS doc_id,
        |       s AS score
        |FROM rk WHERE rn <= 5 ORDER BY query_id, "rank"""".stripMargin,

    // BM25: all-integer replay — fixed-point idf (Lucene form, halves
    // cancel), avgdl/length-ratio/saturation denominator in thousandths,
    // one positive integer division per (query, term, doc).
    // Capacity (16) exceeds the distinct-term count (5), so the
    // Misra-Gries summary is exact and replayable as plain per-window
    // counts ranked (count desc, term asc).
    "q_srch4_trending_terms" ->
      """SELECT window_start, term, cnt, rnk FROM (
        |  SELECT date_trunc('hour', ts) AS window_start,
        |         event_type AS term,
        |         CAST(COUNT(*) AS BIGINT) AS cnt,
        |         ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
        |           ORDER BY COUNT(*) DESC, event_type ASC) AS rnk
        |  FROM events GROUP BY 1, 2)
        |ORDER BY window_start, rnk""".stripMargin,

    "q_srch3_bm25" ->
      raw"""WITH q AS (SELECT doc_id AS qid,
        |            array_to_string((string_split($norm, ' '))[1:5], ' ') AS qt
        |          FROM documents WHERE doc_id % 100 = 3),
        |  qterm AS (SELECT DISTINCT qid, unnest(string_split(qt, ' ')) AS t FROM q),
        |  wd AS (SELECT doc_id AS d, string_split($norm, ' ') AS ws FROM documents),
        |  w AS (SELECT d, CAST(len(ws) AS BIGINT) AS dl, unnest(ws) AS t FROM wd),
        |  tf AS (SELECT d, dl, t, CAST(count(*) AS BIGINT) AS tf FROM w
        |         WHERE t IN (SELECT t FROM qterm) GROUP BY 1, 2, 3),
        |  dft AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |  st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |           CAST(SUM(len(ws)) AS BIGINT) AS tl FROM wd),
        |  il AS (SELECT dft.t, dft.df,
        |           (1024 * (length(bin(2 * st.n + 2)) - 1)
        |              + (((2 * st.n + 2) * 1024) >> (length(bin(2 * st.n + 2)) - 1)) - 1024)
        |           - (1024 * (length(bin(2 * dft.df + 1)) - 1)
        |              + (((2 * dft.df + 1) * 1024) >> (length(bin(2 * dft.df + 1)) - 1)) - 1024)
        |           AS idf,
        |           greatest(st.tl * 1000 // st.n, 1) AS avgdl1000
        |         FROM dft CROSS JOIN st),
        |  sc AS (SELECT qterm.qid, tf.d,
        |           CAST(SUM((il.idf * tf.tf * 2200 * 1000) //
        |             (tf.tf * 1000 + (1200 * (250 +
        |               (750 * ((tf.dl * 1000000) // il.avgdl1000)) // 1000)) // 1000))
        |           AS BIGINT) AS s
        |         FROM tf JOIN qterm USING (t) JOIN il USING (t)
        |         GROUP BY 1, 2),
        |  rk AS (SELECT qid, d, s,
        |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, d ASC) AS rn
        |         FROM sc WHERE s > 0)
        |SELECT qid AS query_id, CAST(rn AS BIGINT) AS "rank", d AS doc_id,
        |       s AS score
        |FROM rk WHERE rn <= 5 ORDER BY query_id, "rank"""".stripMargin,

    // The bloom filter is an accelerator, not a semantic: the operator's
    // contract is exactly batch ∖ corpus by md5 content fingerprint, so
    // the oracle is a plain anti-join — nothing probabilistic to replay.
    "q_dd11_bloom_gate" ->
      s"""WITH corpus AS (SELECT md5($norm) AS fp FROM documents WHERE doc_id % 5 <> 0),
         |  batch AS (SELECT doc_id, md5($norm) AS fp FROM documents WHERE doc_id % 5 = 0
         |            UNION ALL
         |            SELECT doc_id + 1000000, md5($norm) FROM documents WHERE doc_id % 7 = 0)
         |SELECT b.doc_id, b.fp FROM batch b
         |ANTI JOIN corpus c ON b.fp = c.fp
         |ORDER BY b.doc_id""".stripMargin,

    // Only the centroid VALUES are trusted input (echoed at the float
    // precision the kernel computes with); cell assignment (argmax
    // cosine, ties to the lowest cell, NaN/zero-norm floored to -2),
    // the within-cell cosine pair graph, connected components and the
    // keep-one decision are all re-derived from the embeddings table.
    "q_dd10_semantic_dedup" ->
      s"""WITH RECURSIVE o AS (SELECT * FROM read_parquet('$OUT/q_dd10_semantic_dedup/*.parquet')),
         |  cent AS (SELECT cell, centroid, CAST(centroid AS DOUBLE[]) AS cv
         |           FROM o WHERE section = 'centroid'),
         |  e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |  sims AS (SELECT e.vec_id, cent.cell,
         |             coalesce(${cosSql("e.v", "cent.cv")}, -2.0) AS s0
         |           FROM e CROSS JOIN cent),
         |  sims2 AS (SELECT vec_id, cell,
         |              CASE WHEN isnan(s0) THEN -2.0 ELSE s0 END AS s FROM sims),
         |  asg AS (SELECT vec_id, cell FROM (
         |            SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |              ORDER BY s DESC, cell ASC) AS rn FROM sims2)
         |          WHERE rn = 1),
         |  pr AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b
         |         FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id < y.vec_id
         |              JOIN e a ON a.vec_id = x.vec_id
         |              JOIN e b ON b.vec_id = y.vec_id
         |         WHERE ${cosSql("a.v", "b.v")} >= 0.9),
         |  edges AS (SELECT id_a AS src, id_b AS dst FROM pr
         |            UNION SELECT id_b, id_a FROM pr),
         |  cc(node, label) AS (
         |    SELECT src, src FROM (SELECT DISTINCT src FROM edges) t0
         |    UNION
         |    SELECT e2.dst, cc.label FROM cc JOIN edges e2 ON cc.node = e2.src),
         |  lab AS (SELECT node, MIN(label) AS cl FROM cc GROUP BY node),
         |  d AS (SELECT asg.vec_id, CAST(asg.cell AS BIGINT) AS cell,
         |          CAST(coalesce(lab.cl, asg.vec_id) AS BIGINT) AS cluster_id,
         |          coalesce(lab.cl, asg.vec_id) = asg.vec_id AS kept
         |        FROM asg LEFT JOIN lab ON lab.node = asg.vec_id)
         |SELECT 'centroid' AS section, cell, centroid,
         |       CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS BIGINT) AS cluster_id,
         |       CAST(NULL AS BOOLEAN) AS kept
         |FROM cent
         |UNION ALL
         |SELECT 'doc', cell, NULL, vec_id, cluster_id, kept FROM d
         |ORDER BY section, cell, vec_id""".stripMargin,

    // Corpus signatures are trusted input; bucket candidates (signature
    // equality), the cosine rerank from the embeddings table and the
    // top-k cut (cos desc, id asc — the topKByScore contract) are
    // re-derived.
    "q_sim2_lsh_ann" ->
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_sim2_lsh_ann/*.parquet')),
         |  s AS (SELECT vec_id, sig FROM o WHERE section = 'sig'),
         |  e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |  q AS (SELECT vec_id AS query_id, sig FROM s WHERE vec_id < 8),
         |  cand AS (SELECT q.query_id, s.vec_id AS neighbor_id
         |           FROM q JOIN s ON q.sig = s.sig AND s.vec_id <> q.query_id),
         |  sc AS (SELECT query_id, neighbor_id, ${cosSql("qe.v", "ne.v")} AS cos_sim
         |         FROM cand JOIN e qe ON qe.vec_id = cand.query_id
         |                   JOIN e ne ON ne.vec_id = cand.neighbor_id),
         |  r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM sc)
         |SELECT 'sig' AS section, vec_id, sig, CAST(NULL AS BIGINT) AS query_id,
         |       CAST(NULL AS BIGINT) AS neighbor_id, CAST(NULL AS BIGINT) AS rank,
         |       CAST(NULL AS DOUBLE) AS cos_sim
         |FROM s
         |UNION ALL
         |SELECT 'topk', NULL, NULL, query_id, neighbor_id, CAST(rank AS BIGINT), cos_sim
         |FROM r WHERE rank <= 5
         |ORDER BY section, vec_id, query_id, rank""".stripMargin,

    // ANN recall: both retrieval paths replay — the exact cosine top-5
    // from the embeddings table, the approximate side from the echoed
    // signatures — then the intersection and integer recall arithmetic.
    "q_sim8_ann_recall" ->
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_sim8_ann_recall/*.parquet')),
         |  s AS (SELECT planes, vec_id, sig FROM o WHERE section = 'sig'),
         |  e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |  q AS (SELECT planes, vec_id AS query_id, sig FROM s WHERE vec_id < 8),
         |  cand AS (SELECT q.planes, q.query_id, s.vec_id AS neighbor_id
         |           FROM q JOIN s ON q.planes = s.planes AND q.sig = s.sig
         |                        AND s.vec_id <> q.query_id),
         |  asc_ AS (SELECT planes, query_id, neighbor_id,
         |             ${cosSql("qe.v", "ne.v")} AS cs
         |           FROM cand JOIN e qe ON qe.vec_id = cand.query_id
         |                     JOIN e ne ON ne.vec_id = cand.neighbor_id),
         |  ar AS (SELECT planes, query_id, neighbor_id FROM (
         |           SELECT *, ROW_NUMBER() OVER (PARTITION BY planes, query_id
         |             ORDER BY cs DESC, neighbor_id ASC) AS rk FROM asc_)
         |         WHERE rk <= 5),
         |  ex AS (SELECT query_id, neighbor_id FROM (
         |           SELECT qe.vec_id AS query_id, ne.vec_id AS neighbor_id,
         |             ROW_NUMBER() OVER (PARTITION BY qe.vec_id
         |               ORDER BY ${cosSql("qe.v", "ne.v")} DESC, ne.vec_id ASC) AS rk
         |           FROM e qe JOIN e ne ON ne.vec_id <> qe.vec_id
         |           WHERE qe.vec_id < 8)
         |         WHERE rk <= 5),
         |  pl AS (SELECT DISTINCT planes FROM s),
         |  rec AS (SELECT pl.planes, ex.query_id,
         |            CAST(count(*) AS BIGINT) AS n_exact,
         |            CAST(count(ar.neighbor_id) AS BIGINT) AS n_hit
         |          FROM ex CROSS JOIN pl
         |          LEFT JOIN ar ON ar.planes = pl.planes
         |                      AND ar.query_id = ex.query_id
         |                      AND ar.neighbor_id = ex.neighbor_id
         |          GROUP BY 1, 2)
         |SELECT 'sig' AS section, planes, vec_id, sig,
         |       CAST(NULL AS BIGINT) AS query_id,
         |       CAST(NULL AS BIGINT) AS n_exact, CAST(NULL AS BIGINT) AS n_hit,
         |       CAST(NULL AS BIGINT) AS recall_pct
         |FROM s
         |UNION ALL
         |SELECT 'recall', planes, NULL, NULL, query_id, n_exact, n_hit,
         |       CAST(n_hit * 100 // n_exact AS BIGINT)
         |FROM rec
         |ORDER BY section, planes, vec_id, query_id""".stripMargin,

    // Multi-probe LSH: probe sets are integer signature arithmetic
    // (sig XOR one-bit flips), so both probing strategies replay fully.
    "q_sim9_multiprobe" ->
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_sim9_multiprobe/*.parquet')),
         |  s AS (SELECT vec_id, sig FROM o WHERE section = 'sig'),
         |  e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |  q AS (SELECT vec_id AS query_id, sig FROM s WHERE vec_id < 8),
         |  qp AS (SELECT query_id, sig FROM q
         |         UNION
         |         SELECT query_id, xor(sig, 1 << b) AS sig
         |         FROM q CROSS JOIN (SELECT unnest(range(0, 6)) AS b)),
         |  c1 AS (SELECT DISTINCT q.query_id, s.vec_id AS neighbor_id
         |         FROM q JOIN s ON q.sig = s.sig AND s.vec_id <> q.query_id),
         |  cm AS (SELECT DISTINCT qp.query_id, s.vec_id AS neighbor_id
         |         FROM qp JOIN s ON qp.sig = s.sig AND s.vec_id <> qp.query_id),
         |  r1 AS (SELECT query_id, neighbor_id FROM (
         |           SELECT c1.query_id, c1.neighbor_id,
         |             ROW_NUMBER() OVER (PARTITION BY c1.query_id
         |               ORDER BY ${cosSql("qe.v", "ne.v")} DESC, c1.neighbor_id ASC) AS rk
         |           FROM c1 JOIN e qe ON qe.vec_id = c1.query_id
         |                   JOIN e ne ON ne.vec_id = c1.neighbor_id)
         |         WHERE rk <= 5),
         |  rm AS (SELECT query_id, neighbor_id FROM (
         |           SELECT cm.query_id, cm.neighbor_id,
         |             ROW_NUMBER() OVER (PARTITION BY cm.query_id
         |               ORDER BY ${cosSql("qe.v", "ne.v")} DESC, cm.neighbor_id ASC) AS rk
         |           FROM cm JOIN e qe ON qe.vec_id = cm.query_id
         |                   JOIN e ne ON ne.vec_id = cm.neighbor_id)
         |         WHERE rk <= 5),
         |  ex AS (SELECT query_id, neighbor_id FROM (
         |           SELECT qe.vec_id AS query_id, ne.vec_id AS neighbor_id,
         |             ROW_NUMBER() OVER (PARTITION BY qe.vec_id
         |               ORDER BY ${cosSql("qe.v", "ne.v")} DESC, ne.vec_id ASC) AS rk
         |           FROM e qe JOIN e ne ON ne.vec_id <> qe.vec_id
         |           WHERE qe.vec_id < 8)
         |         WHERE rk <= 5),
         |  rec AS (SELECT 'single' AS method, ex.query_id,
         |            CAST(count(*) AS BIGINT) AS n_exact,
         |            CAST(count(r1.neighbor_id) AS BIGINT) AS n_hit
         |          FROM ex LEFT JOIN r1 ON r1.query_id = ex.query_id
         |                              AND r1.neighbor_id = ex.neighbor_id
         |          GROUP BY 2
         |          UNION ALL
         |          SELECT 'multiprobe', ex.query_id,
         |            CAST(count(*) AS BIGINT),
         |            CAST(count(rm.neighbor_id) AS BIGINT)
         |          FROM ex LEFT JOIN rm ON rm.query_id = ex.query_id
         |                              AND rm.neighbor_id = ex.neighbor_id
         |          GROUP BY 2)
         |SELECT 'sig' AS section, vec_id, sig, CAST(NULL AS VARCHAR) AS method,
         |       CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS n_exact,
         |       CAST(NULL AS BIGINT) AS n_hit, CAST(NULL AS BIGINT) AS recall_pct
         |FROM s
         |UNION ALL
         |SELECT 'recall', NULL, NULL, method, query_id, n_exact, n_hit,
         |       CAST(n_hit * 100 // n_exact AS BIGINT)
         |FROM rec
         |ORDER BY section, vec_id, method, query_id""".stripMargin,

    // Only the centroids are trusted input: corpus cell assignment, probe
    // selection (top-nprobe cells by cosine, ties to the lowest cell),
    // the in-cell rerank and the top-k cut are all re-derived.
    // Index maintenance: assignment (argmax with the NaN→-2 floor and
    // lowest-cell tie-break), occupancy and the integer similarity sums
    // all re-derive from the echoed centroids — no division anywhere, so
    // there is no trunc-vs-floor hazard.
    "q_sim11_index_maintenance" ->
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_sim11_index_maintenance/*.parquet')),
         |  cent AS (SELECT cell, centroid, CAST(centroid AS DOUBLE[]) AS cv
         |           FROM o WHERE section = 'centroid'),
         |  e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |          CASE WHEN vec_id % 10 = 0 THEN 'batch' ELSE 'corpus' END AS role
         |        FROM embeddings),
         |  sims AS (SELECT e.vec_id, e.role, cent.cell,
         |             coalesce(${cosSql("e.v", "cent.cv")}, -2.0) AS s0
         |           FROM e CROSS JOIN cent),
         |  sims2 AS (SELECT vec_id, role, cell,
         |              CASE WHEN isnan(s0) THEN -2.0 ELSE s0 END AS s FROM sims),
         |  asg AS (SELECT vec_id, role, cell, s FROM (
         |            SELECT vec_id, role, cell, s,
         |              ROW_NUMBER() OVER (PARTITION BY vec_id
         |                ORDER BY s DESC, cell ASC) AS rn FROM sims2)
         |          WHERE rn = 1),
         |  st AS (SELECT role, CAST(cell AS BIGINT) AS cell,
         |           CAST(count(*) AS BIGINT) AS n,
         |           CAST(SUM(CAST(floor(s * 1e6) AS BIGINT)) AS BIGINT) AS sum_sim_ppm
         |         FROM asg GROUP BY 1, 2)
         |SELECT 'centroid' AS section, cell, centroid,
         |       CAST(NULL AS VARCHAR) AS role, CAST(NULL AS BIGINT) AS n,
         |       CAST(NULL AS BIGINT) AS sum_sim_ppm
         |FROM cent
         |UNION ALL
         |SELECT 'cells', cell, NULL, role, n, sum_sim_ppm FROM st
         |ORDER BY section, cell, role""".stripMargin,

    // Topic-cluster profile: centroids trusted; cell assignment, the
    // per-cell size/char aggregates, the dominant-language pick and the
    // integer-pinned exemplar argmax (incl. both tie-breaks) re-derive
    // from the raw embeddings + documents tables.
    "q_clu1_topic_profile" ->
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_clu1_topic_profile/*.parquet')),
         |  cent AS (SELECT cell, centroid, CAST(centroid AS DOUBLE[]) AS cv
         |           FROM o WHERE section = 'centroid'),
         |  e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |  sims AS (SELECT e.vec_id, cent.cell,
         |             coalesce(${cosSql("e.v", "cent.cv")}, -2.0) AS s0
         |           FROM e CROSS JOIN cent),
         |  sims2 AS (SELECT vec_id, cell,
         |              CASE WHEN isnan(s0) THEN -2.0 ELSE s0 END AS s FROM sims),
         |  asg AS (SELECT vec_id, cell, s FROM (
         |            SELECT vec_id, cell, s, ROW_NUMBER() OVER (PARTITION BY vec_id
         |              ORDER BY s DESC, cell ASC) AS rn FROM sims2)
         |          WHERE rn = 1),
         |  j AS (SELECT a.cell, d.doc_id, d.lang, d.n_chars,
         |          CAST(floor(a.s * 1e6) AS BIGINT) AS sim_ppm
         |        FROM asg a JOIN documents d ON d.doc_id = a.vec_id),
         |  core AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_docs,
         |             CAST(SUM(n_chars) AS BIGINT) AS n_chars
         |           FROM j GROUP BY cell),
         |  ex AS (SELECT cell, doc_id AS exemplar_id, sim_ppm AS exemplar_sim_ppm
         |         FROM (SELECT cell, doc_id, sim_ppm, ROW_NUMBER() OVER (
         |                 PARTITION BY cell ORDER BY sim_ppm DESC, doc_id ASC) AS rn
         |               FROM j) WHERE rn = 1),
         |  lc AS (SELECT cell, lang, CAST(count(*) AS BIGINT) AS ln
         |         FROM j GROUP BY cell, lang),
         |  tl AS (SELECT cell, lang AS top_lang, ln AS top_lang_n
         |         FROM (SELECT cell, lang, ln, ROW_NUMBER() OVER (
         |                 PARTITION BY cell ORDER BY ln DESC, lang ASC) AS rn
         |               FROM lc) WHERE rn = 1)
         |SELECT 'centroid' AS section, cell, centroid,
         |       CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS BIGINT) AS n_chars,
         |       CAST(NULL AS VARCHAR) AS top_lang, CAST(NULL AS BIGINT) AS top_lang_n,
         |       CAST(NULL AS BIGINT) AS exemplar_id,
         |       CAST(NULL AS BIGINT) AS exemplar_sim_ppm
         |FROM cent
         |UNION ALL
         |SELECT 'cluster', c.cell, NULL, c.n_docs, c.n_chars, t.top_lang,
         |       t.top_lang_n, x.exemplar_id, x.exemplar_sim_ppm
         |FROM core c JOIN tl t USING (cell) JOIN ex x USING (cell)
         |ORDER BY section, cell""".stripMargin,

    // Coverage sampling: centroids trusted; assignment, the per-cell
    // closeness ranking (sim-ppm desc, lower vec_id on ties) and the
    // k=32 cut all re-derive from the embeddings table.
    // DSIR importance selection: FULL replay — md5-hashed unigram+bigram
    // buckets, add-1-smoothed fixed-point log-prob ratio target-vs-raw,
    // integral per-occurrence terms (shuffle-order-proof sums), top-100
    // by (logw desc, doc_id). Nothing engine-specific rides through.
    "q_samp9_dsir" ->
      s"""WITH d AS (SELECT doc_id, lang, string_split($norm, ' ') AS ws
         |           FROM documents),
         |  uni AS (SELECT doc_id, lang, unnest(ws) AS f FROM d),
         |  bgx AS (SELECT doc_id, lang, unnest(range(1, len(ws))) AS i, ws FROM d),
         |  bg AS (SELECT doc_id, lang, ws[i] || ' ' || ws[i + 1] AS f FROM bgx),
         |  fa AS (SELECT * FROM uni UNION ALL SELECT * FROM bg),
         |  fb AS (SELECT doc_id, lang,
         |           CAST(('0x' || substr(md5('dsir:' || f), 1, 8)) AS BIGINT)
         |             % 1024 AS b
         |         FROM fa),
         |  pf AS (SELECT doc_id, lang, b, CAST(count(*) AS BIGINT) AS c
         |         FROM fb GROUP BY 1, 2, 3),
         |  cb AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cr,
         |           CAST(SUM(CASE WHEN lang = 'en' THEN c ELSE 0 END)
         |             AS BIGINT) AS ct
         |         FROM pf GROUP BY 1),
         |  tt AS (SELECT CAST(SUM(cr) AS BIGINT) AS totr,
         |                CAST(SUM(ct) AS BIGINT) AS tott FROM cb),
         |  w AS (SELECT b, (${ilSql("(ct + 1)")} - ${ilSql("(tott + 1024)")})
         |            - (${ilSql("(cr + 1)")} - ${ilSql("(totr + 1024)")}) AS wb
         |        FROM cb CROSS JOIN tt),
         |  dw AS (SELECT pf.doc_id, pf.lang,
         |           CAST(SUM(pf.c * w.wb) AS BIGINT) AS logw_1024,
         |           CAST(SUM(pf.c) AS BIGINT) AS n_features
         |         FROM pf JOIN w USING (b) GROUP BY 1, 2)
         |SELECT doc_id, lang, logw_1024, n_features FROM dw
         |ORDER BY logw_1024 DESC, doc_id LIMIT 100""".stripMargin,

    // NB quality classifier: FULL replay — same md5 feature hashing as
    // dsir (shared featurizer contract), per-class add-1-smoothed bucket
    // counts from the TRAIN split only (LEFT JOIN ≙ the engine's
    // materialized full-bucket model: unseen buckets get the smoothing
    // weight), add-1 log-prior over train doc counts, held-out scoring,
    // Bayes decision at 0, top-100 by (score desc, doc_id).
    "q_cls1_nb_quality" ->
      s"""WITH d AS (SELECT doc_id, lang, string_split($norm, ' ') AS ws
         |           FROM documents),
         |  uni AS (SELECT doc_id, lang, unnest(ws) AS f FROM d),
         |  bgx AS (SELECT doc_id, lang, unnest(range(1, len(ws))) AS i, ws FROM d),
         |  bg AS (SELECT doc_id, lang, ws[i] || ' ' || ws[i + 1] AS f FROM bgx),
         |  fa AS (SELECT * FROM uni UNION ALL SELECT * FROM bg),
         |  fb AS (SELECT doc_id, lang,
         |           CAST(('0x' || substr(md5('nbq:' || f), 1, 8)) AS BIGINT)
         |             % 1024 AS b
         |         FROM fa),
         |  cb AS (SELECT b,
         |           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
         |             AS BIGINT) AS cp,
         |           CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
         |             AS BIGINT) AS cn
         |         FROM fb WHERE doc_id % 5 <> 0 GROUP BY 1),
         |  tt AS (SELECT CAST(SUM(cp) AS BIGINT) AS tp,
         |                CAST(SUM(cn) AS BIGINT) AS tn FROM cb),
         |  pf AS (SELECT doc_id, lang, b, CAST(count(*) AS BIGINT) AS c
         |         FROM fb WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3),
         |  pj AS (SELECT pf.doc_id, pf.lang, pf.c,
         |           coalesce(cb.cp, 0) AS cp, coalesce(cb.cn, 0) AS cn
         |         FROM pf LEFT JOIN cb USING (b)),
         |  wj AS (SELECT doc_id, lang, c,
         |           (${ilSql("(cp + 1)")} - ${ilSql("(tp + 1024)")})
         |             - (${ilSql("(cn + 1)")} - ${ilSql("(tn + 1024)")}) AS wb
         |         FROM pj CROSS JOIN tt),
         |  pr AS (SELECT ${ilSql("(np + 1)")} - ${ilSql("(nn + 1)")} AS prior
         |         FROM (SELECT
         |             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
         |               AS BIGINT) AS np,
         |             CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
         |               AS BIGINT) AS nn
         |           FROM documents WHERE doc_id % 5 <> 0)),
         |  dw AS (SELECT doc_id, lang,
         |           CAST(SUM(c * wb) AS BIGINT) AS ll,
         |           CAST(SUM(c) AS BIGINT) AS n_features
         |         FROM wj GROUP BY 1, 2)
         |SELECT doc_id, lang, CAST(ll + prior AS BIGINT) AS score_1024,
         |       n_features, (ll + prior) > 0 AS predicted_positive
         |FROM dw CROSS JOIN pr
         |ORDER BY score_1024 DESC, doc_id LIMIT 100""".stripMargin,

    // Classifier calibration: the SAME replayed chain as q_cls1 (train
    // split, smoothing, prior, decision), folded to the held-out
    // confusion matrix + ppm rates with guarded denominators.
    "q_cls2_nb_eval" ->
      s"""WITH d AS (SELECT doc_id, lang, string_split($norm, ' ') AS ws
         |           FROM documents),
         |  uni AS (SELECT doc_id, lang, unnest(ws) AS f FROM d),
         |  bgx AS (SELECT doc_id, lang, unnest(range(1, len(ws))) AS i, ws FROM d),
         |  bg AS (SELECT doc_id, lang, ws[i] || ' ' || ws[i + 1] AS f FROM bgx),
         |  fa AS (SELECT * FROM uni UNION ALL SELECT * FROM bg),
         |  fb AS (SELECT doc_id, lang,
         |           CAST(('0x' || substr(md5('nbq:' || f), 1, 8)) AS BIGINT)
         |             % 1024 AS b
         |         FROM fa),
         |  cb AS (SELECT b,
         |           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
         |             AS BIGINT) AS cp,
         |           CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
         |             AS BIGINT) AS cn
         |         FROM fb WHERE doc_id % 5 <> 0 GROUP BY 1),
         |  tt AS (SELECT CAST(SUM(cp) AS BIGINT) AS tp0,
         |                CAST(SUM(cn) AS BIGINT) AS tn0 FROM cb),
         |  pf AS (SELECT doc_id, lang, b, CAST(count(*) AS BIGINT) AS c
         |         FROM fb WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3),
         |  pj AS (SELECT pf.doc_id, pf.lang, pf.c,
         |           coalesce(cb.cp, 0) AS cp, coalesce(cb.cn, 0) AS cn
         |         FROM pf LEFT JOIN cb USING (b)),
         |  wj AS (SELECT doc_id, lang, c,
         |           (${ilSql("(cp + 1)")} - ${ilSql("(tp0 + 1024)")})
         |             - (${ilSql("(cn + 1)")} - ${ilSql("(tn0 + 1024)")}) AS wb
         |         FROM pj CROSS JOIN tt),
         |  pr AS (SELECT ${ilSql("(np + 1)")} - ${ilSql("(nn + 1)")} AS prior
         |         FROM (SELECT
         |             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
         |               AS BIGINT) AS np,
         |             CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
         |               AS BIGINT) AS nn
         |           FROM documents WHERE doc_id % 5 <> 0)),
         |  dw AS (SELECT doc_id, lang, CAST(SUM(c * wb) AS BIGINT) AS ll
         |         FROM wj GROUP BY 1, 2),
         |  dec AS (SELECT lang = 'en' AS truth, (ll + prior) > 0 AS pred
         |          FROM dw CROSS JOIN pr),
         |  cm AS (SELECT
         |      CAST(SUM(CASE WHEN truth AND pred THEN 1 ELSE 0 END)
         |        AS BIGINT) AS tp,
         |      CAST(SUM(CASE WHEN NOT truth AND pred THEN 1 ELSE 0 END)
         |        AS BIGINT) AS fp,
         |      CAST(SUM(CASE WHEN truth AND NOT pred THEN 1 ELSE 0 END)
         |        AS BIGINT) AS fn,
         |      CAST(SUM(CASE WHEN NOT truth AND NOT pred THEN 1 ELSE 0 END)
         |        AS BIGINT) AS tn
         |    FROM dec)
         |SELECT tp, fp, fn, tn,
         |  CAST((tp + tn) * 1000000 // (tp + fp + fn + tn) AS BIGINT)
         |    AS accuracy_ppm,
         |  CASE WHEN tp + fp > 0
         |    THEN CAST(tp * 1000000 // (tp + fp) AS BIGINT) END
         |    AS precision_ppm,
         |  CASE WHEN tp + fn > 0
         |    THEN CAST(tp * 1000000 // (tp + fn) AS BIGINT) END
         |    AS recall_ppm
         |FROM cm""".stripMargin,

    "q_samp8_coverage_sample" ->
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_samp8_coverage_sample/*.parquet')),
         |  cent AS (SELECT cell, centroid, CAST(centroid AS DOUBLE[]) AS cv
         |           FROM o WHERE section = 'centroid'),
         |  e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |  sims AS (SELECT e.vec_id, cent.cell,
         |             coalesce(${cosSql("e.v", "cent.cv")}, -2.0) AS s0
         |           FROM e CROSS JOIN cent),
         |  sims2 AS (SELECT vec_id, cell,
         |              CASE WHEN isnan(s0) THEN -2.0 ELSE s0 END AS s FROM sims),
         |  asg AS (SELECT vec_id, cell, CAST(floor(s * 1e6) AS BIGINT) AS sim_ppm
         |          FROM (SELECT vec_id, cell, s, ROW_NUMBER() OVER (PARTITION BY vec_id
         |                  ORDER BY s DESC, cell ASC) AS rn FROM sims2)
         |          WHERE rn = 1),
         |  kept AS (SELECT cell, CAST(rn AS BIGINT) AS "rank", vec_id, sim_ppm
         |           FROM (SELECT cell, vec_id, sim_ppm, ROW_NUMBER() OVER (
         |                   PARTITION BY cell ORDER BY sim_ppm DESC, vec_id ASC) AS rn
         |                 FROM asg)
         |           WHERE rn <= 32)
         |SELECT 'centroid' AS section, cell, centroid,
         |       CAST(NULL AS BIGINT) AS "rank", CAST(NULL AS BIGINT) AS vec_id,
         |       CAST(NULL AS BIGINT) AS sim_ppm
         |FROM cent
         |UNION ALL
         |SELECT 'kept', cell, NULL, "rank", vec_id, sim_ppm FROM kept
         |ORDER BY section, cell, "rank", vec_id""".stripMargin,

    "q_sim3_ivf_ann" ->
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_sim3_ivf_ann/*.parquet')),
         |  cent AS (SELECT cell, centroid, CAST(centroid AS DOUBLE[]) AS cv
         |           FROM o WHERE section = 'centroid'),
         |  e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |  sims AS (SELECT e.vec_id, cent.cell,
         |             coalesce(${cosSql("e.v", "cent.cv")}, -2.0) AS s0
         |           FROM e CROSS JOIN cent),
         |  sims2 AS (SELECT vec_id, cell,
         |              CASE WHEN isnan(s0) THEN -2.0 ELSE s0 END AS s FROM sims),
         |  asg AS (SELECT vec_id, cell FROM (
         |            SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |              ORDER BY s DESC, cell ASC) AS rn FROM sims2)
         |          WHERE rn = 1),
         |  probe AS (SELECT vec_id AS query_id, cell FROM (
         |              SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |                ORDER BY s DESC, cell ASC) AS rn FROM sims2
         |              WHERE vec_id < 8)
         |            WHERE rn <= 3),
         |  cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
         |           FROM probe p JOIN asg a ON a.cell = p.cell
         |           WHERE a.vec_id <> p.query_id),
         |  sc AS (SELECT query_id, neighbor_id, ${cosSql("qe.v", "ne.v")} AS cos_sim
         |         FROM cand JOIN e qe ON qe.vec_id = cand.query_id
         |                   JOIN e ne ON ne.vec_id = cand.neighbor_id),
         |  r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM sc)
         |SELECT 'centroid' AS section, cell, centroid, CAST(NULL AS BIGINT) AS query_id,
         |       CAST(NULL AS BIGINT) AS neighbor_id, CAST(NULL AS BIGINT) AS rank,
         |       CAST(NULL AS DOUBLE) AS cos_sim
         |FROM cent
         |UNION ALL
         |SELECT 'topk', NULL, NULL, query_id, neighbor_id, CAST(rank AS BIGINT), cos_sim
         |FROM r WHERE rank <= 5
         |ORDER BY section, cell, query_id, rank""".stripMargin,

    // Filtered ANN replay: sim3's machinery with the label predicate on
    // the CORPUS side only — assignment/candidates/rerank all re-derive
    // over the qualifying subset; queries stay unfiltered.
    "q_sim12_filtered_ann" ->
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_sim12_filtered_ann/*.parquet')),
         |  cent AS (SELECT cell, centroid, CAST(centroid AS DOUBLE[]) AS cv
         |           FROM o WHERE section = 'centroid'),
         |  e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |  ef AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |         FROM embeddings WHERE label < 3),
         |  simsf AS (SELECT ef.vec_id, cent.cell,
         |              coalesce(${cosSql("ef.v", "cent.cv")}, -2.0) AS s0
         |            FROM ef CROSS JOIN cent),
         |  simsf2 AS (SELECT vec_id, cell,
         |               CASE WHEN isnan(s0) THEN -2.0 ELSE s0 END AS s FROM simsf),
         |  asg AS (SELECT vec_id, cell FROM (
         |            SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |              ORDER BY s DESC, cell ASC) AS rn FROM simsf2)
         |          WHERE rn = 1),
         |  simsq AS (SELECT e.vec_id, cent.cell,
         |              coalesce(${cosSql("e.v", "cent.cv")}, -2.0) AS s0
         |            FROM e CROSS JOIN cent WHERE e.vec_id < 8),
         |  simsq2 AS (SELECT vec_id, cell,
         |               CASE WHEN isnan(s0) THEN -2.0 ELSE s0 END AS s FROM simsq),
         |  probe AS (SELECT vec_id AS query_id, cell FROM (
         |              SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |                ORDER BY s DESC, cell ASC) AS rn FROM simsq2)
         |            WHERE rn <= 3),
         |  cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
         |           FROM probe p JOIN asg a ON a.cell = p.cell
         |           WHERE a.vec_id <> p.query_id),
         |  sc AS (SELECT query_id, neighbor_id, ${cosSql("qe.v", "ne.v")} AS cos_sim
         |         FROM cand JOIN e qe ON qe.vec_id = cand.query_id
         |                   JOIN ef ne ON ne.vec_id = cand.neighbor_id),
         |  r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM sc)
         |SELECT 'centroid' AS section, cell, centroid, CAST(NULL AS BIGINT) AS query_id,
         |       CAST(NULL AS BIGINT) AS neighbor_id, CAST(NULL AS BIGINT) AS rank,
         |       CAST(NULL AS DOUBLE) AS cos_sim
         |FROM cent
         |UNION ALL
         |SELECT 'topk', NULL, NULL, query_id, neighbor_id, CAST(rank AS BIGINT), cos_sim
         |FROM r WHERE rank <= 5
         |ORDER BY section, cell, query_id, rank""".stripMargin,

    // Classifier-gated ANN: the q_cls1 NB chain scores EVERY document
    // (train slice trains, whole corpus scored), the positive decision
    // gates the corpus side, then the q_sim12 IVF replay runs over the
    // gated embeddings. Centroids trusted from the echo; everything else
    // re-derives.
    "q_sim13_classifier_gated_ann" ->
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_sim13_classifier_gated_ann/*.parquet')),
         |  d AS (SELECT doc_id, lang, string_split($norm, ' ') AS ws
         |        FROM documents),
         |  uni AS (SELECT doc_id, lang, unnest(ws) AS f FROM d),
         |  bgx AS (SELECT doc_id, lang, unnest(range(1, len(ws))) AS i, ws FROM d),
         |  bg AS (SELECT doc_id, lang, ws[i] || ' ' || ws[i + 1] AS f FROM bgx),
         |  fa AS (SELECT * FROM uni UNION ALL SELECT * FROM bg),
         |  fb AS (SELECT doc_id, lang,
         |           CAST(('0x' || substr(md5('nbq:' || f), 1, 8)) AS BIGINT)
         |             % 1024 AS b
         |         FROM fa),
         |  cb AS (SELECT b,
         |           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
         |             AS BIGINT) AS cp,
         |           CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
         |             AS BIGINT) AS cn
         |         FROM fb WHERE doc_id % 5 <> 0 GROUP BY 1),
         |  tt AS (SELECT CAST(SUM(cp) AS BIGINT) AS tp,
         |                CAST(SUM(cn) AS BIGINT) AS tn FROM cb),
         |  pf AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c
         |         FROM fb GROUP BY 1, 2),
         |  pj AS (SELECT pf.doc_id, pf.c,
         |           coalesce(cb.cp, 0) AS cp, coalesce(cb.cn, 0) AS cn
         |         FROM pf LEFT JOIN cb USING (b)),
         |  wj AS (SELECT doc_id, c,
         |           (${ilSql("(cp + 1)")} - ${ilSql("(tp + 1024)")})
         |             - (${ilSql("(cn + 1)")} - ${ilSql("(tn + 1024)")}) AS wb
         |         FROM pj CROSS JOIN tt),
         |  pr AS (SELECT ${ilSql("(np + 1)")} - ${ilSql("(nn + 1)")} AS prior
         |         FROM (SELECT
         |             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
         |               AS BIGINT) AS np,
         |             CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
         |               AS BIGINT) AS nn
         |           FROM documents WHERE doc_id % 5 <> 0)),
         |  gate AS (SELECT doc_id FROM (
         |             SELECT doc_id, CAST(SUM(c * wb) AS BIGINT) AS ll
         |             FROM wj GROUP BY 1) g CROSS JOIN pr
         |           WHERE (ll + prior) > 0),
         |  cent AS (SELECT cell, centroid, CAST(centroid AS DOUBLE[]) AS cv
         |           FROM o WHERE section = 'centroid'),
         |  e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |  ef AS (SELECT e.vec_id, e.v FROM e JOIN gate g ON g.doc_id = e.vec_id),
         |  simsf AS (SELECT ef.vec_id, cent.cell,
         |              coalesce(${cosSql("ef.v", "cent.cv")}, -2.0) AS s0
         |            FROM ef CROSS JOIN cent),
         |  simsf2 AS (SELECT vec_id, cell,
         |               CASE WHEN isnan(s0) THEN -2.0 ELSE s0 END AS s FROM simsf),
         |  asg AS (SELECT vec_id, cell FROM (
         |            SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |              ORDER BY s DESC, cell ASC) AS rn FROM simsf2)
         |          WHERE rn = 1),
         |  simsq AS (SELECT e.vec_id, cent.cell,
         |              coalesce(${cosSql("e.v", "cent.cv")}, -2.0) AS s0
         |            FROM e CROSS JOIN cent WHERE e.vec_id < 8),
         |  simsq2 AS (SELECT vec_id, cell,
         |               CASE WHEN isnan(s0) THEN -2.0 ELSE s0 END AS s FROM simsq),
         |  probe AS (SELECT vec_id AS query_id, cell FROM (
         |              SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |                ORDER BY s DESC, cell ASC) AS rn FROM simsq2)
         |            WHERE rn <= 3),
         |  cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
         |           FROM probe p JOIN asg a ON a.cell = p.cell
         |           WHERE a.vec_id <> p.query_id),
         |  sc AS (SELECT query_id, neighbor_id, ${cosSql("qe.v", "ne.v")} AS cos_sim
         |         FROM cand JOIN e qe ON qe.vec_id = cand.query_id
         |                   JOIN ef ne ON ne.vec_id = cand.neighbor_id),
         |  r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM sc)
         |SELECT 'centroid' AS section, cell, centroid, CAST(NULL AS BIGINT) AS query_id,
         |       CAST(NULL AS BIGINT) AS neighbor_id, CAST(NULL AS BIGINT) AS rank,
         |       CAST(NULL AS DOUBLE) AS cos_sim
         |FROM cent
         |UNION ALL
         |SELECT 'topk', NULL, NULL, query_id, neighbor_id, CAST(rank AS BIGINT), cos_sim
         |FROM r WHERE rank <= 5
         |ORDER BY section, cell, query_id, rank""".stripMargin,

    // IVF recall sweep: centroids trusted; cell assignment, all three
    // probe depths, reranks and the recall arithmetic re-derive.
    "q_sim10_ivf_recall" ->
      s"""WITH o AS (SELECT * FROM read_parquet('$OUT/q_sim10_ivf_recall/*.parquet')),
         |  cent AS (SELECT cell, centroid, CAST(centroid AS DOUBLE[]) AS cv
         |           FROM o WHERE section = 'centroid'),
         |  e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |  sims AS (SELECT e.vec_id, cent.cell,
         |             coalesce(${cosSql("e.v", "cent.cv")}, -2.0) AS s0
         |           FROM e CROSS JOIN cent),
         |  sims2 AS (SELECT vec_id, cell,
         |              CASE WHEN isnan(s0) THEN -2.0 ELSE s0 END AS s FROM sims),
         |  asg AS (SELECT vec_id, cell FROM (
         |            SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |              ORDER BY s DESC, cell ASC) AS rn FROM sims2)
         |          WHERE rn = 1),
         |  pr AS (SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
         |           ORDER BY s DESC, cell ASC) AS rn FROM sims2
         |         WHERE vec_id < 8),
         |  probe AS (SELECT np.np, pr.vec_id AS query_id, pr.cell
         |            FROM pr CROSS JOIN (SELECT unnest([1, 2, 4]) AS np) np
         |            WHERE pr.rn <= np.np),
         |  cand AS (SELECT p.np, p.query_id, a.vec_id AS neighbor_id
         |           FROM probe p JOIN asg a ON a.cell = p.cell
         |           WHERE a.vec_id <> p.query_id),
         |  sc AS (SELECT np, query_id, neighbor_id,
         |           ${cosSql("qe.v", "ne.v")} AS cs
         |         FROM cand JOIN e qe ON qe.vec_id = cand.query_id
         |                   JOIN e ne ON ne.vec_id = cand.neighbor_id),
         |  ap AS (SELECT np, query_id, neighbor_id FROM (
         |           SELECT *, ROW_NUMBER() OVER (PARTITION BY np, query_id
         |             ORDER BY cs DESC, neighbor_id ASC) AS rk FROM sc)
         |         WHERE rk <= 5),
         |  ex AS (SELECT query_id, neighbor_id FROM (
         |           SELECT qe.vec_id AS query_id, ne.vec_id AS neighbor_id,
         |             ROW_NUMBER() OVER (PARTITION BY qe.vec_id
         |               ORDER BY ${cosSql("qe.v", "ne.v")} DESC, ne.vec_id ASC) AS rk
         |           FROM e qe JOIN e ne ON ne.vec_id <> qe.vec_id
         |           WHERE qe.vec_id < 8)
         |         WHERE rk <= 5),
         |  npl AS (SELECT unnest([1, 2, 4]) AS np),
         |  rec AS (SELECT npl.np, ex.query_id,
         |            CAST(count(*) AS BIGINT) AS n_exact,
         |            CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit
         |          FROM ex CROSS JOIN npl
         |          LEFT JOIN ap ON ap.np = npl.np AND ap.query_id = ex.query_id
         |                      AND ap.neighbor_id = ex.neighbor_id
         |          GROUP BY 1, 2)
         |SELECT 'centroid' AS section, cell, centroid,
         |       CAST(NULL AS BIGINT) AS nprobe, CAST(NULL AS BIGINT) AS query_id,
         |       CAST(NULL AS BIGINT) AS n_exact, CAST(NULL AS BIGINT) AS n_hit,
         |       CAST(NULL AS BIGINT) AS recall_pct
         |FROM cent
         |UNION ALL
         |SELECT 'recall', NULL, NULL, CAST(np AS BIGINT), query_id, n_exact, n_hit,
         |       CAST(n_hit * 100 // n_exact AS BIGINT)
         |FROM rec
         |ORDER BY section, cell, nprobe, query_id""".stripMargin,

    // The k-gram hash sequence is trusted input; the window-min
    // selection (windows of 4, truncated tail windows like Spark's
    // slice), distinct+sort and the count are re-derived.
    "q_txt5_winnowing" ->
      s"""WITH o AS (SELECT doc_id, kgram_hashes,
         |             CAST(kgram_hashes AS BIGINT[]) AS kh
         |           FROM read_parquet('$OUT/q_txt5_winnowing/*.parquet')),
         |  f AS (SELECT doc_id, kgram_hashes,
         |          list_sort(list_distinct(list_transform(
         |            generate_series(1, greatest(len(kh) - 3, 1)),
         |            j -> list_min(kh[j:j+3])))) AS fps
         |        FROM o)
         |SELECT doc_id, kgram_hashes, to_json(fps)::VARCHAR AS fps,
         |       CAST(len(fps) AS BIGINT) AS n_fingerprints
         |FROM f ORDER BY doc_id""".stripMargin,

    "q_srch2_top_terms" ->
      raw"""WITH w AS (SELECT unnest(string_split(
        |              lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ')) AS term
        |            FROM documents),
        |  c AS (SELECT term, CAST(count(*) AS BIGINT) AS n
        |        FROM w WHERE length(term) > 0 GROUP BY 1),
        |  r AS (SELECT term, n,
        |          ROW_NUMBER() OVER (ORDER BY n DESC, term ASC) AS rk FROM c)
        |SELECT term, n FROM r WHERE rk <= 25 ORDER BY n DESC, term""".stripMargin,

    // Same n-gram machinery as q_txt7, inner-joined for the hit pairs.
    "q_txt13_contamination_hits" ->
      raw"""WITH nd AS (SELECT doc_id,
        |              list_distinct(list_transform(
        |                generate_series(1, greatest(len(w) - 2, 0)),
        |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS ngrams
        |            FROM (SELECT doc_id,
        |                    string_split(lower(regexp_replace(trim(text), '\s+', ' ', 'g')), ' ') AS w
        |                  FROM documents)),
        |  b AS (SELECT DISTINCT unnest(ngrams) AS ngram FROM nd WHERE doc_id % 97 = 0),
        |  d AS (SELECT doc_id, unnest(ngrams) AS ngram FROM nd)
        |SELECT doc_id, ngram FROM d JOIN b USING (ngram)
        |ORDER BY doc_id, ngram""".stripMargin,

    // Windows rebuild from the same (event_type, day) arithmetic as the
    // query; the oracle's join is the plain BETWEEN form the bin-bucketed
    // equi-join must exactly reproduce.
    // Salted join: the oracle is the PLAIN equi-join — salting is
    // internal shuffle mechanics and must never change the result.
    // Threshold = exact DECIMAL(18,2) sum cast double / bigint count,
    // one IEEE division on both engines.
    "q_j10_salted_join" ->
      """WITH d AS (SELECT event_type,
        |            CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |              / COUNT(*) AS avg_value
        |          FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value > d.avg_value AS above_avg
        |FROM events e JOIN d USING (event_type)
        |ORDER BY event_id""".stripMargin,

    "q_j9_interval_join" ->
      """WITH ev AS (SELECT event_id, ts, event_type FROM events),
        |  d AS (SELECT DISTINCT event_type, date_trunc('day', ts) AS day FROM ev),
        |  w AS (SELECT event_type,
        |          epoch_us(day) + (length(event_type) % 12) * 3600000000 AS ws,
        |          epoch_us(day) + (length(event_type) % 12 + 2) * 3600000000 AS we
        |        FROM d)
        |SELECT e.event_id, e.event_type,
        |       CAST(epoch_us(e.ts) AS BIGINT) AS ts_us,
        |       CAST(w.ws AS BIGINT) AS window_start_us
        |FROM ev e JOIN w ON e.event_type = w.event_type
        |  AND epoch_us(e.ts) >= w.ws AND epoch_us(e.ts) < w.we
        |ORDER BY event_id""".stripMargin,

    // Funnel: the oracle's join is the naive "purchase within an hour of
    // a view" BETWEEN form the bin-bucketed equi-join must reproduce.
    "q_w4_funnel" ->
      """WITH v AS (SELECT user_id, epoch_us(ts) AS vu FROM events
        |           WHERE event_type = 'view'),
        |  p AS (SELECT user_id, epoch_us(ts) AS pu FROM events
        |        WHERE event_type = 'purchase'),
        |  conv AS (SELECT v.user_id, vu // 86400000000 AS day_key
        |           FROM v JOIN p ON v.user_id = p.user_id
        |            AND p.pu >= v.vu AND p.pu < v.vu + 3600000000)
        |SELECT CAST(day_key AS BIGINT) AS day_key,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS converted_users,
        |       CAST(count(*) AS BIGINT) AS n_conversions
        |FROM conv GROUP BY 1 ORDER BY day_key""".stripMargin,

    // Retention: distinct (user, day) activity, per-user min day as the
    // cohort, integer day arithmetic end to end.
    "q_w5_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |             epoch_us(ts) // 86400000000 AS day FROM events),
        |  f AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1)
        |SELECT CAST(f.cohort_day AS BIGINT) AS cohort_day,
        |       CAST(a.day - f.cohort_day AS BIGINT) AS offset_days,
        |       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, offset_days""".stripMargin,

    // The raw URLs rebuild from the same doc_id arithmetic as the query,
    // then every canonicalization rule replays in DuckDB string ops:
    // fragment drop, scheme/host lowercase, default-port strip, tracking
    // param removal, param sort, trailing-slash strip.
    // Snapshot diff: both snapshots, the fingerprint full-outer join and
    // the status classification replay exactly from the documents table.
    "q_cur4_snapshot_diff" ->
      raw"""WITH o AS (SELECT doc_id, md5($norm) AS fp_old FROM documents),
        |  n AS (SELECT doc_id,
        |          md5(lower(regexp_replace(trim(
        |            CASE WHEN doc_id % 20 = 5 THEN text || ' [rev2]'
        |                 ELSE text END), '\s+', ' ', 'g'))) AS fp_new
        |        FROM documents WHERE doc_id % 15 <> 3
        |        UNION ALL
        |        SELECT doc_id + 2000000, md5($norm)
        |        FROM documents WHERE doc_id % 25 = 0),
        |  d AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |          CASE WHEN o.fp_old IS NULL THEN 'added'
        |               WHEN n.fp_new IS NULL THEN 'removed'
        |               WHEN o.fp_old <> n.fp_new THEN 'changed'
        |               ELSE 'unchanged' END AS status
        |        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        |SELECT 'doc' AS section, doc_id, status, CAST(NULL AS BIGINT) AS n
        |FROM d WHERE status <> 'unchanged'
        |UNION ALL
        |SELECT 'stat', NULL, status, CAST(count(*) AS BIGINT)
        |FROM d GROUP BY status
        |ORDER BY section, doc_id, status""".stripMargin,

    "q_cur3_url_dedup" ->
      raw"""WITH u AS (SELECT doc_id,
        |              'HTTPS://WWW.Example' || CAST(doc_id % 5 AS VARCHAR) ||
        |              '.COM:443/Articles/item' || CAST(doc_id % 29 AS VARCHAR) ||
        |              CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
        |              CASE WHEN doc_id % 2 = 0
        |                   THEN '?b=' || CAST(doc_id % 3 AS VARCHAR) ||
        |                        '&utm_source=feed' || CAST(doc_id % 7 AS VARCHAR) || '&a=1'
        |                   ELSE '?a=1&fbclid=x' || CAST(doc_id % 11 AS VARCHAR) ||
        |                        '&b=' || CAST(doc_id % 3 AS VARCHAR) END ||
        |              '#sec' || CAST(doc_id % 4 AS VARCHAR) AS raw
        |            FROM documents),
        |  p AS (SELECT doc_id, regexp_replace(raw, '#.*$$', '') AS nf FROM u),
        |  parts AS (SELECT doc_id,
        |              lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |              lower(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS host0,
        |              regexp_replace(regexp_extract(nf,
        |                '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/$$', '') AS path,
        |              regexp_extract(nf, '\?([^#]*)', 1) AS query
        |            FROM p),
        |  canon AS (SELECT doc_id,
        |              scheme || '://' ||
        |              (CASE WHEN scheme = 'https' THEN regexp_replace(host0, ':443$$', '')
        |                    WHEN scheme = 'http' THEN regexp_replace(host0, ':80$$', '')
        |                    ELSE host0 END) || path ||
        |              (CASE WHEN qp IS NULL OR qp = '' THEN '' ELSE '?' || qp END)
        |                AS url_canonical
        |            FROM (SELECT doc_id, scheme, host0, path,
        |                    array_to_string(list_sort(list_filter(
        |                      string_split(query, '&'),
        |                      x -> x <> '' AND NOT regexp_matches(x,
        |                        '^(utm_[^=]*|fbclid|gclid)='))), '&') AS qp
        |                  FROM parts))
        |SELECT url_canonical, CAST(MIN(doc_id) AS BIGINT) AS kept_id,
        |       CAST(COUNT(*) - 1 AS BIGINT) AS n_dups
        |FROM canon GROUP BY 1 ORDER BY url_canonical""".stripMargin,

    // Hopping windows: each event belongs to exactly 4 of the 15-min-slide
    // 1-hour windows — replayed as a cross join with the 4 window offsets.
    // epoch_us on a µs-cast timestamp keeps the bucket math integral.
    "q_w6_sliding_window" ->
      """SELECT make_timestamp(
        |         (epoch_us(CAST(ts AS TIMESTAMP)) // 900000000) * 900000000
        |           - CAST(k.k AS BIGINT) * 900000000) AS window_start,
        |       event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS k) k
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // The merged incremental state must equal a from-scratch aggregate
    // over the full history — so the oracle IS the from-scratch aggregate.
    "q_inc1_incremental_agg" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |       min(ts) AS first_ts, max(ts) AS last_ts
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // Exactness precondition documented at SparkEntry.inc3: with
    // maxItemsTracked >> distinct users the frequent-items sketch never
    // evicts, so the merged estimate equals the exact frequency table —
    // the oracle recomputes it from raw rows; the k-boundary tie is
    // broken by user_id on both engines.
    "q_inc3_topk_sketch" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1
        |ORDER BY n_events DESC, user_id LIMIT 20""".stripMargin,

    // Record-linkage replay: DuckDB's levenshtein is the same unweighted
    // edit distance as Spark's; collapse, blocking and verify are all
    // re-derived from the raw part rows.
    "q_er1_fuzzy_join" ->
      """WITH n AS (SELECT p_name, CAST(count(*) AS BIGINT) AS cnt,
        |                  split_part(p_name, ' ', -1) AS blk
        |           FROM part GROUP BY 1)
        |SELECT a.p_name AS n1, b.p_name AS n2,
        |       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
        |       a.cnt AS cnt1, b.cnt AS cnt2
        |FROM n a JOIN n b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY 1, 2""".stripMargin,

    // Resample + forward-fill replay: grid from generate_series over the
    // global hour bounds, fill via last_value IGNORE NULLS — identical
    // frame to Spark's last(ignoreNulls).over(rowsBetween(unbounded,
    // current)). Totals decimal-pinned before the final double cast;
    // leading gaps stay null on both engines.
    "q_ts1_gap_fill" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |                  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS tot,
        |                  CAST(count(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1, 2),
        |  b AS (SELECT min(date_trunc('hour', ts)) AS h0,
        |               max(date_trunc('hour', ts)) AS h1 FROM events),
        |  g AS (SELECT t.event_type, gs.hour
        |        FROM (SELECT DISTINCT event_type FROM events) t, b,
        |             unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS gs(hour)),
        |  j AS (SELECT g.event_type, g.hour, h.tot,
        |               coalesce(h.n, 0) AS n_events
        |        FROM g LEFT JOIN h USING (event_type, hour))
        |SELECT event_type, hour, n_events,
        |       CAST(last_value(tot IGNORE NULLS) OVER (
        |         PARTITION BY event_type ORDER BY hour
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |         AS total_value,
        |       (n_events = 0) AS is_gap
        |FROM j ORDER BY event_type, hour""".stripMargin,

    "q_gr1_pagerank" -> pageRankSql(5),

    // Full replay of the degree-ordered triangle enumeration: same
    // generator as gr1, symmetrize, degree, orient by (deg, id) row
    // comparison, wedge self-join ordered by the same total order,
    // close, fan the 3 corners out, count. All-integer — engine-exact.
    "q_gr2_triangles" ->
      s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |  de AS (SELECT src, dst FROM (
        |    $linkGenSql) t),
        |  ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |         FROM de WHERE src <> dst),
        |  dg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM (
        |           SELECT a AS v FROM ue UNION ALL SELECT b FROM ue) e GROUP BY 1),
        |  oe AS (SELECT CASE WHEN (da.deg, ue.a) < (db.deg, ue.b)
        |                     THEN ue.a ELSE ue.b END AS src,
        |                CASE WHEN (da.deg, ue.a) < (db.deg, ue.b)
        |                     THEN ue.b ELSE ue.a END AS dst,
        |                CASE WHEN (da.deg, ue.a) < (db.deg, ue.b)
        |                     THEN db.deg ELSE da.deg END AS ddeg
        |         FROM ue JOIN dg da ON da.v = ue.a JOIN dg db ON db.v = ue.b),
        |  tri AS (SELECT w1.src AS u, w1.dst AS tv, w2.dst AS tw
        |          FROM oe w1 JOIN oe w2 ON w1.src = w2.src
        |            AND (w1.ddeg, w1.dst) < (w2.ddeg, w2.dst)
        |          JOIN oe e ON e.src = w1.dst AND e.dst = w2.dst),
        |  tc AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS nt FROM (
        |           SELECT u AS x FROM tri UNION ALL SELECT tv FROM tri
        |           UNION ALL SELECT tw FROM tri) f GROUP BY 1)
        |SELECT d.doc_id, COALESCE(dg.deg, 0) AS degree,
        |       COALESCE(tc.nt, 0) AS n_triangles
        |FROM documents d LEFT JOIN dg ON dg.v = d.doc_id
        |LEFT JOIN tc ON tc.v = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // k-core replay: the same symmetrized generator graph, every peel
    // round as a chained CTE (alive_{i+1} = degree-within-alive_i ≥ k),
    // final degrees within the surviving subgraph. All-integer.
    // rounds here = the OPERATOR'S CAP (kCore converges and exits early;
    // no-op rounds past the fixpoint leave these CTEs unchanged, and a
    // deeper-than-cap graph truncates both engines at the same round).
    "q_gr3_kcore" -> kCoreSql(k = 3, rounds = 16),

    // Radius-2 harmonic centrality replay: same symmetrized generator
    // graph; distance-1 is the adjacency, distance-2 the distinct wedge
    // pairs minus self minus adjacency. Integer 1/840ths fixed-point.
    "q_gr4_harmonic" ->
      s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |  de AS (SELECT src, dst FROM (
        |    $linkGenSql) t),
        |  ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |         FROM de WHERE src <> dst),
        |  adj AS (SELECT a AS v, b AS u FROM ue UNION ALL SELECT b, a FROM ue),
        |  d2 AS (SELECT DISTINCT x.v, y.u FROM adj x JOIN adj y ON x.u = y.v
        |         WHERE x.v <> y.u
        |           AND NOT EXISTS (SELECT 1 FROM adj a
        |                           WHERE a.v = x.v AND a.u = y.u)),
        |  c1 AS (SELECT v, CAST(count(*) AS BIGINT) AS n1 FROM adj GROUP BY 1),
        |  c2 AS (SELECT v, CAST(count(*) AS BIGINT) AS n2 FROM d2 GROUP BY 1)
        |SELECT d.doc_id, COALESCE(c1.n1, 0) AS n1, COALESCE(c2.n2, 0) AS n2,
        |       COALESCE(c1.n1, 0) * 840 + COALESCE(c2.n2, 0) * 420
        |         AS harmonic_x840
        |FROM documents d
        |LEFT JOIN c1 ON c1.v = d.doc_id
        |LEFT JOIN c2 ON c2.v = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // KMV neighborhood sketches replayed round by round: k smallest
    // md5-derived 32-bit hashes per node (row_number ≤ k), round 2 =
    // k-min of round-1 sketches propagated over the adjacency (+self).
    // Estimates all-integer: exact count below k, else
    // (k−1)·2³² // (kth+1). Exact ball sizes from the gr4 CTEs.
    "q_gr5_kmv_neighborhood" ->
      s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |  de AS (SELECT src, dst FROM (
        |    $linkGenSql) t),
        |  ue AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |         FROM de WHERE src <> dst),
        |  adj AS (SELECT a AS v, b AS u FROM ue UNION ALL SELECT b, a FROM ue),
        |  adjs AS (SELECT v, u FROM adj
        |           UNION ALL SELECT doc_id, doc_id FROM documents),
        |  hh AS (SELECT DISTINCT v,
        |           CAST(('0x' || substr(md5('gr5:' || CAST(u AS VARCHAR)), 1, 8))
        |             AS BIGINT) AS h
        |         FROM adjs),
        |  s1 AS (SELECT v, h FROM (
        |           SELECT v, h, row_number() OVER (PARTITION BY v ORDER BY h)
        |             AS rn FROM hh) r WHERE rn <= 16),
        |  p2 AS (SELECT DISTINCT a.v, s.h FROM adjs a JOIN s1 s ON s.v = a.u),
        |  s2 AS (SELECT v, h FROM (
        |           SELECT v, h, row_number() OVER (PARTITION BY v ORDER BY h)
        |             AS rn FROM p2) r WHERE rn <= 16),
        |  e1 AS (SELECT v, CAST(count(*) AS BIGINT) AS c,
        |                CAST(max(h) AS BIGINT) AS kth FROM s1 GROUP BY 1),
        |  e2 AS (SELECT v, CAST(count(*) AS BIGINT) AS c,
        |                CAST(max(h) AS BIGINT) AS kth FROM s2 GROUP BY 1),
        |  d2 AS (SELECT DISTINCT x.v, y.u FROM adj x JOIN adj y ON x.u = y.v
        |         WHERE x.v <> y.u
        |           AND NOT EXISTS (SELECT 1 FROM adj a
        |                           WHERE a.v = x.v AND a.u = y.u)),
        |  c1 AS (SELECT v, CAST(count(*) AS BIGINT) AS n1 FROM adj GROUP BY 1),
        |  c2 AS (SELECT v, CAST(count(*) AS BIGINT) AS n2 FROM d2 GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(CASE WHEN e1.c < 16 THEN e1.c
        |            ELSE 64424509440 // (e1.kth + 1) END AS BIGINT) AS ball1_est,
        |  CAST(CASE WHEN e2.c < 16 THEN e2.c
        |            ELSE 64424509440 // (e2.kth + 1) END AS BIGINT) AS ball2_est,
        |  COALESCE(c1.n1, 0) + 1 AS ball1_exact,
        |  COALESCE(c1.n1, 0) + COALESCE(c2.n2, 0) + 1 AS ball2_exact
        |FROM documents d
        |JOIN e1 ON e1.v = d.doc_id
        |JOIN e2 ON e2.v = d.doc_id
        |LEFT JOIN c1 ON c1.v = d.doc_id
        |LEFT JOIN c2 ON c2.v = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Rolling z-score replay: identical 24-hour PRECEDING frame, the
    // same division-free integer z² inequality. DuckDB's SUM over
    // BIGINT widens to HUGEINT → cast back before the arithmetic.
    "q_ts2_anomaly" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |                  CAST(floor(SUM(CAST(value AS DECIMAL(18,2)))) AS BIGINT) AS x
        |           FROM events GROUP BY 1, 2),
        |  w AS (SELECT event_type, hour, x,
        |          CAST(count(x) OVER win AS BIGINT) AS n,
        |          CAST(COALESCE(SUM(x) OVER win, 0) AS BIGINT) AS s1,
        |          CAST(COALESCE(SUM(x * x) OVER win, 0) AS BIGINT) AS s2
        |        FROM h WINDOW win AS (PARTITION BY event_type ORDER BY hour
        |          ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hour, x, n, s1, s2,
        |       CASE WHEN n >= 12 THEN
        |         (n * x - s1) * (n * x - s1) > 9 * (n * s2 - s1 * s1)
        |       ELSE NULL END AS is_anomaly
        |FROM w ORDER BY event_type, hour""".stripMargin,

    // EWMA recurrence replay: the truncating fixed-point update has no
    // closed form, so the oracle walks it with a recursive CTE — one
    // level per day, joined on rn = rn + 1 within each series. Integer
    // and non-negative throughout, so // and div agree.
    "q_ts3_ewma" ->
      """WITH RECURSIVE h AS (
        |    SELECT event_type, CAST(ts AS DATE) AS day,
        |           CAST(floor(SUM(CAST(value AS DECIMAL(18,2)))) AS BIGINT) AS x
        |    FROM events GROUP BY 1, 2),
        |  r AS (SELECT event_type, day, x,
        |          row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
        |        FROM h),
        |  e AS (SELECT event_type, day, x, rn, x AS ew FROM r WHERE rn = 1
        |        UNION ALL
        |        SELECT r.event_type, r.day, r.x, r.rn, (r.x + 7 * e.ew) // 8
        |        FROM r JOIN e ON r.event_type = e.event_type
        |          AND r.rn = e.rn + 1)
        |SELECT event_type, day, x, ew AS ewma8
        |FROM e ORDER BY event_type, day""".stripMargin,

    // Group-wise OLS replay from the same two-level aggregation; both
    // engines truncate integer division toward zero (Spark `div`,
    // DuckDB `//` — verified on negative operands), so ppm slopes agree
    // bit-for-bit including declining trends.
    "q_a12_trend_ols" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |                 CAST(floor(SUM(CAST(value AS DECIMAL(18,2)))) AS BIGINT) AS y
        |               FROM events GROUP BY 1, 2),
        |  fd AS (SELECT user_id, min(day) AS d0 FROM daily GROUP BY 1),
        |  xy AS (SELECT daily.user_id,
        |                CAST(date_diff('day', fd.d0, daily.day) AS BIGINT) AS x, y
        |         FROM daily JOIN fd USING (user_id)),
        |  m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |               CAST(SUM(x * x) AS BIGINT) AS sxx,
        |               CAST(SUM(x * y) AS BIGINT) AS sxy
        |        FROM xy GROUP BY 1),
        |  sl AS (SELECT *, CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |           ELSE (1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
        |         END AS slope_ppm FROM m)
        |SELECT user_id, n AS n_days, sx, sy, sxx, sxy, slope_ppm,
        |       CASE WHEN slope_ppm IS NULL THEN NULL
        |            ELSE (1000000 * sy - slope_ppm * sx) // n
        |       END AS intercept_ppm
        |FROM sl ORDER BY user_id""".stripMargin,

    // Full bigram-LM replay: same fixed-point log2 as the srch oracles,
    // Laplace smoothing re-derived from the corpus counts. Per-bigram
    // terms are integral, so the sum is shuffle-order-proof on both
    // engines.
    "q_txt16_bigram_lm" ->
      s"""WITH d AS (SELECT doc_id, string_split($norm, ' ') AS ws FROM documents),
         |  bgx AS (SELECT doc_id, unnest(range(1, len(ws))) AS i, ws FROM d),
         |  bg AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM bgx),
         |  pdb AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS c
         |          FROM bg GROUP BY 1, 2, 3),
         |  b AS (SELECT w1, w2, CAST(SUM(c) AS BIGINT) AS cb FROM pdb GROUP BY 1, 2),
         |  u AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cu FROM pdb GROUP BY 1),
         |  vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM u),
         |  sc AS (SELECT pdb.doc_id,
         |           CAST(SUM(pdb.c * (${ilSql("(cu + v)")} - ${ilSql("(cb + 1)")}))
         |             AS BIGINT) AS nll,
         |           CAST(SUM(pdb.c) AS BIGINT) AS n
         |         FROM pdb JOIN b USING (w1, w2) JOIN u USING (w1) CROSS JOIN vv
         |         GROUP BY 1)
         |SELECT d.doc_id, COALESCE(sc.n, 0) AS n_bigrams,
         |       COALESCE(sc.nll, 0) AS nll_total_1024,
         |       COALESCE(sc.nll // sc.n, 0) AS nll_per_bigram_1024
         |FROM d LEFT JOIN sc ON sc.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q_txt15_chunk" ->
      s"""WITH d AS (SELECT doc_id, string_split($norm, ' ') AS ws FROM documents),
         |  c AS (SELECT doc_id, ws, unnest(range(0,
         |          1 + (greatest(len(ws) - 64, 0) + 47) // 48)) AS chunk_idx
         |        FROM d)
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |       CAST(len(list_slice(ws, chunk_idx * 48 + 1, chunk_idx * 48 + 64))
         |         AS BIGINT) AS chunk_tokens,
         |       md5(array_to_string(
         |         list_slice(ws, chunk_idx * 48 + 1, chunk_idx * 48 + 64), ' '))
         |         AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)

  /** DuckDB spelling of SearchFunctions.ilog2x1024 — fixed-point log2 in
    * 1/1024ths of a bit from binary-string length + linear interpolation
    * (the same formula the srch oracles inline). `x` must be a
    * parenthesized SQL expression ≥ 1. */
  private def ilSql(x: String): String =
    s"(1024 * (length(bin($x)) - 1) + (($x * 1024) >> (length(bin($x)) - 1)) - 1024)"

  /** The gr1/gr2/gr3 link-graph generator — ONE SQL spelling, shared by
    * all three graph oracles (mirrors SparkEntry.linkGraphDirected;
    * keep the two in sync). Expects an `nn(n)` CTE in scope. */
  private def linkGenSql =
    """SELECT doc_id AS src, (doc_id * 37 + 11) % nn.n AS dst FROM documents, nn
      |    UNION ALL SELECT doc_id, (doc_id * 101 + 53) % nn.n FROM documents, nn
      |    UNION ALL SELECT doc_id, (doc_id * 197 + 89) % nn.n FROM documents, nn""".stripMargin

  /** Full replay of GraphFunctions.kCore as chained CTEs: one alive-set
    * CTE per peel round (degree counted within the survivors, filter
    * ≥ k), then final degrees within the surviving subgraph. */
  /** BPE merge-learning replay: every round is (pair counts over the
    * current vocab encodings) → (argmax with the md5 tie-break) →
    * (left-to-right greedy fold applying the merge), chained as CTEs.
    * `list_reduce` here and `aggregate` in the engine run the SAME
    * accumulator logic on chr(31)-joined symbol strings, so "aaa" with
    * merge (a,a) folds to [aa, a] on both sides. */
  private def bpeChainSql(n: Int): String =
    bpeChainCore(n,
      raw"""WITH vw AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt
      |    FROM (SELECT unnest(string_split($norm, ' ')) AS w
      |          FROM documents) tw
      |    WHERE regexp_full_match(w, '[a-z0-9]+')
      |    GROUP BY w),
      |  v0 AS (SELECT w,
      |                array_to_string(string_split(w, ''), chr(31)) AS enc,
      |                cnt
      |         FROM vw)""".stripMargin)

  /** Byte-level base vocabulary: NFC words (whitespace-collapsed, case
    * kept — no lower(), engines disagree on Unicode case mappings), each
    * encoded as uppercase hex pairs of its UTF-8 bytes. The merge-loop
    * CTEs are shared with the ASCII chain. */
  private def byteBpeChainSql(n: Int): String =
    bpeChainCore(n,
      raw"""WITH vw AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt
      |    FROM (SELECT unnest(string_split(
      |            nfc_normalize(regexp_replace(trim(text), '\s+', ' ', 'g')),
      |            ' ')) AS w
      |          FROM documents) tw
      |    WHERE length(w) > 0
      |    GROUP BY w),
      |  v0 AS (SELECT w,
      |                array_to_string(
      |                  regexp_extract_all(hex(encode(w)), '..'),
      |                  chr(31)) AS enc,
      |                cnt
      |         FROM vw)""".stripMargin)

  private def bpeChainCore(n: Int, v0Sql: String): String = {
    val sb = new StringBuilder
    sb ++= v0Sql
    for (r <- 1 to n) {
      val pv = s"v${r - 1}"
      sb ++= s""",
      |  g$r AS (SELECT unnest(range(1, len(sy))) AS i, sy, cnt
      |          FROM (SELECT string_split(enc, chr(31)) AS sy, cnt
      |                FROM $pv) s$r),
      |  p$r AS (SELECT sy[i] AS l, sy[i + 1] AS r2,
      |                 CAST(SUM(cnt) AS BIGINT) AS c
      |          FROM g$r GROUP BY 1, 2),
      |  b$r AS (SELECT l, r2, c FROM p$r
      |          ORDER BY c DESC, md5(l || chr(31) || r2) LIMIT 1),
      |  v$r AS (SELECT v.w,
      |            list_reduce(string_split(v.enc, chr(31)), (acc, x) ->
      |            CASE WHEN (acc = b.l OR ends_with(acc, chr(31) || b.l))
      |                  AND x = b.r2
      |                 THEN substr(acc, 1, length(acc) - length(b.l))
      |                      || b.l || b.r2
      |                 ELSE acc || chr(31) || x END) AS enc, v.cnt
      |          FROM $pv v CROSS JOIN b$r b)""".stripMargin
    }
    sb.toString
  }

  private def bpeMergesSql(n: Int): String =
    bpeChainSql(n) + bpeMergesTail(n)

  private def byteBpeMergesSql(n: Int): String =
    byteBpeChainSql(n) + bpeMergesTail(n)

  private def bpeMergesTail(n: Int): String =
    "\n" + (1 to n).map(r =>
      s"SELECT $r AS merge_rank, l AS pair_left, r2 AS pair_right, " +
        s"l || r2 AS merged, c AS weight FROM b$r")
      .mkString("\nUNION ALL ") +
      "\nORDER BY merge_rank"

  /** The learned tokenizer applied to the vocabulary: the chain's final
    * encodings, segmented with spaces. */
  private def bpeVocabSql(n: Int): String =
    bpeChainSql(n) + bpeVocabTail(n)

  private def byteBpeVocabSql(n: Int): String =
    byteBpeChainSql(n) + bpeVocabTail(n)

  private def bpeVocabTail(n: Int): String =
    s"""
      |SELECT w AS word, cnt AS n_occurrences,
      |       CAST(len(string_split(enc, chr(31))) AS BIGINT) AS n_tokens,
      |       replace(enc, chr(31), ' ') AS segmented
      |FROM v$n ORDER BY word""".stripMargin

  private def kCoreSql(k: Int, rounds: Int): String = {
    val head =
      s"""WITH nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |  de AS (SELECT src, dst FROM (
        |    $linkGenSql) t),
        |  ue AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |         FROM de WHERE src <> dst),
        |  al0 AS MATERIALIZED (SELECT doc_id AS v FROM documents)""".stripMargin
    val peels = (1 to rounds).map { i =>
      s""",
         |  dg${i - 1} AS MATERIALIZED (SELECT x AS v, CAST(count(*) AS BIGINT) AS deg FROM (
         |      SELECT ue.a AS x FROM ue
         |        JOIN al${i - 1} p ON p.v = ue.a JOIN al${i - 1} q ON q.v = ue.b
         |      UNION ALL
         |      SELECT ue.b FROM ue
         |        JOIN al${i - 1} p ON p.v = ue.a JOIN al${i - 1} q ON q.v = ue.b) f
         |    GROUP BY 1),
         |  al$i AS MATERIALIZED (SELECT v FROM dg${i - 1} WHERE deg >= $k)""".stripMargin
    }.mkString
    head + peels +
      s""",
         |  fd AS MATERIALIZED (SELECT x AS v, CAST(count(*) AS BIGINT) AS deg FROM (
         |      SELECT ue.a AS x FROM ue
         |        JOIN al$rounds p ON p.v = ue.a JOIN al$rounds q ON q.v = ue.b
         |      UNION ALL
         |      SELECT ue.b FROM ue
         |        JOIN al$rounds p ON p.v = ue.a JOIN al$rounds q ON q.v = ue.b) f
         |    GROUP BY 1)
         |SELECT d.doc_id, (al.v IS NOT NULL) AS in_core,
         |       COALESCE(fd.deg, 0) AS core_degree
         |FROM documents d
         |LEFT JOIN al$rounds al ON al.v = d.doc_id
         |LEFT JOIN fd ON fd.v = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
  }

  /** Full replay of GraphFunctions.pageRank as chained CTEs: the same
    * integer fixed-point update, one CTE per damped round. Every division
    * is on non-negative operands, so DuckDB's floor `//` and Spark's
    * truncating `div` agree. */
  private def pageRankSql(iters: Int): String = {
    val head =
      s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |  edges AS (SELECT DISTINCT src, dst FROM (
        |    $linkGenSql) t),
        |  deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
        |  r0 AS (SELECT doc_id AS v, 1000000000000 // nn.n AS r FROM documents, nn)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s""",
         |  r$i AS (SELECT d.doc_id AS v,
         |            (1000000000000 * 15) // (nn.n * 100)
         |              + (85 * COALESCE(s.cs, 0)) // 100 AS r
         |          FROM documents d CROSS JOIN nn LEFT JOIN (
         |            SELECT e.dst AS v, SUM(r.r // g.deg) AS cs
         |            FROM edges e JOIN deg g ON e.src = g.src
         |            JOIN r${i - 1} r ON r.v = e.src
         |            GROUP BY 1) s ON s.v = d.doc_id)""".stripMargin
    }.mkString
    head + rounds +
      s"\nSELECT v AS doc_id, CAST(r AS BIGINT) AS rank_e12 FROM r$iters ORDER BY v"
  }
}
