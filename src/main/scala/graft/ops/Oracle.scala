package graft.ops

/** DuckDB 1.0.0 oracle SQL for every declared query — validated against
  * the testdata at all three scale factors (SURVEY.md Appendix A; tables
  * referenced by bare name per the driver contract, which registers each
  * parquet file under its table name).
  */
object Oracle {

  /** The q70/q72 maximal-munch walk as a shared CTE chain (vocab values
    * → whitespace-split words → per-position max-match table with
    * arg_max entry ids → recursive cursor walk → toks). Ends at the
    * `toks` CTE so consumers append their own final SELECT (q72: the
    * per-doc stream; q75: the global packed stream). Lives in an
    * s-interpolated string: escape processing IS applied, so the
    * whitespace class is written doubled. */
  private lazy val vocabWalkCtes: String = {
    val vals = Extended.Q70Vocab.zipWithIndex
      .map { case (v, i) => s"($i,'$v')" }.mkString(",")
    s"""WITH RECURSIVE vocab(id, v) AS (VALUES $vals),
      | words AS (
      |  SELECT doc_id, wi, arr[wi] AS w
      |  FROM (SELECT doc_id,
      |          regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+') AS arr
      |        FROM documents),
      |       unnest(range(1, len(arr) + 1)) AS t(wi)
      |  WHERE arr[wi] <> ''),
      | ml AS (
      |  SELECT w.doc_id, w.wi, p.pos, max(len(v.v)) AS m,
      |         arg_max(v.id, len(v.v)) AS tid
      |  FROM words w, unnest(range(1, len(w.w) + 1)) AS p(pos), vocab v
      |  WHERE substr(w.w, p.pos, len(v.v)) = v.v
      |  GROUP BY w.doc_id, w.wi, p.pos),
      | walk(doc_id, wi, w, pos) AS (
      |  SELECT doc_id, wi, w, 1 FROM words WHERE len(w) >= 1
      |  UNION ALL
      |  SELECT wk.doc_id, wk.wi, wk.w, wk.pos + COALESCE(ml.m, 1)
      |  FROM walk wk LEFT JOIN ml
      |    ON ml.doc_id = wk.doc_id AND ml.wi = wk.wi AND ml.pos = wk.pos
      |  WHERE wk.pos + COALESCE(ml.m, 1) <= len(wk.w)),
      | toks AS (
      |  SELECT wk.doc_id, wk.wi, wk.pos,
      |         CAST(COALESCE(ml.tid, -1) AS BIGINT) AS tok
      |  FROM walk wk LEFT JOIN ml
      |    ON ml.doc_id = wk.doc_id AND ml.wi = wk.wi AND ml.pos = wk.pos)""".stripMargin
  }

  /** The q76/q77 window-hash chain as a shared CTE prefix: filtered
    * whitespace words → per-doc token list rebuilt from them (so window
    * positions index the SAME filtered stream Spark's array does) →
    * 8-token windows with 1-based starts → per-instance marks (corpus
    * occurrence count, keep-first rank over (doc_id, s)). Ends at
    * `winmarks`; consumers append their aggregates. The escape-bearing
    * CTEs live in plain (non-interpolated) strings — escape processing
    * is NOT applied, so the whitespace class is written
    * single-backslashed (q73's envelope note) — while the `wins` CTE is
    * s-interpolated (it carries no escapes) so the window length is
    * spliced from Extended.Q76WindowK, the one definition both engines
    * share (the Q70Vocab convention). */
  private lazy val windowCtes: String = {
    val k = Extended.Q76WindowK
    """WITH base AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text),
      |    '[ \t\n\x0B\f\r]+') AS arr
      |  FROM documents),
      | words AS (
      |  SELECT doc_id, wi, arr[wi] AS w
      |  FROM base, unnest(range(1, len(arr) + 1)) AS t(wi)
      |  WHERE arr[wi] <> ''),
      | fdoc AS (
      |  SELECT doc_id, list(w ORDER BY wi) AS fa FROM words GROUP BY doc_id),
      |""".stripMargin +
    s""" wins AS (
      |  SELECT doc_id, u.s AS s, array_to_string(fa[u.s:u.s+${k - 1}], ' ') AS w8
      |  FROM fdoc, unnest(range(1, len(fa) - ${k - 2})) AS u(s)
      |  WHERE len(fa) >= $k),
      |""".stripMargin +
    """ winmarks AS (
      |  SELECT doc_id, s,
      |    count(*) OVER (PARTITION BY w8) AS n_inst,
      |    row_number() OVER (PARTITION BY w8 ORDER BY doc_id, s) AS rn
      |  FROM wins)""".stripMargin
  }

  /** The q59 MinHash pair chain (tokens → md5-derived 32-bit values →
    * explicit (a·x+b) mod p family → 4×4 banding → candidate pairs →
    * intersection counts), shared by every oracle that consumes the
    * SAME edge set: q59 (the pairs), q60 (their transitive closure),
    * q83 (their split-leakage cut). ONE definition — a family constant
    * edit cannot land in one consumer only. Ends at `inter`/`cnt`;
    * consumers append their own CTEs/final SELECT. Constants match
    * Extended.MinHashA/B literal-for-literal. */
  private val minhashChainCtes: String =
    """t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      | uw AS (SELECT doc_id, unnest(toks) AS w FROM t),
      | tok AS (SELECT DISTINCT doc_id, w FROM uw WHERE w <> ''),
      | tx AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS x FROM tok),
      | c AS (SELECT unnest(generate_series(0, 15)) AS i,
      |   unnest([387413, 204209, 501871, 118757, 286711, 430585, 93871, 364657,
      |           259679, 147641, 478237, 58693, 315979, 196613, 420263, 86243]) AS a,
      |   unnest([98429, 312881, 45751, 267923, 159871, 73009, 401587, 22481,
      |           348259, 120097, 289751, 441347, 66563, 237541, 30781, 182429]) AS b),
      | hv AS (SELECT doc_id, i, min((a * x + b) % 2147483647) AS m
      |        FROM tx CROSS JOIN c GROUP BY doc_id, i),
      | bd AS (SELECT doc_id, i // 4 AS g, string_agg(CAST(m AS VARCHAR), ',' ORDER BY i) AS v
      |        FROM hv GROUP BY doc_id, i // 4),
      | cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |          FROM bd x JOIN bd y ON x.g = y.g AND x.v = y.v AND y.doc_id > x.doc_id),
      | cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
      | inter AS (SELECT c2.a, c2.b, count(*) AS ni
      |           FROM cand c2 JOIN tok ta ON ta.doc_id = c2.a
      |                        JOIN tok tb ON tb.doc_id = c2.b AND tb.w = ta.w
      |           GROUP BY c2.a, c2.b)""".stripMargin

  /** The q84 literal-quantizer cell rendered as SQL — (score columns,
    * first-max CASE) — shared by the q84/q88/q89 oracles exactly as
    * `Extended.q84Cell` is shared by the queries: same left-associated
    * element × double(int) chains, same sequential CASE, so the
    * engines' assignments are bit-identical by construction. */
  private def q84CellSql: (String, String) = {
    def dotSql(cs: Seq[Int]): String =
      cs.zipWithIndex.map { case (c, j) =>
        s"(embedding[${j + 1}] * ${c.toDouble})"
      }.mkString(" + ")
    val k = Extended.Q84Centroids.length
    val scoreCols = Extended.Q84Centroids.zipWithIndex
      .map { case (cs, i) => s"${dotSql(cs)} AS s$i" }
      .mkString(",\n    ")
    val caseSql = (0 until k - 1).map { i =>
      val isMax = (i + 1 until k).map(j => s"s$i >= s$j").mkString(" AND ")
      s"WHEN $isMax THEN $i"
    }.mkString("CASE ", " ", s" ELSE ${k - 1} END")
    (scoreCols, caseSql)
  }

  /** The composed-ingest-day CTE chain shared by q95/q96 (the q93
    * spine extended with the substring-scrub and lexical-decontam
    * stages) — ONE definition so the two declared day variants cannot
    * drift: q59 minhash chain → portable-scrub md5 fingerprints (red)
    * → seed fp set (idxfp) → day keep-first exact survivors (ek) →
    * q86-style lexical verdicts (fl) → survivors (lexk) → window
    * ownership over seed ∪ survivors (q76's chain: sb/swords/sfdoc/
    * swins/smarks) → shadowed-window cut and scrubbed word lists
    * (shad/dwords/cov/karr — q77's rebuild; docs scrubbed to nothing
    * simply have no karr row) → q57-style 8-gram containment of the
    * SCRUBBED text vs the raw doc_id < 20 benchmark slice
    * (bbase…cont). Consumers append their own `keepers` CTE +
    * [[pipelineAdmissionTail]]. Ends at `cont`. */
  private lazy val pipelineDayCtes: String = {
    import graft.functions.TextFunctions.{PiiEmailPattern, PiiUrlPattern,
      PiiIpv4Pattern, PiiPhonePortablePattern}
    "WITH " + minhashChainCtes +
    s""",
      | red AS (
      |  SELECT doc_id, lang,
      |    md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
      |      '$PiiEmailPattern', '<EMAIL>', 'g'),
      |      '$PiiUrlPattern', '<URL>', 'g'),
      |      '$PiiIpv4Pattern', '<IP>', 'g'),
      |      '$PiiPhonePortablePattern', '<PHONE>', 'g')) AS clean_fp
      |  FROM documents),
      | idxfp AS (SELECT DISTINCT clean_fp FROM red WHERE doc_id % 10 < 7),
      | ek AS (
      |  SELECT doc_id, lang FROM (
      |    SELECT d.doc_id, d.lang,
      |      row_number() OVER (PARTITION BY d.clean_fp ORDER BY d.doc_id) AS rn
      |    FROM red d LEFT JOIN idxfp i ON i.clean_fp = d.clean_fp
      |    WHERE d.doc_id % 10 >= 7 AND i.clean_fp IS NULL) sub
      |  WHERE rn = 1),
      | pairs AS (SELECT i2.a, i2.b
      |   FROM inter i2 JOIN cnt ca ON ca.doc_id = i2.a JOIN cnt cb ON cb.doc_id = i2.b
      |   WHERE CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE) >= 0.8),
      | sym AS (SELECT a AS x, b AS y FROM pairs UNION ALL SELECT b AS x, a AS y FROM pairs),
      | symk AS (SELECT s.x, s.y,
      |     CASE WHEN s.y % 10 < 7 THEN 1 ELSE 0 END AS y_old,
      |     CASE WHEN e2.doc_id IS NOT NULL THEN 1 ELSE 0 END AS y_ek
      |   FROM sym s LEFT JOIN ek e2 ON e2.doc_id = s.y),
      | fl AS (SELECT e.doc_id, e.lang,
      |     max(s.y_old) AS has_old,
      |     max(CASE WHEN s.y_ek = 1 AND s.y < e.doc_id THEN 1 ELSE 0 END) AS has_new
      |   FROM ek e LEFT JOIN symk s ON s.x = e.doc_id
      |   GROUP BY e.doc_id, e.lang),
      | lexk AS (SELECT doc_id, lang FROM fl
      |   WHERE COALESCE(has_old, 0) = 0 AND COALESCE(has_new, 0) = 0),
      | sb AS (
      |  SELECT d.doc_id, regexp_split_to_array(trim(d.text),
      |    '[ \\t\\n\\x0B\\f\\r]+') AS arr
      |  FROM documents d
      |  WHERE d.doc_id % 10 < 7 OR d.doc_id IN (SELECT doc_id FROM lexk)),
      | swords AS (
      |  SELECT doc_id, wi, arr[wi] AS w
      |  FROM sb, unnest(range(1, len(arr) + 1)) AS t(wi)
      |  WHERE arr[wi] <> ''),
      | sfdoc AS (
      |  SELECT doc_id, list(w ORDER BY wi) AS fa FROM swords GROUP BY doc_id),
      | swins AS (
      |  SELECT doc_id, u.s AS s, array_to_string(fa[u.s:u.s+7], ' ') AS w8
      |  FROM sfdoc, unnest(range(1, len(fa) - 6)) AS u(s)
      |  WHERE len(fa) >= 8),
      | smarks AS (
      |  SELECT doc_id, s,
      |    row_number() OVER (PARTITION BY w8 ORDER BY doc_id, s) AS rn
      |  FROM swins),
      | shad AS (SELECT m.doc_id, m.s FROM smarks m
      |   JOIN lexk l ON l.doc_id = m.doc_id WHERE m.rn > 1),
      | dwords AS (
      |  SELECT w2.doc_id,
      |    row_number() OVER (PARTITION BY w2.doc_id ORDER BY w2.wi) AS p, w2.w
      |  FROM swords w2 JOIN lexk l ON l.doc_id = w2.doc_id),
      | cov AS (
      |  SELECT DISTINCT dw.doc_id, dw.p
      |  FROM dwords dw JOIN shad sh
      |    ON sh.doc_id = dw.doc_id AND dw.p BETWEEN sh.s AND sh.s + 7),
      | karr AS (
      |  SELECT dw.doc_id, list(dw.w ORDER BY dw.p) AS ka
      |  FROM dwords dw LEFT JOIN cov
      |    ON cov.doc_id = dw.doc_id AND cov.p = dw.p
      |  WHERE cov.p IS NULL
      |  GROUP BY dw.doc_id),
      | bbase AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text),
      |    '[ \\t\\n\\x0B\\f\\r]+') AS arr
      |  FROM documents WHERE doc_id < 20),
      | bwords AS (
      |  SELECT doc_id, wi, arr[wi] AS w
      |  FROM bbase, unnest(range(1, len(arr) + 1)) AS t(wi)
      |  WHERE arr[wi] <> ''),
      | bfd AS (
      |  SELECT doc_id, list(w ORDER BY wi) AS fa FROM bwords GROUP BY doc_id),
      | bsh AS (
      |  SELECT DISTINCT array_to_string(fa[u.s:u.s+7], ' ') AS g8
      |  FROM bfd, unnest(range(1, len(fa) - 6)) AS u(s)
      |  WHERE len(fa) >= 8),
      | dsh AS (
      |  SELECT doc_id, array_to_string(ka[u.s:u.s+7], ' ') AS g8
      |  FROM karr, unnest(range(1, len(ka) - 6)) AS u(s)
      |  WHERE len(ka) >= 8),
      | cont AS (SELECT DISTINCT d2.doc_id FROM dsh d2 JOIN bsh b2 ON b2.g8 = d2.g8)""".stripMargin
  }

  /** The composed day's budget-fill tail (q68/q69's hash-order
    * admission at salt 0 under the q93 budget CASE) over a `keepers`
    * CTE with (doc_id, lang, n_tokens) — shared by q93's siblings
    * q95/q96 so the admission arithmetic cannot drift between them. */
  private val pipelineAdmissionTail: String =
    """,
      | ordered AS (
      |  SELECT doc_id, lang, n_tokens,
      |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang
      |      ORDER BY md5('0:' || CAST(doc_id AS VARCHAR)), doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS cum_before,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY md5('0:' || CAST(doc_id AS VARCHAR)), doc_id)
      |      AS BIGINT) AS pick_pos
      |  FROM keepers)
      |SELECT doc_id, lang, n_tokens, cum_before, pick_pos
      |FROM ordered
      |WHERE cum_before < CASE lang WHEN 'en' THEN 3000 WHEN 'de' THEN 800
      |                             WHEN 'es' THEN 500 WHEN 'zh' THEN 1200
      |                             ELSE 0 END
      |ORDER BY doc_id""".stripMargin

  private val base: Map[String, String] = Map(
    "q01_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice * (1 - l_discount), 2) AS net
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_returnflag = 'R' AND l_quantity > 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_pred_complex" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE (c_mktsegment IN ('BUILDING','AUTOMOBILE') OR c_acctbal BETWEEN 1000 AND 2000)
        |  AND c_name LIKE 'Customer%' AND c_nationkey IS NOT NULL AND NOT (c_acctbal < 0)
        |ORDER BY c_custkey""".stripMargin,

    // Sums mirror dsumRound exactly (the q52 pattern): per-term cast to
    // DECIMAL(38,8), EXACT decimal sum, double only for the final round.
    // A raw double sum drifts with accumulation order — at sf0.1's 600k
    // lineitem rows sum_disc crossed a cent boundary against the Spark
    // side's exact decimal sum (…231.625: DuckDB's double sum rendered
    // .62, the exact sum .63). The avg numerator gets the same mirror.
    "q03_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE),2) AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE),2) AS sum_base,
        |  round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,8))) AS DOUBLE),2) AS sum_disc,
        |  round(CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(38,8))) AS DOUBLE),2) AS sum_charge,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE) / count(l_quantity),4) AS avg_qty,
        |  count(*) AS cnt
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q04_agg_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust,
        |       count(DISTINCT o_orderpriority) AS n_prio, count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q05_agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_cust,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(38,8))) AS DOUBLE),2) AS bal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q06_agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE),2) AS tp
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q07_agg_grouping_sets" ->
      """SELECT c_mktsegment, c_nationkey, count(*) AS n
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin,

    "q08_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE),2) AS total
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q09_join_multiway_topn" ->
      """SELECT o.o_orderkey,
        |  round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(38,8))) AS DOUBLE),2) AS revenue,
        |  o.o_orderdate
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-06-15'
        |  AND l.l_shipdate > TIMESTAMP '1998-06-15'
        |GROUP BY o.o_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q10_join_left_outer" ->
      """SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
        |       round(coalesce(CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,8))) AS DOUBLE), 0), 2) AS spent
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_custkey ORDER BY c.c_custkey""".stripMargin,

    "q11_join_full_outer" ->
      """WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
        |     sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT coalesce(cn.nk, sn.nk) AS nationkey, coalesce(n_cust,0) AS n_cust, coalesce(n_supp,0) AS n_supp
        |FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk ORDER BY nationkey""".stripMargin,

    "q12_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q13_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "q14_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q15_join_range_theta" ->
      """SELECT e1.user_id, count(*) AS conversions
        |FROM events e1 JOIN events e2
        |  ON e1.user_id = e2.user_id
        | AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 30 MINUTE
        |WHERE e1.event_type = 'click' AND e2.event_type = 'purchase'
        |GROUP BY e1.user_id ORDER BY e1.user_id""".stripMargin,

    "q16_join_asof" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS last_click_id
        |FROM (SELECT * FROM events WHERE event_type='purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY purchase_id""".stripMargin,

    "q17_win_rank" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    rank()        OVER w AS rnk,
        |    dense_rank()  OVER w AS drnk,
        |    row_number()  OVER w AS rn,
        |    ntile(4)      OVER w AS quartile
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
        |) t WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,

    "q18_win_running" ->
      """SELECT user_id, event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_value
        |FROM events WHERE user_id < 20 ORDER BY user_id, event_id""".stripMargin,

    "q19_win_lead_lag" ->
      """SELECT user_id, event_id,
        |  lag(event_type)  OVER w AS prev_type,
        |  lead(event_type) OVER w AS next_type,
        |  round(value - lag(value, 1, 0.0) OVER w, 2) AS delta
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "q20_win_range_frame" ->
      """SELECT user_id, event_id,
        |  count(*) OVER (PARTITION BY user_id ORDER BY ts
        |     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour
        |FROM events WHERE user_id < 20 ORDER BY user_id, event_id""".stripMargin,

    "q21_sort_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,

    "q22_union" ->
      """SELECT nk, kind FROM (
        |  SELECT DISTINCT c_nationkey AS nk, 'cust' AS kind FROM customer
        |  UNION ALL
        |  SELECT DISTINCT s_nationkey AS nk, 'supp' AS kind FROM supplier
        |) u ORDER BY nk, kind""".stripMargin,

    "q23_intersect_except" ->
      """SELECT nk, 'both' AS tag FROM
        |  (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier) a
        |UNION ALL
        |SELECT nk, 'cust_only' AS tag FROM
        |  (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier) b
        |ORDER BY tag, nk""".stripMargin,

    "q24_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS u, lower(p_type) AS l,
        |  substr(p_name, 1, 8) AS pre,
        |  replace(p_type, ' ', '_') AS rep,
        |  length(p_name) AS len,
        |  concat(p_brand, ':', p_type) AS cat,
        |  trim('  ' || p_brand || ' ') AS trimmed,
        |  CASE WHEN p_type LIKE '%PROMO%' THEN 1 ELSE 0 END AS is_brass
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q25_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(dayofmonth(o_orderdate) AS INT) AS dom,
        |  date_trunc('month', o_orderdate) AS mstart,
        |  o_orderdate + INTERVAL 30 DAY AS due,
        |  CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS age_days
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // round(DOUBLE, s) semantics changed across DuckDB versions (1.0.0 is
    // floor(x*10^s + 0.5)/10^s on IEEE doubles; later releases round the
    // decimal representation), so the oracle spells the rounding formula
    // out explicitly — any DuckDB version then computes bit-identically
    // to the Spark side's Determinism.dround. All rounded expressions
    // here are strictly positive, so the no-sign floor form suffices.
    // Transcendentals (ln, pow) are CAST AS REAL instead: their last
    // double ulp is libm-implementation-defined, and float32 rounding
    // absorbs the drift (see Relational.q26MathFuncs).
    "q26_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  floor(l_extendedprice * 10.0 + 0.5) / 10.0 AS r1,
        |  floor(abs(l_discount - 0.05) * 10000.0 + 0.5) / 10000.0 AS ab,
        |  ceil(l_quantity) AS c, floor(l_quantity) AS f,
        |  floor(sqrt(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS sq,
        |  CAST(ln(l_extendedprice + 1) AS REAL) AS lg,
        |  CAST(pow(1 + l_discount, 2) AS REAL) AS pw,
        |  CAST(l_orderkey % 7 AS BIGINT) AS md
        |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin,

    "q27_case_null" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bucket,
        |  coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q28_json_extract" ->
      """SELECT event_type, round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q29_array_ops" ->
      """SELECT label, count(*) AS n,
        |  round(avg(round(embedding[1], 6)), 6) AS avg_first,
        |  max(len(embedding)) AS dim
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    "q30_tumbling_window" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win, event_type, count(*) AS n,
        |  round(CAST(sum(CAST(value AS DECIMAL(38,8))) AS DOUBLE),2) AS sv
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q31_sliding_window" ->
      """SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE AS win_start,
        |       count(*) AS n,
        |       round(CAST(sum(CAST(value AS DECIMAL(38,8))) AS DOUBLE),2) AS sv
        |FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS k) ks
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q32_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        | sess AS (
        |  SELECT user_id, ts, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM flagged)
        |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, count(*) AS n_events,
        |       min(ts) AS sess_start, max(ts) AS sess_end,
        |       round(CAST(sum(CAST(value AS DECIMAL(38,8))) AS DOUBLE),2) AS sv
        |FROM sess GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin,

    "q33_dedup_keep_first" ->
      """SELECT user_id, event_type, event_id, ts FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q34_dedup_exact_text" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies, min(n_chars) AS n_chars
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "q35_jaccard_neardup" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        | probe AS (SELECT * FROM tok WHERE doc_id < 100),
        | sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
        | inter AS (
        |  SELECT p.doc_id AS a, t.doc_id AS b, count(*) AS i
        |  FROM probe p JOIN tok t ON p.w = t.w AND p.doc_id < t.doc_id
        |  GROUP BY 1, 2)
        |SELECT a, b, round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
        |WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
        |ORDER BY a, b""".stripMargin,

    "q36_cosine_topk" ->
      """WITH probes AS (SELECT vec_id AS pid, embedding AS pe FROM embeddings WHERE vec_id < 10),
        | sims AS (
        |  SELECT pid, vec_id AS nid,
        |    round(list_cosine_similarity(pe, embedding), 4) AS sim
        |  FROM probes CROSS JOIN embeddings e WHERE vec_id <> pid)
        |SELECT pid, nid, sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY pid ORDER BY sim DESC, nid) AS rn FROM sims) t
        |WHERE rn <= 5 ORDER BY pid, rn""".stripMargin,

    "q37_tfidf_top_term" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        | tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
        | df AS (SELECT w, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        | n AS (SELECT count(DISTINCT doc_id) AS n FROM tok)
        |SELECT doc_id, w AS top_term, score FROM (
        |  SELECT tf.doc_id, tf.w,
        |    round(tf.tf * ln((SELECT n FROM n) / df.df), 6) AS score,
        |    row_number() OVER (PARTITION BY tf.doc_id ORDER BY round(tf.tf * ln((SELECT n FROM n) / df.df), 6) DESC, tf.w) AS rn
        |  FROM tf JOIN df ON tf.w = df.w) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q38_star_denorm" ->
      """SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, o.o_orderstatus,
        |  c.c_name, c.c_mktsegment, n.n_name AS cust_nation, r.r_name AS cust_region,
        |  p.p_name, p.p_brand, s.s_name,
        |  round(l.l_extendedprice * (1 - l.l_discount), 2) AS net
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,

    "q39_wordcount_topn" ->
      """SELECT w, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |WHERE w <> '' GROUP BY w ORDER BY n DESC, w LIMIT 20""".stripMargin,

    "q40_histogram" ->
      """SELECT CAST(floor(value / 5) AS BIGINT) AS bucket, count(*) AS n,
        |       round(CAST(sum(CAST(value AS DECIMAL(38,8))) AS DOUBLE) / count(value), 4) AS avg_v
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // Extended (q41+) oracle-matched entries. Rounding is spelled out as
    // the explicit floor formula (see q26 note) and regex classes are
    // ASCII-only so Java regex (Spark) and RE2 (DuckDB) agree. The
    // whitespace class is ALWAYS the explicit '[ \t\n\x0B\f\r]+' (never
    // RE2's '\s', which lacks \x0B — Java's includes it), so a
    // vertical-tab-bearing corpus tokenizes identically in both engines.
    // Token count is written lambda-free (no list_filter closure — the
    // arrow lambda syntax is deprecated in newer DuckDB): interior
    // whitespace splits of a trimmed string never produce empty tokens, so
    // trim-then-split equals filter-out-empties for every input; the
    // CASE guards the all-whitespace/empty document.
    "q41_text_stats" ->
      """SELECT doc_id, n_chars,
        |  CASE WHEN trim(text) = '' THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) END AS n_tokens,
        |  floor(length(regexp_replace(text, '[ \t\n\x0B\f\r]+', '', 'g'))
        |        / greatest(CASE WHEN trim(text) = '' THEN 0
        |                        ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) END, 1)
        |        * 10000.0 + 0.5) / 10000.0 AS mean_tok_len,
        |  floor(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))
        |        / greatest(length(text), 1)
        |        * 10000.0 + 0.5) / 10000.0 AS punct_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    // q42 mirrors graft.functions.TextFunctions feature-for-feature with
    // the SAME operation order, so both engines run identical IEEE double
    // chains: token stats via unnest+group (lambda-free, see q41 note),
    // the langid marker-word argmax as a CASE chain with the Spark
    // fold's en>de>es>fr>zh tie priority, subwords as two
    // regexp_extract_all run counts, and dround as the explicit floor
    // formula (all rounded quantities are >= 0 here).
    "q42_quality_langid" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0B\f\r]+')) AS w
        |  FROM documents WHERE trim(text) <> ''),
        | tstat AS (
        |  SELECT doc_id, count(*) AS n_toks,
        |    sum(CASE WHEN w IN ('the','a','an','and','or','of','to','in','is','are',
        |                        'was','on','for','with','by','at','as','it','this','that')
        |        THEN 1 ELSE 0 END) AS n_stop
        |  FROM tok GROUP BY doc_id),
        | feat AS (
        |  SELECT d.doc_id, d.lang, d.text, lower(d.text) AS lt,
        |         coalesce(t.n_toks, 0) AS n_toks, coalesce(t.n_stop, 0) AS n_stop
        |  FROM documents d LEFT JOIN tstat t ON d.doc_id = t.doc_id),
        | scored AS (
        |  SELECT *,
        |    (CASE WHEN contains(lt, ' the ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' and ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' of ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' is ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' to ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' with ') THEN 1 ELSE 0 END) AS s_en,
        |    (CASE WHEN contains(lt, ' der ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' die ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' das ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' und ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' ist ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' mit ') THEN 1 ELSE 0 END +
        |     CASE WHEN regexp_matches(lt, '[äöüß]') THEN 2 ELSE 0 END) AS s_de,
        |    (CASE WHEN contains(lt, ' el ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' la ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' los ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' es ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' con ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' por ') THEN 1 ELSE 0 END +
        |     CASE WHEN regexp_matches(lt, '[ñ¿¡]') THEN 2 ELSE 0 END) AS s_es,
        |    (CASE WHEN contains(lt, ' le ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' la ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' les ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' est ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' avec ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(lt, ' pour ') THEN 1 ELSE 0 END +
        |     CASE WHEN regexp_matches(lt, '[àâçèêîôû]') THEN 2 ELSE 0 END) AS s_fr,
        |    CASE WHEN regexp_matches(lt, '[\x{4e00}-\x{9fff}]') THEN 10 ELSE 0 END AS s_zh
        |  FROM feat)
        |SELECT doc_id, lang,
        |  CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'unknown'
        |       WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
        |       WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
        |       WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
        |       WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
        |       ELSE 'zh' END AS lang_pred,
        |  floor((least(length(text) / 500.0, 1.0)
        |     + CAST(length(regexp_replace(text, '[^a-zA-Za-яА-Яçáéíóúäöüßàèìòùâêîôû]', '', 'g')) AS DOUBLE)
        |       / greatest(length(text), 1)
        |     + least(CAST(n_stop AS DOUBLE) / greatest(n_toks, 1) * 4.0, 1.0)
        |     + (1.0 - least(CAST(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE)
        |                    / greatest(length(text), 1) * 5.0, 1.0)))
        |    / 4.0 * 10000.0 + 0.5) / 10000.0 AS quality,
        |  floor(CAST(n_stop AS DOUBLE) / greatest(n_toks, 1) * 10000.0 + 0.5) / 10000.0 AS stop_ratio,
        |  len(regexp_extract_all(text, '[a-zA-Z]+'))
        |    + len(regexp_extract_all(text, '[^a-zA-Z \t\n\x0B\f\r]+')) AS n_subwords
        |FROM scored ORDER BY doc_id""".stripMargin,

    // md5() emits the same lowercase hex in Spark and DuckDB, so the
    // fingerprint-dedup map is fully value-checkable.
    "q47_fingerprint_dedup" ->
      """SELECT doc_id, md5(text) AS fp,
        |  min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id,
        |  doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Split buckets from the first 8 md5 hex chars: Spark conv(h,16,10)
    // and DuckDB CAST('0x'||h AS BIGINT) parse the same 32-bit value
    // (always positive, so % agrees too).
    "q50_split_assign" ->
      """SELECT doc_id,
        |  CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 10000 AS bucket,
        |  CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 10000 < 8000 THEN 'train'
        |       WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 10000 < 9000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q45_cosine_neardup" ->
      """SELECT a.vec_id AS pid, b.vec_id AS nid,
        |  round(list_cosine_similarity(a.embedding, b.embedding), 4) AS sim
        |FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
        |WHERE a.vec_id < 100
        |  AND round(list_cosine_similarity(a.embedding, b.embedding), 4) >= 0.35
        |ORDER BY pid, nid""".stripMargin,

    // q58: same md5-derived 60-bit token hashes and bit-balance majority
    // vote as the Spark side, but candidates by BRUTE FORCE over all
    // pairs — so this oracle simultaneously value-checks the signatures
    // and proves the Spark band join's completeness (a missed pair =
    // driver compare failure).
    "q58_simhash_md5" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        | w AS (SELECT doc_id, unnest(toks) AS w FROM t),
        | wn AS (SELECT doc_id, CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) AS h
        |        FROM w WHERE w <> ''),
        | bt AS (SELECT doc_id, b, sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS bal
        |        FROM wn CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) g
        |        GROUP BY doc_id, b),
        | sig AS (SELECT doc_id,
        |           CAST(sum(CASE WHEN bal > 0 THEN (CAST(1 AS BIGINT) << b)
        |                         ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sig
        |         FROM bt GROUP BY doc_id)
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |       CAST(bit_count(xor(x.sig, y.sig)) AS INTEGER) AS hamming
        |FROM sig x JOIN sig y ON y.doc_id > x.doc_id
        |WHERE bit_count(xor(x.sig, y.sig)) <= 3
        |ORDER BY a, b""".stripMargin,

    // q59: the explicit-family MinHash — the oracle REPLAYS the Spark
    // side's hash family, banding, and exact-Jaccard re-score (banding
    // is probabilistic, so reproducing it — not brute force — is what
    // makes the declared result value-checkable). Constants match
    // Extended.MinHashA/B literal-for-literal.
    "q59_minhash_md5" -> ("WITH " + minhashChainCtes +
      """
        |SELECT i2.a, i2.b,
        |  floor(CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS jaccard
        |FROM inter i2 JOIN cnt ca ON ca.doc_id = i2.a JOIN cnt cb ON cb.doc_id = i2.b
        |WHERE CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE) >= 0.8
        |ORDER BY a, b""".stripMargin),

    // q60: connected components over the q59 pair graph, computed
    // declaratively as a recursive-CTE transitive closure (min reachable
    // node = keeper; reach count = component size). The pairs CTE chain
    // is q59's oracle verbatim — the clustering is only meaningful
    // against the exact same edge set.
    //
    // SCALE NOTE: the closure materializes O(sum of component^2) rows —
    // 5.6 s at sf0.01, but component sizes grow ~10x per SF decade so it
    // spills tens of GB at sf0.1. That asymmetry is the point (the Spark
    // side's label propagation holds one (node,label) row per node); run
    // this oracle at the sf0.01 contract tier only.
    "q60_dedup_clusters" -> ("WITH RECURSIVE " + minhashChainCtes +
      """,
        | pairs AS (SELECT i2.a, i2.b
        |           FROM inter i2 JOIN cnt ca ON ca.doc_id = i2.a JOIN cnt cb ON cb.doc_id = i2.b
        |           WHERE CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE) >= 0.8),
        | e AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
        | nodes AS (SELECT DISTINCT x AS node FROM e),
        | reach AS (
        |   SELECT node AS s, node AS t FROM nodes
        |   UNION
        |   SELECT r.s, e.y FROM reach r JOIN e ON e.x = r.t)
        |SELECT s AS doc_id, min(t) AS keeper, count(*) AS component_size
        |FROM reach GROUP BY s ORDER BY doc_id""".stripMargin),

    // q61: blocked Levenshtein fuzzy join — both engines implement the
    // identical unit-cost edit distance; the block predicate and the
    // a < b dedup are plain relational algebra.
    "q61_fuzzy_join" ->
      """SELECT x.p_partkey AS a, y.p_partkey AS b,
        |       x.p_name AS name_a, y.p_name AS name_b,
        |       CAST(levenshtein(x.p_name, y.p_name) AS BIGINT) AS dist
        |FROM part x JOIN part y
        |  ON x.p_brand = y.p_brand AND y.p_partkey > x.p_partkey
        |WHERE x.p_name <> y.p_name AND levenshtein(x.p_name, y.p_name) <= 2
        |ORDER BY a, b""".stripMargin,

    // q62: bigram LM scoring. Bigrams via the q56 position-join
    // convention (adjacent raw positions, both tokens non-empty);
    // per-bigram ln of an exact integer ratio, floor-rounded with the
    // sign-aware dround form (log-probs are negative), summed through
    // DECIMAL so the per-doc mean is order-independent.
    "q62_lm_bigram_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        | u AS (SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS i FROM t),
        | big AS (SELECT a.doc_id, a.w AS w1, b.w AS w2
        |         FROM u a JOIN u b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |         WHERE a.w <> '' AND b.w <> ''),
        | c2 AS (SELECT w1, w2, count(*) AS n2 FROM big GROUP BY w1, w2),
        | c1 AS (SELECT w1, sum(n2) AS n1 FROM c2 GROUP BY w1),
        | v AS (SELECT count(DISTINCT w) AS vocab FROM u WHERE w <> ''),
        | lp AS (SELECT c2.w1, c2.w2,
        |          CASE WHEN ln(CAST(n2 + 1 AS DOUBLE) / CAST(n1 + vocab AS DOUBLE)) * 1000000.0 >= 0
        |               THEN floor(ln(CAST(n2 + 1 AS DOUBLE) / CAST(n1 + vocab AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |               ELSE -floor(-(ln(CAST(n2 + 1 AS DOUBLE) / CAST(n1 + vocab AS DOUBLE)) * 1000000.0) + 0.5) / 1000000.0
        |          END AS logp
        |        FROM c2 JOIN c1 ON c1.w1 = c2.w1 CROSS JOIN v),
        | ds AS (SELECT b.doc_id, CAST(sum(CAST(lp.logp AS DECIMAL(38,8))) AS DOUBLE) AS sd,
        |               count(*) AS nb
        |        FROM big b JOIN lp ON lp.w1 = b.w1 AND lp.w2 = b.w2
        |        GROUP BY b.doc_id)
        |SELECT doc_id, nb AS n_bigrams,
        |  CASE WHEN sd / nb * 1000000.0 >= 0
        |       THEN floor(sd / nb * 1000000.0 + 0.5) / 1000000.0
        |       ELSE -floor(-(sd / nb * 1000000.0) + 0.5) / 1000000.0
        |  END AS lm_score
        |FROM ds ORDER BY doc_id""".stripMargin,

    // q64: the n-gram (character-trigram) Jaccard — q35's shape with
    // substr shingles instead of word tokens. Both engines take 1-based
    // 3-char substrings over identical length semantics (q24-verified).
    "q64_ngram_jaccard" ->
      """WITH p AS (SELECT doc_id, text, unnest(generate_series(1, length(text) - 2)) AS i
        |           FROM documents WHERE length(text) >= 3),
        | g AS (SELECT DISTINCT doc_id, substr(text, i, 3) AS w FROM p),
        | probe AS (SELECT * FROM g WHERE doc_id < 100),
        | sizes AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
        | inter AS (
        |  SELECT pr.doc_id AS a, t.doc_id AS b, count(*) AS i
        |  FROM probe pr JOIN g t ON pr.w = t.w AND pr.doc_id < t.doc_id
        |  GROUP BY 1, 2)
        |SELECT a, b,
        |  floor(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) * 10000.0 + 0.5) / 10000.0 AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
        |WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
        |ORDER BY a, b""".stripMargin,

    // q65: attribution-window conversion latency. Latencies are exact
    // µs integers (epoch_us ≡ Spark's unix_micros under UTC); only the
    // percentile interpolation and the seconds division are floating
    // point, rounded with the shared floor formula (always >= 0 here).
    "q65_conversion_latency" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        | v AS (SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'),
        | lat AS (
        |   SELECT purchase_id, p_ts, max(v_ts) AS v_ts
        |   FROM p JOIN v USING (user_id)
        |   WHERE v_ts <= p_ts AND v_ts >= p_ts - INTERVAL 30 MINUTE
        |   GROUP BY purchase_id, p_ts),
        | l2 AS (SELECT CAST(p_ts AS DATE) AS day,
        |               epoch_us(p_ts) - epoch_us(v_ts) AS lat_us FROM lat)
        |SELECT day, count(*) AS n_conv,
        |  floor(quantile_cont(lat_us, 0.5) / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS p50_s,
        |  floor(quantile_cont(lat_us, 0.9) / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS p90_s
        |FROM l2 GROUP BY day ORDER BY day""".stripMargin,

    // q63: z-score outliers from exact decimal power sums (q51's
    // determinism recipe); z is floor-rounded to 4dp before the
    // threshold so both engines compare the same value at the boundary.
    "q63_outlier_zscore" ->
      """WITH s AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sp,
        |         CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS spp
        |  FROM events GROUP BY event_type),
        | z AS (
        |  SELECT e.event_id, e.event_type, e.value,
        |         (e.value - sp / n) / sqrt((spp - sp * sp / n) / (n - 1)) AS zraw
        |  FROM events e JOIN s ON s.event_type = e.event_type)
        |SELECT event_id, event_type, value,
        |  CASE WHEN zraw * 10000.0 >= 0 THEN floor(zraw * 10000.0 + 0.5) / 10000.0
        |       ELSE -floor(-(zraw * 10000.0) + 0.5) / 10000.0 END AS z
        |FROM z
        |WHERE abs(CASE WHEN zraw * 10000.0 >= 0 THEN floor(zraw * 10000.0 + 0.5) / 10000.0
        |               ELSE -floor(-(zraw * 10000.0) + 0.5) / 10000.0 END) >= 2.5
        |ORDER BY event_id""".stripMargin,

    // Analytics (q51+) — see graft.ops.Analytics. Second-moment stats
    // are derived from EXACT decimal power sums (2-decimal doubles cast
    // to DECIMAL(18,2); decimal products/sums are exact in both
    // engines), then combined in double with the IDENTICAL expression
    // tree as the Spark side, so the pre-rounding doubles are
    // bit-identical. Rounding is the explicit dround floor form
    // (sign-aware CASE where the value can be negative: covar/corr).
    "q51_stats_moments" ->
      """WITH g AS (
        |  SELECT l_returnflag, l_linestatus, count(*) AS n,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS spp,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sqq,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS spq
        |  FROM lineitem GROUP BY 1, 2),
        | m AS (
        |  SELECT l_returnflag, l_linestatus, n,
        |    CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) AS raw_avg,
        |    (CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0) AS raw_var,
        |    (CAST(spq AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(n AS DOUBLE) - 1.0) AS raw_cov,
        |    (CAST(n AS DOUBLE) * CAST(spq AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sq AS DOUBLE))
        |      / (sqrt(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
        |         * sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))) AS raw_corr
        |  FROM g)
        |SELECT l_returnflag, l_linestatus, n,
        |  floor(raw_avg * 10000.0 + 0.5) / 10000.0 AS avg_price,
        |  floor(raw_var * 10000.0 + 0.5) / 10000.0 AS var_price,
        |  floor(sqrt(raw_var) * 10000.0 + 0.5) / 10000.0 AS std_price,
        |  CASE WHEN raw_cov * 10000.0 >= 0 THEN floor(raw_cov * 10000.0 + 0.5)
        |       ELSE -floor(-(raw_cov * 10000.0) + 0.5) END / 10000.0 AS covar_pq,
        |  CASE WHEN raw_corr * 1000000.0 >= 0 THEN floor(raw_corr * 1000000.0 + 0.5)
        |       ELSE -floor(-(raw_corr * 1000000.0) + 0.5) END / 1000000.0 AS corr_pq
        |FROM m ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // Pivot = FILTERed conditional aggregation; revenue through the
    // exact-decimal-sum-then-round pattern (dsumRound twin). Counts
    // FILTER to 0 where the Spark pivot coalesces null cells to 0.
    "q52_pivot_status" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE), 2) AS f_rev,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE), 2) AS o_rev,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE), 2) AS p_rev
        |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin,

    // quantile_cont and Spark's exact percentile share the definition
    // interp(rank = p·(n−1)); quarter-fraction interpolations of
    // 2-decimal inputs carry ≤ 4 decimals, so floor-round(4) is exact.
    "q53_percentile_price" ->
      """SELECT o_orderpriority, count(*) AS n, min(o_totalprice) AS mn,
        |  floor(quantile_cont(o_totalprice, 0.25) * 10000.0 + 0.5) / 10000.0 AS p25,
        |  floor(quantile_cont(o_totalprice, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
        |  floor(quantile_cont(o_totalprice, 0.75) * 10000.0 + 0.5) / 10000.0 AS p75,
        |  max(o_totalprice) AS mx
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    // Day-grain cohorts (the month-long events table collapses to one
    // weekly cohort); all-integral DATE arithmetic in both engines.
    "q54_cohort_retention" ->
      """WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1),
        | j AS (
        |  SELECT e.user_id, CAST(f.first_ts AS DATE) AS cohort_day,
        |    CAST(date_diff('day', CAST(f.first_ts AS DATE), CAST(e.ts AS DATE)) AS INTEGER) AS day_offset
        |  FROM events e JOIN f USING (user_id))
        |SELECT cohort_day, day_offset, count(DISTINCT user_id) AS n_users
        |FROM j GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,

    "q55_funnel_stages" ->
      """WITH u AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS ts_s,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS ts_v,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS ts_p
        |  FROM events GROUP BY 1)
        |SELECT count(*) AS n_users, count(ts_s) AS n_signup,
        |  count(CASE WHEN ts_v > ts_s THEN 1 END) AS n_view_after,
        |  count(CASE WHEN ts_p > ts_v AND ts_v > ts_s THEN 1 END) AS n_full_funnel
        |FROM u""".stripMargin,

    // Adjacent pairs via position self-join (the Spark side zips two
    // slices of the same token array — same pairs, no join). Pairs
    // spanning an empty token are dropped on both sides.
    "q56_bigram_topn" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        | u AS (SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS i FROM t)
        |SELECT a.w || ' ' || b.w AS bigram, count(*) AS n
        |FROM u a JOIN u b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |WHERE a.w <> '' AND b.w <> ''
        |GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20""".stripMargin,

    // 8-gram shingles as list_slice joins; docs 0–19 are the held-out
    // benchmark (DISTINCT shingle set), every other doc reports its
    // occurrence-counted hit ratio.
    "q57_decontam_overlap" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        | p AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 7)) AS i
        |       FROM t WHERE len(toks) >= 8),
        | s AS (SELECT doc_id, array_to_string(list_slice(toks, i, i + 7), ' ') AS sh FROM p),
        | b AS (SELECT DISTINCT sh FROM s WHERE doc_id < 20)
        |SELECT s.doc_id, count(*) AS n_shingles, count(b.sh) AS n_hits,
        |  floor(CAST(count(b.sh) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS ratio,
        |  count(b.sh) > 0 AS contaminated
        |FROM s LEFT JOIN b ON s.sh = b.sh
        |WHERE s.doc_id >= 20 GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    // q67: sequence packing — the identical virtual-token-stream cumsum
    // + generate_series span expansion as the Spark side, all integer
    // arithmetic (the window sum is cast back to BIGINT: DuckDB widens
    // sum(BIGINT) to HUGEINT, which would fail dtype parity; `//` is
    // DuckDB's integer floor division, mirroring Spark's `div` — both
    // sides stay exact past 2^53 tokens where float division would
    // not). Token counts reuse q41's lambda-free trim-then-split
    // formulation.
    "q67_pack_sequences" ->
      """WITH sized AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) END AS n
        |  FROM documents),
        | spans AS (
        |  SELECT doc_id,
        |    CAST(sum(n) OVER (ORDER BY doc_id) - n AS BIGINT) AS s,
        |    CAST(sum(n) OVER (ORDER BY doc_id) AS BIGINT) AS e
        |  FROM sized WHERE n > 0),
        | x AS (
        |  SELECT doc_id, s, e,
        |    unnest(generate_series(CAST(s // 512 AS BIGINT),
        |                           CAST((e - 1) // 512 AS BIGINT))) AS seq_id
        |  FROM spans)
        |SELECT seq_id, doc_id,
        |  greatest(seq_id * 512, s) - s AS doc_offset,
        |  greatest(seq_id * 512, s) - seq_id * 512 AS seq_offset,
        |  least((seq_id + 1) * 512, e) - greatest(seq_id * 512, s) AS slice_len
        |FROM x ORDER BY seq_id, seq_offset""".stripMargin,

    // q68 replays the quota fill as a plain per-language window (fine at
    // oracle scale; the Spark side's two-phase prefix sum exists exactly
    // because this shape doesn't scale): md5 hex order keys are
    // byte-identical across engines, token counts are q41's lambda-free
    // formulation, and every output column is integer arithmetic, so
    // the running sums, pick order, and the budget cut value-match.
    "q68_mixture_sample" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) END AS n_tokens,
        |    md5('mix:' || CAST(doc_id AS VARCHAR)) AS rk
        |  FROM documents),
        | ordered AS (
        |  SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang
        |      ORDER BY rk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY rk, doc_id)
        |      AS BIGINT) AS pick_pos
        |  FROM toks)
        |SELECT doc_id, lang, n_tokens, cum_before, pick_pos
        |FROM ordered WHERE cum_before < 2000 ORDER BY doc_id""".stripMargin,

    // q69: q68's window twin with a per-language CASE budget — the ELSE
    // 0 branch value-checks the whitelist (unlisted `fr` contributes
    // nothing: cum_before < 0 is always false).
    "q69_mixture_budgets" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) END AS n_tokens,
        |    md5('mix:' || CAST(doc_id AS VARCHAR)) AS rk
        |  FROM documents),
        | ordered AS (
        |  SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang
        |      ORDER BY rk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY rk, doc_id)
        |      AS BIGINT) AS pick_pos
        |  FROM toks)
        |SELECT doc_id, lang, n_tokens, cum_before, pick_pos
        |FROM ordered
        |WHERE cum_before < CASE lang WHEN 'en' THEN 3000 WHEN 'de' THEN 800
        |                             WHEN 'es' THEN 500 WHEN 'zh' THEN 1200
        |                             ELSE 0 END
        |ORDER BY doc_id""".stripMargin,

    // q70: independent replay of the greedy longest-match (maximal
    // munch) vocab tokenizer — the ONE declared query whose Spark side
    // is a custom codegen'd expression (vocab_token_count), here
    // value-checked by a different engine. Structure: words (split +
    // ordinality), ml = max vocab match length at every (word, pos)
    // (precomputed so the recursive part stays join-only — DuckDB
    // forbids aggregates/subqueries there), then the walk advances the
    // cursor by max(match, 1) counting one token per visited position;
    // per-word count = max(cnt) at the walk's fixpoint. The vocab
    // VALUES list renders from Extended.Q70Vocab — one definition, two
    // engines.
    "q70_vocab_tokens" -> {
      val vals = Extended.Q70Vocab.map(v => s"('$v')").mkString(",")
      s"""WITH RECURSIVE vocab(v) AS (VALUES $vals),
        | words AS (
        |  SELECT doc_id, wi, arr[wi] AS w
        |  FROM (SELECT doc_id,
        |          regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+') AS arr
        |        FROM documents),
        |       unnest(range(1, len(arr) + 1)) AS t(wi)
        |  WHERE arr[wi] <> ''),
        | ml AS (
        |  SELECT w.doc_id, w.wi, p.pos, max(len(v.v)) AS m
        |  FROM words w, unnest(range(1, len(w.w) + 1)) AS p(pos), vocab v
        |  WHERE substr(w.w, p.pos, len(v.v)) = v.v
        |  GROUP BY w.doc_id, w.wi, p.pos),
        | walk(doc_id, wi, w, pos, cnt) AS (
        |  SELECT doc_id, wi, w, 1, 1 FROM words WHERE len(w) >= 1
        |  UNION ALL
        |  SELECT wk.doc_id, wk.wi, wk.w, wk.pos + COALESCE(ml.m, 1), wk.cnt + 1
        |  FROM walk wk LEFT JOIN ml
        |    ON ml.doc_id = wk.doc_id AND ml.wi = wk.wi AND ml.pos = wk.pos
        |  WHERE wk.pos + COALESCE(ml.m, 1) <= len(wk.w)),
        | perword AS (SELECT doc_id, wi, max(cnt) AS n FROM walk GROUP BY doc_id, wi)
        |SELECT d.doc_id, CAST(COALESCE(sum(p.n), 0) AS BIGINT) AS n_vocab_tokens
        |FROM documents d
        |LEFT JOIN perword p ON p.doc_id = d.doc_id
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
    },

    // q71: the explicit-hyperplane ANN replayed literal for literal —
    // each plane dot is the SAME left-associated chain of
    // element × double(coefficient) products as the Spark expression
    // (float widens into an exact double product; identical addition
    // order), so bucket signs, the Hamming ≤ 3 candidate set, and the
    // float32 cosine re-score (list_cosine_similarity ≡ float_dot,
    // the q36/q45-proven pairing) all value-match.
    "q71_ann_planes" -> {
      def dotSql(cs: Seq[Int]): String =
        cs.zipWithIndex.map { case (c, j) =>
          s"(embedding[${j + 1}] * ${c.toDouble})"
        }.mkString(" + ")
      val bucketSql = Extended.Q71Planes.zipWithIndex.map { case (cs, i) =>
        s"(CASE WHEN ${dotSql(cs)} > 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH vecs AS (
        |  SELECT vec_id, embedding, $bucketSql AS bkt FROM embeddings),
        | probes AS (
        |  SELECT vec_id AS pid, embedding AS pe, bkt AS pb
        |  FROM vecs WHERE vec_id < 10),
        | cand AS (
        |  SELECT pid, v.vec_id AS nid,
        |    round(list_cosine_similarity(pe, v.embedding), 4) AS sim
        |  FROM probes, vecs v
        |  WHERE v.vec_id <> pid
        |    AND bit_count(CAST(xor(pb, v.bkt) AS BIGINT)) <= 3)
        |SELECT pid, nid, sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY pid ORDER BY sim DESC, nid) AS rn
        |  FROM cand) t
        |WHERE rn <= 5 ORDER BY pid, rn""".stripMargin
    },

    // q72: q70's maximal-munch replay extended from counts to the
    // SEGMENTATION itself, linearized to one row per token. Delta vs
    // q70: the vocab VALUES carry the 0-based entry index; ml
    // additionally takes arg_max(id, len) — the longest match's
    // entry, unique because equal-length matches at one position are
    // the same string and the vocab is distinct; the walk drops its
    // counter (every walk row IS one emitted token position) and
    // joins back to ml for the id (-1 when no match — the one-char
    // fallback); a per-doc row_number over (word, pos) is exactly
    // posexplode's stream order.
    "q72_vocab_token_ids" -> {
      s"""$vocabWalkCtes
        |SELECT doc_id,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wi, pos) - 1
        |    AS BIGINT) AS idx,
        |  tok AS token_id
        |FROM toks
        |ORDER BY doc_id, idx""".stripMargin
    },

    // q75: the packed payload replay — q72's walk CTEs plus ONE window:
    // the global stream position over (doc_id, wi, pos) — exactly
    // packing's ascending-doc_id stream order — then seq_id/pos as
    // div/mod 512. Any slice-map, array-slicing, or reassembly-order
    // defect on the Spark side lands ids at wrong (seq_id, pos) and
    // fails the value hash.
    "q75_packed_token_ids" -> {
      s"""$vocabWalkCtes,
        | stream AS (
        |  SELECT tok,
        |    row_number() OVER (ORDER BY doc_id, wi, pos) - 1 AS gpos
        |  FROM toks)
        |SELECT CAST(gpos // 512 AS BIGINT) AS seq_id,
        |  CAST(gpos % 512 AS BIGINT) AS pos,
        |  tok AS token_id
        |FROM stream
        |ORDER BY seq_id, pos""".stripMargin
    },

    // q73: the same repetition quantities computed the RELATIONAL way
    // (unnest → per-(doc, token) counts → max/sum/count) where the
    // Spark side is a shuffle-free array pass (array_distinct +
    // sorted-run fold). Every input to a ratio is an exact integer on
    // both sides, so the method difference cannot drift; dround is the
    // explicit floor formula (all ratios >= 0). Docs with no tokens
    // (none in this corpus) would emit zeros via the LEFT JOIN
    // COALESCEs on both sides. The split spells Java's `\s` class out
    // explicitly (q70's envelope note: RE2's \s lacks \x0B).
    "q73_repetition_stats" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text),
        |    '[ \t\n\x0B\f\r]+') AS arr
        |  FROM documents),
        | words AS (
        |  SELECT doc_id, wi, arr[wi] AS w
        |  FROM base, unnest(range(1, len(arr) + 1)) AS t(wi)
        |  WHERE arr[wi] <> ''),
        | cnt AS (
        |  SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w),
        | tstat AS (
        |  SELECT doc_id, sum(c) AS n, count(*) AS nd, max(c) AS topc
        |  FROM cnt GROUP BY doc_id),
        | big AS (
        |  SELECT a.doc_id, a.w || ' ' || b.w AS bg
        |  FROM words a JOIN words b
        |    ON b.doc_id = a.doc_id AND b.wi = a.wi + 1),
        | bstat AS (
        |  SELECT doc_id, count(*) AS nb, count(DISTINCT bg) AS nbd
        |  FROM big GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(t.n, 0) AS BIGINT) AS n_tokens,
        |  floor((COALESCE(t.n, 0) - COALESCE(t.nd, 0))
        |        / greatest(COALESCE(t.n, 0), 1)
        |        * 10000.0 + 0.5) / 10000.0 AS dup_tok_frac,
        |  floor(COALESCE(t.topc, 0) / greatest(COALESCE(t.n, 0), 1)
        |        * 10000.0 + 0.5) / 10000.0 AS top_tok_frac,
        |  floor((COALESCE(b.nb, 0) - COALESCE(b.nbd, 0))
        |        / greatest(COALESCE(b.nb, 0), 1)
        |        * 10000.0 + 0.5) / 10000.0 AS dup_bigram_frac
        |FROM documents d
        |LEFT JOIN tstat t ON t.doc_id = d.doc_id
        |LEFT JOIN bstat b ON b.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // q74: boilerplate replay — the top-5-by-document-frequency set is
    // deterministic (ties broken by the word), the mark is a LEFT JOIN
    // against it, and string_agg's in-aggregate ORDER BY wi with its
    // NULL-skipping CASE mirrors collect_list's null-dropping
    // conditional exactly. Output domain = docs with >= 1 token, the
    // same domain posexplode produces on the Spark side.
    "q74_boilerplate_scrub" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text),
        |    '[ \t\n\x0B\f\r]+') AS arr
        |  FROM documents),
        | words AS (
        |  SELECT doc_id, wi, arr[wi] AS w
        |  FROM base, unnest(range(1, len(arr) + 1)) AS t(wi)
        |  WHERE arr[wi] <> ''),
        | bp AS (
        |  SELECT w FROM (
        |    SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY w)
        |  ORDER BY df DESC, w LIMIT 5),
        | marked AS (
        |  SELECT wo.doc_id, wo.wi, wo.w, (bp.w IS NOT NULL) AS is_bp
        |  FROM words wo LEFT JOIN bp ON bp.w = wo.w)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  COALESCE(string_agg(CASE WHEN NOT is_bp THEN w END, ' '
        |                      ORDER BY wi), '') AS kept_text
        |FROM marked GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // q76: window-level duplication counts, grouping the raw 8-token
    // window STRINGS where the Spark side groups their md5 — identical
    // equality classes, so every count agrees. The token stream is
    // REBUILT from the filtered words (fdoc) so window positions match
    // Spark's filtered array exactly (1-based here vs 0-based there —
    // consistent within each engine, never compared across). count()
    // OVER and row_number() OVER mirror the operator's hash-group
    // n_inst / struct-min owner.
    "q76_window_stats" -> (windowCtes +
      """,
        | per AS (
        |  SELECT doc_id, count(*) AS nw,
        |    sum(CASE WHEN n_inst > 1 THEN 1 ELSE 0 END) AS ndup,
        |    sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS nshad
        |  FROM winmarks GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(p.nw, 0) AS BIGINT) AS n_windows,
        |  CAST(COALESCE(p.ndup, 0) AS BIGINT) AS n_dup_windows,
        |  CAST(COALESCE(p.nshad, 0) AS BIGINT) AS n_shadowed,
        |  floor(COALESCE(p.ndup, 0) / greatest(COALESCE(p.nw, 0), 1)
        |        * 10000.0 + 0.5) / 10000.0 AS dup_window_frac
        |FROM documents d
        |LEFT JOIN per p ON p.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin),

    // q77: the scrub replay — shadowed starts (rn > 1) cover positions
    // [s, s+7]; the covered set is the DISTINCT position join (the
    // relational form of the operator's flatten+array_distinct), the
    // kept text a NULL-filtered string_agg in position order, and the
    // domain LEFT JOINs back to every document (untouched docs:
    // n_removed 0; fully-covered docs: kept_text '').
    "q77_window_scrub" -> (windowCtes +
      s""",
        | shad AS (SELECT doc_id, s FROM winmarks WHERE rn > 1),
        | words2 AS (
        |  SELECT doc_id,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY wi) AS p, w
        |  FROM words),
        | cov AS (
        |  SELECT DISTINCT w2.doc_id, w2.p
        |  FROM words2 w2 JOIN shad sh
        |    ON sh.doc_id = w2.doc_id
        |    AND w2.p BETWEEN sh.s AND sh.s + ${Extended.Q76WindowK - 1}),
        | tot AS (SELECT doc_id, count(*) AS n FROM words2 GROUP BY doc_id),
        | kept AS (
        |  SELECT w2.doc_id, count(*) AS nk,
        |    string_agg(w2.w, ' ' ORDER BY w2.p) AS txt
        |  FROM words2 w2 LEFT JOIN cov
        |    ON cov.doc_id = w2.doc_id AND cov.p = w2.p
        |  WHERE cov.p IS NULL
        |  GROUP BY w2.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(t.n, 0) - COALESCE(kp.nk, 0) AS BIGINT) AS n_removed,
        |  COALESCE(kp.txt, '') AS kept_text
        |FROM documents d
        |LEFT JOIN tot t ON t.doc_id = d.doc_id
        |LEFT JOIN kept kp ON kp.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin),

    // q78: the PII scrub replay — the injection CASEs mirror the Spark
    // side's residue-class construction literally, and the four
    // count-then-redact stages splice the SAME pattern constants
    // (TextFunctions.Pii*Pattern — one definition, two engines; all
    // RE2-portable by that family's contract). regexp_replace needs the
    // 'g' flag here (DuckDB replaces first-only by default; Spark is
    // global always). Each stage counts on the PREVIOUS stage's output,
    // the exact sequential composition the query declares.
    "q78_pii_scrub" -> {
      import graft.functions.TextFunctions.{PiiEmailPattern, PiiUrlPattern,
        PiiIpv4Pattern, PiiPhonePortablePattern}
      s"""WITH aug AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 3 = 0 THEN ' mail user'
        |         || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
        |    || CASE WHEN doc_id % 4 = 0 THEN ' call 415-555-'
        |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0 THEN ' host 10.'
        |         || CAST(doc_id % 256 AS VARCHAR) || '.0.'
        |         || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0 THEN ' see https://example.com/p/'
        |         || CAST(doc_id AS VARCHAR) ELSE '' END AS a
        |  FROM documents),
        | s1 AS (SELECT doc_id,
        |   CAST(len(regexp_extract_all(a, '$PiiEmailPattern')) AS BIGINT) AS n_emails,
        |   regexp_replace(a, '$PiiEmailPattern', '<EMAIL>', 'g') AS t FROM aug),
        | s2 AS (SELECT doc_id, n_emails,
        |   CAST(len(regexp_extract_all(t, '$PiiUrlPattern')) AS BIGINT) AS n_urls,
        |   regexp_replace(t, '$PiiUrlPattern', '<URL>', 'g') AS t FROM s1),
        | s3 AS (SELECT doc_id, n_emails, n_urls,
        |   CAST(len(regexp_extract_all(t, '$PiiIpv4Pattern')) AS BIGINT) AS n_ips,
        |   regexp_replace(t, '$PiiIpv4Pattern', '<IP>', 'g') AS t FROM s2)
        |SELECT doc_id, n_emails, n_urls, n_ips,
        |  CAST(len(regexp_extract_all(t, '$PiiPhonePortablePattern')) AS BIGINT) AS n_phones,
        |  regexp_replace(t, '$PiiPhonePortablePattern', '<PHONE>', 'g') AS clean_text
        |FROM s3
        |ORDER BY doc_id""".stripMargin
    },

    // q79: the corpus-derived temperature mixture replay. The
    // apportionment is integer-exact by construction (Sampling
    // .sqrtBudgets' contract): floor(sqrt(DOUBLE)) — sqrt is IEEE
    // correctly-rounded in both engines, so the weights agree
    // bit-for-bit — then BIGINT `//` and `%` with the largest-remainder
    // topup ranked by (rem DESC, lang). The fill below the derived
    // budgets is q69's window replay verbatim; b > 0 encodes
    // sqrtBudgets' zero-budget drop.
    "q79_temperature_mixture" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0B\f\r]+')) END AS n_tokens,
        |    md5('mix:' || CAST(doc_id AS VARCHAR)) AS rk
        |  FROM documents),
        | counts AS (
        |  SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS c
        |  FROM toks GROUP BY lang),
        | w AS (
        |  SELECT lang, CAST(floor(sqrt(CAST(c AS DOUBLE))) AS BIGINT) AS wt
        |  FROM counts),
        | app AS (
        |  SELECT lang, (2000 * wt) // z AS fb, (2000 * wt) % z AS rem
        |  FROM w, (SELECT CAST(sum(wt) AS BIGINT) AS z FROM w)),
        | bud AS (
        |  SELECT lang, fb + CASE WHEN row_number()
        |      OVER (ORDER BY rem DESC, lang)
        |      <= 2000 - (SELECT sum(fb) FROM app) THEN 1 ELSE 0 END AS b
        |  FROM app),
        | ordered AS (
        |  SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang
        |      ORDER BY rk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY rk, doc_id)
        |      AS BIGINT) AS pick_pos
        |  FROM toks)
        |SELECT o.doc_id, o.lang, o.n_tokens, o.cum_before, o.pick_pos
        |FROM ordered o JOIN bud ON bud.lang = o.lang
        |WHERE bud.b > 0 AND o.cum_before < bud.b
        |ORDER BY o.doc_id""".stripMargin,

    // q80: the shuffle-shard replay — one window over the seeded md5
    // rank (both engines order the same hex strings, so the rank is
    // exact), then round-robin modulus for the shard and integer
    // division for the in-shard position. The shard count is spliced
    // from Extended.Q80Shards (one definition, two engines). The
    // Spark side's two-phase rank is plan shape, not semantics: its
    // result IS this row_number.
    "q80_shard_shuffle" ->
      s"""WITH r AS (
        |  SELECT doc_id,
        |    md5('shuf:0:' || CAST(doc_id AS VARCHAR)) AS rk
        |  FROM documents),
        | ranked AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY rk, doc_id) - 1 AS rank0
        |  FROM r)
        |SELECT doc_id,
        |  CAST(rank0 % ${Extended.Q80Shards} AS BIGINT) AS shard,
        |  CAST(rank0 // ${Extended.Q80Shards} AS BIGINT) AS pos
        |FROM ranked
        |ORDER BY doc_id""".stripMargin,

    // q81: the per-source cap replay — rank by the same seeded md5
    // within each source, keep rank <= cap (spliced from
    // Extended.Q81CapPerSource). The Spark side's WindowGroupLimit is
    // plan shape; the kept set and ranks ARE this window.
    "q81_source_cap" ->
      s"""WITH r AS (
        |  SELECT doc_id, source,
        |    md5('cap:' || CAST(doc_id AS VARCHAR)) AS rk
        |  FROM documents)
        |SELECT doc_id, source, CAST(src_rank AS BIGINT) AS src_rank
        |FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY rk, doc_id)
        |      AS src_rank
        |  FROM r)
        |WHERE src_rank <= ${Extended.Q81CapPerSource}
        |ORDER BY doc_id""".stripMargin,

    // q82: the epoch-repeat mixture replay — q68's span window, a
    // per-lang mass aggregate, budgets from the spliced VALUES list
    // (Extended.Q82Budgets — one definition, two engines), then the
    // epoch fan-out as unnest(range(0, fe + 1)) with the same
    // (epoch < fe OR prefix) cut. Pure BIGINT div/mod — exact by
    // construction.
    "q82_epoch_mixture" -> {
      val vals = Extended.Q82Budgets
        .map { case (g, b) => s"('$g', $b)" }.mkString(", ")
      s"""WITH toks AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(regexp_split_to_array(trim(text),
        |                   '[ \\t\\n\\x0B\\f\\r]+')) END
        |      AS n_tokens,
        |    md5('mix:' || CAST(doc_id AS VARCHAR)) AS rk
        |  FROM documents),
        | ordered AS (
        |  SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang
        |      ORDER BY rk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY rk, doc_id)
        |      AS BIGINT) AS pick_pos
        |  FROM toks),
        | tot AS (
        |  SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS m
        |  FROM toks GROUP BY lang),
        | bud AS (SELECT * FROM (VALUES $vals) AS v(lang, b)),
        | ep AS (
        |  SELECT o.doc_id, o.lang, o.n_tokens, o.cum_before, o.pick_pos,
        |    CAST(b.b AS BIGINT) // t.m AS fe,
        |    CAST(b.b AS BIGINT) % t.m AS rem
        |  FROM ordered o
        |  JOIN tot t ON t.lang = o.lang AND t.m > 0
        |  JOIN bud b ON b.lang = o.lang)
        |SELECT doc_id, lang, n_tokens, CAST(u.epoch AS BIGINT) AS epoch,
        |  cum_before, pick_pos
        |FROM ep, unnest(range(0, fe + 1)) AS u(epoch)
        |WHERE u.epoch < fe OR cum_before < rem
        |ORDER BY doc_id, epoch""".stripMargin
    },

    // q83: split-leakage audit — the q59 pair chain (shared CTEs, same
    // edge set by construction) joined to q50's content-hash split,
    // keeping only pairs whose ends landed in DIFFERENT splits. The
    // split CASE is q50's oracle expression verbatim.
    "q83_split_leakage" -> ("WITH " + minhashChainCtes +
      """,
        | pairs AS (SELECT i2.a, i2.b,
        |    floor(CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS jaccard
        |  FROM inter i2 JOIN cnt ca ON ca.doc_id = i2.a JOIN cnt cb ON cb.doc_id = i2.b
        |  WHERE CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE) >= 0.8),
        | sp AS (SELECT doc_id,
        |  CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 10000 < 8000 THEN 'train'
        |       WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 10000 < 9000 THEN 'val'
        |       ELSE 'test' END AS split
        |  FROM documents)
        |SELECT p.a, p.b, p.jaccard,
        |  sa.split AS split_a, sb.split AS split_b
        |FROM pairs p
        |JOIN sp sa ON sa.doc_id = p.a
        |JOIN sp sb ON sb.doc_id = p.b
        |WHERE sa.split <> sb.split
        |ORDER BY a, b""".stripMargin),

    // q84: the literal-quantizer semantic dedup replayed stage for
    // stage — the q71 convention (integer-coefficient left-associated
    // dot chains, exact in double, identical addition order) for the
    // cell assignment, the SAME sequential first-max CASE as the Spark
    // side for the argmax, q45's proven list_cosine_similarity ≡
    // float_dot pairing for the within-cell re-score, and q60's
    // recursive-CTE closure for the components. The Spark side's
    // zero-norm exclusion is vacuous on this corpus (the embeddings are
    // unit-norm by generation — measured min = max = 1.0), so the
    // oracle joins cells directly.
    "q84_semantic_dedup_cells" -> {
      val (scoreCols, caseSql) = q84CellSql
      s"""WITH RECURSIVE scored AS (
        |  SELECT vec_id, embedding,
        |    $scoreCols
        |  FROM embeddings),
        | cells AS (
        |  SELECT vec_id, embedding, $caseSql AS cell FROM scored),
        | pairs AS (
        |  SELECT x.vec_id AS a, y.vec_id AS b
        |  FROM cells x JOIN cells y
        |    ON x.cell = y.cell AND y.vec_id > x.vec_id
        |  WHERE round(list_cosine_similarity(x.embedding, y.embedding), 4) >= 0.35),
        | e AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
        | nodes AS (SELECT DISTINCT x AS node FROM e),
        | reach AS (
        |   SELECT node AS s, node AS t FROM nodes
        |   UNION
        |   SELECT r.s, e.y FROM reach r JOIN e ON e.x = r.t),
        | comp AS (SELECT s AS vid, min(t) AS kpr FROM reach GROUP BY s),
        | assigned AS (
        |  SELECT c.vec_id, c.cell, COALESCE(k.kpr, c.vec_id) AS keeper
        |  FROM cells c LEFT JOIN comp k ON k.vid = c.vec_id),
        | sizes AS (SELECT keeper AS kk, count(*) AS cluster_size
        |           FROM assigned GROUP BY keeper)
        |SELECT a.vec_id, a.cell, a.keeper, s.cluster_size,
        |       a.vec_id = a.keeper AS is_keeper
        |FROM assigned a JOIN sizes s ON s.kk = a.keeper
        |ORDER BY a.vec_id""".stripMargin
    },

    // q85: transitive split-leakage — q60's recursive closure over the
    // q59 pair chain (components + min-id keeper) joined to q50's split
    // CASE, aggregated to one row per component touching >= 2 splits.
    // Per-split sums cast back to BIGINT (DuckDB widens sum(INTEGER)
    // to HUGEINT — the q67 dtype-parity note).
    //
    // SCALE NOTE: inherits q60's recursive-closure cost — O(sum of
    // component^2) reach rows, tens-of-GB spill over the ~2.5M-pair
    // sf0.1 chain. Run this oracle at the sf0.01 contract tier only;
    // sf0.1 coverage is the Spark-side cardinality pin in
    // GoldenCountsSpec.
    "q85_transitive_leakage" -> ("WITH RECURSIVE " + minhashChainCtes +
      """,
        | pairs AS (SELECT i2.a, i2.b
        |   FROM inter i2 JOIN cnt ca ON ca.doc_id = i2.a JOIN cnt cb ON cb.doc_id = i2.b
        |   WHERE CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE) >= 0.8),
        | e AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
        | nodes AS (SELECT DISTINCT x AS node FROM e),
        | reach AS (
        |   SELECT node AS s, node AS t FROM nodes
        |   UNION
        |   SELECT r.s, e.y FROM reach r JOIN e ON e.x = r.t),
        | comp AS (SELECT s AS node_id, min(t) AS keeper FROM reach GROUP BY s),
        | sp AS (SELECT doc_id,
        |   CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 10000 < 8000 THEN 'train'
        |        WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 10000 < 9000 THEN 'val'
        |        ELSE 'test' END AS split
        |   FROM documents),
        | m AS (SELECT c.keeper, c.node_id, sp.split
        |       FROM comp c JOIN sp ON sp.doc_id = c.node_id)
        |SELECT keeper, count(*) AS component_size,
        |  count(DISTINCT split) AS n_splits,
        |  CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |  CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
        |  CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
        |FROM m GROUP BY keeper
        |HAVING count(DISTINCT split) >= 2
        |ORDER BY keeper""".stripMargin),

    // q86: incremental dedup verdicts derived from the SYMMETRIC q59
    // pair set (the Spark side's asymmetric increment×index band join
    // yields the same increment-involving pairs — banding is per-doc
    // and the emit-once check is symmetric, so only the join SHAPE
    // differs). Each increment doc (doc_id % 10 >= 7): dup_old if any
    // accepted pair reaches an index doc, else dup_new if one reaches
    // an EARLIER increment doc, else keep. The LEFT JOIN keeps
    // pairless docs; their CASE flags aggregate to 0 → keep.
    "q86_incremental_dedup" -> ("WITH " + minhashChainCtes +
      """,
        | pairs AS (SELECT i2.a, i2.b
        |   FROM inter i2 JOIN cnt ca ON ca.doc_id = i2.a JOIN cnt cb ON cb.doc_id = i2.b
        |   WHERE CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE) >= 0.8),
        | sym AS (SELECT a AS x, b AS y FROM pairs UNION ALL SELECT b AS x, a AS y FROM pairs),
        | nd AS (SELECT doc_id FROM documents WHERE doc_id % 10 >= 7),
        | fl AS (SELECT n.doc_id,
        |     max(CASE WHEN s.y % 10 < 7 THEN 1 ELSE 0 END) AS has_old,
        |     max(CASE WHEN s.y % 10 >= 7 AND s.y < n.doc_id THEN 1 ELSE 0 END) AS has_new
        |   FROM nd n LEFT JOIN sym s ON s.x = n.doc_id
        |   GROUP BY n.doc_id)
        |SELECT doc_id,
        |  CASE WHEN has_old = 1 THEN 'dup_old'
        |       WHEN has_new = 1 THEN 'dup_new'
        |       ELSE 'keep' END AS verdict
        |FROM fl ORDER BY doc_id""".stripMargin),

    // q88: incremental semantic dedup — q84's literal-centroid cell
    // CASE (identical render both engines) + q86's verdict derivation,
    // with the pair set restricted to increment-involving pairs inside
    // a cell: (y index) OR (y an EARLIER increment vector). The LEFT
    // JOIN keeps pairless increment vectors; NULL flags aggregate to
    // 0 → keep.
    "q88_incremental_semantic" -> {
      val (scoreCols, caseSql) = q84CellSql
      s"""WITH scored AS (
        |  SELECT vec_id, embedding,
        |    $scoreCols
        |  FROM embeddings),
        | cells AS (
        |  SELECT vec_id, embedding, $caseSql AS cell FROM scored),
        | pairs AS (
        |  SELECT x.vec_id AS a, (y.vec_id % 10 >= 7) AS y_new
        |  FROM cells x JOIN cells y ON x.cell = y.cell
        |  WHERE x.vec_id % 10 >= 7
        |    AND ((y.vec_id % 10 < 7) OR y.vec_id < x.vec_id)
        |    AND round(list_cosine_similarity(x.embedding, y.embedding), 4) >= 0.35),
        | nd AS (SELECT vec_id FROM embeddings WHERE vec_id % 10 >= 7),
        | fl AS (SELECT n.vec_id,
        |     max(CASE WHEN NOT p.y_new THEN 1 ELSE 0 END) AS has_old,
        |     max(CASE WHEN p.y_new THEN 1 ELSE 0 END) AS has_new
        |   FROM nd n LEFT JOIN pairs p ON p.a = n.vec_id
        |   GROUP BY n.vec_id)
        |SELECT vec_id,
        |  CASE WHEN has_old = 1 THEN 'dup_old'
        |       WHEN has_new = 1 THEN 'dup_new'
        |       ELSE 'keep' END AS verdict
        |FROM fl ORDER BY vec_id""".stripMargin
    },

    // q87: embedding-space decontamination — q45's proven
    // list_cosine_similarity ≡ float_dot parity chain (FLOAT
    // accumulation, pair-level round to 4dp BEFORE the threshold and
    // the aggregates, so both engines aggregate identical values).
    // The norm > 0 guards mirror the Spark side's zero-norm exclusion
    // (cosine undefined — a 0/0 NaN would compare TRUE under
    // NaN-greatest ordering); this testdata has no zero vectors, so
    // the guard is behavior-preserving here and load-bearing only on
    // corpora that do.
    "q87_semantic_decontam" ->
      """SELECT b.vec_id,
        |  CAST(count(*) AS BIGINT) AS n_hits,
        |  max(round(list_cosine_similarity(a.embedding, b.embedding), 4)) AS max_sim
        |FROM embeddings a JOIN embeddings b ON b.vec_id % 40 <> 0
        |WHERE a.vec_id % 40 = 0
        |  AND list_dot_product(a.embedding, a.embedding) > 0
        |  AND list_dot_product(b.embedding, b.embedding) > 0
        |  AND round(list_cosine_similarity(a.embedding, b.embedding), 4) >= 0.35
        |GROUP BY b.vec_id
        |ORDER BY b.vec_id""".stripMargin,

    // q93: the COMPOSED ingest day — advanceTrainingSet's fp-screen →
    // lexical near-dup screen → budget admission, re-derived stage by
    // stage from the proven chains: q78's portable scrub (same spliced
    // pattern constants) feeding md5 fingerprints, q47's keep-first fp
    // window over the day against the seed's fp set, q86's verdict
    // derivation over the shared q59 pair chain (restricted to
    // exact-screen survivors — the docs the Spark side actually bands),
    // and q68/q69's hash-order budget fill with the q93 salt ('0:' ||
    // doc_id — advanceTrainingSet's concat_ws(":", salt, doc_id) at
    // salt 0). The composition IS the operator's contract: any
    // reordering or plumbing defect between the stages shows up as a
    // value mismatch here.
    "q93_pipeline_day" -> {
      import graft.functions.TextFunctions.{PiiEmailPattern, PiiUrlPattern,
        PiiIpv4Pattern, PiiPhonePortablePattern}
      "WITH " + minhashChainCtes +
      s""",
        | red AS (
        |  SELECT doc_id, lang,
        |    md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
        |      '$PiiEmailPattern', '<EMAIL>', 'g'),
        |      '$PiiUrlPattern', '<URL>', 'g'),
        |      '$PiiIpv4Pattern', '<IP>', 'g'),
        |      '$PiiPhonePortablePattern', '<PHONE>', 'g')) AS clean_fp,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) END AS n_tokens
        |  FROM documents),
        | idxfp AS (SELECT DISTINCT clean_fp FROM red WHERE doc_id % 10 < 7),
        | ek AS (
        |  SELECT doc_id, lang, n_tokens FROM (
        |    SELECT d.doc_id, d.lang, d.n_tokens,
        |      row_number() OVER (PARTITION BY d.clean_fp ORDER BY d.doc_id) AS rn
        |    FROM red d LEFT JOIN idxfp i ON i.clean_fp = d.clean_fp
        |    WHERE d.doc_id % 10 >= 7 AND i.clean_fp IS NULL) sub
        |  WHERE rn = 1),
        | pairs AS (SELECT i2.a, i2.b
        |   FROM inter i2 JOIN cnt ca ON ca.doc_id = i2.a JOIN cnt cb ON cb.doc_id = i2.b
        |   WHERE CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE) >= 0.8),
        | sym AS (SELECT a AS x, b AS y FROM pairs UNION ALL SELECT b AS x, a AS y FROM pairs),
        | symk AS (SELECT s.x, s.y,
        |     CASE WHEN s.y % 10 < 7 THEN 1 ELSE 0 END AS y_old,
        |     CASE WHEN e2.doc_id IS NOT NULL THEN 1 ELSE 0 END AS y_ek
        |   FROM sym s LEFT JOIN ek e2 ON e2.doc_id = s.y),
        | fl AS (SELECT e.doc_id, e.lang, e.n_tokens,
        |     max(s.y_old) AS has_old,
        |     max(CASE WHEN s.y_ek = 1 AND s.y < e.doc_id THEN 1 ELSE 0 END) AS has_new
        |   FROM ek e LEFT JOIN symk s ON s.x = e.doc_id
        |   GROUP BY e.doc_id, e.lang, e.n_tokens),
        | keepers AS (SELECT doc_id, lang, n_tokens FROM fl
        |   WHERE COALESCE(has_old, 0) = 0 AND COALESCE(has_new, 0) = 0),
        | ordered AS (
        |  SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY lang
        |      ORDER BY md5('0:' || CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('0:' || CAST(doc_id AS VARCHAR)), doc_id)
        |      AS BIGINT) AS pick_pos
        |  FROM keepers)
        |SELECT doc_id, lang, n_tokens, cum_before, pick_pos
        |FROM ordered
        |WHERE cum_before < CASE lang WHEN 'en' THEN 3000 WHEN 'de' THEN 800
        |                             WHEN 'es' THEN 500 WHEN 'zh' THEN 1200
        |                             ELSE 0 END
        |ORDER BY doc_id""".stripMargin
    },

    // q95: the composed ingest day with substring scrub + lexical
    // decontamination ON — q93's fp-screen/lexical-screen/budget-fill
    // re-derivation extended with the q76/q77 window chain (ownership
    // over seed ∪ day-survivor windows, keep-first by (doc_id, start),
    // covered positions cut, docs scrubbed to nothing dropped, token
    // counts re-derived from the SCRUBBED word list) and q57's 8-gram
    // containment (scrubbed day text vs the raw doc_id < 20 benchmark
    // slice; any shared 8-gram drops the doc — the 1e-9 containment
    // floor). Every constant matches the Spark side: window k = 8
    // (Extended.Q76WindowK), minhash family/threshold from the shared
    // chain, budgets/salt from q93. The five-stage composition IS
    // advanceTrainingSet's contract with stage 3b + 4 on, so a defect
    // in the scrub's ownership merge, the scrubbed-token budgeting, or
    // decontam-on-scrubbed-text ordering is a value mismatch here.
    "q95_pipeline_day_full" -> (pipelineDayCtes + """,
        | keepers AS (
        |  SELECT k2.doc_id, l.lang, CAST(len(k2.ka) AS BIGINT) AS n_tokens
        |  FROM karr k2 JOIN lexk l ON l.doc_id = k2.doc_id
        |  WHERE k2.doc_id NOT IN (SELECT doc_id FROM cont))""".stripMargin +
      pipelineAdmissionTail),

    // q96: the composed ingest day with EVERY stage on that the engine
    // can express — q95's chains plus the semantic stages under the
    // LITERAL q84 quantizer (the declared-twin convention that makes
    // k-means-free cell assignment engine-renderable): semantic
    // decontamination vs the q87 benchmark slice (vec_id % 40 = 0,
    // all seed ids by residue arithmetic) through the proven
    // list_cosine_similarity ≡ float_dot 4-dp parity chain, then the
    // q88 verdict derivation restricted to the day's post-decontam
    // survivors — y_old against the corpus-verbatim SEED vector index,
    // y_new against earlier post-decontam day survivors in the same
    // cell. Only the quality gate stays no-op'd (its thresholds are
    // the query's (0, 1, 0) contract, not an expressibility gap). No
    // norm guards in the pair CTEs — the q88 oracle's convention
    // (this testdata has no zero vectors; the Spark side excludes
    // them from judgment, which only diverges on corpora that do).
    "q96_pipeline_day_max" -> {
      val (scoreCols, caseSql) = q84CellSql
      pipelineDayCtes + s""",
        | lexclean AS (
        |  SELECT k2.doc_id, l.lang, CAST(len(k2.ka) AS BIGINT) AS n_tokens
        |  FROM karr k2 JOIN lexk l ON l.doc_id = k2.doc_id
        |  WHERE k2.doc_id NOT IN (SELECT doc_id FROM cont)),
        | esc AS (SELECT vec_id, embedding,
        |    $scoreCols
        |  FROM embeddings),
        | ecell AS (SELECT vec_id, embedding, $caseSql AS cell FROM esc),
        | sdec AS (SELECT DISTINCT c.doc_id
        |  FROM lexclean c
        |  JOIN embeddings e ON e.vec_id = c.doc_id
        |  JOIN embeddings b ON b.vec_id % 40 = 0
        |  WHERE round(list_cosine_similarity(b.embedding, e.embedding), 4) >= 0.35),
        | dayvec AS (SELECT c.doc_id, c.lang, c.n_tokens, ec.cell, ec.embedding
        |  FROM lexclean c JOIN ecell ec ON ec.vec_id = c.doc_id
        |  WHERE c.doc_id NOT IN (SELECT doc_id FROM sdec)),
        | spairs AS (
        |  SELECT x.doc_id AS a, FALSE AS y_new
        |  FROM dayvec x JOIN ecell y ON y.cell = x.cell AND y.vec_id % 10 < 7
        |  WHERE round(list_cosine_similarity(x.embedding, y.embedding), 4) >= 0.35
        |  UNION ALL
        |  SELECT x.doc_id AS a, TRUE AS y_new
        |  FROM dayvec x JOIN dayvec y ON y.cell = x.cell AND y.doc_id < x.doc_id
        |  WHERE round(list_cosine_similarity(x.embedding, y.embedding), 4) >= 0.35),
        | sflag AS (SELECT a,
        |    max(CASE WHEN NOT y_new THEN 1 ELSE 0 END) AS has_old,
        |    max(CASE WHEN y_new THEN 1 ELSE 0 END) AS has_new
        |  FROM spairs GROUP BY a),
        | keepers AS (
        |  SELECT v.doc_id, v.lang, v.n_tokens
        |  FROM dayvec v
        |  WHERE v.doc_id NOT IN (
        |    SELECT a FROM sflag WHERE has_old = 1 OR has_new = 1))""".stripMargin +
      pipelineAdmissionTail
    },

    // q94: the lexical band-occupancy monitor — per colliding band
    // value, doc count and candidate-pair mass, straight off the shared
    // q59 chain's `bd` CTE (the band values are its comma-joined
    // VARCHAR aggregates, byte-identical across engines; the unused
    // downstream CTEs are defined but never referenced, so they do not
    // execute). Integer-exact throughout (`//` is BIGINT division and
    // n·(n−1) is always even).
    "q94_band_occupancy" -> ("WITH " + minhashChainCtes +
      """
        |SELECT CAST(g AS BIGINT) AS g, v, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS pair_mass
        |FROM bd GROUP BY g, v HAVING count(*) >= 2
        |ORDER BY g, v""".stripMargin),

    // q89: quantizer-cell balance — the shared q84 cell CASE, exact
    // integer counts, and the share as an IEEE double division of two
    // BIGINTs (exactly rounded, identical in both engines) through the
    // explicit dround floor formula.
    "q89_cell_balance" -> {
      val (scoreCols, caseSql) = q84CellSql
      s"""WITH scored AS (
        |  SELECT vec_id,
        |    $scoreCols
        |  FROM embeddings),
        | cells AS (
        |  SELECT vec_id, $caseSql AS cell FROM scored),
        | j AS (
        |  SELECT d.lang, c.cell
        |  FROM cells c JOIN documents d ON d.doc_id = c.vec_id)
        |SELECT lang, cell,
        |  CAST(count(*) AS BIGINT) AS n_vectors,
        |  floor((CAST(count(*) AS DOUBLE) /
        |         CAST(sum(count(*)) OVER (PARTITION BY lang) AS DOUBLE))
        |        * 1000000 + 0.5) / 1000000 AS share
        |FROM j GROUP BY lang, cell
        |ORDER BY lang, cell""".stripMargin
    }
  )

  /** q90/q91 (round 14): the index-advance REPLAYS. Their oracles are
    * q86's/q88's VERBATIM — the replay's defining property is that a
    * 3-day screen-fold loop over id-monotone days reproduces the
    * single-batch screen, so the independent engine re-derives the
    * same verdicts with no notion of days, and any fold defect
    * (provenance flag, per-day keep-first, index growth) surfaces as
    * a hash mismatch. Defined as a lookup, not a copy, so the twin
    * strings cannot drift apart. */
  val sql: Map[String, String] = base ++ Map(
    "q90_index_advance" -> base("q86_incremental_dedup"),
    "q91_semantic_advance" -> base("q88_incremental_semantic"),
    // q92: a single increment's horizon is the whole corpus, so the
    // stored-index screen equals batch q76 restricted to increment
    // docs — q76's SQL with exactly that WHERE, derived by anchored
    // rewrite so the shared chain cannot drift.
    "q92_incremental_window" -> {
      val anchor = "ORDER BY d.doc_id"
      val q76 = base("q76_window_stats")
      require(q76.contains(anchor), "q76 oracle lost its final ORDER BY anchor")
      q76.replace(anchor, "WHERE d.doc_id % 10 >= 7\n" + anchor)
    })
}
