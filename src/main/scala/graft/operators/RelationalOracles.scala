package graft.operators

/** DuckDB oracle SQL for [[Relational]] — one entry per query key, column
  * names aliased identically to the Spark side (the driver's compare sorts
  * columns by name before hashing). Money sums mirror
  * [[graft.core.Exact]]'s integer-cents arithmetic so both engines produce
  * bitwise-identical doubles.
  */
object RelationalOracles {
  private val C = "CAST(round(%s * 100) AS BIGINT)"
  private def cents(e: String) = C.format(e)

  val sql: Map[String, String] = Map(
    "proj_select" -> """
      SELECT l_orderkey, l_linenumber,
             l_extendedprice * (1.0 - l_discount) AS revenue,
             l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge
      FROM lineitem""",

    "filter_pred" -> """
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders
      WHERE (o_orderstatus = 'F' OR o_totalprice > 200000.0)
        AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1999-12-31'
        AND (o_custkey % 10) IS NOT DISTINCT FROM 3
        AND o_orderpriority LIKE '%-%'
        AND regexp_matches(o_orderstatus, '^[FOP]$')""",

    "join_inner_bcast" -> s"""
      SELECT r_name, n_name, count(*) AS n_orders,
             sum(${cents("o_totalprice")}) / 100.0 AS total_rev
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name""",

    "join_left" -> s"""
      SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
             coalesce(sum(${cents("o_totalprice")}) / 100.0, 0.0) AS spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name""",

    "join_right" -> s"""
      SELECT p_partkey, p_name, count(l_orderkey) AS n_lines,
             coalesce(sum(${cents("l_quantity")}) / 100.0, 0.0) AS qty_sold
      FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
      GROUP BY p_partkey, p_name""",

    "join_full" -> """
      SELECT coalesce(ck, sk) AS nationkey,
             coalesce(n_cust, 0) AS n_cust,
             coalesce(n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey AS ck, count(*) AS n_cust FROM customer GROUP BY 1) c
      FULL OUTER JOIN (SELECT s_nationkey AS sk, count(*) AS n_supp FROM supplier GROUP BY 1) s
      ON ck = sk""",

    "join_semi" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""",

    "join_anti" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",

    "join_cross" -> """
      SELECT r_name, o_orderstatus
      FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s""",

    "join_range" -> s"""
      SELECT band_id, count(*) AS n_parts,
             sum(${cents("p_retailprice")}) / 100.0 AS band_value
      FROM part
      JOIN (SELECT r_regionkey AS band_id, r_regionkey * 500.0 AS lo,
                   (r_regionkey + 1) * 500.0 AS hi FROM region) b
        ON p_retailprice >= lo AND p_retailprice < hi
      GROUP BY band_id""",

    "join_asof" -> """
      WITH clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS event_id
        FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      signups AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS event_id
        FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
      SELECT c.user_id AS user_id, c.event_id AS click_id, s.event_id AS signup_id
      FROM clicks c ASOF JOIN signups s
        ON c.user_id = s.user_id AND c.ts >= s.ts""",

    // forward direction via DuckDB's native ASOF JOIN with c.ts <=
    // p.ts — nearest purchase at or after the click, the next-touch
    // definition the reversed engine window must reproduce
    "join_asof_forward" -> """
      WITH clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS event_id
        FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      purchases AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS event_id
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT c.user_id AS user_id, c.event_id AS click_id,
             p.event_id AS purchase_id
      FROM clicks c ASOF JOIN purchases p
        ON c.user_id = p.user_id AND c.ts <= p.ts""",

    // the SPEC via DuckDB's native ASOF LEFT JOIN: latest signup at
    // ts <= click ts, nulled when older than the 7-day tolerance (any
    // other candidate is older still, so null-latest IS the semantics)
    "join_asof_tolerance" -> """
      WITH clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS event_id
        FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      signups AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS event_id
        FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
      SELECT c.user_id AS user_id, c.event_id AS click_id,
             CASE WHEN s.ts >= c.ts - INTERVAL 7 DAY THEN s.event_id END
               AS signup_id,
             CAST(s.ts IS NOT NULL AND s.ts >= c.ts - INTERVAL 7 DAY AS BIGINT)
               AS within_tol
      FROM clicks c ASOF LEFT JOIN signups s
        ON c.user_id = s.user_id AND c.ts >= s.ts""",

    // basket = (user, day); HUGEINT product // mirrors the engine's
    // DECIMAL(38,0) div (both exact truncating on non-negatives — the
    // skew_report ppm precedent)
    // INDEPENDENT formulation: three per-window range joins with
    // count(DISTINCT) — the engine's single min-offset tier aggregate
    // must reproduce all three window widths exactly
    "events_active_users" -> """
      WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      days AS (SELECT DISTINCT day FROM ud),
      dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
      wau AS (SELECT d.day, count(DISTINCT u.user_id) AS wau
              FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
              GROUP BY 1),
      mau AS (SELECT d.day, count(DISTINCT u.user_id) AS mau
              FROM days d JOIN ud u ON u.day BETWEEN d.day - 27 AND d.day
              GROUP BY 1)
      SELECT d.day, dau.dau, wau.wau, mau.mau,
             CAST(dau.dau * 1000000 // mau.mau AS BIGINT) AS stickiness_ppm
      FROM days d JOIN dau USING (day) JOIN wau USING (day)
      JOIN mau USING (day)""",

    "events_lift" -> """
      WITH ut AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
        FROM events),
      tot AS (SELECT count(*) AS n_ud
              FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) FROM events)),
      per AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
      pair AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_both
        FROM ut a JOIN ut b USING (user_id, day)
        WHERE a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT p.type_a, p.type_b, pa.n AS n_a, pb.n AS n_b, p.n_both,
             t.n_ud,
             CAST((p.n_both * CAST(t.n_ud AS HUGEINT) * 1000000)
                  // (pa.n * pb.n) AS BIGINT) AS lift_ppm
      FROM pair p
      JOIN per pa ON pa.event_type = p.type_a
      JOIN per pb ON pb.event_type = p.type_b
      CROSS JOIN tot t""",

    // INDEPENDENT formulation of Kaplan-Meier: each n_risk is a
    // correlated >=-count over the subject frame (the engine computes
    // it as N - prefix from a histogram fold); the survival product is
    // the same truncating-div ppm recurrence, unrolled by a recursive
    // CTE over the ordered event times
    "events_survival" -> """
      WITH RECURSIVE per AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS t0,
               CAST(min(CASE WHEN event_type = 'purchase' AND value >= 100
                             THEN ts END) AS DATE) AS fp
        FROM events GROUP BY 1),
      mx AS (SELECT CAST(max(ts) AS DATE) AS maxd FROM events),
      subj AS (
        SELECT CASE WHEN fp IS NULL
                    THEN datediff('day', t0, (SELECT maxd FROM mx))
                    ELSE datediff('day', t0, fp) END AS dur,
               CAST(fp IS NOT NULL AS BIGINT) AS converted
        FROM per),
      steps AS (
        SELECT dur, count(*) AS n_converted,
               row_number() OVER (ORDER BY dur) AS rn
        FROM subj WHERE converted = 1 GROUP BY dur),
      risk AS (
        SELECT s.rn, s.dur, s.n_converted,
               (SELECT count(*) FROM subj WHERE subj.dur >= s.dur) AS n_risk
        FROM steps s),
      km AS (
        SELECT rn, dur, n_converted, n_risk,
               CAST(1000000 AS BIGINT) * (n_risk - n_converted) // n_risk
                 AS surv_ppm
        FROM risk WHERE rn = 1
        UNION ALL
        SELECT r.rn, r.dur, r.n_converted, r.n_risk,
               (k.surv_ppm * (r.n_risk - r.n_converted)) // r.n_risk
        FROM km k JOIN risk r ON r.rn = k.rn + 1)
      SELECT dur AS duration_days, n_risk, n_converted, surv_ppm FROM km""",

    // window-SQL formulation of the same decomposition (the engine
    // computes the centered MA with a slice-fold, no window): QUALIFY
    // trims the edge days where the full 7-day window is undefined
    "ts_stl_lite" -> """
      WITH grid AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      o AS (SELECT day, cents, row_number() OVER (ORDER BY day) AS rn,
                   count(*) OVER () AS n FROM grid),
      tr AS (
        SELECT day, cents,
               CAST((sum(cents) OVER (ORDER BY rn
                  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) // 7 AS BIGINT)
                 AS trend_cents
        FROM o QUALIFY rn BETWEEN 4 AND n - 3),
      se AS (
        SELECT isodow(day) AS iso_dow,
               CAST(sum(cents - trend_cents) // count(*) AS BIGINT)
                 AS seasonal_cents
        FROM tr GROUP BY 1)
      SELECT t.day, t.cents AS obs_cents, t.trend_cents, s.seasonal_cents,
             t.cents - t.trend_cents - s.seasonal_cents AS resid_cents
      FROM tr t JOIN se s ON s.iso_dow = isodow(t.day)""",

    // independent formulation of the Holt recurrence: recursive CTE
    // over the ordered day grid (the engine folds an aggregate HOF);
    // integer `//` truncates exactly like Spark's `div`, incl. the
    // negative-trend rows
    "ts_holt" -> """
      WITH RECURSIVE grid AS (
        SELECT row_number() OVER (ORDER BY day) AS rn, day, cents FROM (
          SELECT CAST(ts AS DATE) AS day,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM events WHERE event_type = 'purchase' GROUP BY 1)),
      holt AS (
        SELECT rn, day, cents, cents AS level, CAST(0 AS BIGINT) AS trend,
               cents AS fitted
        FROM grid WHERE rn = 1
        UNION ALL
        SELECT g.rn, g.day, g.cents,
               (g.cents + 4 * (h.level + h.trend)) // 5 AS level,
               (((g.cents + 4 * (h.level + h.trend)) // 5 - h.level)
                + 9 * h.trend) // 10 AS trend,
               h.level + h.trend AS fitted
        FROM holt h JOIN grid g ON g.rn = h.rn + 1)
      SELECT day, cents AS obs_cents, level, trend, fitted FROM holt""",

    "window_dist" -> """
      SELECT c_nationkey, c_custkey, c_acctbal,
             ntile(4) OVER w AS quartile,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cume
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)""",

    "agg_percentile" -> """
      SELECT o_orderstatus,
             round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
             round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
             count(*) AS n
      FROM orders GROUP BY o_orderstatus""",

    "sort_global" -> """
      SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
      ORDER BY c_mktsegment ASC, c_acctbal DESC, c_custkey ASC""",

    "events_funnel" -> """
      WITH s1 AS (
        SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id),
      s2 AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t1
        GROUP BY e.user_id),
      s3 AS (
        SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t2
        GROUP BY e.user_id)
      SELECT s1.user_id,
             1 + (s2.user_id IS NOT NULL)::BIGINT + (s3.user_id IS NOT NULL)::BIGINT
               AS steps_completed
      FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
              LEFT JOIN s3 ON s1.user_id = s3.user_id""",

    "agg_sketch_rollup" -> """
      WITH e AS (
        SELECT CAST(ts AS DATE) AS day, user_id FROM events),
      w AS (
        SELECT datediff('day', DATE '2024-01-01', day) // 7 AS week,
               day, user_id
        FROM e)
      SELECT CAST(week AS BIGINT) AS week,
             count(DISTINCT day) AS n_days,
             count(DISTINCT user_id) AS exact_users,
             CAST(1 AS BIGINT) AS hll_ok
      FROM w GROUP BY week""",

    "agg_approx_topk" -> """
      WITH t AS (
        SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
      f AS (SELECT tok FROM t WHERE tok <> ''),
      e AS (SELECT tok, count(*) AS exact_n FROM f GROUP BY tok),
      r AS (SELECT tok, exact_n,
                   row_number() OVER (ORDER BY exact_n DESC, tok ASC) AS rk
            FROM e)
      SELECT tok, rk, exact_n,
             CAST(1 AS BIGINT) AS in_sketch, CAST(1 AS BIGINT) AS count_ok
      FROM r WHERE rk <= 10""",

    "ts_cross_correlation" -> """
      WITH x AS (
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
               count(*) AS xv
        FROM events WHERE event_type = 'view' GROUP BY 1),
      y AS (
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
               count(*) AS yv
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      lags AS (SELECT unnest(range(-3, 4)) AS lag_d),
      paired AS (
        SELECT l.lag_d, x.xv, y.yv
        FROM lags l
        JOIN x ON true
        JOIN y ON y.day = x.day + l.lag_d * INTERVAL 1 DAY),
      m AS (
        SELECT CAST(lag_d AS BIGINT) AS lag_d, count(*) AS n,
               CAST(sum(xv) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
               CAST(sum(xv*yv) AS BIGINT) AS sxy,
               CAST(sum(xv*xv) AS BIGINT) AS sx2, CAST(sum(yv*yv) AS BIGINT) AS sy2
        FROM paired GROUP BY 1)
      SELECT lag_d, n, sx, sy, sxy,
             CASE WHEN n*sx2 - sx*sx = 0 OR n*sy2 - sy*sy = 0 THEN NULL
                  ELSE CAST(n*sxy - sx*sy AS DOUBLE) /
                       (sqrt(CAST(n*sx2 - sx*sx AS DOUBLE)) *
                        sqrt(CAST(n*sy2 - sy*sy AS DOUBLE))) END AS corr
      FROM m""",

    // the matrix stated pair-by-pair (6 UNION ALL rescans) — a different
    // decomposition than the engine's single 15-moment aggregate, so the
    // one-scan rewrite is checked against the per-pair definition
    "agg_corr_matrix" -> """
      WITH b AS (
        SELECT l_returnflag AS flag,
               CAST(round(l_quantity * 100) AS BIGINT)      AS q,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
               CAST(round(l_discount * 100) AS BIGINT)      AS d,
               CAST(round(l_tax * 100) AS BIGINT)           AS t
        FROM lineitem),
      u AS (
        SELECT flag, 'quantity' AS cx, 'price' AS cy, q AS x, p AS y FROM b
        UNION ALL SELECT flag, 'quantity', 'discount', q, d FROM b
        UNION ALL SELECT flag, 'quantity', 'tax', q, t FROM b
        UNION ALL SELECT flag, 'price', 'discount', p, d FROM b
        UNION ALL SELECT flag, 'price', 'tax', p, t FROM b
        UNION ALL SELECT flag, 'discount', 'tax', d, t FROM b),
      m AS (
        SELECT flag, cx, cy, count(*) AS n,
               sum(CAST(x AS DECIMAL(38,0))) AS sx,
               sum(CAST(y AS DECIMAL(38,0))) AS sy,
               sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
               sum(CAST(x AS DECIMAL(38,0)) * x) AS sx2,
               sum(CAST(y AS DECIMAL(38,0)) * y) AS sy2
        FROM u GROUP BY 1, 2, 3)
      SELECT flag, cx, cy, CAST(n AS BIGINT) AS n,
             CASE WHEN n*sx2 - sx*sx = 0 OR n*sy2 - sy*sy = 0 THEN NULL
                  ELSE CAST(n*sxy - sx*sy AS DOUBLE) /
                       (sqrt(CAST(n*sx2 - sx*sx AS DOUBLE)) *
                        sqrt(CAST(n*sy2 - sy*sy AS DOUBLE))) END AS corr
      FROM m""",

    "ts_forecast_baselines" -> """
      WITH d AS (
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      l AS (
        SELECT cents,
               lag(cents, 1) OVER (ORDER BY day) AS f1,
               lag(cents, 7) OVER (ORDER BY day) AS f7
        FROM d),
      m1 AS (
        SELECT 'naive' AS method, count(*) AS n,
               CAST(sum(abs(f1 - cents)) // count(*) AS BIGINT) AS mae_cents,
               CAST(sum((2 * abs(f1 - cents) * 1000000) // (f1 + cents))
                    // count(*) AS BIGINT) AS smape_ppm
        FROM l WHERE f1 IS NOT NULL),
      m7 AS (
        SELECT 'snaive7' AS method, count(*) AS n,
               CAST(sum(abs(f7 - cents)) // count(*) AS BIGINT) AS mae_cents,
               CAST(sum((2 * abs(f7 - cents) * 1000000) // (f7 + cents))
                    // count(*) AS BIGINT) AS smape_ppm
        FROM l WHERE f7 IS NOT NULL)
      SELECT * FROM m1 UNION ALL SELECT * FROM m7""",

    "agg_gini" -> """
      WITH bt AS (
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
               event_type, count(*) AS n_i
        FROM events GROUP BY 1, 2),
      p AS (
        SELECT day, CAST(sum(n_i) AS BIGINT) AS n,
               CAST(sum(CAST(n_i AS HUGEINT) * n_i) AS HUGEINT) AS sum_sq,
               CAST(max(n_i) AS BIGINT) AS max_i, count(*) AS n_types
        FROM bt GROUP BY 1)
      SELECT day, n, n_types,
             CAST(((CAST(n AS HUGEINT) * n - sum_sq) * 1000000)
                  // (CAST(n AS HUGEINT) * n) AS BIGINT) AS gini_ppm,
             CAST((CAST(max_i AS HUGEINT) * 1000000) // n AS BIGINT)
               AS dominant_share_ppm
      FROM p""",

    // four conditional-aggregate cells + floor-div ppm means; DiD stated
    // on the quantized means, exactly the engine's rule
    "events_srm" -> """
      WITH u AS (SELECT DISTINCT user_id % 2 AS arm, user_id FROM events),
      m AS (
        SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        FROM u)
      SELECT n0, n1,
             CAST(CASE WHEN n0 + n1 = 0 THEN NULL
                  ELSE (CAST(n0 - n1 AS HUGEINT) * (n0 - n1) * 1000000) // (n0 + n1)
                  END AS BIGINT) AS chi2_micro,
             CAST(CASE WHEN n0 + n1 = 0 THEN NULL
                  ELSE CAST(n0 - n1 AS HUGEINT) * (n0 - n1) * 1000000
                       < CAST(3841459 AS HUGEINT) * (n0 + n1) END AS BIGINT) AS srm_ok
      FROM m""",

    // double expressions mirror the engine's shared trees VERBATIM
    // (moments HUGEINT ≡ DECIMAL(38,0); CAST-to-DOUBLE then one
    // identical arithmetic tree, floor-scaled — the events_ab pattern)
    "events_cuped" -> """
      WITH u AS (
        SELECT CAST(user_id % 2 AS BIGINT) AS arm,
               CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15 00:00:00'
                             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15 00:00:00'
                             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id),
      m AS (
        SELECT count(*) AS n,
               CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sx2,
               CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS sy2,
               CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS HUGEINT) AS sx0,
               CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS HUGEINT) AS sx1,
               CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS HUGEINT) AS sy0,
               CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS HUGEINT) AS sy1
        FROM u)
      SELECT n0, n1,
             CAST(CASE WHEN n0 = 0 OR n1 = 0 THEN NULL
                  ELSE floor((CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)) * 1e6) END AS BIGINT) AS lift_micro,
             CAST(CASE WHEN (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0 THEN NULL
                  ELSE floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                             / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 1e6)
                  END AS BIGINT) AS theta_micro,
             CAST(CASE WHEN n0 = 0 OR n1 = 0 OR (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0 THEN NULL
                  ELSE floor(((CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                             - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                               / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                               * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE))) * 1e6)
                  END AS BIGINT) AS adj_lift_micro,
             CAST(CASE WHEN (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0
                         OR (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) = 0 THEN NULL
                  ELSE floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                             * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                             / ((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) * 1e6)
                  END AS BIGINT) AS var_reduction_ppm
      FROM m""",

    "events_did" -> """
      WITH p AS (
        SELECT CAST(user_id % 2 AS BIGINT) AS t,
               CAST(CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15 00:00:00' AS BIGINT) AS po,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
      m AS (
        SELECT sum(CASE WHEN t=0 AND po=0 THEN 1 ELSE 0 END) AS n00,
               sum(CASE WHEN t=0 AND po=1 THEN 1 ELSE 0 END) AS n01,
               sum(CASE WHEN t=1 AND po=0 THEN 1 ELSE 0 END) AS n10,
               sum(CASE WHEN t=1 AND po=1 THEN 1 ELSE 0 END) AS n11,
               CAST(sum(CASE WHEN t=0 AND po=0 THEN cents ELSE 0 END) AS HUGEINT) AS s00,
               CAST(sum(CASE WHEN t=0 AND po=1 THEN cents ELSE 0 END) AS HUGEINT) AS s01,
               CAST(sum(CASE WHEN t=1 AND po=0 THEN cents ELSE 0 END) AS HUGEINT) AS s10,
               CAST(sum(CASE WHEN t=1 AND po=1 THEN cents ELSE 0 END) AS HUGEINT) AS s11
        FROM p),
      mm AS (
        SELECT CAST(n00 AS BIGINT) AS n00, CAST(n01 AS BIGINT) AS n01,
               CAST(n10 AS BIGINT) AS n10, CAST(n11 AS BIGINT) AS n11,
               CAST(CASE WHEN n00=0 THEN NULL ELSE (s00*1000000)//n00 END AS BIGINT) AS m00_ppm,
               CAST(CASE WHEN n01=0 THEN NULL ELSE (s01*1000000)//n01 END AS BIGINT) AS m01_ppm,
               CAST(CASE WHEN n10=0 THEN NULL ELSE (s10*1000000)//n10 END AS BIGINT) AS m10_ppm,
               CAST(CASE WHEN n11=0 THEN NULL ELSE (s11*1000000)//n11 END AS BIGINT) AS m11_ppm
        FROM m)
      SELECT *, (m11_ppm - m10_ppm) - (m01_ppm - m00_ppm) AS did_ppm FROM mm""",

    // same md5 bucket convention as the engine (one hash scheme repo-wide);
    // ppm quantization applied BEFORE the variance on both sides
    "events_jackknife" -> s"""
      WITH p AS (
        SELECT (${Maintenance.md5Hex32Sql("CAST(user_id AS VARCHAR)")} % 20) AS bkt,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
      b AS (SELECT bkt, count(*) AS n_b, CAST(sum(cents) AS HUGEINT) AS s_b
            FROM p GROUP BY 1),
      g AS (SELECT CAST(sum(n_b) AS HUGEINT) AS n_tot,
                   CAST(sum(s_b) AS HUGEINT) AS s_tot, count(*) AS k FROM b),
      loo AS (
        SELECT CAST(b.bkt AS BIGINT) AS bkt, b.n_b, CAST(b.s_b AS BIGINT) AS s_b,
               CAST(((g.s_tot - b.s_b) * 1000000) // (g.n_tot - b.n_b) AS BIGINT)
                 AS loo_mean_ppm
        FROM b, g),
      st AS (SELECT CAST(sum(loo_mean_ppm) // count(*) AS BIGINT) AS mbar_ppm,
                    count(*) AS k2 FROM loo),
      v AS (SELECT CAST(sum(CAST(loo.loo_mean_ppm - st.mbar_ppm AS HUGEINT)
                            * (loo.loo_mean_ppm - st.mbar_ppm))
                        * (max(st.k2) - 1) // max(st.k2) AS BIGINT) AS jk_var_ppm2
            FROM loo, st)
      SELECT loo.bkt, loo.n_b, loo.s_b, loo.loo_mean_ppm, v.jk_var_ppm2
      FROM loo, v""",

    // java.util.regex (engine) vs RE2 (here): patterns stay inside the
    // shared dialect subset — see fnRegex's contract note
    "fn_regex" -> """
      SELECT doc_id,
             regexp_extract(text, '([A-Z][a-z]+)', 1) AS first_cap,
             CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS n_vowel_runs,
             regexp_replace(substr(text, 1, 48), '[aeiou]', '_', 'g') AS devoweled,
             -- DuckDB array_to_string([]) is NULL; Spark array_join([]) is ''
             coalesce(array_to_string(regexp_extract_all(text, '([a-z]+ing)\b', 1), ','), '') AS ing_words,
             CAST(regexp_matches(text, '[A-Za-z]+ed\b') AS BIGINT) AS has_past
      FROM documents""",

    // the tsCrossCorrelation oracle shape, self-joined on the revenue
    // grid; decimal moments because daily-revenue squares outgrow BIGINT
    "ts_acf" -> """
      WITH x AS (
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      lags AS (SELECT unnest(range(1, 11)) AS lag_d),
      paired AS (
        SELECT l.lag_d, x.cents AS xv, y.cents AS yv
        FROM lags l
        JOIN x ON true
        JOIN x y ON y.day = x.day + l.lag_d * INTERVAL 1 DAY),
      m AS (
        SELECT CAST(lag_d AS BIGINT) AS lag_d, count(*) AS n,
               sum(CAST(xv AS DECIMAL(38,0))) AS sx,
               sum(CAST(yv AS DECIMAL(38,0))) AS sy,
               sum(CAST(xv AS DECIMAL(38,0)) * yv) AS sxy,
               sum(CAST(xv AS DECIMAL(38,0)) * xv) AS sx2,
               sum(CAST(yv AS DECIMAL(38,0)) * yv) AS sy2
        FROM paired GROUP BY 1)
      SELECT lag_d, n,
             CASE WHEN n*sx2 - sx*sx = 0 OR n*sy2 - sy*sy = 0 THEN NULL
                  ELSE CAST(n*sxy - sx*sy AS DOUBLE) /
                       (sqrt(CAST(n*sx2 - sx*sx AS DOUBLE)) *
                        sqrt(CAST(n*sy2 - sy*sy AS DOUBLE))) END AS acf
      FROM m""",

    // lower-median rank rule stated through row_number — an independent
    // formulation of the engine's sorted-array element_at pick
    "ts_anomaly_mad" -> """
      WITH d AS (
        SELECT event_type,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2),
      r AS (
        SELECT event_type, day, cents,
               row_number() OVER (PARTITION BY event_type ORDER BY cents, day) AS rn,
               count(*)    OVER (PARTITION BY event_type) AS n
        FROM d),
      med AS (
        SELECT event_type, cents AS med FROM r WHERE rn = (n + 1) // 2),
      dev AS (
        SELECT d.event_type, d.day, d.cents, m.med, abs(d.cents - m.med) AS adev
        FROM d JOIN med m USING (event_type)),
      r2 AS (
        SELECT event_type, adev,
               row_number() OVER (PARTITION BY event_type ORDER BY adev) AS rn,
               count(*)    OVER (PARTITION BY event_type) AS n
        FROM dev),
      mad AS (
        SELECT event_type, adev AS mad FROM r2 WHERE rn = (n + 1) // 2)
      SELECT v.event_type, v.day, v.cents, v.med, CAST(m.mad AS BIGINT) AS mad,
             CAST(CASE WHEN m.mad = 0 THEN (v.adev > 0)
                       ELSE (6745 * v.adev > 15000 * m.mad) END AS BIGINT) AS is_anomaly
      FROM dev v JOIN mad m USING (event_type)""",

    // the bloom reduction is semantically invisible: the oracle is the
    // PLAIN dim-filtered join — any bloom false negative would drop rows
    // and hash-mismatch here
    "join_bloom" -> """
      SELECT s.s_suppkey, s.s_name, count(*) AS n_items,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM supplier s JOIN lineitem l ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey IN (3, 9)
      GROUP BY 1, 2""",

    "ts_changepoint" -> """
      WITH d AS (
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      g AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS total FROM d),
      c AS (
        SELECT day, cents,
               CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
               CAST(sum(cents) OVER (ORDER BY day) AS BIGINT) AS prefix
        FROM d)
      SELECT c.day, c.t, c.cents,
             CAST(g.n * c.prefix - c.t * g.total AS BIGINT) AS cusum_scaled,
             CAST((abs(g.n * c.prefix - c.t * g.total) =
                   (SELECT max(abs(g2.n * c2.prefix - c2.t * g2.total))
                    FROM c c2 CROSS JOIN g g2)) AS BIGINT) AS is_changepoint
      FROM c CROSS JOIN g""",

    "ts_seasonal_dow" -> """
      WITH e AS (
        SELECT isodow(CAST(ts AS TIMESTAMP)) AS iso_dow, CAST(ts AS DATE) AS day,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      p AS (
        SELECT iso_dow, count(DISTINCT day) AS n_days, count(*) AS n_events,
               CAST(sum(cents) AS BIGINT) AS total_cents
        FROM e GROUP BY iso_dow)
      SELECT CAST(iso_dow AS BIGINT) AS iso_dow, n_days, n_events, total_cents,
             total_cents // n_days AS cents_per_day,
             CAST(total_cents // n_days =
                  max(total_cents // n_days) OVER () AS BIGINT) AS is_peak
      FROM p""",

    "join_scd2" -> """
      WITH dim AS (
        SELECT c_custkey AS user_id, c_mktsegment AS segment,
               TIMESTAMP '1970-01-01' AS valid_from,
               TIMESTAMP '2024-01-15' AS valid_to
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, 'UPGRADED-' || c_mktsegment,
               TIMESTAMP '2024-01-15', TIMESTAMP '2099-01-01'
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, c_mktsegment,
               TIMESTAMP '1970-01-01', TIMESTAMP '2099-01-01'
        FROM customer WHERE c_custkey % 3 <> 0)
      SELECT dim.segment, count(*) AS n_events
      FROM events e
      JOIN dim ON e.user_id = dim.user_id
           AND CAST(e.ts AS TIMESTAMP) >= dim.valid_from
           AND CAST(e.ts AS TIMESTAMP) < dim.valid_to
      GROUP BY dim.segment""",

    "window_running_distinct" -> """
      WITH e AS (
        SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        FROM events),
      f AS (
        SELECT user_id, event_id, ts,
               CASE WHEN row_number() OVER (
                      PARTITION BY user_id, event_type
                      ORDER BY ts ASC, event_id ASC) = 1
                    THEN 1 ELSE 0 END AS is_new
        FROM e)
      SELECT user_id, event_id, CAST(is_new AS BIGINT) AS is_new,
             CAST(sum(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC)
                  AS BIGINT) AS n_types_seen
      FROM f""",

    "events_time_to_convert" -> """
      WITH e AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      u AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t1
        FROM e GROUP BY user_id),
      c AS (
        SELECT u.user_id, u.t1, min(e2.ts) AS t2
        FROM u JOIN e e2 ON e2.user_id = u.user_id
             AND e2.event_type = 'purchase' AND e2.ts > u.t1
        GROUP BY u.user_id, u.t1),
      lat AS (
        SELECT user_id, epoch_us(t2) - epoch_us(t1) AS lat_us FROM c),
      anch AS (
        SELECT count(*) AS n_anchored FROM u WHERE t1 IS NOT NULL),
      r AS (
        SELECT lat_us,
               row_number() OVER (ORDER BY lat_us ASC, user_id ASC) AS rk
        FROM lat),
      s AS (
        SELECT count(*) AS n_converted, min(lat_us) AS min_us,
               max(lat_us) AS max_us
        FROM lat)
      SELECT anch.n_anchored, s.n_converted, s.min_us, s.max_us,
             (SELECT lat_us FROM r, s
              WHERE rk = ((n_converted - 1) * 50) // 100 + 1) AS p50_us,
             (SELECT lat_us FROM r, s
              WHERE rk = ((n_converted - 1) * 90) // 100 + 1) AS p90_us
      FROM anch, s""",

    "events_streaks" -> """
      WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      isl AS (
        SELECT user_id,
               day - CAST(row_number() OVER (PARTITION BY user_id
                                             ORDER BY day ASC) AS INTEGER)
                 AS island
        FROM days),
      runs AS (
        SELECT user_id, island, count(*) AS len
        FROM isl GROUP BY user_id, island)
      SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
             count(*) AS n_streaks, max(len) AS longest_streak
      FROM runs GROUP BY user_id""",

    "events_sessionize" -> """
      WITH e AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      f AS (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_us(ts) - epoch_us(coalesce(lag(ts) OVER w, ts))
                         > 43200000000 THEN 1 ELSE 0 END AS new_sess
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      g AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC) AS session_idx
        FROM f)
      SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
             count(*) AS n_events,
             min(ts) AS sess_start, max(ts) AS sess_end,
             epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
      FROM g GROUP BY user_id, session_idx""",

    "agg_pivot" -> """
      SELECT o_orderpriority,
             count(*) FILTER (o_orderstatus = 'F') AS n_f,
             count(*) FILTER (o_orderstatus = 'O') AS n_o,
             count(*) FILTER (o_orderstatus = 'P') AS n_p
      FROM orders GROUP BY o_orderpriority""",

    "agg_unpivot" -> """
      WITH p AS (
        SELECT o_orderpriority,
               count(*) FILTER (o_orderstatus = 'F') AS n_f,
               count(*) FILTER (o_orderstatus = 'O') AS n_o,
               count(*) FILTER (o_orderstatus = 'P') AS n_p
        FROM orders GROUP BY o_orderpriority)
      SELECT o_orderpriority, 'n_f' AS status, n_f AS n FROM p
      UNION ALL SELECT o_orderpriority, 'n_o', n_o FROM p
      UNION ALL SELECT o_orderpriority, 'n_p', n_p FROM p""",

    "agg_histogram" -> """
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 5000000 AS bucket,
             count(*) AS n,
             min(CAST(round(o_totalprice * 100) AS BIGINT)) AS min_cents,
             max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents
      FROM orders GROUP BY 1""",

    "fn_bitwise" -> """
      SELECT o_orderkey,
             o_orderkey & 255 AS k_and,
             o_orderkey | 4096 AS k_or,
             xor(o_orderkey, o_custkey) AS k_xor,
             o_orderkey << 3 AS k_shl,
             o_orderkey >> 2 AS k_shr,
             CAST(bit_count(o_orderkey) AS BIGINT) AS k_pop
      FROM orders""",

    "fn_try" -> """
      SELECT o_orderkey,
             TRY_CAST(o_orderpriority AS INT) AS prio_bad,
             TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) AS prio_num,
             CAST(round(o_totalprice * 100) AS BIGINT)
               / NULLIF(o_custkey % 3, 0) AS cents_per,
             TRY_CAST(o_orderstatus AS DATE) AS date_bad
      FROM orders""",

    "ts_gapfill" -> """
      WITH daily AS (
        SELECT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
               count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2),
      span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
      cal AS (
        SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        FROM span)
      SELECT c.user_id, c.day,
             CAST(coalesce(n, 0) AS BIGINT) AS n_events,
             CAST(coalesce(cents, 0) AS BIGINT) AS day_cents,
             CAST(last_value(cents IGNORE NULLS) OVER (
               PARTITION BY c.user_id ORDER BY c.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS locf_cents
      FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day""",

    "sql_scalar_subquery" -> """
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders o
      WHERE o_totalprice > (SELECT sum(CAST(round(i.o_totalprice * 100) AS BIGINT))
                                   / 100.0 / count(*)
                            FROM orders i
                            WHERE i.o_orderstatus = o.o_orderstatus)""",

    "fn_na" -> """
      SELECT c_custkey, coalesce(n_orders, 0) AS n_orders, c_acctbal,
             coalesce(n_orders, 0) > 0 AS has_orders
      FROM customer
      LEFT JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
        ON c_custkey = o_custkey
      WHERE c_acctbal IS NOT NULL""",

    "fn_date2" -> """
      SELECT o_orderkey,
             quarter(o_orderdate) AS qtr,
             dayofweek(o_orderdate) + 1 AS dow,
             weekofyear(o_orderdate) AS iso_week,
             last_day(CAST(o_orderdate AS DATE)) AS month_end,
             CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2mo,
             strftime(o_orderdate, '%Y-%m') AS ym
      FROM orders""",

    "fn_string2" -> """
      SELECT p_partkey,
             regexp_replace(p_name, 'a', '@', 'g') AS subst,
             lpad(p_brand, 12, '*') AS pad_l,
             rpad(p_type, 30, '.') AS pad_r,
             translate(p_type, 'aeiou', 'AEIOU') AS xlat,
             levenshtein(p_brand, 'Brand#13') AS edit_dist,
             reverse(p_name) AS rev,
             repeat(p_brand, 2) AS twice,
             substr(p_name, 1, 4) AS left4
      FROM part""",

    "join_skew_salted" -> s"""
      SELECT s_nationkey, count(*) AS n_items,
             sum(${cents("l_extendedprice")}) / 100.0 AS volume
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_nationkey""",

    "q1_agg" -> s"""
      SELECT l_returnflag, l_linestatus,
             sum(l_quantity) AS sum_qty,
             sum(${cents("l_extendedprice")}) / 100.0 AS sum_base_price,
             sum(${cents("l_extendedprice")} * (100 - ${cents("l_discount")})) / 10000.0 AS sum_disc_price,
             sum(${cents("l_extendedprice")}) / 100.0 / count(*) AS avg_price,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus""",

    // the sketch's error bound is driver-checked: approx_ok must be 1 for
    // every group (the sketch value itself is engine-specific and omitted)
    "agg_approx" -> """
      SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
             CAST(1 AS BIGINT) AS approx_ok
      FROM lineitem GROUP BY l_returnflag""",

    // sketch/approx values are engine-specific; the oracle checks the
    // exact columns and asserts the accuracy flags constant-true
    "agg_approx_percentile" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(1 AS BIGINT) AS p50_ok, CAST(1 AS BIGINT) AS p90_ok
      FROM orders GROUP BY o_orderstatus""",

    // theta sketches run in their exact regime at fixture cardinalities
    // (pinned in AnalyticsSpec), so the set algebra replays exactly
    "agg_theta_diff" -> """
      WITH a AS (SELECT DISTINCT user_id FROM events
                 WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-02'),
      b AS (SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase'
              AND ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-03')
      SELECT (SELECT count(*) FROM a) AS n_day1,
             (SELECT count(*) FROM b) AS n_day2,
             (SELECT count(*) FROM a
              WHERE user_id NOT IN (SELECT user_id FROM b)) AS churned,
             (SELECT count(*) FROM a
              WHERE user_id IN (SELECT user_id FROM b)) AS retained""",

    "agg_kll_quantile" -> """
      WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events)
      SELECT count(*) AS n,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT)
               AS p50_exact_cents,
             CAST(1 AS BIGINT) AS quantile_ok,
             CAST(1 AS BIGINT) AS rank_ok
      FROM c""",

    "agg_sketch_union" -> """
      SELECT count(DISTINCT c_nationkey) AS n_nations,
             count(DISTINCT c_custkey) AS exact_total,
             CAST(1 AS BIGINT) AS union_ok
      FROM customer""",

    "agg_stats" -> s"""
      SELECT o_orderpriority, count(*) AS n,
             count(DISTINCT o_custkey) AS n_cust,
             min(o_totalprice) AS min_price,
             max(o_totalprice) AS max_price,
             sum(${cents("o_totalprice")}) / 100.0 / count(*) AS avg_price
      FROM orders GROUP BY o_orderpriority""",

    "agg_collect" -> """
      SELECT o_orderstatus,
             string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS priorities,
             count(*) AS n
      FROM orders GROUP BY o_orderstatus""",

    "agg_minmax_by" -> """
      SELECT c_nationkey,
             min_by(c_name, c_custkey) AS first_cust,
             max_by(c_name, c_custkey) AS last_cust,
             max(c_acctbal) AS top_bal
      FROM customer GROUP BY c_nationkey""",

    "agg_rollup" -> s"""
      SELECT coalesce(n_name, 'ALL') AS nation,
             coalesce(c_mktsegment, 'ALL') AS segment,
             count(*) AS n,
             sum(${cents("c_acctbal")}) / 100.0 AS bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, c_mktsegment)""",

    "agg_cube" -> """
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",

    "agg_grouping_sets" -> s"""
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             count(*) AS n,
             sum(${cents("l_extendedprice")}) / 100.0 AS base
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))""",

    "window_rank" -> """
      SELECT * FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER w AS rn,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
      ) t WHERE rn <= 5""",

    "window_lag_lead" -> """
      SELECT l_suppkey, l_orderkey, l_linenumber,
             coalesce(lag(l_quantity, 1) OVER w, -1.0) AS prev_qty,
             coalesce(lead(l_quantity, 1) OVER w, -1.0) AS next_qty
      FROM lineitem
      WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate ASC, l_orderkey ASC,
                   l_linenumber ASC, l_quantity ASC)""",

    "window_frames" -> s"""
      SELECT o_orderstatus, o_orderkey,
             sum(c) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running,
             sum(c) OVER (PARTITION BY o_orderstatus ORDER BY c ASC
                          RANGE BETWEEN 10000000 PRECEDING AND CURRENT ROW) / 100.0 AS band
      FROM (SELECT o_orderstatus, o_orderkey, ${cents("o_totalprice")} AS c FROM orders) t""",

    "sort_limit" -> """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
      LIMIT 50""",

    "set_ops_all" -> """
      WITH a AS (SELECT l_returnflag, l_linestatus FROM lineitem
                 WHERE l_quantity <= 25),
      b AS (SELECT l_returnflag, l_linestatus FROM lineitem
            WHERE l_quantity >= 20),
      ia AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
      ea AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b),
      ua AS (SELECT * FROM a UNION ALL SELECT * FROM b)
      SELECT 'intersect_all' AS op, l_returnflag, l_linestatus,
             count(*) AS n
      FROM ia GROUP BY l_returnflag, l_linestatus
      UNION ALL
      SELECT 'except_all', l_returnflag, l_linestatus, count(*)
      FROM ea GROUP BY l_returnflag, l_linestatus
      UNION ALL
      SELECT 'union_all', l_returnflag, l_linestatus, count(*)
      FROM ua GROUP BY l_returnflag, l_linestatus""",

    "set_union" -> """
      SELECT nationkey, count(*) AS n FROM (
        SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
        UNION ALL
        SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
      ) u GROUP BY nationkey""",

    "set_intersect" -> """
      SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
      INTERSECT
      SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier""",

    "set_except" -> """
      SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
      EXCEPT
      SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier""",

    "set_distinct" -> """
      SELECT DISTINCT c_nationkey, c_mktsegment FROM customer""",

    "fn_editdist" -> """
      SELECT p_partkey,
             CAST(levenshtein(p_name, p_type) AS BIGINT) AS dist_name_type,
             CAST(levenshtein(lower(p_brand), lower(p_type)) AS BIGINT)
               AS dist_brand_type,
             CAST(CASE WHEN levenshtein(p_name, p_type) > 5 THEN -1
                       ELSE levenshtein(p_name, p_type) END AS BIGINT)
               AS dist_capped5
      FROM part""",

    "fn_mask" -> """
      SELECT c_custkey,
             regexp_replace(regexp_replace(regexp_replace(c_name,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
               AS masked_name,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               c_mktsegment,
               '[^A-Za-z0-9]', '*', 'g'),
               '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '#', 'g')
               AS masked_seg,
             regexp_replace(regexp_replace(regexp_replace(c_name,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', '9', 'g')
               AS masked_digits9
      FROM customer""",

    "fn_string" -> """
      SELECT p_partkey,
             lower(p_name) AS lo,
             upper(p_brand) AS up,
             trim('  pad  ') AS trimmed,
             substring(p_type, 1, 5) AS type5,
             length(p_name) AS name_len,
             concat_ws('/', p_brand, p_type) AS brand_type,
             len(string_split(p_name, ' ')) AS n_words
      FROM part""",

    "fn_date" -> """
      SELECT o_orderkey,
             year(o_orderdate) AS yr,
             month(o_orderdate) AS mo,
             dayofmonth(o_orderdate) AS dom,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
             CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      FROM orders""",

    "fn_math" -> """
      SELECT l_orderkey, l_linenumber,
             round(l_extendedprice / 7.0, 2) AS div7,
             abs(l_discount - 0.05) AS abs_disc,
             round(pow(l_quantity, 2.0), 2) AS qty_sq,
             round(ln(l_extendedprice), 6) AS ln_price,
             CASE WHEN l_quantity > 25 THEN 'bulk' ELSE 'small' END AS bucket,
             coalesce(nullif(l_returnflag, 'N'), 'none') AS rf
      FROM lineitem""",

    "fn_array" -> """
      SELECT doc_id,
             len(toks) AS n_toks,
             list_contains(toks, 'spark') AS has_spark,
             len(list_filter(toks, t -> length(t) > 4)) AS n_long,
             CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS total_chars,
             array_to_string(list_transform(toks[1:3], t -> upper(t)), '-') AS head3
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t""",

    "fn_map" -> s"""
      WITH m AS (
        SELECT o_orderstatus, count(*) AS n,
               CAST(sum(${cents("o_totalprice")}) AS BIGINT) AS c
        FROM orders GROUP BY o_orderstatus)
      SELECT o_orderstatus, 'n,cents' AS keys_csv, n + c AS vals_sum,
             'n' AS metric, n AS val FROM m
      UNION ALL
      SELECT o_orderstatus, 'n,cents' AS keys_csv, n + c AS vals_sum,
             'cents' AS metric, c AS val FROM m""",

    "fn_json" -> """
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct
      FROM events""",

    "events_retention" -> """
      WITH w AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS week
        FROM events),
      c AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1)
      SELECT c.cohort_week,
             CAST(datediff('day', c.cohort_week, w.week) // 7 AS BIGINT) AS week_offset,
             count(*) AS n_users
      FROM w JOIN c ON w.user_id = c.user_id
      GROUP BY 1, 2""",

    "events_attribution" -> """
      WITH u AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
               CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind,
               CASE WHEN event_type = 'click'
                    THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100) AS BIGINT) END AS cents
        FROM events WHERE event_type IN ('click', 'purchase')),
      a AS (
        SELECT *,
               last_value(k IGNORE NULLS) OVER w AS last_k,
               last_value(CASE WHEN kind = 0 THEN ts END IGNORE NULLS) OVER w
                 AS last_click_ts
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, kind ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT CASE WHEN last_click_ts >= ts - INTERVAL 7 DAY
                  THEN last_k ELSE -1 END AS campaign,
             count(*) AS n_purchases, CAST(sum(cents) AS BIGINT) AS revenue_cents
      FROM a WHERE kind = 1 GROUP BY 1""",

    "events_paths" -> """
      WITH e AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts ASC, event_id ASC) AS next_type
        FROM events)
      SELECT event_type AS src_type, next_type AS dst_type, count(*) AS n
      FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2""",

    "agg_bool" -> """
      SELECT l_returnflag,
             bool_and(l_quantity > CAST(0 AS DOUBLE)) AS all_pos,
             bool_or(l_discount > CAST(0.05 AS DOUBLE)) AS some_deep_disc,
             bool_and(l_tax <= CAST(0.08 AS DOUBLE)) AS all_tax_capped,
             count(*) FILTER (WHERE l_tax = CAST(0 AS DOUBLE)) AS n_tax_free,
             count(*) FILTER (WHERE l_quantity >= CAST(25 AS DOUBLE)) AS n_heavy
      FROM lineitem GROUP BY 1""",

    "agg_moments" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(q) AS BIGINT) AS sum_q, CAST(sum(q * q) AS BIGINT) AS sum_q2,
             CAST(sum(d) AS BIGINT) AS sum_d, CAST(sum(d * d) AS BIGINT) AS sum_d2,
             CAST(sum(q * d) AS BIGINT) AS sum_qd
      FROM (SELECT l_returnflag,
                   CAST(l_quantity AS BIGINT) AS q,
                   CAST(round(l_discount * 100) AS BIGINT) AS d
            FROM lineitem)
      GROUP BY 1""",

    "agg_mode" -> """
      WITH counts AS (
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               c_mktsegment AS segment, count(*) AS n
        FROM customer GROUP BY 1, 2),
      rk AS (
        SELECT nationkey, segment, n,
               row_number() OVER (PARTITION BY nationkey
                                  ORDER BY n DESC, segment ASC) AS rk
        FROM counts)
      SELECT nationkey, segment AS mode_segment, n AS mode_n
      FROM rk WHERE rk = 1""",

    "agg_cms" -> """
      SELECT l_suppkey, count(*) AS exact_cnt,
             CAST(1 AS BIGINT) AS no_underestimate_ok,
             CAST(1 AS BIGINT) AS overestimate_bound_ok
      FROM lineitem GROUP BY 1""",

    "join_nearest" -> """
      WITH u AS (
        SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
        FROM events WHERE event_type IN ('click', 'purchase')),
      x AS (
        SELECT *,
               last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
                 OVER wp AS prev_id,
               last_value(CASE WHEN kind = 0 THEN ts_us END IGNORE NULLS)
                 OVER wp AS prev_ts,
               first_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
                 OVER wn AS next_id,
               first_value(CASE WHEN kind = 0 THEN ts_us END IGNORE NULLS)
                 OVER wn AS next_ts
        FROM u
        WINDOW wp AS (PARTITION BY user_id ORDER BY ts_us ASC, kind ASC, event_id ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY user_id ORDER BY ts_us ASC, kind ASC, event_id ASC
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
      y AS (
        SELECT user_id, event_id,
               CASE WHEN ts_us - prev_ts <= 86400000000 THEN ts_us - prev_ts END
                 AS d_prev,
               CASE WHEN next_ts - ts_us <= 86400000000 THEN next_ts - ts_us END
                 AS d_next,
               prev_id, next_id
        FROM x WHERE kind = 1)
      SELECT user_id, event_id AS purchase_id,
             CASE WHEN d_prev IS NOT NULL AND (d_next IS NULL OR d_prev <= d_next)
                    THEN prev_id
                  WHEN d_next IS NOT NULL THEN next_id END AS click_id,
             CASE WHEN d_prev IS NOT NULL AND (d_next IS NULL OR d_prev <= d_next)
                    THEN -d_prev
                  WHEN d_next IS NOT NULL THEN d_next END AS dt_us
      FROM y""",

    "events_dips" -> """
      WITH e AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CAST(round(value * 100) AS BIGINT) AS c
        FROM events),
      x AS (
        SELECT user_id, c,
               lag(c) OVER w AS prev, lead(c) OVER w AS next
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
      SELECT user_id, count(*) AS n_dips,
             max(least(prev, next) - c) AS max_dip_cents
      FROM x WHERE prev > c AND next > c
      GROUP BY user_id""",

    "agg_hll_intersect" -> """
      SELECT count(*) AS exact_both, CAST(1 AS BIGINT) AS intersect_ok
      FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
            INTERSECT
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')""",

    "events_anomaly" -> """
      WITH e AS (
        SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      s AS (
        -- HUGEINT mirrors the Spark side's DECIMAL(38,0) widening: the
        -- squared terms overflow BIGINT at a few hundred large events
        SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(cents) AS HUGEINT) AS sc,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS sc2
        FROM e GROUP BY 1)
      SELECT e.user_id, e.event_id, e.cents
      FROM e JOIN s ON e.user_id = s.user_id
      WHERE n >= 2
        AND (n * cents - sc) * (n * cents - sc) > 9 * (n * sc2 - sc * sc)""",

    "fn_collation" -> """
      WITH v AS (
        SELECT CASE WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
                    WHEN c_custkey % 3 = 1 THEN c_mktsegment
                    ELSE upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
               END AS w
        FROM customer)
      SELECT lower(w) AS segment, count(*) AS n,
             count(DISTINCT w) AS n_forms,
             CAST(1 AS BIGINT) AS ci_eq_ok,
             CAST(max(CASE WHEN contains(lower(w), 'build') THEN 1 ELSE 0 END) AS BIGINT) AS has_build
      FROM v GROUP BY lower(w)""",

    "fn_url" -> """
      SELECT doc_id,
             'https://' || source || '.example.com/' || lang || '/doc-'
               || CAST(doc_id AS VARCHAR) || '?ref=r' || CAST(doc_id % 7 AS VARCHAR)
               AS url,
             source || '.example.com' AS host,
             '/' || lang || '/doc-' || CAST(doc_id AS VARCHAR) AS path,
             'ref=r' || CAST(doc_id % 7 AS VARCHAR) AS query,
             'r' || CAST(doc_id % 7 AS VARCHAR) AS ref
      FROM documents""",

    "ts_interpolate" -> """
      WITH daily AS (
        SELECT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
               count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2),
      span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
      cal AS (
        SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        FROM span),
      x AS (
        SELECT c.user_id, c.day, coalesce(n, 0) AS n_events,
               last_value(cents IGNORE NULLS) OVER wp AS prev_cents,
               last_value(CASE WHEN cents IS NOT NULL THEN c.day END IGNORE NULLS)
                 OVER wp AS prev_day,
               first_value(cents IGNORE NULLS) OVER wn AS next_cents,
               first_value(CASE WHEN cents IS NOT NULL THEN c.day END IGNORE NULLS)
                 OVER wn AS next_day
        FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
        WINDOW wp AS (PARTITION BY c.user_id ORDER BY c.day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY c.user_id ORDER BY c.day
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT user_id, day, CAST(n_events AS BIGINT) AS n_events,
             CAST(CASE WHEN prev_day = next_day THEN prev_cents
                  ELSE (prev_cents * datediff('day', day, next_day)
                        + next_cents * datediff('day', prev_day, day))
                       // datediff('day', prev_day, next_day) END AS BIGINT)
               AS interp_cents
      FROM x""",

    "ts_resample" -> """
      WITH e AS (
        SELECT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
               CAST(ts AS TIMESTAMP) AS ts, event_id,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      x AS (
        SELECT user_id, day, cents,
               first_value(cents) OVER wo AS open,
               last_value(cents) OVER wc AS close
        FROM e
        WINDOW wo AS (PARTITION BY user_id, day ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wc AS (PARTITION BY user_id, day ORDER BY ts, event_id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT user_id, day, count(*) AS n_events, min(open) AS open_cents,
             max(cents) AS high_cents, min(cents) AS low_cents,
             min(close) AS close_cents, CAST(sum(cents) AS BIGINT) AS vol_cents
      FROM x GROUP BY user_id, day""",

    // the INDEPENDENT quadratic formulation of the sweep-line operator:
    // per interval group, sum the multiplicity of earlier-starting
    // groups still active at its start (the exact quantity the Spark
    // sweep's running sum carries) — so the hash-check proves the sweep
    // equals real join semantics
    "join_interval" -> """
      WITH iv AS (
        SELECT l_partkey AS part,
               date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d0,
               date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
                 + 1 + (l_suppkey % 14) AS d1
        FROM lineitem),
      g AS (SELECT part, d0, d1, count(*) AS m FROM iv GROUP BY 1, 2, 3),
      cov AS (
        SELECT i.part, i.d0, i.d1, i.m, coalesce(sum(j.m), 0) AS act
        FROM g i LEFT JOIN g j ON j.part = i.part
          AND (j.d0 < i.d0 OR (j.d0 = i.d0 AND j.d1 < i.d1))
          AND j.d1 >= i.d0
        GROUP BY i.part, i.d0, i.d1, i.m)
      SELECT part AS l_partkey,
             CAST(sum(m * act + m * (m - 1) // 2) AS BIGINT) AS n_overlap_pairs,
             CAST(max(act + m) AS BIGINT) AS max_concurrency,
             CAST(sum(m) AS BIGINT) AS n_intervals
      FROM cov GROUP BY part""",

    "agg_listagg" -> """
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS n_rich,
             string_agg(c_name, ',' ORDER BY c_name) AS names_csv
      FROM customer WHERE c_acctbal > 9000
      GROUP BY 1""",

    "agg_weighted_median" -> """
      WITH b AS (
        SELECT o_orderpriority AS priority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               1 + (o_orderkey % 7) AS w
        FROM orders),
      x AS (
        SELECT priority, cents, w,
               sum(w) OVER (PARTITION BY priority ORDER BY cents, w
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
               sum(w) OVER (PARTITION BY priority) AS totw
        FROM b)
      SELECT priority, CAST(min(cents) AS BIGINT) AS wmedian_cents,
             CAST(min(totw) AS BIGINT) AS total_weight
      FROM x WHERE cumw * 2 >= totw GROUP BY priority""",

    "fn_variant" -> """
      SELECT doc_id, doc_id AS id_v, lang AS lang_v, n_chars AS n_v,
             source AS tag0, 't' || CAST(doc_id % 5 AS VARCHAR) AS tag1,
             CAST(NULL AS BIGINT) AS missing_v
      FROM documents""",

    // fn_struct's struct algebra collapses to flat leaf expressions under
    // Catalyst; the oracle states those leaves directly.
    "fn_struct" -> """
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
             o_custkey % 7 AS bucket,
             o_orderstatus AS st,
             o_orderpriority = '1-URGENT' AS urgent
      FROM orders""",

    // ts_ewma: the oracle re-derives each row's frame by a row-number
    // band self-join (boring, version-stable SQL) instead of the engine's
    // window+array form; weights 2^(j-st) oldest-first, normalizer
    // 2^m - 1 — identical exact-integer arithmetic. // == div because
    // cents are non-negative.
    "ts_ewma" -> """
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        FROM events)
      SELECT a.user_id, a.ts, a.event_id, a.cents,
             CAST(count(*) AS BIGINT) AS n_frame,
             CAST(1000 * sum(b.cents *
                             (CAST(1 AS BIGINT) << CAST(b.rn - greatest(a.rn - 7, 1) AS INT)))
                  // ((CAST(1 AS BIGINT) << CAST(count(*) AS INT)) - 1)
                  AS BIGINT) AS ewma_milli
      FROM e a JOIN e b
        ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 7 AND a.rn
      GROUP BY a.user_id, a.ts, a.event_id, a.cents""",

    // the bitmap rollup is exact by construction; the oracle is the
    // plain distinct count it must reproduce
    "agg_bitmap" -> """
      SELECT o_orderpriority AS priority,
             count(DISTINCT o_custkey) AS n_distinct_cust
      FROM orders GROUP BY o_orderpriority""",

    "events_pattern" -> """
      WITH seqs AS (
        SELECT user_id, count(*) AS n_events,
               string_agg(event_type, ' '
                          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS seq
        FROM events GROUP BY user_id)
      SELECT user_id, n_events,
             regexp_matches(seq, 'click purchase') AS direct_buy,
             regexp_matches(seq, 'view( [a-z]+)* purchase') AS view_to_buy,
             regexp_matches(seq, '^signup') AS signup_first,
             sha256(seq) AS seq_sha
      FROM seqs""",

    // identical expression tree to the Spark side: every double op is
    // IEEE-correctly-rounded on exact integer inputs, so t_stat is
    // bitwise-equal
    "events_ab" -> """
      WITH arms AS (
        SELECT user_id % 2 AS arm, count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc,
               CAST(sum(CAST(round(value * 100) AS BIGINT)
                        * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sc2
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      p AS (
        SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
               max(CASE WHEN arm = 0 THEN sc END) AS s0,
               max(CASE WHEN arm = 0 THEN sc2 END) AS s20,
               max(CASE WHEN arm = 1 THEN n END) AS n1,
               max(CASE WHEN arm = 1 THEN sc END) AS s1,
               max(CASE WHEN arm = 1 THEN sc2 END) AS s21
        FROM arms)
      SELECT n0, s0, s20, n1, s1, s21,
             CAST((1000 * s1) // n1 - (1000 * s0) // n0 AS BIGINT) AS lift_millicents,
             CAST(floor(((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             / sqrt((CAST(s21 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                      / CAST(n1 - 1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    + (CAST(s20 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                      / CAST(n0 - 1 AS DOUBLE) / CAST(n0 AS DOUBLE))) * 1e6) AS BIGINT) AS t_stat_micro
      FROM p""",

    "fn_lambda" -> """
      WITH t AS (
        SELECT l_orderkey, l_linenumber,
               range(1, 2 + (l_orderkey + l_linenumber) % 6) AS a,
               CAST(round(l_quantity) AS BIGINT) AS q
        FROM lineitem)
      SELECT l_orderkey, l_linenumber,
             len(a) AS n,
             CAST(list_sum(list_transform(a, x -> x * q)) AS BIGINT) AS wsum,
             CAST(len(list_filter(a, x -> x % 2 = 0)) AS BIGINT) AS n_even,
             len(list_filter(a, x -> x * q > 40)) > 0 AS any_big,
             len(list_filter(a, x -> x > 7)) = 0 AS all_small,
             CAST(list_sum(list_transform(range(1, len(a) + 1),
                                          i -> a[i] * a[len(a) + 1 - i]))
               AS BIGINT) AS palindot
      FROM t""",

    "events_quant_pattern" -> """
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
               CASE WHEN lag(event_type) OVER w IS NULL
                      OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      r0 AS (
        SELECT *, sum(chg) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) AS run_id
        FROM e),
      runs AS (
        SELECT user_id, run_id, max(event_type) AS rtype, count(*) AS rlen
        FROM r0 GROUP BY 1, 2),
      adj AS (
        SELECT *, lead(rtype, 1) OVER wr AS t1, lead(rtype, 2) OVER wr AS t2,
               lead(rlen, 1) OVER wr AS b_len
        FROM runs
        WINDOW wr AS (PARTITION BY user_id ORDER BY run_id ASC))
      SELECT user_id, count(*) AS n_matches,
             CAST(sum(b_len) AS BIGINT) AS total_view_len,
             CAST(max(b_len) AS BIGINT) AS max_view_len,
             CAST(min(run_id) AS BIGINT) AS first_match_run
      FROM adj
      WHERE rtype = 'signup' AND t1 = 'view' AND t2 = 'purchase'
      GROUP BY 1""",

    "ts_rolling" -> """
      WITH p AS (
        SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase')
      SELECT user_id, event_id, ts_us, cents,
             CAST(sum(cents) OVER w AS BIGINT) AS roll7_cents,
             count(*) OVER w AS roll7_n
      FROM p
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC
                   RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)""",

    "events_rfm" -> """
      WITH p AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'),
      per AS (
        SELECT user_id,
               CAST(datediff('day', CAST(max(ts) AS DATE),
                             CAST((SELECT max(ts) FROM p) AS DATE)) AS BIGINT)
                 AS recency_days,
               count(*) AS frequency,
               CAST(sum(cents) AS BIGINT) AS monetary_cents
        FROM p GROUP BY 1)
      SELECT user_id, recency_days, frequency, monetary_cents,
             CAST(ntile(5) OVER (ORDER BY recency_days ASC, user_id ASC) AS BIGINT)
               AS r_quintile,
             CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id ASC) AS BIGINT)
               AS f_quintile,
             CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, user_id ASC) AS BIGINT)
               AS m_quintile
      FROM per""",

    "events_cohort_ltv" -> """
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        FROM events),
      cohort AS (
        SELECT user_id,
               min(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS cohort_week
        FROM e GROUP BY 1),
      rev AS (
        SELECT c.cohort_week,
               CAST(datediff('day', CAST(c.cohort_week AS DATE),
                             CAST(date_trunc('week', e.ts) AS DATE)) // 7
                 AS BIGINT) AS week_offset,
               CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
                 AS rev_cents
        FROM e JOIN cohort c USING (user_id)
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2),
      sizes AS (
        SELECT cohort_week, count(*) AS cohort_users FROM cohort GROUP BY 1)
      SELECT r.cohort_week, r.week_offset, r.rev_cents, s.cohort_users,
             CAST(sum(r.rev_cents) OVER w AS BIGINT) AS cum_rev_cents,
             CAST(sum(r.rev_cents) OVER w // s.cohort_users AS BIGINT)
               AS cum_cents_per_user
      FROM rev r JOIN sizes s USING (cohort_week)
      WINDOW w AS (PARTITION BY r.cohort_week ORDER BY r.week_offset ASC)""",

    "events_skyline" -> """
      WITH per AS (
        SELECT user_id, count(*) AS frequency,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS monetary_cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT user_id, frequency, monetary_cents
      FROM per u
      WHERE NOT EXISTS (
        SELECT 1 FROM per v
        WHERE v.frequency >= u.frequency
          AND v.monetary_cents >= u.monetary_cents
          AND (v.frequency > u.frequency OR v.monetary_cents > u.monetary_cents))""",

    "events_markov" -> """
      WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
        FROM events),
      p AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts ASC, event_id ASC) AS from_type,
               event_type AS to_type
        FROM e),
      t AS (
        SELECT from_type, to_type, count(*) AS n
        FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
             CAST((n * 1000000) // sum(n) OVER (PARTITION BY from_type)
               AS BIGINT) AS ppm
      FROM t""",

    // deliberately the brute-force SPEC (all pairs, ±2 length band,
    // dist ≤ 1, per-probe minimum) so the engine's prefix-filtered
    // candidate generation is checked against the definition, not
    // against a replay of its own blocking
    "join_fuzzy_editdist" -> """
      WITH probes AS (
        SELECT p_partkey AS probe_key,
               substr(p_name, 1, 1) || substr(p_name, 3) AS probe_name
        FROM part WHERE p_partkey % 37 = 0),
      scored AS (
        SELECT probe_key, probe_name, p_partkey AS cand_key,
               CAST(levenshtein(probe_name, p_name) AS BIGINT) AS dist
        FROM probes CROSS JOIN part
        WHERE abs(len(probe_name) - len(p_name)) <= 2)
      SELECT probe_key, probe_name, cand_key AS matched_key, dist
      FROM (SELECT *, row_number() OVER (PARTITION BY probe_key
                                         ORDER BY dist ASC, cand_key ASC) AS rk
            FROM scored
            WHERE dist <= 1)
      WHERE rk = 1"""
  )
}
