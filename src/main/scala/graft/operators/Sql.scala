package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** SQL entry path: the engine's tables registered as temp views and
  * queried with ANSI SQL through `spark.sql` — the query layer the
  * reference lacks entirely (its "query language" is a mapper/reducer
  * script pair; SURVEY.md §1) and the one a user of a general analytics
  * engine reaches for first. The same Catalyst plans as the DataFrame
  * API: the Q3-shaped query below compiles to the identical
  * broadcast-join + two-phase-agg + TakeOrderedAndProject physical plan
  * its DataFrame twin would.
  */
object Sql {

  /** Register every fixture table as `graft_<name>` temp views. events
    * goes through its dedicated loader (ns-timestamp handling — a bare
    * parquet read of timestamp[ns] throws). Registration is once per
    * (session, data dir) — re-registering 10 views (and re-resolving the
    * events ns-timestamp loader) on every SQL call was measurable
    * per-query overhead the bench charged to each SQL query. */
  private val ViewsDirKey = "spark.graft.sql.viewsDir"
  def registerViews(s: SparkSession, d: String): Unit = {
    if (s.conf.getOption(ViewsDirKey).contains(d)) return
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(s, d) else Tables.load(s, d, n)
      df.createOrReplaceTempView(s"graft_$n")
    }
    s.conf.set(ViewsDirKey, d)
  }

  /** TPC-H Q3 shape (shipping priority): 3-way join, filter on both fact
    * sides, exact-cents revenue, top-10 by revenue with unique tiebreak. */
  def q3Shipping(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT l.l_orderkey AS orderkey,
             sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
               / CAST(100 AS DOUBLE) AS revenue,
             o.o_orderdate AS orderdate
      FROM graft_customer c
      JOIN graft_orders o   ON c.c_custkey = o.o_custkey
      JOIN graft_lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
        AND l.l_shipdate  > TIMESTAMP '1996-01-01'
      GROUP BY l.l_orderkey, o.o_orderdate
      ORDER BY revenue DESC, orderkey ASC
      LIMIT 10
    """)
  }

  /** TPC-H Q5 shape (local-supplier volume): the 6-table join a real
    * analytics user runs on day one — region → nation → supplier pruned
    * down one branch, customer → orders → lineitem up the other, with the
    * non-tree c_nationkey = s_nationkey condition that forces the
    * customer and supplier branches to meet on nation. Catalyst handles
    * what a hand-planner would: the three dimension tables broadcast
    * (region 5 / nation 25 / supplier rows ≪ the fact side), the
    * orderdate range pushes into the orders scan, and the lineitem ⋈
    * orders equi-join stays eligible for an injected bloom runtime
    * filter — all pinned in PlanShapeSpec. At 100 TB the only shuffle
    * this plan needs is the single fact-fact orderkey exchange. */
  def q5Local(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT n.n_name AS nation,
             sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
               / CAST(100 AS DOUBLE) AS revenue
      FROM graft_customer c
      JOIN graft_orders o   ON c.c_custkey = o.o_custkey
      JOIN graft_lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN graft_supplier s ON l.l_suppkey = s.s_suppkey
                           AND c.c_nationkey = s.s_nationkey
      JOIN graft_nation n   ON s.s_nationkey = n.n_nationkey
      JOIN graft_region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY n.n_name
    """)
  }

  /** TPC-H Q9 shape (product-type profit): like-filter on part (no
    * sargable prefix — a genuine mid-string LIKE the optimizer cannot
    * push as a range), then the 5-way star part → lineitem ← supplier →
    * nation, lineitem → orders, aggregated per (nation, order year).
    * The fixture has no partsupp table, so profit is the discounted
    * revenue (the join/agg SHAPE is what Q9 exercises; supplycost would
    * be one more broadcast dim). part after the LIKE filter and the two
    * dims broadcast; lineitem shuffles once on orderkey against orders. */
  def q9Profit(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
               / CAST(100 AS DOUBLE) AS profit
      FROM graft_part p
      JOIN graft_lineitem l ON p.p_partkey = l.l_partkey
      JOIN graft_supplier s ON l.l_suppkey = s.s_suppkey
      JOIN graft_nation n   ON s.s_nationkey = n.n_nationkey
      JOIN graft_orders o   ON l.l_orderkey = o.o_orderkey
      WHERE p.p_name LIKE '%red%'
      GROUP BY n.n_name, year(o.o_orderdate)
    """)
  }

  /** TPC-H Q7 shape (volume shipping between two nations): the SAME
    * dimension table joined TWICE under different aliases (supplier's
    * nation and customer's nation) with a disjunctive pair predicate —
    * the self-aliased-dimension shape that breaks engines whose view
    * registration conflates aliases. Both nation copies broadcast; the
    * OR pair condition evaluates above the joins (it references both
    * aliases, so it cannot push into either). */
  def q7Volume(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
               / CAST(100 AS DOUBLE) AS revenue
      FROM graft_supplier s
      JOIN graft_lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN graft_orders o   ON o.o_orderkey = l.l_orderkey
      JOIN graft_customer c ON c.c_custkey = o.o_custkey
      JOIN graft_nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN graft_nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2')
      GROUP BY n1.n_name, n2.n_name, year(o.o_orderdate)
    """)
  }

  /** TPC-H Q18 shape (large-volume orders): an IN-subquery over a
    * grouped HAVING aggregate — the aggregate-then-semi-join plan
    * Catalyst rewrites to a LeftSemi against the HAVING output, with the
    * outer join tree re-aggregating the same fact table. Quantities are
    * integer-valued; BIGINT casts keep both engines' sums exact. */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT c.c_name, o.o_orderkey AS orderkey, o.o_totalprice AS totalprice,
             sum(CAST(l.l_quantity AS BIGINT)) AS sum_qty
      FROM graft_customer c
      JOIN graft_orders o   ON c.c_custkey = o.o_custkey
      JOIN graft_lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM graft_lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS BIGINT)) > 280)
      GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
    """)
  }

  /** TPC-H Q20 shape (the nested-subquery gauntlet): a doubly-nested
    * IN — suppliers whose shipped quantity of 'blue%' parts is above
    * the all-supplier average for those parts — with the threshold
    * itself a nested scalar subquery. The fixture has no partsupp, so
    * the Q20 `availqty > 0.5 × shipped` correlation becomes
    * above-average shipping, kept EXACT-INTEGER (sum·n_suppliers >
    * total — no avg() double at the comparison boundary) and
    * scale-invariant (~half the suppliers qualify at every SF).
    * What it exercises on the optimizer: IN → left-semi unnesting at
    * two levels, scalar-subquery reuse (the same filtered-lineitem
    * aggregate appears twice and should evaluate once per branch via
    * subquery/exchange reuse), and the part-filter pushed into the
    * innermost semi-join's build side. At 100 TB: part('blue%') and
    * the two scalars broadcast; one shuffle of filtered lineitem on
    * suppkey is the whole cost. */
  def q20Nested(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT s.s_name, n.n_name AS nation
      FROM graft_supplier s
      JOIN graft_nation n ON s.s_nationkey = n.n_nationkey
      WHERE s.s_suppkey IN (
        SELECT l.l_suppkey FROM graft_lineitem l
        WHERE l.l_partkey IN (
          SELECT p_partkey FROM graft_part WHERE p_name LIKE 'blue%')
        GROUP BY l.l_suppkey
        HAVING sum(CAST(l.l_quantity AS BIGINT)) *
               (SELECT count(DISTINCT l_suppkey) FROM graft_lineitem
                WHERE l_partkey IN (
                  SELECT p_partkey FROM graft_part WHERE p_name LIKE 'blue%')) >
               (SELECT sum(CAST(l_quantity AS BIGINT)) FROM graft_lineitem
                WHERE l_partkey IN (
                  SELECT p_partkey FROM graft_part WHERE p_name LIKE 'blue%')))
    """)
  }

  /** TPC-H Q4 shape (order-priority checking): the `EXISTS` half of
    * correlated SQL — count orders per priority that have at least one
    * late lineitem. The fixture has no commit/receipt dates, so "late"
    * is shipped more than 60 days after the order date (the correlated
    * predicate then references BOTH the equi key l_orderkey AND the
    * outer o_orderdate — a strictly harder decorrelation than textbook
    * Q4, since the non-equi leg must ride the semi join as a join
    * condition, not a pushed filter). Catalyst must rewrite the EXISTS
    * to a LeftSemi hash join on orderkey (pinned in PlanShapeSpec):
    * executed row-at-a-time this is O(|orders|·|lineitem|); as a semi
    * join it is one shuffle of each side. */
  def q4OrderPriority(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT o.o_orderpriority AS priority, count(*) AS order_count
      FROM graft_orders o
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        AND EXISTS (
          SELECT 1 FROM graft_lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL '60' DAY)
      GROUP BY o.o_orderpriority
    """)
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the gauntlet —
    * EXISTS and NOT EXISTS correlated against the SAME fact table with
    * a `<>` disequality on the correlated key. Per finished order, a
    * supplier is counted when they shipped late (fixture lacks
    * commit/receipt dates → "late" = shipped in 1999+, a per-row
    * predicate like the reference's receipt>commit), some OTHER supplier
    * contributed a line (EXISTS → LeftSemi), and NO other supplier was
    * also late (NOT EXISTS → LeftAnti). This is where decorrelation goes
    * quadratic if either subquery falls back to a nested loop: both must
    * plan as set-based semi/anti hash joins on l_orderkey with the
    * suppkey disequality as a join residual (pinned in PlanShapeSpec).
    * At 100 TB: three hash exchanges of lineitem on orderkey — the same
    * partitioning, so AQE/exchange reuse can co-locate them. */
  def q21Waiting(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT s.s_name, count(*) AS numwait
      FROM graft_supplier s
      JOIN graft_lineitem l1 ON s.s_suppkey = l1.l_suppkey
      JOIN graft_orders o    ON o.o_orderkey = l1.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l1.l_shipdate >= TIMESTAMP '1999-01-01'
        AND EXISTS (
          SELECT 1 FROM graft_lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM graft_lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate >= TIMESTAMP '1999-01-01')
      GROUP BY s.s_name
    """)
  }

  /** TPC-H Q22 shape (global sales opportunity): NOT EXISTS + a scalar
    * average subquery — rich customers (balance above the positive-
    * balance average) with no recent orders, rolled up per nation (the
    * fixture has no phone country codes). The average threshold is the
    * exact-integer pattern from Q20: `cents · count > total_cents`
    * instead of a double `avg()` at the comparison boundary, so both
    * engines agree bit-for-bit on who qualifies. The NOT EXISTS is
    * windowed (no orders since 2000) because every fixture customer has
    * SOME order — an unwindowed anti join would be vacuously empty and
    * test nothing. Plan: two broadcast scalar subqueries + one LeftAnti
    * hash join of customer against date-filtered orders (pinned). */
  def q22GlobalSales(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT c.c_nationkey AS nationkey, count(*) AS numcust,
             sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS totacctbal_cents
      FROM graft_customer c
      WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) *
            (SELECT count(*) FROM graft_customer WHERE c_acctbal > 0.0) >
            (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT))
             FROM graft_customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (
          SELECT 1 FROM graft_orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
      GROUP BY c.c_nationkey
    """)
  }

  /** TPC-H Q16 shape (supplier diversity per part line): `NOT IN` with a
    * subquery — the THIRD anti-join decorrelation path, distinct from
    * NOT EXISTS (Q21/Q22): NOT IN is null-aware, so Catalyst must plan a
    * null-aware anti join (the `key = k OR isnull(key = k)` disjunct —
    * one NULL in the subquery legally empties the whole result, which a
    * plain LeftAnti gets wrong). Pinned in PlanShapeSpec: LeftAnti WITH
    * the isnull disjunct, build side broadcast (the excluded-supplier
    * list is dimension-sized at any scale — NAAJ requires a broadcast
    * build, which is why an accidentally fact-sized NOT IN subquery is a
    * 100 TB incident; the fixture's is ~a fifth of the suppliers at
    * every SF — non-empty even at sf0.001, so AQE's empty-relation
    * propagation can't elide the join the pin asserts). Also exercises
    * count(DISTINCT) per group — the Expand-based two-phase distinct
    * aggregate. */
  def q16SupplierCnt(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT p.p_brand AS brand, p.p_type AS type,
             count(DISTINCT l.l_suppkey) AS supplier_cnt
      FROM graft_part p
      JOIN graft_lineitem l ON p.p_partkey = l.l_partkey
      WHERE p.p_brand <> 'Brand#1'
        AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM graft_supplier WHERE s_acctbal < 1500)
      GROUP BY p.p_brand, p.p_type
    """)
  }

  /** TPC-H Q13 shape (customer order-count distribution): LEFT JOIN with
    * a predicate in the ON clause, then `count(o_orderkey)` — the classic
    * null-count trap. A customer whose every order is filtered away by
    * the ON condition must survive the outer join with o_orderkey NULL
    * and land in the c_count = 0 bucket (count of a column skips NULLs;
    * count(*) would wrongly report 1). The second GROUP BY is on the
    * computed count itself — an aggregate of an aggregate, two
    * exchanges, the second one tiny (|distinct counts| keys). The
    * fixture's c_count=0 row is live (one customer has only URGENT
    * orders at sf0.01), so the trap is actually exercised, not just
    * syntactically present. */
  def q13CountGrouping(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT c_count, count(*) AS custdist
      FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM graft_customer c
        LEFT JOIN graft_orders o ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
      ) t
      GROUP BY c_count
    """)
  }

  /** TPC-H Q17 shape (small-quantity revenue): a correlated SCALAR
    * AGGREGATE in the WHERE clause — each lineitem compares against the
    * average quantity OF ITS OWN PART (`0.2 * avg(..) WHERE l2.l_partkey
    * = l.l_partkey`). Catalyst decorrelates this into one per-part
    * aggregate joined back on the key (RewriteCorrelatedScalarSubquery):
    * at 100 TB that is a map-side-combined agg over lineitem plus one
    * equi-join — NOT a per-row re-scan, which is how a naive nested-loop
    * evaluation goes quadratic (pinned: no nested loop in the plan).
    * Determinism: quantities are integer-valued doubles (exact IEEE
    * sums, order-independent), and the 0.2 factor is CAST AS DOUBLE on
    * both sides — Spark and DuckDB both parse a bare `0.2` as DECIMAL,
    * with different multiply semantics. */
  def q17SmallQty(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT p.p_brand AS brand,
             count(*) AS n_small,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS revenue_cents
      FROM graft_lineitem l
      JOIN graft_part p ON p.p_partkey = l.l_partkey
      WHERE l.l_quantity < CAST(0.2 AS DOUBLE) * (
          SELECT avg(l2.l_quantity) FROM graft_lineitem l2
          WHERE l2.l_partkey = l.l_partkey)
      GROUP BY p.p_brand
    """)
  }

  /** TPC-H Q2 shape (minimum-cost supplier): a correlated MIN subquery
    * selecting, per part, exactly the offer(s) at that part's minimum
    * price — `l_extendedprice = (SELECT min(..) WHERE l2.l_partkey =
    * p.p_partkey)`. Same decorrelation family as Q17 but with the
    * equality-on-extremum twist: the rewritten plan aggregates lineitem
    * per part once and equi-joins the min back, then the outer 3-way
    * join (part ⋈ lineitem ⋈ supplier) proceeds as ordinary hash joins
    * with the dimension sides broadcast. Price equality is a bit
    * comparison of unmodified doubles (no arithmetic), so ties at the
    * minimum are kept — Q2's LIMIT-free core semantics. Rolled up by
    * supplier nation so the result is group-sized at every SF. */
  def q2MinCost(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT s.s_nationkey AS nationkey,
             count(*) AS n_min_offers,
             count(DISTINCT p.p_partkey) AS n_parts
      FROM graft_part p
      JOIN graft_lineitem l ON l.l_partkey = p.p_partkey
      JOIN graft_supplier s ON s.s_suppkey = l.l_suppkey
      WHERE p.p_size >= 40
        AND l.l_extendedprice = (
          SELECT min(l2.l_extendedprice) FROM graft_lineitem l2
          WHERE l2.l_partkey = p.p_partkey)
      GROUP BY s.s_nationkey
    """)
  }

  /** TPC-H Q15 shape (top supplier): a named revenue CTE referenced
    * TWICE — once as the join input, once inside the scalar
    * `(SELECT max(..) FROM revenue)` — the view-plus-extremum pattern
    * every reporting workload contains. Spark plans the CTE once and
    * reuses it when worthwhile; the scalar max is a one-row broadcast
    * into the filter, so the whole query is one windowed-scan aggregate
    * + one dimension join at any scale. Integer-cents totals make the
    * max and its equality comparison exact, and TIES at the maximum are
    * all returned (the SQL-standard Q15 answer set, no arbitrary pick). */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      WITH revenue AS (
        SELECT l_suppkey,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                 AS total_cents
        FROM graft_lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s.s_suppkey AS suppkey, s.s_name AS name, r.total_cents
      FROM graft_supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
      WHERE r.total_cents = (SELECT max(total_cents) FROM revenue)
    """)
  }

  /** TPC-H Q11 shape (important stock): a grouped total filtered against
    * a SHARE of the global total — the classic scalar-subquery-in-HAVING.
    * TPC-H scales its fraction by 1/SF so the result stays non-empty;
    * here the threshold is relative to the MEAN supplier share
    * (value × n_suppliers × 100 > total × 105, all integer — suppliers
    * at >1.05× the mean), which is scale-invariant by construction:
    * non-empty at every SF without a tuned constant. Plan: two
    * aggregates over the same per-supplier frame (Spark reuses the
    * exchange) and two one-row scalar broadcasts into the filter —
    * nothing rescans lineitem. */
  def q11ImportantValue(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      WITH sup AS (
        SELECT l_suppkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value_cents
        FROM graft_lineitem GROUP BY l_suppkey)
      SELECT l_suppkey AS suppkey, value_cents
      FROM sup
      WHERE value_cents * (SELECT count(*) FROM sup) * 100 >
            (SELECT sum(value_cents) FROM sup) * 105
    """)
  }

  /** TPC-H Q1 proper, through the SQL entry path (the DataFrame twin is
    * `q1_agg`): the pricing summary with all EIGHT aggregate columns —
    * three tiered cents sums (base, discounted, charged = disc×(1+tax)),
    * the quantity sum, three averages, and the row count — in ONE
    * grouped aggregate over a date-filtered scan. The averages divide
    * exact integer sums in identical double expressions (a bare `avg()`
    * over doubles is partition-order-dependent in its low bits). This is
    * THE canonical columnar-engine benchmark query: 6 groups out of
    * millions of rows, pure map-side-combine, the scan dominates. */
  def q1Pricing(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT l_returnflag, l_linestatus,
             sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_base_cents,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS sum_disc_cents,
             sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT))
               AS sum_charge_cents,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               / count(*) / 100 AS avg_price,
             CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
               / count(*) / 100 AS avg_disc,
             count(*) AS count_order
      FROM graft_lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      GROUP BY l_returnflag, l_linestatus
      """)
  }

  /** TPC-H Q6 shape (forecast revenue change): the degenerate-but-vital
    * plan — a GLOBAL scalar aggregate over one tightly filtered scan, no
    * join, no grouping. What is under test is the scan: all three
    * predicates (date range, discount band, quantity cap) must reach the
    * parquet reader as pushed filters so a 100 TB scan prunes row groups
    * instead of materializing rows (min/max stats kill whole files on
    * the date range). Revenue rounds extendedprice×discount to cents
    * PER ROW then sums exact integers. */
  def q6ForecastRevenue(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT count(*) AS n,
             sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
               AS revenue_cents
      FROM graft_lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
        AND l_discount >= CAST(0.05 AS DOUBLE)
        AND l_discount <= CAST(0.07 AS DOUBLE)
        AND l_quantity < 24
      """)
  }

  /** TPC-H Q8 shape (national market share): conditional aggregation as
    * a SHARE — `sum(CASE WHEN supplier is ours THEN rev END) / sum(rev)`
    * per order year. Both sums ride ONE aggregate over the 3-way join
    * (no second pass, no self-join): the CASE is a projection, so at
    * 100 TB this costs exactly one join tree + one grouped aggregate.
    * The share itself divides the two exact cents totals in an
    * identical double expression on both engines. */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             sum(CASE WHEN s.s_nationkey = 7
                      THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                      ELSE 0 END) AS nation_cents,
             sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
               AS total_cents,
             CAST(sum(CASE WHEN s.s_nationkey = 7
                      THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                      ELSE 0 END) AS DOUBLE) /
             CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                  AS DOUBLE) AS mkt_share
      FROM graft_lineitem l
      JOIN graft_orders o ON o.o_orderkey = l.l_orderkey
      JOIN graft_supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY year(o.o_orderdate)
      """)
  }

  /** TPC-H Q10 shape (returned-item reporting): the classic 3-table
    * fact-to-dimension rollup — customers ranked by revenue lost to
    * returns in a quarter. Group keys carry the customer attributes
    * (key, name, nation) through the aggregate — the wide-group-key
    * pattern whose 100 TB answer is "aggregate on c_custkey, then
    * broadcast-join the attributes back" and Spark's aggregate pushdown
    * does the equivalent by treating the functionally-dependent columns
    * as part of the key. */
  def q10ReturnedItems(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT c.c_custkey, c.c_name, c.c_nationkey,
             count(*) AS n_items,
             sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
               AS revenue_cents
      FROM graft_customer c
      JOIN graft_orders o ON o.o_custkey = c.c_custkey
      JOIN graft_lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      GROUP BY c.c_custkey, c.c_name, c.c_nationkey
      """)
  }

  /** TPC-H Q12 shape (shipping-priority audit): CASE-counting two
    * priority classes inside one aggregate over a join with a DERIVED
    * row predicate (late = shipped >90 days after ordering; the fixture
    * has no commit/receipt dates, so the shipdate-vs-orderdate gap
    * stands in — same cross-table comparison shape). The IN/NOT-IN
    * literal lists are complementary, so high+low = group size, a
    * conservation the oracle hash implicitly pins. */
  def q12ShipPriority(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT l.l_returnflag,
             sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS high_line_count,
             sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS low_line_count
      FROM graft_lineitem l
      JOIN graft_orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL '90' DAY
      GROUP BY l.l_returnflag
      """)
  }

  /** TPC-H Q14 shape (promotion effect): monthly share of revenue from
    * promo-typed parts — the LIKE-predicated conditional share, month
    * grain. Same one-aggregate discipline as Q8; the prefix LIKE rides
    * the broadcast part dimension. */
  def q14PromoEffect(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT date_trunc('month', l.l_shipdate) AS month,
             sum(CASE WHEN p.p_type LIKE 'PROMO%'
                      THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                      ELSE 0 END) AS promo_cents,
             sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
               AS total_cents
      FROM graft_lineitem l
      JOIN graft_part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY date_trunc('month', l.l_shipdate)
      """)
  }

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicates): an OR
    * of three conjunctive clauses that each mix part-side and
    * lineitem-side predicates — the query that separates planners with
    * CNF extraction from those without. The common join key equality
    * must still plan as a hash join (NOT a nested loop over the OR),
    * with the per-side common factors (brand/size on part, quantity on
    * lineitem) extracted and pushed below the join; PlanShapeSpec pins
    * the no-nested-loop shape. */
  def q19DiscountedRevenue(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT count(*) AS n,
             sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
               AS revenue_cents
      FROM graft_lineitem l
      JOIN graft_part p ON p.p_partkey = l.l_partkey
      WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
             AND l.l_quantity >= 1 AND l.l_quantity <= 21)
         OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
             AND l.l_quantity >= 10 AND l.l_quantity <= 30)
         OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
             AND l.l_quantity >= 20 AND l.l_quantity <= 40)
      """)
  }

  /** Ordered-set aggregates (`WITHIN GROUP`, SQL:2003): grouped
    * `percentile_disc` — the smallest value whose cumulative
    * distribution reaches p, an ACTUAL data value both engines pick
    * identically — plus one `percentile_cont` midpoint. Exact-cents
    * discipline: disc percentiles are BIGINT cents end-to-end; the cont
    * interpolation runs on integer-valued doubles, whose midpoints are
    * exactly representable, so the double compare is still bitwise.
    *
    * MEMORY MODEL (round-14 doc fix): Spark's ordered-set aggregates are
    * BUFFERING — each percentile_disc/cont accumulates EVERY group value
    * in its aggregation buffer and sorts at eval, so per-task memory is
    * O(rows/group). Fine here (3 return flags × bench-SF rows), and the
    * one-hash-aggregate plan avoids `agg_percentile`'s global rank
    * window — but at 100 TB with ~33 B rows per flag the buffer is the
    * job. For unbounded groups the scale-safe exact shape is
    * `agg_percentile_exact`'s DistRank (distributed order statistics —
    * no task ever buffers a group), and the cheap approximate shape is
    * `agg_approx_percentile`'s sketch. This key exists for the SQL:2003
    * WITHIN GROUP surface, not as the large-group plan. */
  def percentileDisc(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT l_returnflag,
             CAST(percentile_disc(0.25) WITHIN GROUP
               (ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS p25_cents,
             CAST(percentile_disc(0.5) WITHIN GROUP
               (ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS p50_cents,
             CAST(percentile_disc(0.9) WITHIN GROUP
               (ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS p90_cents,
             percentile_cont(0.5) WITHIN GROUP
               (ORDER BY CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DOUBLE)) AS p50_cont
      FROM graft_lineitem
      GROUP BY l_returnflag
    """)
  }

  /** SQL pipe syntax (Spark 4's `|>` operators — SPIP in Spark 4.0,
    * the composable FROM-first form): the same filter → derive →
    * aggregate pipeline a DataFrame user writes, expressed in pure SQL
    * through the `spark.sql` entry path. Semantically identical to the
    * ANSI form (the parser desugars each `|>` stage onto the same
    * logical plan — same pushdown, same codegen), so the DuckDB oracle
    * is just the desugared query; the value is API-surface parity for
    * SQL-first users. Exact-cents revenue; per-flag aggregate. */
  def pipeSyntax(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      FROM graft_lineitem
      |> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |> EXTEND CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
           AS disc_cents
      |> AGGREGATE count(*) AS n_items, sum(disc_cents) AS revenue_cents
           GROUP BY l_returnflag
      |> SELECT l_returnflag, n_items, revenue_cents
    """)
  }

  /** Correlated LATERAL subquery (the SQL:1999 form of "top-N per
    * group"): for each nation row, the lateral derived table re-ranks
    * that nation's suppliers and keeps two — the correlated
    * row_number + LIMIT shape Catalyst must DECORRELATE into a
    * partitioned window + filter (DecorrelateInnerQuery; running it
    * row-at-a-time would be O(|nation|·|supplier|)). Deterministic
    * tiebreak on (acctbal DESC, suppkey ASC) in exact cents. The same
    * query a DataFrame user writes as row_number().over(partitionBy)
    * ≤ 2 — this is the SQL-entry parity check that the lateral route
    * lands on the same plan family. */
  def lateralTopPerGroup(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      SELECT n.n_name AS nation, t.s_name,
             CAST(t.rk AS BIGINT) AS rk, t.bal_cents
      FROM graft_nation n
      JOIN LATERAL (
        SELECT s.s_name,
               row_number() OVER (ORDER BY s.s_acctbal DESC, s.s_suppkey ASC)
                 AS rk,
               CAST(round(s.s_acctbal * 100) AS BIGINT) AS bal_cents
        FROM graft_supplier s
        WHERE s.s_nationkey = n.n_nationkey
        ORDER BY s.s_acctbal DESC, s.s_suppkey ASC
        LIMIT 2
      ) t
    """)
  }

  /** Join-strategy hints — the knob a user reaches for when stats
    * mislead the planner at 100 TB (a filtered-but-unanalyzed build side
    * the optimizer sizes wrong, a skewed key set where broadcast beats
    * shuffle). The SAME orders ⋈ lineitem aggregate runs under BROADCAST,
    * MERGE, and SHUFFLE_HASH hints; the three strategy rows must carry
    * IDENTICAL numbers (join strategy is an execution choice, never a
    * semantics choice — THE invariant this query hash-checks), and
    * PlanShapeSpec pins that the three hints really produced three
    * different physical join operators rather than being ignored. */
  def joinHints(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    def branch(hint: String, label: String) = s"""
      SELECT '$label' AS strategy, count(*) AS n,
             sum(disc_cents) AS revenue_cents
      FROM (SELECT /*+ $hint(o) */
              CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)
                AS disc_cents
            FROM graft_orders o JOIN graft_lineitem l
              ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderpriority = '1-URGENT') t"""
    s.sql(Seq(branch("BROADCAST", "broadcast"),
              branch("MERGE", "merge"),
              branch("SHUFFLE_HASH", "shuffle_hash")).mkString("\nUNION ALL\n"))
  }

  /** SQL-defined scalar functions (`CREATE FUNCTION ... RETURN expr`,
    * new in Spark 4 — SQL UDFs): the portable way to package the
    * exact-cents discipline as a named function instead of repeating the
    * cast chain in every query. Definition is session-scoped DDL through
    * the same `spark.sql` entry; the body INLINES into the calling plan
    * (it is resolved at analysis time, so codegen/pushdown see the raw
    * expression — zero call overhead, unlike an external UDF), which
    * PlanShapeSpec pins by asserting the plan contains no UDF eval node.
    * The oracle replays the body inline — identical by construction. */
  def sqlUdf(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_cents(p DOUBLE, d DOUBLE)
      RETURNS BIGINT
      RETURN CAST(round(p * (1.0 - d) * 100) AS BIGINT)""")
    s.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION graft_band(q DOUBLE)
      RETURNS STRING
      RETURN CASE WHEN q < 10 THEN 'small' WHEN q < 30 THEN 'mid' ELSE 'large' END""")
    s.sql("""
      SELECT l_returnflag, graft_band(l_quantity) AS band,
             count(*) AS n,
             sum(graft_disc_cents(l_extendedprice, l_discount)) AS revenue_cents
      FROM graft_lineitem
      GROUP BY l_returnflag, graft_band(l_quantity)
    """)
  }

  /** Parameterized SQL (named parameter markers, Spark 3.4+): the
    * injection-safe templating surface every SQL-first service layer
    * needs — `:name` markers bound through the `spark.sql(text, args)`
    * API, never string-spliced. Binding happens at parse time, so the
    * bound literal constant-folds and pushes into the scan exactly like
    * a hand-written literal (date range reaches PushedFilters — the plan
    * is indistinguishable from the literal form). */
  def sqlParameterized(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(
      """
      SELECT l_returnflag, count(*) AS n,
             sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
               AS revenue_cents
      FROM graft_lineitem
      WHERE l_shipdate >= :lo AND l_shipdate < :hi AND l_quantity >= :minq
      GROUP BY l_returnflag""",
      Map("lo" -> graft.core.Utc.ts("1996-01-01 00:00:00"),
          "hi" -> graft.core.Utc.ts("1998-01-01 00:00:00"),
          "minq" -> Int.box(5)))
  }

  /** One extensions-configured session per SparkContext (the memo twin of
    * a cluster's spark.sql.extensions static conf, which is read once at
    * first-session creation): reuses the JVM's context, restores the
    * caller's active/default session, and is what every pure-SQL query
    * below runs on. Retention is bounded by the number of SparkContexts
    * (one per JVM in practice) — unlike a per-session memo, this cannot
    * grow with session churn. */
  private val extMemo =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, SparkSession]()
  private def extSession(s: SparkSession): SparkSession =
    extMemo.computeIfAbsent(s.sparkContext, _ => {
      val prevActive = SparkSession.getActiveSession
      val prevDefault = SparkSession.getDefaultSession
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      try SparkSession.builder()
        .master(s.sparkContext.master)
        .withExtensions(new graft.GraftExtensions())
        .getOrCreate()
      finally {
        prevDefault.foreach(SparkSession.setDefaultSession)
        prevActive.foreach(SparkSession.setActiveSession)
      }
    })

  /** The pure-SQL route through [[graft.GraftExtensions]] end-to-end
    * (SURVEY §2.3 custom-operator distribution path): an
    * extensions-configured session resolves the engine's codegen
    * expressions — `winnow_fingerprints`, `simhash64` — from SQL text
    * with no programmatic register() call, and the winnowing output is
    * hash-checked against the same DuckDB replay as text_winnow (a real
    * oracle, not a smoke flag). simhash64 has no SQL-replayable oracle
    * (xxhash64 bit patterns), so the SQL-route value is compared against
    * the DataFrame-route expression per doc and the agreement flag is
    * oracle-asserted constant-true. */
  def extWinnow(s: SparkSession, d: String): DataFrame = {
    val s2 = extSession(s)
    import s2.implicits._
    Tables.documents(s2, d).createOrReplaceTempView("graft_documents_ext")
    // the winnow side: SQL-resolved codegen expression, exploded per fp
    val winnow = s2.sql("""
      SELECT doc_id, explode(winnow_fingerprints(lower(text), 8, 4)) AS fp
      FROM graft_documents_ext""")
    // the simhash parity side, collapsed to ONE scalar before touching the
    // winnow output — joining it per-row would drag the fingerprint arrays
    // through the join (measured ~2× the query)
    val sqlSh = s2.sql("""
      SELECT doc_id,
             simhash64(transform(array_distinct(split(lower(text), ' ')),
                                 t -> xxhash64(t))) AS sh_sql
      FROM graft_documents_ext""")
    val dfSh = Tables.documents(s2, d)
      .select($"doc_id", Dedup.simhash($"text").as("sh_df"))
    val parity = sqlSh.join(dfSh, "doc_id")
      .agg(min(($"sh_sql" === $"sh_df").cast("long")).as("simhash_sql_eq"))
    winnow.crossJoin(parity) // 1-row scalar
  }

  /** Recursive CTE (`WITH RECURSIVE`, new in Spark 4 — SPARK-24497): the
    * hierarchy walk every org-chart / category-tree / BOM query needs and
    * the one SQL shape plain self-joins can't express when depth is
    * data-dependent. The hierarchy is STAGED from persisted fields (the
    * staged-fixture pattern): supplier k's parent is `k div 10`, giving a
    * forest rooted at keys 0–9 whose depth grows with log₁₀(|supplier|) —
    * genuinely data-dependent recursion, identical in both engines
    * (truncating vs flooring division agree on the non-negative keys).
    * Each supplier walks to its root, aggregating ancestor count, root
    * id, and the exact-cents account-balance rollup along the chain.
    * Spark executes this as a UnionLoop with one anchor pass + one
    * incremental pass per level — iteration state is the frontier, not
    * the accumulated result, so a 100 TB hierarchy iterates in
    * O(depth) joins each ∝ |frontier|. */
  def sqlRecursive(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql("""
      WITH RECURSIVE chain AS (
        SELECT s_suppkey AS id, s_suppkey AS anc FROM graft_supplier
        UNION ALL
        SELECT id, anc div 10 AS anc FROM chain WHERE anc >= 10
      )
      SELECT c.id, count(*) AS n_anc, min(c.anc) AS root,
             sum(CAST(round(s.s_acctbal * 100) AS BIGINT)) AS chain_cents
      FROM chain c JOIN graft_supplier s ON c.anc = s.s_suppkey
      GROUP BY c.id
    """)
  }

  val oracle: Map[String, String] = Map(
    // the three strategy rows must be IDENTICAL numbers — join strategy
    // is an execution choice; the oracle replays the join once per label
    "sql_join_hints" -> """
      WITH j AS (
        SELECT CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)
                 AS disc_cents
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderpriority = '1-URGENT')
      SELECT s.strategy, (SELECT count(*) FROM j) AS n,
             (SELECT CAST(sum(disc_cents) AS BIGINT) FROM j) AS revenue_cents
      FROM (VALUES ('broadcast'), ('merge'), ('shuffle_hash')) s(strategy)""",

    "sql_udf" -> """
      SELECT l_returnflag,
             CASE WHEN l_quantity < 10 THEN 'small'
                  WHEN l_quantity < 30 THEN 'mid' ELSE 'large' END AS band,
             count(*) AS n,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
                  AS BIGINT) AS revenue_cents
      FROM lineitem
      GROUP BY 1, 2""",

    "sql_parameterized" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT))
                  AS BIGINT) AS revenue_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND l_quantity >= 5
      GROUP BY l_returnflag""",

    "sql_percentile_disc" -> """
      SELECT l_returnflag,
             CAST(percentile_disc(0.25) WITHIN GROUP
               (ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS p25_cents,
             CAST(percentile_disc(0.5) WITHIN GROUP
               (ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS p50_cents,
             CAST(percentile_disc(0.9) WITHIN GROUP
               (ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS p90_cents,
             percentile_cont(0.5) WITHIN GROUP
               (ORDER BY CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS DOUBLE)) AS p50_cont
      FROM lineitem
      GROUP BY l_returnflag""",

    "sql_q4_order_priority" -> """
      SELECT o.o_orderpriority AS priority, count(*) AS order_count
      FROM orders o
      WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      GROUP BY o.o_orderpriority""",

    "sql_q21_waiting" -> """
      SELECT s.s_name, count(*) AS numwait
      FROM supplier s
      JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      JOIN orders o    ON o.o_orderkey = l1.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l1.l_shipdate >= TIMESTAMP '1999-01-01'
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate >= TIMESTAMP '1999-01-01')
      GROUP BY s.s_name""",

    "sql_q22_global_sales" -> """
      SELECT c.c_nationkey AS nationkey, count(*) AS numcust,
             CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS totacctbal_cents
      FROM customer c
      WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) *
            (SELECT count(*) FROM customer WHERE c_acctbal > 0.0) >
            (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT))
             FROM customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
      GROUP BY c.c_nationkey""",

    "sql_q16_supplier_cnt" -> """
      SELECT p.p_brand AS brand, p.p_type AS type,
             count(DISTINCT l.l_suppkey) AS supplier_cnt
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      WHERE p.p_brand <> 'Brand#1'
        AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 1500)
      GROUP BY p.p_brand, p.p_type""",

    "sql_q13_count_grouping" -> """
      SELECT c_count, count(*) AS custdist
      FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
      ) t
      GROUP BY c_count""",

    "sql_q1_pricing" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_base_cents,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                  AS BIGINT) AS sum_disc_cents,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
                           AS BIGINT)) AS BIGINT) AS sum_charge_cents,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
               / count(*) / 100 AS avg_price,
             CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
               / count(*) / 100 AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      GROUP BY l_returnflag, l_linestatus""",

    "sql_q6_forecast" -> """
      SELECT count(*) AS n,
             CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
        AND l_discount >= CAST(0.05 AS DOUBLE)
        AND l_discount <= CAST(0.07 AS DOUBLE)
        AND l_quantity < 24""",

    "sql_q8_market_share" -> """
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(sum(CASE WHEN s.s_nationkey = 7
                      THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS nation_cents,
             CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                  AS BIGINT) AS total_cents,
             CAST(sum(CASE WHEN s.s_nationkey = 7
                      THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                      ELSE 0 END) AS DOUBLE) /
             CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                  AS DOUBLE) AS mkt_share
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY year(o.o_orderdate)""",

    "sql_q10_returned_items" -> """
      SELECT c.c_custkey, c.c_name, c.c_nationkey,
             count(*) AS n_items,
             CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                  AS BIGINT) AS revenue_cents
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      GROUP BY c.c_custkey, c.c_name, c.c_nationkey""",

    "sql_q12_ship_priority" -> """
      SELECT l.l_returnflag,
             CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      GROUP BY l.l_returnflag""",

    "sql_q14_promo_effect" -> """
      SELECT CAST(date_trunc('month', l.l_shipdate) AS TIMESTAMP) AS month,
             CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                      THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS promo_cents,
             CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                  AS BIGINT) AS total_cents
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY date_trunc('month', l.l_shipdate)""",

    "sql_q19_discounted_revenue" -> """
      SELECT count(*) AS n,
             CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                  AS BIGINT) AS revenue_cents
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
             AND l.l_quantity >= 1 AND l.l_quantity <= 21)
         OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
             AND l.l_quantity >= 10 AND l.l_quantity <= 30)
         OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
             AND l.l_quantity >= 20 AND l.l_quantity <= 40)""",

    "sql_q17_small_qty" -> """
      SELECT p.p_brand AS brand,
             count(*) AS n_small,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_quantity < CAST(0.2 AS DOUBLE) * (
          SELECT avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey)
      GROUP BY p.p_brand""",

    "sql_q2_min_cost" -> """
      SELECT s.s_nationkey AS nationkey,
             count(*) AS n_min_offers,
             count(DISTINCT p.p_partkey) AS n_parts
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE p.p_size >= 40
        AND l.l_extendedprice = (
          SELECT min(l2.l_extendedprice) FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey)
      GROUP BY s.s_nationkey""",

    "sql_q15_top_supplier" -> """
      WITH revenue AS (
        SELECT l_suppkey,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s.s_suppkey AS suppkey, s.s_name AS name, r.total_cents
      FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
      WHERE r.total_cents = (SELECT max(total_cents) FROM revenue)""",

    "sql_q11_important_value" -> """
      WITH sup AS (
        SELECT l_suppkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS value_cents
        FROM lineitem GROUP BY l_suppkey)
      SELECT l_suppkey AS suppkey, value_cents
      FROM sup
      WHERE value_cents * (SELECT count(*) FROM sup) * 100 >
            (SELECT CAST(sum(value_cents) AS BIGINT) FROM sup) * 105""",

    "sql_recursive" -> """
      WITH RECURSIVE chain AS (
        SELECT s_suppkey AS id, s_suppkey AS anc FROM supplier
        UNION ALL
        SELECT id, anc // 10 AS anc FROM chain WHERE anc >= 10
      )
      SELECT c.id, count(*) AS n_anc, min(c.anc) AS root,
             CAST(sum(CAST(round(s.s_acctbal * 100) AS BIGINT)) AS BIGINT) AS chain_cents
      FROM chain c JOIN supplier s ON c.anc = s.s_suppkey
      GROUP BY c.id""",

    // derived from the text_winnow oracle (single source of truth for the
    // winnowing replay) plus the SQL-route parity flag
    "sql_ext_winnow" -> s"""
      SELECT doc_id, fp, CAST(1 AS BIGINT) AS simhash_sql_eq
      FROM (${TextAnalysis.oracle("text_winnow")}) t""",

    "sql_lateral" -> """
      SELECT n.n_name AS nation, t.s_name,
             CAST(t.rk AS BIGINT) AS rk, t.bal_cents
      FROM nation n
      JOIN LATERAL (
        SELECT s.s_name,
               row_number() OVER (ORDER BY s.s_acctbal DESC, s.s_suppkey ASC)
                 AS rk,
               CAST(round(s.s_acctbal * 100) AS BIGINT) AS bal_cents
        FROM supplier s
        WHERE s.s_nationkey = n.n_nationkey
        ORDER BY s.s_acctbal DESC, s.s_suppkey ASC
        LIMIT 2
      ) t ON true""",

    "sql_q20_nested" -> """
      SELECT s.s_name, n.n_name AS nation
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE s.s_suppkey IN (
        SELECT l.l_suppkey FROM lineitem l
        WHERE l.l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
        GROUP BY l.l_suppkey
        HAVING sum(CAST(l.l_quantity AS BIGINT)) *
               (SELECT count(DISTINCT l_suppkey) FROM lineitem
                WHERE l_partkey IN (
                  SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')) >
               (SELECT sum(CAST(l_quantity AS BIGINT)) FROM lineitem
                WHERE l_partkey IN (
                  SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')))""",

    "sql_pipe" -> """
      SELECT l_returnflag, count(*) AS n_items,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      GROUP BY l_returnflag""",

    "sql_q7_volume" -> """
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
               / 100.0 AS revenue
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_2')
      GROUP BY n1.n_name, n2.n_name, year(o.o_orderdate)""",

    "sql_q18_large_orders" -> """
      SELECT c.c_name, o.o_orderkey AS orderkey, o.o_totalprice AS totalprice,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS BIGINT)) > 280)
      GROUP BY c.c_name, o.o_orderkey, o.o_totalprice""",

    "sql_q5_local" -> """
      SELECT n.n_name AS nation,
             sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
               / 100.0 AS revenue
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
                    AND c.c_nationkey = s.s_nationkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY n.n_name""",

    "sql_q9_profit" -> """
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
               / 100.0 AS profit
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      WHERE p.p_name LIKE '%red%'
      GROUP BY n.n_name, year(o.o_orderdate)""",

    "sql_q3_shipping" -> """
      SELECT l.l_orderkey AS orderkey,
             sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))
               / 100.0 AS revenue,
             o.o_orderdate AS orderdate
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
        AND l.l_shipdate  > TIMESTAMP '1996-01-01'
      GROUP BY l.l_orderkey, o.o_orderdate
      ORDER BY revenue DESC, orderkey ASC
      LIMIT 10"""
  )
}
