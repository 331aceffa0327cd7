package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Exact, Tables}

/** Relational operator surface (SURVEY.md §2.3 B–I) as a declared query
  * corpus. Every query here is paired with ANSI SQL in [[oracles]] that
  * DuckDB runs over the same parquet tables (driver correctness gate).
  *
  * Design rules (100 TB-scale):
  *  - stay in the DataFrame algebra so Catalyst pushes filters/pruning into
  *    the parquet scan and AQE re-plans shuffles at runtime;
  *  - dimension joins (`region`, `nation`, price bands, `customer` at small
  *    SF) carry an explicit `broadcast()` hint — at 1000 executors these
  *    stay map-side joins with zero shuffle of the fact table;
  *  - aggregates over money columns use exact integer cents
  *    ([[graft.core.Exact]]) so results are order-independent — required
  *    both for oracle parity and for deterministic re-execution when AQE
  *    changes partitioning;
  *  - every output is a deterministic *set* (no arbitrary-survivor rows,
  *    `limit` only after a total order with a unique tiebreak).
  *
  * MR lineage: joins = reference map-side tagging + reduce-side merge
  * (/root/reference/cmd/azure/azure_util.go:234-246 hash shuffle +
  * cmd/worker/mr_worker.go:202 sort); aggregation = sorted-stream reduce
  * (client/scripts/reducer.py:14-27). Spark's two-phase hash agg strictly
  * dominates the reference's combiner-less shuffle.
  */
object Relational {
  import Exact._

  // ---------------------------------------------------------------- C. projection / selection

  /** select / withColumn arithmetic; per-row double ops are bitwise
    * reproducible across engines (same IEEE ops, same order). */
  def projSelect(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_discount", $"l_tax")
      .withColumn("revenue", $"l_extendedprice" * (lit(1.0) - $"l_discount"))
      .withColumn("charge", $"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))
      .select($"l_orderkey", $"l_linenumber", $"revenue", $"charge")
  }

  /** Conjunctive/disjunctive predicates, isin, between, null-safe equality,
    * like/rlike. All pushable; `PushedFilters` carries the conjuncts into
    * the parquet reader. */
  def filterPred(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .filter(
        ($"o_orderstatus" === "F" || $"o_totalprice" > 200000.0) &&
        $"o_orderpriority".isin("1-URGENT", "2-HIGH", "3-MEDIUM") &&
        $"o_orderdate".between(lit("1995-01-01").cast("timestamp"), lit("1999-12-31").cast("timestamp")) &&
        (($"o_custkey" % 10) <=> lit(3L)) &&
        $"o_orderpriority".like("%-%") &&
        $"o_orderstatus".rlike("^[FOP]$"))
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice", $"o_orderpriority")
  }

  // ---------------------------------------------------------------- D. joins

  /** Star join: fact `orders` against broadcast dims. At scale: customer →
    * nation → region stay broadcast; only the pre-aggregation of orders
    * shuffles (partial agg map-side first). */
  def joinInnerBcast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d).select($"c_custkey", $"c_nationkey")
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    o.join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_orders"), sumMoney($"o_totalprice").as("total_rev"))
  }

  /** Left outer join keeping customers with zero orders. */
  def joinLeft(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey", $"c_name")
      .agg(count($"o_orderkey").as("n_orders"),
           coalesce(sumMoney($"o_totalprice"), lit(0.0)).as("spend"))
  }

  /** Right outer join — the remaining §2.3 D direction: the fact table on
    * the LEFT, the dimension on the RIGHT, keeping dimension rows with no
    * facts (parts never sold aggregate to zero). Catalyst mirrors it into
    * the same physical join as the left-outer case; what's exercised is
    * the API direction and the null-producing stream side. */
  def joinRight(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val l = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    l.join(p, $"l_partkey" === $"p_partkey", "right")
      .groupBy($"p_partkey", $"p_name")
      .agg(count($"l_orderkey").as("n_lines"),
           coalesce(sumMoney($"l_quantity"), lit(0.0)).as("qty_sold"))
  }

  /** Full outer join of two aggregated sides (per-nation customer count vs
    * supplier count) — exercises null-producing both sides. */
  def joinFull(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d).groupBy($"c_nationkey".as("ck")).agg(count(lit(1)).as("n_cust"))
    val su = Tables.supplier(s, d).groupBy($"s_nationkey".as("sk")).agg(count(lit(1)).as("n_supp"))
    c.join(su, $"ck" === $"sk", "full")
      .select(coalesce($"ck", $"sk").as("nationkey"),
              coalesce($"n_cust", lit(0L)).as("n_cust"),
              coalesce($"n_supp", lit(0L)).as("n_supp"))
  }

  /** Left-semi: customers having at least one high-value order (EXISTS). */
  def joinSemi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val big = Tables.orders(s, d).filter($"o_totalprice" > 300000.0).select($"o_custkey")
    c.join(big, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
  }

  /** Left-anti: customers with no orders at all (NOT EXISTS). */
  def joinAnti(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select($"o_custkey")
    c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
  }

  /** Cross join of two tiny dims (guarded: both sides bounded). */
  def joinCross(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val r = Tables.region(s, d).select($"r_name")
    val st = Tables.orders(s, d).select($"o_orderstatus").distinct()
    r.crossJoin(st)
  }

  /** Theta/range join: parts matched to price bands derived from region —
    * a broadcast nested-loop join, the right physical choice when one side
    * is tiny and the predicate is an interval. */
  def joinRange(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = Tables.region(s, d)
      .select($"r_regionkey".as("band_id"),
              ($"r_regionkey" * 500.0).as("lo"),
              (($"r_regionkey" + 1) * 500.0).as("hi"))
    val p = Tables.part(s, d)
    p.join(broadcast(bands), $"p_retailprice" >= $"lo" && $"p_retailprice" < $"hi")
      .groupBy($"band_id")
      .agg(count(lit(1)).as("n_parts"), sumMoney($"p_retailprice").as("band_value"))
  }

  /** As-of join (each click ↔ the same user's most recent signup at or
    * before it) — an operator Spark has no native form for, composed from
    * existing ops per the preference ladder: tag both sides, union, one
    * window pass per user carrying the last-seen signup forward. ONE
    * shuffle on user_id and state linear in the row count — vs the
    * range-join formulation whose per-user cross product explodes on hot
    * users. Ties (signup at the click's exact ts) match, so signups sort
    * before clicks at equal ts; both sides are deduped to one row per
    * (user, ts) with the max id, making the as-of winner unique. Inner
    * semantics: clicks with no prior signup are dropped. Oracle: DuckDB's
    * native ASOF JOIN. */
  def joinAsof(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // ONE scan (both event kinds in a single pushed-down filter) and ONE
    // shuffle: the round-3 tie-dedup ran a groupBy(user_id, ts) per side —
    // two extra exchanges — before the window. Both dedups now ride the
    // same windowed pass: ordering by (ts, kind, event_id) makes the
    // running `last` signup pick the max event_id at the latest ts ≤ click
    // ts for free, and a `lead` over the identical partition+order drops
    // every click that is followed by another click at the same (user, ts)
    // — keeping exactly the max-event_id click. Same window spec → the
    // planner stacks both window ops on one Exchange(user_id) + sort.
    val tagged = Tables.events(s, d)
      .where($"event_type".isin("click", "signup"))
      .select($"user_id", $"ts",
        when($"event_type" === "signup", 0).otherwise(1).as("kind"),
        $"event_id")
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"kind".asc, $"event_id".asc)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_signup",
        last(when($"kind" === 0, $"event_id"), ignoreNulls = true).over(running))
      .withColumn("nxt_ts", lead($"ts", 1).over(w))
      .withColumn("nxt_kind", lead($"kind", 1).over(w))
      .where($"kind" === 1 && $"asof_signup".isNotNull &&
        ($"nxt_ts".isNull || $"nxt_ts" =!= $"ts" || $"nxt_kind" =!= $"kind"))
      .select($"user_id", $"event_id".as("click_id"), $"asof_signup".as("signup_id"))
  }

  /** FORWARD as-of join (pandas `merge_asof(direction='forward')`) —
    * each click ↔ the same user's NEAREST purchase at or after it: the
    * next-touch question ("did this click convert, and to which
    * purchase?") that the backward as-of cannot answer. Same ONE-scan
    * ONE-exchange window shape as [[joinAsof]], time-reversed: the
    * per-user traversal runs ts DESC with purchases (kind 0) before
    * clicks at equal ts, so a running `last` carries the nearest
    * FOLLOWING purchase — equal-ts purchases match (c.ts ≤ p.ts), and
    * the max-event_id dedup per (user, ts) rides the same sort exactly
    * as in joinAsof. Inner semantics: clicks with no later purchase
    * drop. Oracle: DuckDB's native forward ASOF JOIN (ON c.ts ≤ p.ts),
    * so the reversed-window rewrite is checked against the definition. */
  def joinAsofForward(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tagged = Tables.events(s, d)
      .where($"event_type".isin("click", "purchase"))
      .select($"user_id", $"ts",
        when($"event_type" === "purchase", 0).otherwise(1).as("kind"),
        $"event_id")
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".desc, $"kind".asc, $"event_id".asc)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("next_purchase",
        last(when($"kind" === 0, $"event_id"), ignoreNulls = true).over(running))
      .withColumn("nxt_ts", lead($"ts", 1).over(w))
      .withColumn("nxt_kind", lead($"kind", 1).over(w))
      .where($"kind" === 1 && $"next_purchase".isNotNull &&
        ($"nxt_ts".isNull || $"nxt_ts" =!= $"ts" || $"nxt_kind" =!= $"kind"))
      .select($"user_id", $"event_id".as("click_id"),
        $"next_purchase".as("purchase_id"))
  }

  /** Bloom-filter semi-join reduction (SURVEY §2.3 D — the classic
    * distributed-DB sideways information passing move, cf. Bloom 1970;
    * LIP in Redshift/Impala; Spark's own runtime row-level filtering):
    * per-supplier revenue for ONE nation's suppliers, in the regime
    * where the dim side is too big to broadcast as a hash table. A
    * Bloom filter over the dim KEYS is built distributed
    * (`stat.bloomFilter` — fixed-size bitmap however many rows feed
    * it), broadcast (~a few hundred KB), and applied to the fact side
    * BEFORE its exchange via the codegen'd
    * [[graft.functions.BloomMightContain]] predicate — so the shuffle
    * moves ~4 % of lineitem (this nation's rows + the 1 % FP mass)
    * instead of 100 %. The exact sort-merge join afterwards removes
    * false positives: the reduction is semantically invisible, which is
    * exactly why the oracle can state the query as the PLAIN join.
    * `hint("shuffle_merge")` pins the no-broadcast regime at test SF
    * (Catalyst would rightly broadcast a 10-row dim; at 100 TB with a
    * fact-sized dim it could not). Driver traffic is bounded: one
    * footer-stat scalar ([[Tables.rowStat]] — metadata, no job) + one
    * fixed-size bitmap. Plan pin (PlanShapeSpec): the
    * bloom predicate filters below the fact-side exchange; law
    * (NewOpsLawSpec): bloom pass-rate ≪ 1 yet result ≡ unfiltered join. */
  def joinBloom(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // two consumers (bloom build, join probe) — checkpoint or Catalyst
    // re-runs the dim scan per reference
    val dim = Tables.supplier(s, d).where($"s_nationkey".isin(3, 9))
      .select($"s_suppkey", $"s_name").localCheckpoint()
    // size the bitmap from TABLE STATS (parquet footer row counts — the
    // ANALYZE-style catalog number, a driver metadata read), not a
    // dim-side count() job: the unfiltered cardinality over-sizes the
    // bitmap by 1/selectivity (~12× here), which only LOWERS the FP
    // rate — bits are cheap, an extra job in the DAG is not
    val nKeys = math.max(Tables.rowStat(s, d, "supplier"), 64L)
    val bf = dim.stat.bloomFilter("s_suppkey", nKeys, 0.01)
    val bc = s.sparkContext.broadcast(bf)
    val fact = Tables.lineitem(s, d)
      .select($"l_suppkey", cents($"l_extendedprice").as("cents"))
      .where(graft.functions.BloomFunctions.mightContain(s, bc, $"l_suppkey"))
    fact.join(dim.hint("shuffle_merge"), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_suppkey", $"s_name")
      .agg(count(lit(1)).as("n_items"), sum($"cents").as("rev_cents"))
  }

  /** As-of join WITH tolerance (pandas `merge_asof(tolerance=...)` /
    * kdb window-join semantics — SURVEY §2.3 D's temporal family): each
    * click matches the LATEST signup at ts ≤ click ts, but only when
    * that signup is within 7 days — an older match is reported as NULL
    * (LEFT as-of, so every click survives; `within_tol` makes both
    * branches hash-checked). Correctness note: nulling the latest match
    * when it is out of tolerance IS the tolerance semantics — any other
    * candidate is older still. Same ONE-scan ONE-shuffle window shape
    * as [[joinAsof]]: the running `last` also carries the signup ts, so
    * the tolerance test is a per-row comparison with no second scan and
    * no extra exchange; at 100 TB this is one user-partitioned window
    * pass, P-way parallel. The oracle states the SPEC through DuckDB's
    * native ASOF LEFT JOIN + tolerance CASE, so the window rewrite is
    * checked against the definition, not itself. */
  def joinAsofTolerance(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tagged = Tables.events(s, d)
      .where($"event_type".isin("click", "signup"))
      .select($"user_id", $"ts",
        when($"event_type" === "signup", 0).otherwise(1).as("kind"),
        $"event_id")
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"kind".asc, $"event_id".asc)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_signup",
        last(when($"kind" === 0, $"event_id"), ignoreNulls = true).over(running))
      .withColumn("asof_ts",
        last(when($"kind" === 0, $"ts"), ignoreNulls = true).over(running))
      .withColumn("nxt_ts", lead($"ts", 1).over(w))
      .withColumn("nxt_kind", lead($"kind", 1).over(w))
      // keep exactly the max-event_id click per (user, ts) — the
      // joinAsof dedup rule — but LEFT: unmatched clicks survive
      .where($"kind" === 1 &&
        ($"nxt_ts".isNull || $"nxt_ts" =!= $"ts" || $"nxt_kind" =!= $"kind"))
      .withColumn("within_tol",
        ($"asof_ts".isNotNull &&
          $"asof_ts" >= $"ts" - expr("INTERVAL 7 DAYS")).cast("bigint"))
      .select($"user_id", $"event_id".as("click_id"),
        when($"within_tol" === 1, $"asof_signup").as("signup_id"),
        $"within_tol")
  }

  /** Skew-mitigated join by explicit key salting: the fact side gets a
    * deterministic salt in [0,S), the dim side is replicated S times, and
    * the join key becomes (key, salt) — a hot key's rows spread over S
    * reducers instead of one. This is the manual fallback for when AQE's
    * skew-join split can't apply (e.g. the join feeds a stateful op that
    * pins partitioning). Join output is salt-invariant, so the oracle is
    * the plain join — correctness of the technique, not just the plumbing,
    * is what's hash-checked. The complementary automatic path — AQE's
    * OptimizeSkewedJoin splitting an EMERGENT fat partition — is pinned
    * in PlanShapeSpec on a planted-skew fixture (skew=true join + >1
    * PartialReducerPartitionSpec reads in the adaptive final plan). */
  def joinSkewSalted(s: SparkSession, d: String, salts: Int = 8): DataFrame = {
    import s.implicits._
    val fact = Tables.lineitem(s, d)
      .withColumn("salt", pmod(hash($"l_orderkey", $"l_linenumber"), lit(salts)))
    val dim = Tables.supplier(s, d)
      .withColumn("salt", explode(sequence(lit(0), lit(salts - 1))))
    fact.join(dim, $"l_suppkey" === $"s_suppkey" && fact("salt") === dim("salt"))
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_items"), sumMoney($"l_extendedprice").as("volume"))
  }

  // ---------------------------------------------------------------- E. aggregation

  /** TPC-H Q1 flavor: two-phase hash agg with partial (map-side) combine —
    * the single most shuffle-efficient plan shape Spark offers. */
  def q1Agg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),                       // integral doubles: exact
        sumMoney($"l_extendedprice").as("sum_base_price"),
        (sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount"))) / 10000.0).as("sum_disc_price"),
        avgMoney($"l_extendedprice").as("avg_price"),
        count(lit(1)).as("count_order"))
  }

  /** min/max/avg/count/count_distinct per group. */
  def aggStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        count_distinct($"o_custkey").as("n_cust"),
        min($"o_totalprice").as("min_price"),
        max($"o_totalprice").as("max_price"),
        avgMoney($"o_totalprice").as("avg_price"))
  }

  /** HLL sketch vs exact, in one pass: the oracle hash-checks the exact
    * count AND a driver-visible error bound on the sketch (round 1 left
    * the sketch rows-only; the 5%-band assertion lived in a local spec
    * the driver never saw). The sketch value itself stays out of the
    * output — HLL register layouts are engine-specific. */
  def aggApprox(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(count_distinct($"l_partkey").as("exact_parts"),
           approx_count_distinct($"l_partkey", 0.02).as("approx"))
      .select($"l_returnflag", $"exact_parts",
        (abs($"approx" - $"exact_parts") <= $"exact_parts" * 0.05)
          .cast("long").as("approx_ok"))
  }

  /** Spark 4's built-in frequent-items sketch (`approx_top_k`,
    * Catalyst's ApproxTopK aggregate) with the family's exact-confirm
    * discipline: the sketch runs over the exploded token stream, and
    * the EMITTED rows are the exact top-10 (exact counts, deterministic
    * tiebreak) carrying two oracle-checked flags — the token appears in
    * the sketch output, and the sketch's count matches within the
    * frequent-items error bound n/maxItemsTracked (capacity 65536 ≫
    * vocabulary, so the sketch is operating in its exact regime and
    * both flags must hold deterministically; a sketch regression fails
    * CORRECTNESS, the agg_cms/agg_approx pattern). At 100 TB the same
    * shape holds — the sketch is one map-side-combinable aggregate and
    * only the k-row profile leaves the executors; the exact-confirm
    * side is the test harness, not the production path. */
  def aggApproxTopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d)
      .select(explode(split(lower($"text"), " ")).as("tok"))
      .where($"tok" =!= "")
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("exact_n"))
    val w = Window.orderBy($"exact_n".desc, $"tok".asc)
    val top10 = exact.withColumn("rk", row_number().over(w)).where($"rk" <= 10)
    val total = toks.agg(count(lit(1)).as("n_tokens"))
    // k=128 ≫ the fixture vocabulary (31 tokens at every SF, pinned in
    // AnalyticsSpec): the sketch returns the whole vocabulary, so the
    // exact top-10 is contained regardless of count ties at any rank —
    // the round-7 k=31 sat exactly at vocab size, where a boundary tie
    // under the sketch's unspecified tiebreak could flip in_sketch
    val approx = toks.agg(expr("approx_top_k(tok, 128, 65536)").as("sk"))
      .select(explode($"sk").as("e"))
      .select($"e.item".as("tok"), $"e.count".cast("bigint").as("approx_n"))
    top10.join(approx, Seq("tok"), "left")
      .crossJoin(broadcast(total)) // 1-row scalar
      .select($"tok", $"rk".cast("bigint").as("rk"), $"exact_n",
        $"approx_n".isNotNull.cast("bigint").as("in_sketch"),
        (abs(coalesce($"approx_n", lit(0L)) - $"exact_n") <=
          expr("n_tokens div 65536") + 1L).cast("bigint").as("count_ok"))
  }

  /** Sketch RE-aggregation — the pre-aggregated-rollup pattern every
    * warehouse runs: per-day HLL partials (`hll_sketch_agg`, the
    * Datasketches binary a daily batch would persist) are MERGED up to
    * weeks (`hll_union_agg`) without touching raw events again —
    * count_distinct cannot do this (distinct is not reaggregatable;
    * sketches are exactly the fix). Emitted per week: day count, the
    * EXACT weekly distinct (computed independently from raw events for
    * the confirm), and the bound flag |estimate − exact| ≤ 5% + 1 —
    * deterministic because the sketch of a fixed input is
    * deterministic. At 100 TB only the daily sketch table (days ×
    * 1.5 KB) feeds the rollup; raw events are read once at partial
    * build. */
  def aggSketchRollup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d).select(to_date($"ts").as("day"), $"user_id")
    // floor division, not `div` (truncate-toward-zero): DuckDB's `//` in
    // the oracle floors, so a pre-anchor event day (negative diff) must
    // bucket identically in both engines — the fixture starts exactly at
    // the anchor today, but the bucketing must not depend on that
    val weekCol = expr("floor(datediff(day, date'2024-01-01') / 7)")
    val daily = ev.groupBy($"day").agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val weekly = daily.withColumn("week", weekCol.cast("bigint"))
      .groupBy($"week")
      .agg(count(lit(1)).as("n_days"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = ev.withColumn("week", weekCol.cast("bigint"))
      .groupBy($"week").agg(count_distinct($"user_id").as("exact_users"))
    weekly.join(exact, Seq("week"))
      .select($"week", $"n_days", $"exact_users",
        (abs($"est" - $"exact_users") <= $"exact_users" * 0.05 + 1)
          .cast("bigint").as("hll_ok"))
  }

  /** collect_set canonicalized to a sorted joined string (deterministic). */
  def aggCollect(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(array_join(sort_array(collect_set($"o_orderpriority")), "|").as("priorities"),
           count(lit(1)).as("n"))
  }

  /** min_by / max_by — deterministic first/last via a unique ordering key. */
  def aggMinMaxBy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .groupBy($"c_nationkey")
      .agg(min_by($"c_name", $"c_custkey").as("first_cust"),
           max_by($"c_name", $"c_custkey").as("last_cust"),
           max($"c_acctbal").as("top_bal"))
  }

  /** ROLLUP with sentinel labels (sentinels avoid NULL-canonicalization
    * ambiguity in the oracle compare). */
  def aggRollup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .rollup($"n_name", $"c_mktsegment")
      .agg(count(lit(1)).as("n"), sumMoney($"c_acctbal").as("bal"))
      .select(coalesce($"n_name", lit("ALL")).as("nation"),
              coalesce($"c_mktsegment", lit("ALL")).as("segment"),
              $"n", $"bal")
  }

  /** CUBE over two low-cardinality dims. */
  def aggCube(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
              coalesce($"o_orderpriority", lit("ALL")).as("priority"),
              $"n")
  }

  /** GROUPING SETS via the SQL layer (DataFrame API has no direct form). */
  def aggGroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem_gs")
    s.sql("""
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             count(*) AS n,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / CAST(100 AS DOUBLE) AS base
      FROM graft_lineitem_gs
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """)
  }

  /** Pivot: order counts + exact-cents revenue per priority, statuses as
    * columns (explicit value list keeps the schema static — at scale an
    * unpinned pivot triggers a distinct-values job first). */
  def aggPivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select($"o_orderpriority",
        coalesce($"F", lit(0L)).as("n_f"),
        coalesce($"O", lit(0L)).as("n_o"),
        coalesce($"P", lit(0L)).as("n_p"))
  }

  /** Correlated scalar subquery (SQL layer): orders pricier than their
    * status's average — Catalyst decorrelates the subquery into an
    * aggregate + join rather than re-running it per row. */
  def sqlScalarSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("graft_orders_ss")
    s.sql("""
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM graft_orders_ss o
      WHERE o_totalprice > (SELECT sum(CAST(round(i.o_totalprice * 100) AS BIGINT))
                                   / CAST(100 AS DOUBLE) / count(*)
                            FROM graft_orders_ss i
                            WHERE i.o_orderstatus = o.o_orderstatus)
    """)
  }

  /** NA handling: na.fill / na.drop over the null-producing left join
    * (customers without orders). */
  def fnNa(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
    val joined = c.join(o, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"n_orders", $"c_acctbal")
    joined.na.fill(Map("n_orders" -> 0L))
      .na.drop(Seq("c_acctbal"))
      .withColumn("has_orders", $"n_orders" > 0)
  }

  // ---------------------------------------------------------------- F. window functions

  /** Ranking family over a per-nation partition. row_number gets a unique
    * tiebreak; rank/dense_rank are deterministic under ties by value. */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey".asc)
    Tables.customer(s, d)
      .select($"c_nationkey", $"c_custkey", $"c_acctbal")
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter($"rn" <= 5)
      .select($"c_nationkey", $"c_custkey", $"c_acctbal",
              $"rn".cast("bigint").as("rn"), $"rnk".cast("bigint").as("rnk"),
              $"drnk".cast("bigint").as("drnk"))
  }

  /** lag / lead over a totally ordered per-key sequence. */
  def windowLagLead(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture
    // (118k duplicate pairs at sf0.1) — one duplicated full key makes
    // lag/lead nondeterministic across engines AND across runs of the
    // same engine. l_quantity as the final key totalizes the order over
    // every emitted column, so any remaining ties are between fully
    // identical rows, which lag/lead may swap without changing the
    // result multiset.
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate".asc, $"l_orderkey".asc, $"l_linenumber".asc,
               $"l_quantity".asc)
    Tables.lineitem(s, d)
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_shipdate", $"l_quantity")
      .withColumn("prev_qty", lag($"l_quantity", 1).over(w))
      .withColumn("next_qty", lead($"l_quantity", 1).over(w))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
              coalesce($"prev_qty", lit(-1.0)).as("prev_qty"),
              coalesce($"next_qty", lit(-1.0)).as("next_qty"))
  }

  /** Frames: running total (ROWS) + banded total (RANGE) in exact cents.
    *
    * The banded sum (all orders within $100k below this one's price) is
    * computed as the DIFFERENCE OF TWO CUMULATIVE range frames —
    * cum(≤ v) − cum(≤ v − band − 1) — NOT as one sliding
    * `rangeBetween(-band, 0)` frame: Spark evaluates a sliding frame by
    * re-aggregating the whole in-frame buffer per row, O(rows × frame
    * width) per partition (measured 45 s at sf0.1 — 50k-row partitions
    * whose band covers a large value fraction; the first honest noop-sink
    * bench surfaced it), while unbounded-preceding frames grow
    * incrementally, O(rows) total. Tie semantics are identical: a range
    * frame always includes the full peer group at each bound, and with
    * integer cents the −(band+1) upper offset is exactly "strictly below
    * v − band". This difference-of-cumulatives identity is THE way to
    * express wide value-banded aggregates at scale. */
  def windowFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byKey = Window.partitionBy($"o_orderstatus")
      .orderBy($"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byPrice = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice_c".asc)
    val cumAll = byPrice.rangeBetween(Window.unboundedPreceding, 0L)
    val cumBelowBand = byPrice.rangeBetween(Window.unboundedPreceding, -100000L * 100 - 1)
    Tables.orders(s, d)
      .select($"o_orderstatus", $"o_orderkey", cents($"o_totalprice").as("o_totalprice_c"))
      .withColumn("running_c", sum($"o_totalprice_c").over(byKey))
      .withColumn("band_c",
        sum($"o_totalprice_c").over(cumAll) -
          coalesce(sum($"o_totalprice_c").over(cumBelowBand), lit(0L)))
      .select($"o_orderstatus", $"o_orderkey",
              ($"running_c" / 100.0).as("running"), ($"band_c" / 100.0).as("band"))
  }

  /** Distribution window functions: ntile, percent_rank, cume_dist over
    * the per-nation balance ordering. */
  def windowDist(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".asc, $"c_custkey".asc)
    Tables.customer(s, d)
      .select($"c_nationkey", $"c_custkey", $"c_acctbal")
      .withColumn("quartile", ntile(4).over(w).cast("bigint"))
      // UNROUNDED: percent_rank/cume_dist are single divisions of exact
      // integers, bitwise-identical across engines — while round(x, 6)
      // DIVERGES whenever (rank-1)/(n-1) lands exactly on a 5e-7
      // boundary (e.g. 41/640 = 0.0640625 at sf0.1: Spark rounds half
      // up, DuckDB half even)
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
  }

  /** Exact interpolated percentiles (median + p90) per group — rounded to
    * 4dp: Spark and DuckDB both interpolate linearly but may differ in
    * the last ulp of the blend arithmetic. */
  def aggPercentile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(round(percentile($"o_totalprice", lit(0.5)), 4).as("median_price"),
           round(percentile($"o_totalprice", lit(0.9)), 4).as("p90_price"),
           count(lit(1)).as("n"))
  }

  /** Approximate percentiles — the production path at 100 TB (exact
    * interpolated percentiles need a full per-group sort; the
    * percentile_approx sketch is bounded-memory and MERGEABLE, so
    * partial aggregation works map-side). Oracle-checked accuracy
    * contract per group: each approx percentile must land inside the
    * exact ±5-percentile-point value band computed in the same pass
    * (generous vs the sketch's ~1e-4 rank error at accuracy=10000 —
    * a regression to junk fails, bit-level sketch drift doesn't). */
  def aggApproxPercentile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(
        percentile_approx($"o_totalprice", lit(0.5), lit(10000)).as("ap50"),
        percentile_approx($"o_totalprice", lit(0.9), lit(10000)).as("ap90"),
        percentile($"o_totalprice", lit(0.45)).as("lo50"),
        percentile($"o_totalprice", lit(0.55)).as("hi50"),
        percentile($"o_totalprice", lit(0.85)).as("lo90"),
        percentile($"o_totalprice", lit(0.95)).as("hi90"),
        count(lit(1)).as("n"))
      .select($"o_orderstatus", $"n",
        ($"ap50" >= $"lo50" && $"ap50" <= $"hi50").cast("long").as("p50_ok"),
        ($"ap90" >= $"lo90" && $"ap90" <= $"hi90").cast("long").as("p90_ok"))
  }

  /** DataSketches HLL build + MERGE — the re-aggregatable distinct-count
    * pattern: per-shard sketches (here per nation) are unioned into a
    * global estimate without re-touching rows, which is how a 100 TB
    * pipeline maintains distinct counts incrementally (sketch per
    * partition/day, merge on demand — impossible with exact
    * count_distinct, whose partials aren't mergeable without the full
    * key set). Oracle checks the exact side and a 5% error flag on the
    * merged estimate; sketch bytes stay out of the output. */
  def aggSketchUnion(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perNation = Tables.customer(s, d)
      .groupBy($"c_nationkey")
      .agg(hll_sketch_agg($"c_custkey").as("sk"))
    val merged = perNation
      .agg(count(lit(1)).as("n_nations"),
           hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
    val exact = Tables.customer(s, d)
      .agg(count_distinct($"c_custkey").as("exact_total"))
    merged.crossJoin(exact) // two 1-row frames
      .select($"n_nations", $"exact_total",
        (abs($"est" - $"exact_total") <= $"exact_total" * 0.05)
          .cast("long").as("union_ok"))
  }

  /** Theta sketches (Datasketches, Spark 4.1 built-ins): the SET-ALGEBRA
    * sketch — unlike HLL (union only; [[aggHllIntersect]] fakes
    * intersection by inclusion–exclusion and cannot do difference at
    * all), theta sketches close under union, intersection AND
    * difference, which is what retention/churn set arithmetic actually
    * needs: purchasers on day 1 who did / did not return on day 2. At
    * every shipped SF the distinct counts sit far below the sketch's
    * 2¹² nominal entries, so the sketches operate in their EXACT regime
    * and every estimate is the true cardinality — emitted as hash-checked
    * BIGINTs, no band flags needed (the same fixture-pinned-exactness
    * discipline as agg_approx_topk's k; at 100 TB the identical query
    * returns ~1.6%-accurate estimates from ~32 KB of state per set).
    * Scale shape: two map-side-combinable sketch aggregates, one 1-row
    * cross join of ~KB sketch blobs, set algebra on the driver row. */
  def aggThetaDiff(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val buys = Tables.events(s, d).where($"event_type" === "purchase")
      .select($"user_id", $"ts")
    val day1 = buys.where($"ts" < lit(graft.core.Utc.ts("2024-01-02 00:00:00")))
      .agg(expr("theta_sketch_agg(user_id)").as("ska"))
    val day2 = buys.where($"ts" >= lit(graft.core.Utc.ts("2024-01-02 00:00:00")) &&
                          $"ts" < lit(graft.core.Utc.ts("2024-01-03 00:00:00")))
      .agg(expr("theta_sketch_agg(user_id)").as("skb"))
    day1.crossJoin(day2) // 1-row × 1-row sketch blobs
      .select(
        round(expr("theta_sketch_estimate(ska)")).cast("bigint").as("n_day1"),
        round(expr("theta_sketch_estimate(skb)")).cast("bigint").as("n_day2"),
        round(expr("theta_sketch_estimate(theta_difference(ska, skb))"))
          .cast("bigint").as("churned"),
        round(expr("theta_sketch_estimate(theta_intersection(ska, skb))"))
          .cast("bigint").as("retained"))
  }

  /** KLL quantile sketch (Karnin–Lang–Liberty, Spark 4.1 built-ins):
    * the MERGEABLE quantile state a 100 TB percentile dashboard keeps —
    * per-group sketches built map-side (`kll_sketch_agg_bigint`), merged
    * without revisiting rows (`kll_merge_agg_bigint`), then queried BOTH
    * directions: value at a rank (`..get_quantile..`) and rank of a
    * value (`..get_rank..`) — the inverse query `percentile_approx`
    * cannot answer. Output follows the agg_approx discipline: exact
    * integers (count + the exact discrete p50 in cents) plus two flags
    * the oracle pins constant-true — the sketch's p50 must sit within
    * ±3 rank points of 0.5 by EXACT rank (3× the k=200 sketch's ~1%
    * rank error), and the sketch's rank of the exact p50 must sit in
    * the same band; a sketch regression hash-fails CORRECTNESS while
    * bit-level sketch drift cannot. */
  def aggKllQuantile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cents = Tables.events(s, d)
      .select($"event_type", round($"value" * 100).cast("bigint").as("cents"))
    cents.createOrReplaceTempView("graft_kll_cents")
    // the rank-probe value must be FOLDABLE (the kll getters take
    // constants), so the exact p50 comes back as one bounded driver
    // scalar first — the skew_report/CC-fingerprint class of collect —
    // and folds into the sketch query as a literal
    val p50Exact = s.sql("""
      SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT)
      FROM graft_kll_cents""").head().getLong(0)
    s.sql(s"""
      WITH per_type AS (
        SELECT event_type, kll_sketch_agg_bigint(cents) AS sk
        FROM graft_kll_cents GROUP BY event_type),
      merged AS (
        SELECT kll_merge_agg_bigint(sk) AS sk FROM per_type),
      probes AS (
        SELECT kll_sketch_get_quantile_bigint(m.sk, 0.5) AS sk_p50,
               kll_sketch_get_rank_bigint(m.sk, ${p50Exact}L) AS sk_rank_of_p50
        FROM merged m)
      SELECT (SELECT count(*) FROM graft_kll_cents) AS n,
             ${p50Exact}L AS p50_exact_cents,
             CAST(abs((SELECT CAST(count(*) AS DOUBLE) FROM graft_kll_cents
                       WHERE cents <= p.sk_p50)
                      / (SELECT count(*) FROM graft_kll_cents) - 0.5) <= 0.03
                  AS BIGINT) AS quantile_ok,
             CAST(abs(p.sk_rank_of_p50 - 0.5) <= 0.03 AS BIGINT) AS rank_ok
      FROM probes p""")
  }

  /** Mergeable frequency sketch (Count–Min, Cormode & Muthukrishnan):
    * build ONE distributed CMS over the join key (`count_min_sketch` is
    * an associative partial aggregate — partitions sketch locally and
    * merge, exactly how a 100 TB hot-key pre-pass runs), broadcast the
    * ~100 KB sketch, probe every key's estimate distributed. Emits the
    * two CMS guarantees as oracle-checked flags per key: estimates never
    * undercount, and overshoot ≤ ⌈ε·N⌉ (ε = 0.001, N from the data —
    * the w.p.-1−δ bound; with seed fixed the sketch is deterministic,
    * so the flags are replay-stable). The sketch singleton to the driver
    * is the CC-head() class of exception (one bounded binary); the probe
    * deserializes once per partition — a [[DataFrame]] map would
    * re-parse the sketch per row. */
  def aggCms(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d).select($"l_suppkey")
    val skBytes = li.agg(expr(
        "count_min_sketch(l_suppkey, CAST(0.001 AS DOUBLE), CAST(0.999 AS DOUBLE), 42)")
        .as("sk"))
      .head().getAs[Array[Byte]](0)
    val bc = s.sparkContext.broadcast(skBytes)
    // ε·N from the sketch itself (totalCount() is N) — no second pass
    // over the fact table just to recount what the sketch already holds
    val epsN = math.ceil(0.001 * org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(skBytes)).totalCount()).toLong
    val exact = li.groupBy($"l_suppkey").agg(count(lit(1)).as("exact_cnt"))
    exact.as[(Long, Long)].mapPartitions { it =>
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bc.value))
      it.map { case (k, ex) => (k, ex, cms.estimateCount(k)) }
    }.toDF("l_suppkey", "exact_cnt", "est_cnt")
      .select($"l_suppkey", $"exact_cnt",
        ($"est_cnt" >= $"exact_cnt").cast("long").as("no_underestimate_ok"),
        ($"est_cnt" - $"exact_cnt" <= epsN).cast("long").as("overestimate_bound_ok"))
  }

  /** Ordered funnel (view → click → purchase): per user, each step's
    * earliest timestamp strictly after the previous step's. ONE shuffle
    * on user_id, then three chained whole-partition window minima (each
    * step's window references the previous step's per-user constant) and
    * a final per-user collapse that reuses the same partitioning — no
    * joins at all. The round-2 shape broadcast the per-user step frames,
    * which are O(total users), not a dimension: at 10⁹ users that build
    * side OOMs. Window frames over the existing hash partitioning keep
    * every step distributed and add zero exchanges (plan-asserted in
    * PlanShapeSpec). */
  def eventsFunnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id")
    Tables.events(s, d).select($"user_id", $"event_type", $"ts")
      .withColumn("t1", min(when($"event_type" === "view", $"ts")).over(w))
      .withColumn("t2", min(when($"event_type" === "click" && $"ts" > $"t1", $"ts")).over(w))
      .withColumn("t3", min(when($"event_type" === "purchase" && $"ts" > $"t2", $"ts")).over(w))
      .where($"t1".isNotNull) // funnel anchors on users with a view
      .groupBy($"user_id")
      .agg(max($"t2").as("t2"), max($"t3").as("t3")) // per-user constants
      .select($"user_id",
        (lit(1) + when($"t2".isNotNull, 1).otherwise(0)
                + when($"t3".isNotNull, 1).otherwise(0)).cast("bigint").as("steps_completed"))
  }

  /** Batch sessionization: split each user's event stream into sessions
    * at >12h inactivity gaps (the batch twin of `stream_session`). ONE
    * shuffle on user_id, then two window passes over the SAME
    * partitioning (lag to flag session starts, running sum to number
    * them) and a final groupBy that reuses it again — Catalyst plans a
    * single exchange for all three. Session numbering is tie-order
    * invariant: events sharing a timestamp see the same lagged ts either
    * way, so the flags (and their prefix sums) don't depend on how the
    * sort broke the tie. Per-session metrics are count/min/max only —
    * no double summation, so the result is bit-stable under any
    * partitioning. At 100 TB this is the canonical "billions of small
    * groups" window: state per user is one row, and AQE handles the
    * skewed power-user partitions. */
  def eventsSessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byTs = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val gapUs = 12L * 3600 * 1000 * 1000 // 12h in microseconds
    Tables.events(s, d).select($"user_id", $"event_id", $"ts")
      .withColumn("new_sess",
        (unix_micros($"ts") - unix_micros(coalesce(lag($"ts", 1).over(byTs), $"ts"))
          > gapUs).cast("long"))
      .withColumn("session_idx", sum($"new_sess").over(byTs))
      .groupBy($"user_id", $"session_idx")
      .agg(count(lit(1)).as("n_events"),
           min($"ts").as("sess_start"), max($"ts").as("sess_end"))
      .withColumn("duration_us",
        unix_micros($"sess_end") - unix_micros($"sess_start"))
  }

  /** Running COUNT DISTINCT over an ordered stream — the discovery
    * curve ("how many distinct event types has this user touched by
    * time t") that plain window aggregates can't express (DISTINCT is
    * unsupported in windowed aggregation in both engines). The
    * standard decomposition: flag each row that is the FIRST
    * occurrence of its (user, value) pair — row_number = 1 over the
    * (user, type) partition — then a running sum of flags over the
    * (user) time order. Two window partitionings → two exchanges; the
    * second is the price of the finer first-occurrence key (at scale,
    * pre-partitioning by user_id lets AQE plan the (user, type) hash
    * as a local re-sort within user partitions only when the
    * partitioner is compatible; both engines replay the same unique
    * (ts, event_id) tiebreak, so the curve is deterministic). */
  def windowRunningDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val firstPer = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts".asc, $"event_id".asc)
    val byTime = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"event_id".asc)
    Tables.events(s, d).select($"user_id", $"event_id", $"event_type", $"ts")
      .withColumn("is_new", (row_number().over(firstPer) === 1).cast("bigint"))
      .withColumn("n_types_seen", sum($"is_new").over(byTime))
      .select($"user_id", $"event_id", $"is_new", $"n_types_seen")
  }

  /** Funnel latency distribution — the metric behind every conversion
    * dashboard: per user, time from first 'view' to the first
    * 'purchase' AFTER it (the events_funnel anchor rule), summarized
    * as one row of exact integers — anchored/converted counts, min and
    * max latency in µs, and DISCRETE p50/p90 with the explicit
    * skew-report rank rule (rank = (n−1)·p div 100 + 1 over ascending
    * latency, user_id tiebreak) — a real data value, not an
    * interpolated double, and the same convention DuckDB replays
    * exactly. One user_id window pass, then the converted-user profile
    * is ranked with the DISTRIBUTED exact rank ([[DistRank.withRank]]:
    * range-repartition + zipWithIndex offsets — round-9/10 rewrite of
    * the flagged single-partition
    * `row_number() OVER (ORDER BY lat_us)`; "converted ≪ events" still
    * holds but the profile is user-scale, so it must never funnel
    * through one partition); the percentile picks ride a broadcast
    * 1-row scalar, the skew_report shape. */
  def eventsTimeToConvert(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id")
    val lat = Tables.events(s, d).select($"user_id", $"event_type", $"ts")
      .withColumn("t1", min(when($"event_type" === "view", $"ts")).over(w))
      .withColumn("t2",
        min(when($"event_type" === "purchase" && $"ts" > $"t1", $"ts")).over(w))
      .where($"t1".isNotNull)
      .groupBy($"user_id")
      .agg((unix_micros(max($"t2")) - unix_micros(max($"t1"))).as("lat_us"))
      // consumed by the rank pass AND the stats aggregate below:
      // cache the events scan + user-window + groupBy once
      // (multi-consumer rule), |anchored users| narrow rows; lazy —
      // the first consuming job materializes (see DistRank scaladoc)
      .localCheckpoint(eager = false)
    val ranked = DistRank.withRank(lat.where($"lat_us".isNotNull),
      Seq($"lat_us".asc, $"user_id".asc), "rk")
    val stats = lat.agg(count(lit(1)).as("n_anchored"),
      count($"lat_us").as("n_converted"),
      min($"lat_us").as("min_us"), max($"lat_us").as("max_us"))
    // percentile picks collapse to one row even when NO user converts
    // (ranked empty → agg-without-groupBy still emits one all-NULL row),
    // and the 1-row stats frame DRIVES the final select — so
    // n_anchored/n_converted survive an empty converted set instead of
    // being nulled by aggregating over the empty cross product
    val picks = ranked.crossJoin(broadcast(stats)) // 1-row scalar
      .agg(
        max(when($"rk" === expr("((n_converted - 1) * 50) div 100 + 1"),
          $"lat_us")).as("p50_us"),
        max(when($"rk" === expr("((n_converted - 1) * 90) div 100 + 1"),
          $"lat_us")).as("p90_us"))
    stats.crossJoin(broadcast(picks)) // 1-row scalar × 1-row scalar
      .select($"n_anchored", $"n_converted", $"min_us", $"max_us",
        $"p50_us", $"p90_us")
  }

  /** Point-in-time join against a versioned dimension — the SCD
    * type-2 staple: each fact row must see the dimension version whose
    * [valid_from, valid_to) interval covers the event time, not
    * today's version (the classic back-test/training-data leakage
    * trap). The dim is STAGED in-query from customer (every %3 == 0
    * key gets a mid-history segment change at 2024-01-15, inside the
    * events span; everyone else one full-range version), then the join
    * is an EQUI join on the key with the validity range as a residual
    * filter — the 100 TB shape: the dim (rows ≈ keys × avg versions)
    * broadcasts or buckets by key, the fact side never re-shuffles for
    * the range part, and exactly one version matches per fact row by
    * construction (intervals partition time). Per segment-at-event-time
    * counts. */
  def joinScd2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lo = lit(graft.core.Utc.ts("1970-01-01 00:00:00"))
    val split = lit(graft.core.Utc.ts("2024-01-15 00:00:00"))
    val hi = lit(graft.core.Utc.ts("2099-01-01 00:00:00"))
    val cust = Tables.customer(s, d)
    val changed = cust.where($"c_custkey" % 3 === 0)
    val dim = changed.select($"c_custkey".as("user_id"),
        $"c_mktsegment".as("segment"), lo.as("valid_from"), split.as("valid_to"))
      .unionByName(changed.select($"c_custkey".as("user_id"),
        concat(lit("UPGRADED-"), $"c_mktsegment").as("segment"),
        split.as("valid_from"), hi.as("valid_to")))
      .unionByName(cust.where($"c_custkey" % 3 =!= 0)
        .select($"c_custkey".as("user_id"), $"c_mktsegment".as("segment"),
          lo.as("valid_from"), hi.as("valid_to")))
    Tables.events(s, d).select($"user_id", $"ts")
      .join(broadcast(dim), Seq("user_id"))
      .where($"ts" >= $"valid_from" && $"ts" < $"valid_to")
      .groupBy($"segment").agg(count(lit(1)).as("n_events"))
  }

  /** Gaps-and-islands (activity streaks): per user, the longest run of
    * CONSECUTIVE calendar days with ≥1 event — the retention metric
    * sessionization can't express (sessions measure time gaps; streaks
    * measure calendar continuity). The classic trick: day −
    * row_number(day) is constant exactly within a consecutive run, so
    * one distinct + one window + two aggregates does it — no self-join,
    * no iteration. Scale: everything after the (user, day) distinct is
    * proportional to active-days (≪ events); the window and both
    * groupBys share the user_id partitioning, so AQE coalesces to ONE
    * exchange chain end-to-end. */
  def eventsStreaks(s: SparkSession, d: String): DataFrame =
    eventsStreaksOf(Tables.events(s, d))

  /** Core over any (user_id, ts) frame — the declared query and
    * AnalyticsSpec's planted-streak law both drive this path. */
  def eventsStreaksOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val byDay = Window.partitionBy($"user_id").orderBy($"day".asc)
    events.select($"user_id", to_date($"ts").as("day")).distinct()
      .withColumn("island", date_sub($"day", row_number().over(byDay)))
      .groupBy($"user_id", $"island").agg(count(lit(1)).as("len"))
      .groupBy($"user_id")
      .agg(sum($"len").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max($"len").as("longest_streak"))
  }

  // ---------------------------------------------------------------- G. sort / limit / top-k

  /** Global multi-key sort (no limit): Catalyst samples for a
    * RangePartitioning exchange, then sorts per partition — the
    * distributed total order the reference can only produce by
    * client-side concatenation+sort (SURVEY §2.1 quirks). Output set ==
    * input set; the plan shape is what PlanShapeSpec pins. */
  def sortGlobal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .orderBy($"c_mktsegment".asc, $"c_acctbal".desc, $"c_custkey".asc)
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
  }


  /** Global top-N: Catalyst plans TakeOrderedAndProject — per-partition
    * top-N then a single-reduce merge, no global sort shuffle. */
  def sortLimit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .orderBy($"o_totalprice".desc_nulls_last, $"o_orderkey".asc_nulls_first)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .limit(50)
  }

  // ---------------------------------------------------------------- H. set ops

  /** UNION ALL then aggregate (unionByName for schema safety). */
  /** Bag-semantics set algebra (the ALL variants — multiset min /
    * difference / sum of multiplicities), which Spark executes as
    * count-annotated aggregates + generate rather than row-matching
    * joins. Two overlapping lineitem slices (quantity ≤ 25 vs ≥ 20)
    * give every key genuine duplicate multiplicity; the result is the
    * per-key count under each ALL operator, labeled — the oracle
    * replays INTERSECT ALL / EXCEPT ALL / UNION ALL literally. One
    * exchange per operator on the (flag, status) key; the distinct
    * variants are the `set_*` family above. */
  def setOpsAll(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val a = li.where($"l_quantity" <= 25).select($"l_returnflag", $"l_linestatus")
    val b = li.where($"l_quantity" >= 20).select($"l_returnflag", $"l_linestatus")
    def cnt(df: DataFrame, op: String) =
      df.groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n")).withColumn("op", lit(op))
    cnt(a.intersectAll(b), "intersect_all")
      .unionByName(cnt(a.exceptAll(b), "except_all"))
      .unionByName(cnt(a.unionAll(b), "union_all"))
      .select($"op", $"l_returnflag", $"l_linestatus", $"n")
  }

  def setUnion(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d).select($"c_nationkey".cast("int").as("nationkey"))
    val su = Tables.supplier(s, d).select($"s_nationkey".cast("int").as("nationkey"))
    c.unionByName(su).groupBy($"nationkey").agg(count(lit(1)).as("n"))
  }

  /** INTERSECT (distinct semantics). */
  def setIntersect(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d).select($"c_nationkey".cast("int").as("nationkey"))
    val su = Tables.supplier(s, d).select($"s_nationkey".cast("int").as("nationkey"))
    c.intersect(su)
  }

  /** EXCEPT (distinct semantics). */
  def setExcept(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d).select($"c_nationkey".cast("int").as("nationkey"))
    val su = Tables.supplier(s, d).select($"s_nationkey".cast("int").as("nationkey"))
    c.except(su)
  }

  /** distinct + dropDuplicates(cols) (projected to the dedup key so the
    * surviving-row choice cannot leak nondeterminism). */
  def setDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .dropDuplicates("c_nationkey", "c_mktsegment")
      .select($"c_nationkey", $"c_mktsegment")
      .distinct()
  }

  // ---------------------------------------------------------------- I. scalar functions

  /** String function battery over part. */
  /** Edit-distance scalar (`levenshtein` — implemented natively by
    * both engines, so the oracle is a direct replay): per-row
    * distances between catalog strings plus the bounded variant
    * (Spark's threshold form returns −1 above the bound — replayed as
    * a CASE over the exact distance). The scalar complement of
    * `join_fuzzy_editdist`'s blocked join. Per-row, zero shuffle. */
  def fnEditdist(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d).select(
      $"p_partkey",
      levenshtein($"p_name", $"p_type").cast("bigint").as("dist_name_type"),
      levenshtein(lower($"p_brand"), lower($"p_type")).cast("bigint")
        .as("dist_brand_type"),
      expr("levenshtein(p_name, p_type, 5)").cast("bigint")
        .as("dist_capped5"))
  }

  /** Data-masking governance (`mask()` — Spark's built-in column
    * redaction, the share-a-table-without-the-PII primitive): default
    * masking (upper→X, lower→x, digit→n, other retained) and a custom
    * character class set. Deterministic per-character rewriting, which
    * the oracle replays as chained regexp_replace passes — the same
    * observable contract, proving the built-in against first
    * principles. Per-row, zero shuffle. */
  def fnMask(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d).select(
      $"c_custkey",
      expr("mask(c_name)").as("masked_name"),
      expr("mask(c_mktsegment, 'U', 'l', '#', '*')").as("masked_seg"),
      expr("mask(c_name, 'X', 'x', '9')").as("masked_digits9"))
  }

  /** Regexp scalar family (SURVEY §2.3 I): extract / extract-groups /
    * count / replace-all / match-test over real document text. Dialect
    * discipline: Spark compiles java.util.regex, DuckDB compiles RE2 —
    * the patterns here stay inside the shared subset (literal classes,
    * `+` quantifiers, anchored groups, `\b`), where both engines are
    * specified identically; backreferences, lookaround, and possessive
    * quantifiers are out of contract (RE2 rejects the first two
    * outright). Per-row, zero shuffle, codegen'd built-ins. */
  def fnRegex(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(
      $"doc_id",
      regexp_extract($"text", "([A-Z][a-z]+)", 1).as("first_cap"),
      regexp_count($"text", lit("[aeiou]+")).cast("bigint").as("n_vowel_runs"),
      regexp_replace(substring($"text", 1, 48), "[aeiou]", "_").as("devoweled"),
      array_join(expr("regexp_extract_all(text, '([a-z]+ing)\\\\b', 1)"), ",").as("ing_words"),
      $"text".rlike("[A-Za-z]+ed\\b").cast("bigint").as("has_past"))
  }

  def fnString(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d).select(
      $"p_partkey",
      lower($"p_name").as("lo"),
      upper($"p_brand").as("up"),
      trim(lit("  pad  ")).as("trimmed"),
      substring($"p_type", 1, 5).as("type5"),
      length($"p_name").cast("bigint").as("name_len"),
      concat_ws("/", $"p_brand", $"p_type").as("brand_type"),
      size(split($"p_name", " ")).cast("bigint").as("n_words"))
  }

  /** Extended string battery: regex replace, padding, translate, edit
    * distance, reverse/repeat/left-right slicing. */
  def fnString2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d).select(
      $"p_partkey",
      regexp_replace($"p_name", "a", "@").as("subst"),
      lpad($"p_brand", 12, "*").as("pad_l"),
      rpad($"p_type", 30, ".").as("pad_r"),
      translate($"p_type", "aeiou", "AEIOU").as("xlat"),
      levenshtein($"p_brand", lit("Brand#13")).cast("bigint").as("edit_dist"),
      reverse($"p_name").as("rev"),
      repeat($"p_brand", 2).as("twice"),
      substring($"p_name", 1, 4).as("left4"))
  }

  /** Date/time battery over orders. */
  def fnDate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d).select(
      $"o_orderkey",
      year($"o_orderdate").cast("bigint").as("yr"),
      month($"o_orderdate").cast("bigint").as("mo"),
      dayofmonth($"o_orderdate").cast("bigint").as("dom"),
      date_trunc("month", $"o_orderdate").as("month_start"),
      datediff($"o_orderdate", lit("1995-01-01").cast("date")).cast("bigint").as("days_since"),
      unix_timestamp($"o_orderdate").as("epoch_s"))
  }

  /** Date/time battery 2: calendar arithmetic. dayofweek is Spark's
    * Sunday=1 convention (oracle shifts DuckDB's Sunday=0); add_months
    * end-of-month clamping matches interval arithmetic on both engines. */
  def fnDate2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d).select(
      $"o_orderkey",
      quarter($"o_orderdate").cast("bigint").as("qtr"),
      dayofweek($"o_orderdate").cast("bigint").as("dow"),
      weekofyear($"o_orderdate").cast("bigint").as("iso_week"),
      last_day($"o_orderdate").cast("date").as("month_end"),
      add_months($"o_orderdate", 2).cast("date").as("plus2mo"),
      date_format($"o_orderdate", "yyyy-MM").as("ym"))
  }

  /** Math + conditional battery (transcendentals rounded: last-ulp libm
    * differences between JVM and C are real). */
  def fnMath(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d).select(
      $"l_orderkey", $"l_linenumber",
      round($"l_extendedprice" / 7.0, 2).as("div7"),
      abs($"l_discount" - 0.05).as("abs_disc"),
      round(pow($"l_quantity", 2.0), 2).as("qty_sq"),
      round(log($"l_extendedprice"), 6).as("ln_price"),
      when($"l_quantity" > 25, "bulk").otherwise("small").as("bucket"),
      coalesce(nullif($"l_returnflag", lit("N")), lit("none")).as("rf"))
  }

  /** Array higher-order functions over tokenized text: transform / filter /
    * aggregate / array_contains / size — all codegen'd, no UDFs. */
  def fnArray(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", split($"text", " ").as("toks"))
      .select(
        $"doc_id",
        size($"toks").cast("bigint").as("n_toks"),
        array_contains($"toks", "spark").as("has_spark"),
        size(filter($"toks", t => length(t) > 4)).cast("bigint").as("n_long"),
        aggregate($"toks", lit(0L), (acc, t) => acc + length(t).cast("long")).as("total_chars"),
        array_join(slice(transform($"toks", t => upper(t)), 1, 3), "-").as("head3"))
  }

  /** Map functions: build a map, inspect it with map_keys/map_values
    * (SURVEY §2.3 I), then explode it back to rows. keys_csv and vals_sum
    * are computed FROM the map column — the oracle pins their expected
    * values, so the key/value accessors are genuinely checked, not just
    * present. */
  def fnMap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).cast("long").as("n"), sum(cents($"o_totalprice")).as("c"))
      .select($"o_orderstatus",
              map(lit("n"), $"n", lit("cents"), $"c").as("m"))
      .select($"o_orderstatus",
              array_join(map_keys($"m"), ",").as("keys_csv"),
              aggregate(map_values($"m"), lit(0L), (a, v) => a + v).as("vals_sum"),
              explode($"m").as(Seq("metric", "val")))
  }

  /** JSON functions over events.props. */
  def fnJson(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d).select(
      $"event_id",
      get_json_object($"props", "$.k").cast("long").as("k_path"),
      from_json($"props", org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
        .getField("k").as("k_struct"))
  }

  /** Fixed-width integer histogram of order values ($50k buckets on
    * integer cents — division and boundaries are exact, unlike a
    * float-width bucketing whose edges drift): one two-phase hash
    * aggregate; the per-bucket min/max show each bucket's true extent.
    * The histogram is the profile behind mix planning and outlier
    * triage; at 100 TB it is the same single pass. (Bucket uses integer
    * `div`, which truncates toward zero — identical to DuckDB's floor
    * `//` only on the non-negative domain; o_totalprice > 0 always. A
    * signed-domain histogram needs an explicit floor-div.) */
  def aggHistogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select(round($"o_totalprice" * 100).cast("bigint").as("cents"))
      .select(expr("cents div 5000000").as("bucket"), $"cents") // ONE cents definition
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"), min($"cents").as("min_cents"), max($"cents").as("max_cents"))
  }

  /** Bitwise function family over key columns: and/or/xor, shifts, and
    * popcount — the primitives every hash/bitmap/bloom structure builds
    * on, all codegen'd integer ops. */
  def fnBitwise(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d).select(
      $"o_orderkey",
      $"o_orderkey".bitwiseAND(255L).as("k_and"),
      $"o_orderkey".bitwiseOR(4096L).as("k_or"),
      $"o_orderkey".bitwiseXOR($"o_custkey").as("k_xor"),
      shiftleft($"o_orderkey", 3).as("k_shl"),
      shiftright($"o_orderkey", 2).as("k_shr"),
      bit_count($"o_orderkey").cast("bigint").as("k_pop"))
  }

  /** Error-tolerant expressions (the dirty-data ingestion path): try_cast
    * on strings that don't parse, try_divide across a divisor that hits
    * zero — each yields NULL instead of failing the task, which is the
    * only viable contract when one malformed row out of 10¹¹ must not
    * kill a 6-hour job. All per-row codegen; the oracle replays the
    * identical null semantics via TRY_CAST/NULLIF. */
  def fnTry(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d).select(
      $"o_orderkey",
      expr("try_cast(o_orderpriority AS INT)").as("prio_bad"), // '1-URGENT' → NULL
      expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("prio_num"),
      try_divide(round($"o_totalprice" * 100).cast("bigint"),
        pmod($"o_custkey", lit(3L))).as("cents_per"), // ⅓ of rows divide by zero
      expr("try_cast(o_orderstatus AS DATE)").as("date_bad")) // 'F' → NULL
  }

  /** Unpivot (melt) — the inverse of [[aggPivot]]: the wide per-priority
    * status counts fold back into (priority, status, n) rows. Wide→long
    * reshaping is how a pipeline normalizes metric tables for storage;
    * the unpivot itself is a zero-shuffle per-row expansion. */
  def aggUnpivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    aggPivot(s, d).unpivot(
      Array($"o_orderpriority"),
      Array($"n_f", $"n_o", $"n_p"),
      "status", "n")
  }

  /** Weekly cohort retention: users are cohorted by the week of their
    * first event; each (cohort_week, week_offset) cell counts the users
    * of that cohort active `offset` weeks later — the canonical product
    * analytics matrix. ONE exchange on user_id does all per-user work
    * (min week + the distinct active-week set in a single aggregate; a
    * user's week set is bounded by the calendar, so `collect_set` state
    * is O(weeks), never O(events)); the second aggregate groups a
    * (cohort, offset) table whose cardinality is weeks², independent of
    * user count. Offsets are exact multiples of 7 days, so the integer
    * `div 7` is lossless. At 100 TB the shape is unchanged — billions of
    * users hash across the first exchange and the output stays tiny. */
  def eventsRetention(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id", date_trunc("week", $"ts").as("week"))
      .groupBy($"user_id")
      .agg(min($"week").as("cohort_week"), collect_set($"week").as("weeks"))
      .select($"cohort_week", explode($"weeks").as("week"))
      .select($"cohort_week",
        expr("datediff(week, cohort_week) div 7").cast("bigint").as("week_offset"))
      .groupBy($"cohort_week", $"week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Last-touch attribution: each purchase's revenue is credited to the
    * campaign (`props.k`) of the user's most recent click no older than
    * 7 days; purchases with no qualifying click fall into campaign −1.
    * Same single-pass shape as [[joinAsof]]: union the two event kinds,
    * ONE window over (user, ts, kind, event_id) carries the last click's
    * campaign and timestamp forward (`last(..., ignoreNulls)`), then one
    * aggregate. The tie rule is explicit — a click sharing a purchase's
    * timestamp sorts first (kind 0 < 1) and is attributable — so the
    * result is independent of shuffle order. Revenue is integer cents.
    * At scale this beats the join formulation: no build side, no skew
    * joins, state per user is one row. */
  def eventsAttribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // ONE scan: a union of two filtered branches reads the fact table
    // twice; per-row conditionals over a single IN-filtered pass don't
    // (plan-asserted — 2 scans of a 100 TB event log is the whole cost)
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"kind".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .where($"event_type".isin("click", "purchase"))
      .select($"user_id", $"ts", $"event_id",
        when($"event_type" === "click", 0L).otherwise(1L).as("kind"),
        when($"event_type" === "click",
          get_json_object($"props", "$.k").cast("long")).as("k"),
        when($"event_type" === "purchase",
          round($"value" * 100).cast("bigint")).as("cents"))
      .withColumn("last_k", last($"k", ignoreNulls = true).over(w))
      .withColumn("last_click_ts",
        last(when($"kind" === 0, $"ts"), ignoreNulls = true).over(w))
      .where($"kind" === 1)
      // NULL last_click_ts (no prior click) fails the >= and falls to −1
      .select(
        when($"last_click_ts" >= $"ts" - expr("INTERVAL 7 DAYS"), $"last_k")
          .otherwise(lit(-1L)).as("campaign"),
        $"cents")
      .groupBy($"campaign")
      .agg(count(lit(1)).as("n_purchases"), sum($"cents").as("revenue_cents"))
  }

  /** Event-sequence transition counts (the first-order Markov model of
    * user behavior): per user, events in (ts, event_id) total order;
    * each consecutive pair contributes one (src_type → dst_type)
    * transition. ONE window exchange on user_id, then an aggregate over
    * the |types|² transition matrix. The total order makes the
    * transition multiset deterministic even with equal timestamps. */
  def eventsPaths(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(s, d)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .where($"next_type".isNotNull)
      .groupBy($"event_type".as("src_type"), $"next_type".as("dst_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Boolean / conditional aggregates per group — `bool_and`,
    * `bool_or`, and `count_if` (ANSI EVERY / SOME / FILTER class), all
    * codegen'd predicate folds with map-side partials: AND/OR are
    * associative-commutative, so at 100 TB these collapse map-side like
    * any sum. Predicate literals are cast to DOUBLE in the oracle (a
    * bare 0.05 is DECIMAL in DuckDB — the cross-engine comparison
    * gotcha) so both engines compare the same doubles. */
  def aggBool(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(
        bool_and($"l_quantity" > 0.0).as("all_pos"),
        bool_or($"l_discount" > 0.05).as("some_deep_disc"),
        bool_and($"l_tax" <= 0.08).as("all_tax_capped"),
        count_if($"l_tax" === 0.0).as("n_tax_free"),
        count_if($"l_quantity" >= 25.0).as("n_heavy"))
  }

  /** Exact statistical moments per group — the integer sums (n, Σx, Σx²,
    * Σy, Σy², Σxy) from which variance, covariance and correlation
    * derive in closed form. This is the mergeable-statistics pattern for
    * 100 TB: one map-side-combinable pass produces partials that sum
    * associatively (plain `var_samp`/`corr` over doubles is
    * partial-order dependent and can never hash-match across engines).
    * x = quantity (≤50), y = discount in integer percent (≤10): the
    * squared sums stay ≪ 2⁶³ at any realistic SF. AnalyticsSpec derives
    * corr from these sums and checks it against Spark's own `corr`. */
  def aggMoments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_returnflag",
        $"l_quantity".cast("bigint").as("q"),
        round($"l_discount" * 100).cast("bigint").as("disc_pc"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum($"q").as("sum_q"), sum($"q" * $"q").as("sum_q2"),
        sum($"disc_pc").as("sum_d"), sum($"disc_pc" * $"disc_pc").as("sum_d2"),
        sum($"q" * $"disc_pc").as("sum_qd"))
  }

  /** Per-group mode (most frequent value) with a deterministic tie rule:
    * highest count first, lexicographically-smallest value on ties. Two
    * hash aggregates — (group, value) counts, then a row_number window
    * over the count table, which is |groups|·|distinct values|, not
    * |rows|. The heavy first aggregate is map-side combinable; the mode
    * pick runs on the tiny profile. (Spark's builtin `mode` breaks ties
    * arbitrarily — useless under a hash-compare gate and a liability for
    * reproducible pipelines; this shape is the deterministic fix.) */
  def aggMode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val counts = Tables.customer(s, d)
      .groupBy($"c_nationkey".cast("long").as("nationkey"), $"c_mktsegment".as("segment"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"nationkey").orderBy($"n".desc, $"segment".asc)
    counts.withColumn("rk", row_number().over(w)).where($"rk" === 1)
      .select($"nationkey", $"segment".as("mode_segment"), $"n".as("mode_n"))
  }

  /** Linear interpolation over the gap-filled daily series (the
    * numeric-series twin of [[tsGapfill]]'s LOCF): missing days get the
    * distance-weighted mean of the bracketing observed days, computed in
    * integer cents as (prev·(gap−step) + next·step) div gap. The
    * weighted-mean form keeps the numerator non-negative, where integer
    * division truncates identically in Spark (`div`, toward zero) and
    * DuckDB (`//`, floor) — the subtraction form prev + Δ·step/gap has a
    * sign-dependent rounding mismatch between the two. Present days pass
    * their own cents through untouched. Two frames (LOCF-backward,
    * LOCF-forward) over the SAME (user, day) sort share one exchange. */
  def tsInterpolate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // localCheckpoint: daily feeds BOTH the calendar derivation and the
    // join probe — without it Catalyst duplicates the whole scan+agg
    // subtree and the event log is scanned twice (plan-asserted)
    val daily = Tables.events(s, d)
      .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n"),
           sum(round($"value" * 100).cast("bigint")).as("cents"))
      .localCheckpoint()
    val cal = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id",
        explode(sequence($"d0", $"d1", expr("INTERVAL 1 DAY"))).as("day"))
    val ord = Window.partitionBy($"user_id").orderBy($"day".asc)
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cal.join(daily, Seq("user_id", "day"), "left")
      .select($"user_id", $"day", coalesce($"n", lit(0L)).as("n_events"),
        last($"cents", ignoreNulls = true).over(wPrev).as("prev_cents"),
        last(when($"cents".isNotNull, $"day"), ignoreNulls = true).over(wPrev).as("prev_day"),
        first($"cents", ignoreNulls = true).over(wNext).as("next_cents"),
        first(when($"cents".isNotNull, $"day"), ignoreNulls = true).over(wNext).as("next_day"))
      // span is [first observed, last observed], so prev/next always exist
      .select($"user_id", $"day", $"n_events",
        when($"prev_day" === $"next_day", $"prev_cents")
          .otherwise(expr(
            """(prev_cents * datediff(next_day, day)
               + next_cents * datediff(day, prev_day))
              div datediff(next_day, prev_day)"""))
          .as("interp_cents"))
  }

  /** Integer-exact 3σ outlier detection: flag events whose value sits
    * more than three population standard deviations from the user's own
    * mean. The test |x−μ| > 3σ is evaluated as (n·x − S)² > 9·(n·S₂ − S²)
    * — both sides exact BIGINT (multiply the z² inequality through by
    * n²·σ²'s denominator) — so the flag set is bit-stable under any
    * partitioning and engines can't drift in a sqrt or a double sum.
    * ONE user_id window exchange carries all three moment sums; the
    * point itself stays in its own baseline (population z, the standard
    * streaming-monitor convention). The comparison runs in
    * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): the squared terms reach
    * (n·|cents|)², which blows through 2⁶³ at a few hundred large
    * events per user — BIGINT math here would wrap silently in Spark
    * (ANSI off) and raise in DuckDB, the worst possible divergence. The
    * binding bound is the SQUARED terms against DECIMAL(38,0)'s 10³⁸−1
    * ceiling (DuckDB's HUGEINT holds ~1.7·10³⁸, so in the narrow band
    * past Spark's ceiling the engines would diverge — Spark nulls the
    * predicate, DuckDB keeps evaluating): 9·(n·S₂−S²) ≤ 9·n²·c² and
    * dev² ≤ 4·n²·c² both stay under 10³⁸ iff n·|cents| < ~3·10¹⁸
    * (≈10^18.5) — still far past any real user (at |cents| ≤ 10⁹ that
    * is 3·10⁹ events for one user). Past it, compare the unsquared
    * |n·x−S| > 3·σ·n form in double instead. Only the WHERE widens —
    * output columns stay BIGINT. */
  def eventsAnomaly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
    val dec = "decimal(38,0)"
    Tables.events(s, d)
      .select($"user_id", $"event_id", round($"value" * 100).cast("bigint").as("cents"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sum_c", sum($"cents").over(w))
      // the Σc² aggregate is already past 2⁶³ territory — widen BEFORE
      // summing, not just in the comparison
      .withColumn("sum_c2", sum($"cents".cast(dec) * $"cents").over(w))
      .withColumn("dev", $"n".cast(dec) * $"cents" - $"sum_c")
      .where($"n" >= 2 &&
        $"dev" * $"dev" >
          lit(9L) * ($"n".cast(dec) * $"sum_c2" - $"sum_c".cast(dec) * $"sum_c"))
      .select($"user_id", $"event_id", $"cents")
  }

  /** Collated string semantics (Spark 4, SPARK-46830): grouping,
    * equality, and substring matching under the UTF8_LCASE collation —
    * the engine-level case-insensitivity a multi-source text corpus
    * needs without wrapping every expression in lower(). Mixed-case
    * surface forms are STAGED from custkey residues (lower / original /
    * first-upper-rest-lower), then grouped by the COLLATED column: the
    * three binary forms collapse to one case-insensitive group while
    * count_distinct on the raw column still sees all three. The group
    * representative Spark returns is whichever form a partition met
    * first — nondeterministic by contract — so the emitted key is
    * normalized through lower(); ci_eq_ok pins collated equality
    * (variant = lowercase under LCASE) and has_build pins collated
    * contains(). Oracle replays every column via lower() arithmetic. */
  def fnCollation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = $"c_custkey"
    val seg = $"c_mktsegment"
    val variant = when(k % 3 === 0, lower(seg))
      .when(k % 3 === 1, seg)
      .otherwise(concat(upper(seg.substr(lit(1), lit(1))),
        lower(seg.substr(lit(2), length(seg)))))
    Tables.customer(s, d)
      .select(variant.as("w"))
      .groupBy(collate($"w", "UTF8_LCASE").as("wc"))
      .agg(count(lit(1)).as("n"),
        count_distinct($"w").as("n_forms"),
        min((collate($"w", "UTF8_LCASE") === lower($"w")).cast("long")).as("ci_eq_ok"),
        max(collate($"w", "UTF8_LCASE").contains(lit("BuIlD")).cast("long")).as("has_build"))
      .select(lower($"wc").as("segment"), $"n", $"n_forms", $"ci_eq_ok", $"has_build")
  }

  /** URL parsing family (`parse_url`: HOST / PATH / QUERY / keyed query
    * param) — the per-row extraction every web-corpus pipeline runs
    * before host-level dedup or robots filtering. URLs are synthesized
    * deterministically from document fields (same staged-fixture pattern
    * as curate_pii_scrub), so the oracle can assert ground truth by
    * RECONSTRUCTING each component from the same fields — testing
    * Spark's parser against the URL grammar rather than against itself.
    * All codegen, zero shuffle. */
  def fnUrl(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val url = concat(lit("https://"), $"source", lit(".example.com/"), $"lang",
      lit("/doc-"), $"doc_id".cast("string"),
      lit("?ref=r"), pmod($"doc_id", lit(7L)).cast("string"))
    Tables.documents(s, d)
      .select($"doc_id", url.as("url"))
      .select($"doc_id", $"url",
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY')").as("query"),
        expr("parse_url(url, 'QUERY', 'ref')").as("ref"))
  }

  /** Nearest-event join — [[joinAsof]]'s bidirectional sibling (sensor /
    * log alignment semantics): each purchase pairs with the user's
    * CLOSEST click by |Δt| within ±1 day, not merely the latest
    * preceding one. Same single union-free pass: one (ts, kind,
    * event_id)-ordered user window carries the latest prior click
    * (last … ignoreNulls over the preceding frame) and the earliest
    * following click (first … over the following frame); the closer
    * side wins, exact ties prefer the earlier click, and a same-µs
    * click sorts before the purchase (kind 0 < 1) so Δt = 0 matches
    * deterministically. Unmatched purchases emit NULLs. All integer µs
    * arithmetic; two frames, ONE exchange. */
  def joinNearest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ord = Window.partitionBy($"user_id")
      .orderBy($"ts_us".asc, $"kind".asc, $"event_id".asc)
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val dayUs = 86400000000L
    val clickId = when($"kind" === 0, $"event_id")
    val clickTs = when($"kind" === 0, $"ts_us")
    Tables.events(s, d)
      .where($"event_type".isin("click", "purchase"))
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
        when($"event_type" === "click", 0L).otherwise(1L).as("kind"))
      .withColumn("prev_id", last(clickId, ignoreNulls = true).over(wPrev))
      .withColumn("prev_ts", last(clickTs, ignoreNulls = true).over(wPrev))
      .withColumn("next_id", first(clickId, ignoreNulls = true).over(wNext))
      .withColumn("next_ts", first(clickTs, ignoreNulls = true).over(wNext))
      .where($"kind" === 1)
      .withColumn("d_prev",
        when($"ts_us" - $"prev_ts" <= dayUs, $"ts_us" - $"prev_ts"))
      .withColumn("d_next",
        when($"next_ts" - $"ts_us" <= dayUs, $"next_ts" - $"ts_us"))
      .withColumn("prev_wins",
        $"d_prev".isNotNull && ($"d_next".isNull || $"d_prev" <= $"d_next"))
      .select($"user_id", $"event_id".as("purchase_id"),
        // neither side in window → both WHENs miss → NULL (unmatched)
        when($"prev_wins", $"prev_id")
          .when($"d_next".isNotNull, $"next_id").as("click_id"),
        when($"prev_wins", -$"d_prev")
          .when($"d_next".isNotNull, $"d_next").as("dt_us"))
  }

  /** Sequence-pattern detection (MATCH_RECOGNIZE-lite): per user, local
    * minima in the value series — positions where the previous and next
    * values both exceed the current one (a "dip", the down-up shape a
    * monitoring rule keys on). lag/lead over ONE (ts, event_id)-ordered
    * user window, then a per-user aggregate of dip count and the deepest
    * dip (all integer cents). The same two-window skeleton extends to
    * any fixed-length pattern; state is O(pattern length) per row. */
  def eventsDips(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(s, d)
      .select($"user_id", $"ts", $"event_id", round($"value" * 100).cast("bigint").as("c"))
      .withColumn("prev", lag($"c", 1).over(w))
      .withColumn("next", lead($"c", 1).over(w))
      .where($"prev" > $"c" && $"next" > $"c")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_dips"),
           max(least($"prev", $"next") - $"c").as("max_dip_cents"))
  }

  /** Sketch set algebra: estimate an INTERSECTION from mergeable HLL
    * sketches by inclusion–exclusion, |A∩B| ≈ est(A) + est(B) − est(A∪B)
    * — the audience-overlap question (users who click AND purchase)
    * answered without ever co-shuffling the two sets. Each side is one
    * mergeable sketch aggregate; the union is sketch-level (`hll_union`),
    * so the whole query moves three ~KB sketches, not user ids — at
    * 100 TB the two sides can live on different clusters and still
    * compose. The estimate is checked against the exact distinct
    * intersection (±10% or ±5 absolute — inclusion–exclusion stacks
    * three estimators' errors, measured ≪ at fixture scales). */
  def aggHllIntersect(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, d)
    val clicks = e.where($"event_type" === "click").select($"user_id")
    val buys = e.where($"event_type" === "purchase").select($"user_id")
    val est = clicks.agg(hll_sketch_agg($"user_id").as("ska"))
      .crossJoin(buys.agg(hll_sketch_agg($"user_id").as("skb")))
      .select(
        (hll_sketch_estimate($"ska") + hll_sketch_estimate($"skb") -
         hll_sketch_estimate(hll_union($"ska", $"skb"))).as("est_both"))
    val exact = clicks.intersect(buys).agg(count(lit(1)).as("exact_both"))
    est.crossJoin(exact) // two 1-row frames
      .select($"exact_both",
        (abs($"est_both" - $"exact_both") <=
          greatest($"exact_both".cast("double") * 0.10, lit(5.0)))
          .cast("long").as("intersect_ok"))
  }

  /** Calendar gap-fill + LOCF (time-series resampling): per user, the
    * daily activity series over the user's own [first, last] day span
    * with missing days materialized (count 0) and the last seen day's
    * cents carried forward. The calendar derives from ONE per-user
    * min/max aggregate exploded through `sequence` — never a cross join
    * against a global calendar — so row count is Σ user-spans. The LOCF
    * window and the daily aggregate share the user_id partitioning.
    * Counts and integer cents only: no double summation anywhere. */
  def tsGapfill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n"),
           sum(round($"value" * 100).cast("bigint")).as("cents"))
    val cal = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id",
        explode(sequence($"d0", $"d1", expr("INTERVAL 1 DAY"))).as("day"))
    val w = Window.partitionBy($"user_id").orderBy($"day".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("user_id", "day"), "left")
      .select($"user_id", $"day",
        coalesce($"n", lit(0L)).as("n_events"),
        coalesce($"cents", lit(0L)).as("day_cents"),
        last($"cents", ignoreNulls = true).over(w).as("locf_cents"))
  }

  /** OHLC downsampling (the market-data resample every monitoring and
    * feature pipeline runs): per (user, day) bucket, the opening /
    * highest / lowest / closing value plus count and volume — all in
    * integer cents. Open and close are FIRST/LAST under the (ts,
    * event_id) total order, computed as two frames over the SAME
    * (user, day)-partitioned sort — one exchange carries the window
    * pass AND the final aggregate (the window's partition keys are the
    * groupBy keys, so the agg reuses the exchange). high/low/n/volume
    * are plain map-side-combinable aggregates. At 100 TB this is the
    * canonical "align ticks to bars" pass: state per bucket is O(1). */
  /** Day-of-week seasonality profile — the first decomposition every
    * ops dashboard wants: per ISO weekday, active-day count, event
    * count, exact total cents, cents-per-active-day (integer floor
    * div), and a peak flag (argmax over the 7-row profile, computed
    * with an unpartitioned window that is trivially safe because the
    * input IS 7 rows). Spark's `weekday()` (0=Mon) + 1 equals DuckDB's
    * `isodow` (1=Mon), so the bucketing replays bit-exactly — the
    * engines' default `dayofweek` functions DISAGREE on the week
    * origin (Sunday=1 vs Sunday=0), the classic cross-engine seasonal
    * bug this operator's oracle would catch. One scan, one 7-group
    * aggregate, all map-side combinable; the distinct-day count rides
    * the same aggregate as count_distinct. */
  /** Lagged cross-correlation between two daily series (views vs
    * purchases): lead/lag discovery — "does today's browsing predict
    * purchases ℓ days out?" — the first question asked of any pair of
    * operational time series. Pearson correlation at each lag in
    * [-3, +3], computed FROM EXACT INTEGER MOMENTS: per-lag n/Σx/Σy/Σxy
    * are BIGINT sums of daily counts (order-independent), and the
    * correlation divides those exact integers in one identical double
    * expression on both engines — `corr()` built-ins are deliberately
    * NOT used because Spark and DuckDB implement different streaming
    * variance algorithms whose last bits disagree. Day pairing is an
    * inner join on shifted day (days absent from either series drop; a
    * gapfilled-zeros variant composes with [[tsGapfill]]). Plan: two
    * tiny day-grain aggregates (map-side combined over the raw scan),
    * a 7-row broadcast lag frame, one day-key equi-join — at 100 TB
    * the only fact-sized work is the first aggregate's scan; everything
    * after operates on |days| rows. */
  def tsCrossCorrelation(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    def daily(t: String, c: String) = ev.where($"event_type" === t)
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as(c))
    val x = daily("view", "xv")
    val y = daily("purchase", "yv")
    val lags = broadcast((-3 to 3).toDF("lag_d"))
    val paired = x.crossJoin(lags)
      .join(y.select($"day".as("y_day"), $"yv"),
        $"y_day" === expr("timestampadd(DAY, lag_d, day)"))
    val m = paired.groupBy($"lag_d".cast("bigint").as("lag_d"))
      .agg(count(lit(1)).as("n"),
        sum($"xv").as("sx"), sum($"yv").as("sy"),
        sum($"xv" * $"yv").as("sxy"),
        sum($"xv" * $"xv").as("sx2"), sum($"yv" * $"yv").as("sy2"))
    // zero-variance guard, identical on both sides: Spark's Divide
    // returns NULL on /0 while DuckDB returns IEEE inf/NaN, so a
    // constant series at some lag would flag a spurious engine/oracle
    // mismatch; an explicit NULL under zero variance pins ONE semantic
    m.select($"lag_d", $"n", $"sx", $"sy", $"sxy",
      when(($"n" * $"sx2" - $"sx" * $"sx") === 0L ||
           ($"n" * $"sy2" - $"sy" * $"sy") === 0L, lit(null))
        .otherwise(($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          (sqrt(($"n" * $"sx2" - $"sx" * $"sx").cast("double")) *
           sqrt(($"n" * $"sy2" - $"sy" * $"sy").cast("double")))).as("corr"))
  }

  /** Pairwise Pearson correlation matrix over the four lineitem
    * measures (quantity, price, discount, tax) per return flag — the
    * feature-correlation profile every training-data EDA pass computes
    * before feature selection. The [[tsCrossCorrelation]] exactness
    * pattern, widened to a matrix and hardened one magnitude up: all
    * 14 moments (4 sums, 4 sum-squares, 6 cross-sums) accumulate as
    * DECIMAL(38,0) over integer cents — BIGINT cross-products were
    * measured WRAPPING at sf0.1 on ml_linreg, and sum(price_cents²)
    * here is ~10²² at that SF — then each variance/covariance combo
    * (n·sxy − sx·sy) is computed exactly in decimal and cast to double
    * only for the final sqrt/divide, which both engines evaluate as
    * the identical IEEE expression (sqrt is correctly rounded) →
    * bit-equal corr. Zero-variance pairs → explicit NULL (the
    * tsCrossCorrelation guard).
    * Scale shape: ONE fact scan into ONE map-side-combined hash
    * aggregate (corpus → |flags| rows × 15 columns — the full matrix
    * costs one pass however many pairs); the 6-way pair expansion is a
    * `stack` over that profile. The oracle re-states the matrix as 6
    * independent UNION ALL branches — a different decomposition of the
    * same moments, so the single-scan rewrite is checked against the
    * per-pair definition. */
  def aggCorrMatrix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val b = Tables.lineitem(s, d).select(
      $"l_returnflag".as("flag"),
      round($"l_quantity" * 100).cast("bigint").as("q"),
      cents($"l_extendedprice").as("p"),
      round($"l_discount" * 100).cast("bigint").as("dd"),
      round($"l_tax" * 100).cast("bigint").as("t"))
    // per-row products are DOMAIN-bounded (quantity ≤ 50, price/discount/
    // tax cents bounded by the TPC-H value domains — independent of row
    // count), so they stay exact in LONG at any SF; only the corpus-sized
    // SUMS need the decimal accumulator. Multiplying in long and casting
    // once per row keeps the hot loop out of per-row BigDecimal math
    // (measured 2.5 s → decimal-multiply vs long-multiply at sf0.1).
    def s1(c: String) = sum(col(c).cast(dec)).as(s"s_$c")
    def s2(c: String) = sum((col(c) * col(c)).cast(dec)).as(s"s2_$c")
    def sxy(x: String, y: String) = sum((col(x) * col(y)).cast(dec)).as(s"s_${x}_$y")
    val m = b.groupBy($"flag").agg(count(lit(1)).as("n"),
      s1("q"), s1("p"), s1("dd"), s1("t"),
      s2("q"), s2("p"), s2("dd"), s2("t"),
      sxy("q", "p"), sxy("q", "dd"), sxy("q", "t"),
      sxy("p", "dd"), sxy("p", "t"), sxy("dd", "t"))
    val pairs = m.selectExpr("flag", "n", """stack(6,
      'quantity', 'price',    s_q,  s_p,  s_q_p,  s2_q,  s2_p,
      'quantity', 'discount', s_q,  s_dd, s_q_dd, s2_q,  s2_dd,
      'quantity', 'tax',      s_q,  s_t,  s_q_t,  s2_q,  s2_t,
      'price',    'discount', s_p,  s_dd, s_p_dd, s2_p,  s2_dd,
      'price',    'tax',      s_p,  s_t,  s_p_t,  s2_p,  s2_t,
      'discount', 'tax',      s_dd, s_t,  s_dd_t, s2_dd, s2_t
      ) AS (cx, cy, sx, sy, sxy, sx2, sy2)""")
    pairs.select($"flag", $"cx", $"cy", $"n",
      when(($"n" * $"sx2" - $"sx" * $"sx") === 0 ||
           ($"n" * $"sy2" - $"sy" * $"sy") === 0, lit(null))
        .otherwise(($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          (sqrt(($"n" * $"sx2" - $"sx" * $"sx").cast("double")) *
           sqrt(($"n" * $"sy2" - $"sy" * $"sy").cast("double")))).as("corr"))
  }

  /** Forecast BASELINE error metrics (Hyndman's forecasting-101 rule:
    * no model earns its keep until it beats naive and seasonal-naive):
    * per method, MAE in cents and sMAPE in ppm for one-step forecasts
    * of daily purchase revenue — naive (yesterday) and snaive-7 (same
    * weekday last week). Exact integers end-to-end: per-day sMAPE
    * terms are 2·|f−o|·10⁶ div (f+o) (floor-div, f+o > 0 on revenue
    * days), the means floor-div again — both engines replay the same
    * quantized arithmetic. Scale: the one corpus-sized stage is the
    * day-grain aggregate; the lag windows run over the CALENDAR-
    * bounded grid (the ts_changepoint class) and the output is 2
    * rows. */
  def tsForecastBaselines(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, d)
      .where($"event_type" === "purchase")
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(sum(round($"value" * 100).cast("bigint")).as("cents"))
      .localCheckpoint() // two lag readers
    val w = Window.orderBy($"day")
    def metrics(method: String, lagN: Int) = daily
      .withColumn("f", lag($"cents", lagN).over(w))
      .where($"f".isNotNull)
      .select(abs($"f" - $"cents").as("ae"),
        expr("(2 * abs(f - cents) * 1000000) div (f + cents)").as("sm"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(ae) div count(*) AS BIGINT)").as("mae_cents"),
        expr("CAST(sum(sm) div count(*) AS BIGINT)").as("smape_ppm"))
      .select(lit(method).as("method"), $"n", $"mae_cents", $"smape_ppm")
    metrics("naive", 1).unionAll(metrics("snaive7", 7))
  }

  /** Gini impurity of the per-day event-type mix — the distribution-
    * concentration diagnostic (is traffic diversifying or collapsing
    * into one event type?) and the split criterion [[MlFeatures
    * .boostedStumps]]'s classification twin would use. Exact integer
    * ppm: gini = 1 − Σpᵢ² stated as (n² − Σnᵢ²)·10⁶ div n² — no
    * division until the final quantized one; n²·10⁶ rides
    * DECIMAL(38,0) (wraps BIGINT past ~3·10⁶ rows/day). Also emits
    * the dominant type's share (max nᵢ·10⁶ div n). ONE map-side
    * (day, type) aggregate (≤|days|×|types| rows) folded to the day
    * profile — corpus touched once. */
  def aggGini(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byType = Tables.events(s, d)
      .groupBy(date_trunc("day", $"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n_i"))
    byType.groupBy($"day")
      .agg(sum($"n_i").as("n"),
        sum(($"n_i".cast(org.apache.spark.sql.types.DecimalType(38, 0)) * $"n_i"))
          .as("sum_sq"),
        max($"n_i").as("max_i"),
        count(lit(1)).as("n_types"))
      .select($"day", $"n", $"n_types",
        expr("""CAST(((CAST(n AS DECIMAL(38,0)) * n - sum_sq) * 1000000)
                     div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""").as("gini_ppm"),
        expr("CAST((CAST(max_i AS DECIMAL(38,0)) * 1000000) div n AS BIGINT)")
          .as("dominant_share_ppm"))
  }

  /** Difference-in-differences estimator (Card–Krueger form) — THE
    * quasi-experimental effect readout when treatment was not
    * randomized: purchase value for treated (odd user_id) vs control
    * cohorts, before vs after a cutoff date, effect = (T,post −
    * T,pre) − (C,post − C,pre). ONE map-side-combined conditional
    * aggregate computes all four cells in a single fact pass (the
    * agg_corr_matrix shape); cell means are exact floor-div ppm on
    * DECIMAL(38,0) sums (BIGINT·10⁶ wraps at corpus scale — the
    * ml_linreg rationale; sums are non-negative so plain `div` ≡
    * DuckDB HUGEINT `//`), and the DiD is computed ON the quantized
    * means so both engines state the identical integer. Empty cells →
    * NULL (never arises at the fixture SFs, pinned anyway). */
  def eventsDid(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cutoff = graft.core.Utc.ts("2024-01-15 00:00:00")
    val p = Tables.events(s, d)
      .where($"event_type" === "purchase")
      .select(($"user_id" % 2).as("t"),
        ($"ts" >= lit(cutoff)).cast("bigint").as("po"),
        round($"value" * 100).cast("bigint").as("cents"))
    def cell(t: Int, po: Int, col: org.apache.spark.sql.Column) =
      sum(when($"t" === t && $"po" === po, col).otherwise(lit(0L)))
    val m = p.groupBy().agg(
      cell(0, 0, lit(1L)).as("n00"), cell(0, 1, lit(1L)).as("n01"),
      cell(1, 0, lit(1L)).as("n10"), cell(1, 1, lit(1L)).as("n11"),
      cell(0, 0, $"cents").cast(dec).as("s00"), cell(0, 1, $"cents").cast(dec).as("s01"),
      cell(1, 0, $"cents").cast(dec).as("s10"), cell(1, 1, $"cents").cast(dec).as("s11"))
    def meanPpm(sc: String, nc: String) =
      expr(s"CAST(CASE WHEN $nc = 0 THEN NULL ELSE ($sc * 1000000) div $nc END AS BIGINT)")
    m.select($"n00", $"n01", $"n10", $"n11",
      meanPpm("s00", "n00").as("m00_ppm"), meanPpm("s01", "n01").as("m01_ppm"),
      meanPpm("s10", "n10").as("m10_ppm"), meanPpm("s11", "n11").as("m11_ppm"))
      .withColumn("did_ppm",
        ($"m11_ppm" - $"m10_ppm") - ($"m01_ppm" - $"m00_ppm"))
  }

  /** Delete-one-bucket jackknife for the mean — distributed uncertainty
    * quantification: how wide is the confidence band around "average
    * purchase value"? True bootstrap needs random resampling; the
    * delete-d jackknife over K = 20 content-addressed user buckets
    * (md5 hash — [[Maintenance.md5Hex32Col]], the repo's one hash
    * convention) is its deterministic, one-pass, merge-friendly
    * sibling (Efron 1982): leave-one-bucket-out means m₋ᵦ from the
    * per-bucket (nᵦ, sᵦ) partials, variance = (K−1)/K · Σ(m₋ᵦ − m̄)².
    * Everything after the ONE fact aggregate is 20-row profile math;
    * the ppm quantization of m₋ᵦ is applied BEFORE the variance on
    * both engines, so the contract is exact integers all the way.
    * At 100 TB: one map-side-combined aggregate (20 partials), zero
    * extra passes — the same partials an incremental pipeline already
    * maintains ([[Maintenance.incrementalAgg]]). K = 20 is the
    * declared contract; the estimator is NOT K-fragile — the
    * K-sensitivity law in NewOpsLawSpec replays the whole pipeline at
    * K ∈ {5, 10, 20} and pins every mbar within 1 % of the global
    * mean (delete-one-bucket means center on the full-sample mean
    * whatever the bucketing). */
  def eventsJackknife(s: SparkSession, d: String): DataFrame =
    jackknifeByK(s, d, 20)

  /** [[eventsJackknife]] with the bucket count exposed — the law spec
    * varies K to show the uncertainty estimate is a property of the
    * data, not of the K = 20 choice the public key declares. */
  private[graft] def jackknifeByK(s: SparkSession, d: String, k: Int): DataFrame = {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val byB = Tables.events(s, d)
      .where($"event_type" === "purchase")
      .select((Maintenance.md5Hex32Col($"user_id") % k).as("bkt"),
        round($"value" * 100).cast("bigint").as("cents"))
      .groupBy($"bkt")
      .agg(count(lit(1)).as("n_b"), sum($"cents").cast(dec).as("s_b"))
      .localCheckpoint() // consumed by the totals probe and the output
    val g = broadcast(byB.agg(sum($"n_b").as("n_tot"), sum($"s_b").as("s_tot"),
      count(lit(1)).as("k")))
    val loo = byB.crossJoin(g)
      .select($"bkt", $"n_b", $"s_b".cast("bigint").as("s_b"), $"k",
        expr("CAST((( s_tot - s_b) * 1000000) div (n_tot - n_b) AS BIGINT)")
          .as("loo_mean_ppm"))
      .localCheckpoint() // consumed by the mbar/var probe and the output
    val stats = broadcast(loo
      .agg(expr("CAST(sum(loo_mean_ppm) div count(*) AS BIGINT)").as("mbar_ppm"),
        count(lit(1)).as("k2")))
    val varRow = broadcast(loo.crossJoin(stats)
      .agg(expr("""CAST(sum(CAST(loo_mean_ppm - mbar_ppm AS DECIMAL(38,0))
                           * (loo_mean_ppm - mbar_ppm))
                        * max(k2 - 1) div max(k2) AS BIGINT)""").as("jk_var_ppm2")))
    loo.crossJoin(varRow)
      .select($"bkt", $"n_b", $"s_b", $"loo_mean_ppm", $"jk_var_ppm2")
  }

  /** Autocorrelation function of the daily revenue series at lags 1–10
    * (the Box–Jenkins diagnostic that picks AR orders and validates the
    * `ts_holt`/`ts_stl_lite` residuals): Pearson between the series and
    * its own lag, per-lag means over the PAIRED subset (the textbook
    * sample-ACF-with-per-lag-moments variant, which is what
    * [[tsCrossCorrelation]] computes between two series — this is its
    * self-join twin on the revenue grid). Exactness identical: BIGINT
    * moments per lag, correlation as ONE shared double expression,
    * zero-variance → NULL. Scale: one fact-sized day-grain aggregate,
    * then a |days|×10 broadcast self-pairing — calendar-bounded both
    * ways. */
  def tsAcf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, d)
      .where($"event_type" === "purchase")
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(sum(round($"value" * 100).cast("bigint")).as("cents"))
      .localCheckpoint() // both sides of the self-pairing
    val lags = broadcast((1 to 10).toDF("lag_d"))
    val paired = daily.crossJoin(lags)
      .join(broadcast(daily.select($"day".as("y_day"), $"cents".as("yv"))),
        $"y_day" === expr("timestampadd(DAY, lag_d, day)"))
    // daily revenue cents grow with the CORPUS (unlike the day counts in
    // tsCrossCorrelation), so squares leave long around daily sums of
    // ~3·10⁹ — and the pairing frame is calendar-bounded anyway, so the
    // decimal moments are free here
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val m = paired.groupBy($"lag_d".cast("bigint").as("lag_d"))
      .agg(count(lit(1)).as("n"),
        sum($"cents".cast(dec)).as("sx"), sum($"yv".cast(dec)).as("sy"),
        sum($"cents".cast(dec) * $"yv").as("sxy"),
        sum($"cents".cast(dec) * $"cents").as("sx2"),
        sum($"yv".cast(dec) * $"yv").as("sy2"))
    m.select($"lag_d", $"n",
      when(($"n" * $"sx2" - $"sx" * $"sx") === 0L ||
           ($"n" * $"sy2" - $"sy" * $"sy") === 0L, lit(null))
        .otherwise(($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
          (sqrt(($"n" * $"sx2" - $"sx" * $"sx").cast("double")) *
           sqrt(($"n" * $"sy2" - $"sy" * $"sy").cast("double")))).as("acf"))
  }

  /** CUSUM changepoint detection over the daily revenue series (Page
    * 1954): the standard "did the level shift, and when" monitor run on
    * every operational metric. The cumulative deviation from the global
    * mean is kept EXACT by scaling through the row count — S_t·n =
    * n·prefix_t − t·total, all BIGINT — so argmax and ties replay
    * bitwise (a double running mean would drift in the last bits and
    * flip the argmax on near-ties). Emits the full per-day trace with
    * the changepoint flag (ties flag every maximal day — deterministic,
    * no arbitrary pick). Plan: one fact-sized day-grain aggregate, then
    * windows over |days| rows — the unpartitioned ORDER BY day window is
    * bounded by the calendar, not the corpus (the events_rfm
    * discipline); the global (n, total) pair rides a 1-row broadcast
    * cross join. */
  def tsChangepoint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // |days|-sized but referenced by FOUR plan subtrees (g, c, and both
    // again under mx): checkpoint, or Catalyst duplicates the fact-sized
    // scan+aggregate per reference (the tsInterpolate discipline)
    val daily = Tables.events(s, d)
      .where($"event_type" === "purchase")
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(sum(round($"value" * 100).cast("bigint")).as("cents"))
      .localCheckpoint()
    val g = broadcast(daily.agg(count(lit(1)).as("n"), sum($"cents").as("total")))
    val wOrd = Window.orderBy($"day")
    val c = daily.select($"day", $"cents",
      row_number().over(wOrd).cast("bigint").as("t"),
      sum($"cents").over(wOrd).as("prefix"))
      .crossJoin(g)
      .withColumn("cusum_scaled", $"n" * $"prefix" - $"t" * $"total")
      .localCheckpoint() // two consumers: the max probe and the output
    val mx = broadcast(c.agg(max(abs($"cusum_scaled")).as("mx")))
    c.crossJoin(mx)
      .select($"day", $"t", $"cents", $"cusum_scaled",
        (abs($"cusum_scaled") === $"mx").cast("bigint").as("is_changepoint"))
  }

  /** Robust time-series anomaly flags via median/MAD (Hampel /
    * Iglewicz–Hoaglin modified z-score — the outlier detector that,
    * unlike the CUSUM mean-shift in [[tsChangepoint]] or the stddev
    * z-score in `events_anomaly`, is itself immune to the outliers it
    * hunts): per event type, flag days whose daily revenue deviates
    * from the type's median by more than z·MAD/0.6745 (z = 1.5 here —
    * the textbook 3.5 is a parameter; 1.5 exercises both flag values
    * at the gate SFs). Everything integer-exact: cents quantization,
    * LOWER-median convention (rank ceil(n/2) of the sorted profile, so
    * even-length series never interpolate), and the threshold as the
    * cross-multiplied comparison 6745·|x−med| > 15000·MAD (zero-MAD
    * series fall back to |x−med| > 0) — no division anywhere, so the
    * DuckDB oracle (an independent row_number-rank formulation) must
    * hash-match bit-for-bit.
    * Scale shape: ONE corpus-sized map-side-combined aggregate (events
    * → |types|×|days| daily profile); both medians are per-type sorted
    * collects over that profile, bounded by the CALENDAR (≤ |days|
    * elements per group whatever the SF — the ts_seasonal_dow
    * boundedness class); the med/MAD profiles (≤|types| rows) join
    * back broadcast. No window over fact rows, no driver loop. */
  def tsAnomalyMad(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // two consumers (median profile + dev join): checkpoint, or the
    // fact aggregate re-runs per reference (the tsChangepoint rule)
    val daily = Tables.events(s, d)
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(sum(round($"value" * 100).cast("bigint")).as("cents"))
      .localCheckpoint()
    val lowerMedian = (c: org.apache.spark.sql.Column) =>
      element_at(sort_array(c), ((size(c) + 1) / 2).cast("int"))
    val med = daily.groupBy($"event_type")
      .agg(lowerMedian(collect_list($"cents")).as("med"))
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("adev", abs($"cents" - $"med"))
      .localCheckpoint() // two consumers: MAD profile + the output
    val mad = dev.groupBy($"event_type")
      .agg(lowerMedian(collect_list($"adev")).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .select($"event_type", $"day", $"cents", $"med", $"mad",
        when($"mad" === 0, $"adev" > 0)
          .otherwise(lit(6745L) * $"adev" > lit(15000L) * $"mad")
          .cast("bigint").as("is_anomaly"))
  }

  def tsSeasonalDow(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val profile = Tables.events(s, d)
      .select((weekday($"ts") + 1).cast("bigint").as("iso_dow"),
        to_date($"ts").as("day"),
        round($"value" * 100).cast("bigint").as("cents"))
      .groupBy($"iso_dow")
      .agg(count_distinct($"day").as("n_days"),
        count(lit(1)).as("n_events"),
        sum($"cents").as("total_cents"))
      .select($"iso_dow", $"n_days", $"n_events", $"total_cents",
        expr("total_cents div n_days").as("cents_per_day"))
    profile.withColumn("is_peak",
      ($"cents_per_day" ===
        max($"cents_per_day").over(Window.partitionBy()))
        .cast("bigint"))
  }

  /** Holt linear (double-exponential) smoothing of daily purchase
    * revenue — level + trend forecasting (Holt 1957), the one-step-ahead
    * `fitted` being the forecast every ops dashboard overlays. Exact
    * INTEGER recurrence so the DuckDB oracle replays it bit-for-bit:
    * α = 1/5, β = 1/10 as rational truncating divisions
    * (`div` here ≡ DuckDB integer `//`, both truncate toward zero — and
    * trend DOES go negative, so matching division semantics is load-
    * bearing, not cosmetic):
    *   level₀ = obs₀, trend₀ = 0, fitted₀ = obs₀
    *   fittedₜ = levelₜ₋₁ + trendₜ₋₁
    *   levelₜ  = (obsₜ + 4·fittedₜ) div 5
    *   trendₜ  = ((levelₜ − levelₜ₋₁) + 9·trendₜ₋₁) div 10
    * Scale shape: the ONLY corpus-sized work is the map-side-combined
    * day-grid aggregate (corpus → ≤|calendar days| rows); the smoothing
    * is an inherently sequential fold over that CALENDAR-BOUNDED grid,
    * run as one `aggregate` HOF over the collected (day, cents) array —
    * the ts_seasonal_dow boundedness class, ~730 rows at two years
    * whatever the SF — then exploded back to rows. No window, no
    * driver loop. The oracle is an independent formulation (recursive
    * CTE over the ordered grid), so the fold is checked against the
    * recurrence definition. */
  def tsHolt(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val grid = Tables.events(s, d)
      .where($"event_type" === "purchase")
      .groupBy(to_date($"ts").as("day"))
      .agg(sum(round($"value" * 100).cast("bigint")).as("cents"))
    grid
      .agg(sort_array(collect_list(struct($"day", $"cents"))).as("g"))
      .select(expr("""
        aggregate(
          g,
          CAST(array() AS ARRAY<STRUCT<day: DATE, obs_cents: BIGINT,
                                       level: BIGINT, trend: BIGINT,
                                       fitted: BIGINT>>),
          (acc, x) -> CASE WHEN size(acc) = 0
            THEN array(named_struct(
              'day', x.day, 'obs_cents', x.cents,
              'level', x.cents, 'trend', CAST(0 AS BIGINT),
              'fitted', x.cents))
            ELSE concat(acc, array(named_struct(
              'day', x.day, 'obs_cents', x.cents,
              'level',
                (x.cents + 4 * (element_at(acc, -1).level
                                + element_at(acc, -1).trend)) div 5,
              'trend',
                ((x.cents + 4 * (element_at(acc, -1).level
                                 + element_at(acc, -1).trend)) div 5
                 - element_at(acc, -1).level
                 + 9 * element_at(acc, -1).trend) div 10,
              'fitted',
                element_at(acc, -1).level + element_at(acc, -1).trend)))
          END) AS h"""))
      .select(explode($"h").as("r"))
      .select($"r.day", $"r.obs_cents", $"r.level", $"r.trend", $"r.fitted")
  }

  /** STL-lite seasonal–trend decomposition of daily revenue —
    * trend = CENTERED 7-day moving average (positional over the
    * observed day sequence, defined only where the full window exists:
    * days 4..n−3, the classic edge convention), seasonal = per-ISO-
    * weekday floor-mean of the detrended series, residual = obs −
    * trend − seasonal. All exact integers: the 7-day sum floor-divides
    * by 7, the seasonal mean is sum div count on (possibly negative)
    * detrended cents — truncating `div` on both engines, the ts_holt
    * division discipline. The anomaly/forecast twin queries
    * (`ts_changepoint`, `ts_holt`) consume raw or level series; this
    * is the decomposition view every capacity dashboard plots.
    *
    * Scale shape: corpus → map-side-combined day grid (calendar-
    * bounded); the centered MA runs as one `transform` + windowed
    * `slice` fold over the collected grid (no Spark window, no
    * allowlist); the seasonal profile is a ≤7-row aggregate broadcast
    * back onto the ≤|days| trend frame. */
  def tsStlLite(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val grid = Tables.events(s, d)
      .where($"event_type" === "purchase")
      .groupBy(to_date($"ts").as("day"))
      .agg(sum(round($"value" * 100).cast("bigint")).as("cents"))
    val tr = grid
      .agg(sort_array(collect_list(struct($"day", $"cents"))).as("g"))
      .select(expr("""
        CASE WHEN size(g) >= 7 THEN
          transform(sequence(4, size(g) - 3), i -> named_struct(
            'day', g[i - 1].day,
            'obs_cents', g[i - 1].cents,
            'trend_cents', aggregate(slice(g, i - 3, 7), CAST(0 AS BIGINT),
                                     (a, x) -> a + x.cents) div 7))
        ELSE CAST(array() AS ARRAY<STRUCT<day: DATE, obs_cents: BIGINT,
                                          trend_cents: BIGINT>>)
        END AS t"""))
      .select(explode($"t").as("r"))
      .select($"r.day", $"r.obs_cents", $"r.trend_cents",
        (weekday($"r.day") + 1).cast("bigint").as("iso_dow"))
      // consumed by the seasonal aggregate AND the final join
      .localCheckpoint(eager = false)
    val se = tr.groupBy($"iso_dow") // ≤7 rows
      .agg(expr("sum(obs_cents - trend_cents) div count(1)").as("seasonal_cents"))
    tr.join(broadcast(se), "iso_dow")
      .select($"day", $"obs_cents", $"trend_cents", $"seasonal_cents",
        ($"obs_cents" - $"trend_cents" - $"seasonal_cents").as("resid_cents"))
  }

  def tsResample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ord = Window.partitionBy($"user_id", $"day")
      .orderBy($"ts".asc, $"event_id".asc)
    val wOpen = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wClose = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    Tables.events(s, d)
      .select($"user_id", date_trunc("day", $"ts").as("day"), $"ts",
        $"event_id", round($"value" * 100).cast("bigint").as("cents"))
      .withColumn("open", first($"cents").over(wOpen))
      .withColumn("close", last($"cents").over(wClose))
      .groupBy($"user_id", $"day")
      .agg(count(lit(1)).as("n_events"),
        min($"open").as("open_cents"),   // constant per bucket: min = the value
        max($"cents").as("high_cents"),
        min($"cents").as("low_cents"),
        min($"close").as("close_cents"),
        sum($"cents").as("vol_cents"))
  }

  /** Interval-overlap join WITHOUT the join (SURVEY §2.3 D's hard
    * temporal shape): per part, how many pairs of shipment transit
    * intervals overlap, and the peak number simultaneously in transit.
    * The naive formulation is an equi-key self-join with an overlap
    * predicate — O(c²) rows per part, quadratic on hot keys. This is
    * the sweep-line reshape: each interval becomes a start(+1)/end(−1)
    * event; under the (day, typ) order with starts before ends,
    * the running active count AT each start equals the number of
    * intervals the starting one overlaps (inclusive ends: an interval
    * ending the same day still counts, because its −1 sorts after the
    * start). Σ of that count = exact overlapping-pair count; max+1 =
    * peak concurrency — one exchange + one window, state O(1), never
    * materializing a pair. The ORACLE runs the actual quadratic
    * self-join, so the sweep's equivalence to the join semantics is
    * what the hash-check proves. Intervals are first GROUPED by (part,
    * d0, d1) with multiplicity m — the fixture has duplicate
    * (orderkey, linenumber) rows, so no row-level column set is a
    * usable tiebreak, while the group key is unique per part and gives
    * both engines a true total order (dd, typ, d0, d1). A group
    * contributes m·act cross-pairs at its start plus C(m,2) pairs
    * among its own identical intervals; deltas are ±m. Transit
    * duration is STAGED from persisted fields (the fixture has no
    * receipt date): 1 + (l_suppkey mod 14) days, replayed identically
    * by the oracle. */
  def joinInterval(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // ONE exchange end-to-end: hash-partitioning on l_partkey alone
    // satisfies the clustered distribution of the (part, d0, d1) group
    // agg, the part-partitioned window AND the final per-part agg —
    // interval groups barely compress raw rows (shipdates vary), so one
    // raw-row shuffle beats agg-exchange + window-exchange. Plan pinned
    // in PlanShapeSpec.
    val iv = Tables.lineitem(s, d)
      .select($"l_partkey",
        datediff(to_date($"l_shipdate"), to_date(lit("1970-01-01"))).as("d0"),
        (datediff(to_date($"l_shipdate"), to_date(lit("1970-01-01")))
          + lit(1) + pmod($"l_suppkey", lit(14))).as("d1"))
      .repartition($"l_partkey")
      .groupBy($"l_partkey", $"d0", $"d1").agg(count(lit(1)).as("m"))
    val ev = iv.select($"l_partkey", $"m", $"d0", $"d1",
      explode(array(
        struct($"d0".as("dd"), lit(0).as("typ")),
        struct($"d1".as("dd"), lit(1).as("typ")))).as("e"))
      .select($"l_partkey", $"e.dd", $"e.typ", $"d0", $"d1", $"m")
    val w = Window.partitionBy($"l_partkey")
      .orderBy($"dd".asc, $"typ".asc, $"d0".asc, $"d1".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("act",
        coalesce(sum(when($"typ" === 0, $"m").otherwise(-$"m")).over(w), lit(0L)))
      .where($"typ" === 0)
      .groupBy($"l_partkey")
      .agg(sum($"m" * $"act" + expr("m * (m - 1) div 2")).as("n_overlap_pairs"),
        max($"act" + $"m").as("max_concurrency"),
        sum($"m").as("n_intervals"))
  }

  /** VARIANT-type semi-structured path access (Spark 4's native
    * open-schema column, SPARK-45827 — the parquet-native answer to
    * "a JSON blob per row" that every ingest pipeline carries):
    * `parse_json` once into a binary VARIANT, then typed
    * `variant_get` path extraction — object fields, nested objects,
    * array indexing — and `try_variant_get` returning NULL on a
    * missing path instead of failing the row. The JSON itself is
    * STAGED deterministically from document fields (fn_url's pattern),
    * so the oracle asserts ground truth by RECONSTRUCTING each
    * extracted value from the same fields — the parser+extractor is
    * tested against the JSON grammar, not against itself. Per-row and
    * shuffle-free; at 100 TB VARIANT's shredded binary encoding keeps
    * repeated path access O(field), not O(document re-parse). */
  /** Ordered string aggregation (`listagg`, new as a first-class
    * aggregate in Spark 4 — SPARK-42746): per nation, the
    * comma-joined roster of high-balance customer names under an
    * explicit WITHIN GROUP order. The ordering clause is the whole
    * point — an unordered listagg is nondeterministic under any
    * parallel engine and useless under a hash-compare gate (same
    * reasoning as [[aggMode]]'s tie rule). The balance filter bounds
    * the per-group string: rosters a pipeline materializes must be
    * capped by a predicate or top-k, never "all rows", or a hot group
    * OOMs the agg buffer at scale. */
  def aggListagg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .where($"c_acctbal" > 9000)
      .groupBy($"c_nationkey".cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_rich"),
        expr("listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name)").as("names_csv"))
  }

  /** Exact weighted median — the robust location statistic percentile
    * sketches approximate, computed exactly in ONE window pass: sort
    * each group by value under a total order, accumulate weights, and
    * the weighted median is the smallest value whose cumulative weight
    * reaches half the group total (the lower weighted median — a pinned
    * convention, like [[aggMode]]'s tie rule). Weights are STAGED from
    * the order key (1 + key mod 7 — the fixture has no weight column);
    * everything is integer cents/counts so both engines agree exactly.
    * One exchange: the (priority) window sort also serves the final
    * per-priority aggregate. At 100 TB this is the shape for exact
    * medians when the group count is modest; for huge group counts the
    * approx-percentile sketch ([[aggApproxPercentile]]) is the trade. */
  def aggWeightedMedian(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, d).select(
      $"o_orderpriority".as("priority"),
      round($"o_totalprice" * 100).cast("bigint").as("cents"),
      (lit(1L) + pmod($"o_orderkey", lit(7L))).as("w"))
    val grp = Window.partitionBy($"priority")
    val cum = grp.orderBy($"cents".asc, $"w".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("cumw", sum($"w").over(cum))
      .withColumn("totw", sum($"w").over(grp))
      .where($"cumw" * 2 >= $"totw")
      .groupBy($"priority")
      .agg(min($"cents").as("wmedian_cents"),
        min($"totw").as("total_weight"))
  }

  def fnVariant(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val j = concat(
      lit("{\"id\": "), $"doc_id".cast("string"),
      lit(", \"meta\": {\"lang\": \""), $"lang",
      lit("\", \"n\": "), $"n_chars".cast("string"),
      lit("}, \"tags\": [\""), $"source",
      lit("\", \"t"), pmod($"doc_id", lit(5L)).cast("string"), lit("\"]}"))
    Tables.documents(s, d)
      .select($"doc_id", parse_json(j).as("v"))
      .select($"doc_id",
        expr("variant_get(v, '$.id', 'long')").as("id_v"),
        expr("variant_get(v, '$.meta.lang', 'string')").as("lang_v"),
        expr("variant_get(v, '$.meta.n', 'long')").as("n_v"),
        expr("variant_get(v, '$.tags[0]', 'string')").as("tag0"),
        expr("variant_get(v, '$.tags[1]', 'string')").as("tag1"),
        expr("try_variant_get(v, '$.meta.absent', 'long')").as("missing_v"))
  }

  /** Nested-struct manipulation (the semi-structured record surface next
    * to [[fnVariant]]'s VARIANT paths): build a nested record per order,
    * then evolve it declaratively — `withField` adds a computed leaf (at
    * the top level AND inside the nested struct), `dropFields` removes
    * one — and read leaves back via nested field access. The output is
    * the flattened leaves, so the hash-check verifies every struct op's
    * effect. Catalyst's OptimizeUpdateFields/SimplifyExtractValueOps
    * collapse the whole chain to flat column expressions — the struct
    * algebra is free at any scale (zero exchanges, whole-stage codegen),
    * which is exactly why schema evolution on nested parquet is done
    * declaratively rather than by rewriting records in a UDF. */
  def fnStruct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey",
        struct(
          $"o_custkey".as("cust"),
          round($"o_totalprice" * 100).cast("bigint").as("price_c"),
          struct($"o_orderstatus".as("st"), $"o_orderpriority".as("pri"))
            .as("tag")).as("rec"))
      .select($"o_orderkey",
        $"rec".withField("bucket", pmod($"rec.cust", lit(7L)))
          .withField("tag.urgent", $"rec.tag.pri" === "1-URGENT")
          .dropFields("cust").as("rec2"))
      .select($"o_orderkey",
        $"rec2.price_c".as("price_c"),
        $"rec2.bucket".as("bucket"),
        $"rec2.tag.st".as("st"),
        $"rec2.tag.urgent".as("urgent"))
  }

  /** EWMA frame length: the smoother looks back at most this many
    * observations (7 preceding + current). */
  val EwmaFrame = 8

  /** Exponentially-weighted moving average over each user's event values
    * (α = 1/2, truncated to the last [[EwmaFrame]] observations and
    * renormalized) — the standard smoothing pass for metric streams.
    * α = 1/2 is chosen deliberately: the weights 2⁰…2^(m−1) and the
    * normalizer 2^m − 1 are exact BIGINTs, so the whole smoother is
    * integer arithmetic end to end (num = Σ cents·2^i oldest-first, emit
    * 1000·num div den) — no double powers (pow is not correctly rounded
    * cross-engine), no order-dependent double sums. An UNBOUNDED
    * exponential window would need a running double recurrence that
    * cannot be re-normalized exactly; the truncated form loses < 2⁻⁸ of
    * the mass and keeps the operator distributable as one window pass:
    * a single exchange on user_id, O(frame) work per row. Window order
    * totalizes over (ts, event_id) — fixture timestamps collide. */
  def tsEwma(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(-(EwmaFrame - 1), Window.currentRow)
    Tables.events(s, d)
      .select($"user_id", $"ts", $"event_id",
        round($"value" * 100).cast("bigint").as("cents"))
      .withColumn("hist", collect_list($"cents").over(w)) // oldest-first
      .select($"user_id", $"ts", $"event_id", $"cents",
        size($"hist").cast("bigint").as("n_frame"),
        expr("""1000 * aggregate(zip_with(hist, sequence(0, size(hist) - 1),
                                          (x, i) -> x * shiftleft(1L, i)),
                                 0L, (acc, x) -> acc + x)
                div (shiftleft(1L, size(hist)) - 1)""").as("ewma_milli"))
  }

  /** Exact distinct counting via mergeable BITMAPS (Spark 3.5+'s
    * bitmap_* family) — the pre-aggregation pattern that makes exact
    * COUNT(DISTINCT) incremental at scale: each (group, bucket) holds a
    * fixed-width bitmap of the ids it saw; bitmaps OR-merge across any
    * sub-grouping (here: built per (priority, status), merged across
    * status), and the final count is a SUM of per-bucket popcounts.
    * Unlike a raw count_distinct — whose shuffle carries every distinct
    * id per group — the merged layout shuffles |groups|·|buckets| fixed
    * 4 KB bitmaps however many rows arrive, and a new data slice
    * OR-merges into the stored bitmaps without touching history (the
    * cube-materialization trick). The oracle runs the plain
    * COUNT(DISTINCT), proving the bitmap path exact. */
  def aggBitmap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderpriority".as("priority"), $"o_orderstatus".as("status"),
        $"o_custkey")
      .groupBy($"priority", $"status", expr("bitmap_bucket_number(o_custkey)").as("bkt"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").as("bm"))
      .groupBy($"priority", $"bkt")
      .agg(expr("bitmap_or_agg(bm)").as("bm")) // merge across status
      .groupBy($"priority")
      .agg(sum(expr("bitmap_count(bm)")).as("n_distinct_cust"))
  }

  /** Sequence-pattern detection over event streams (the
    * MATCH_RECOGNIZE-class workload, expressed portably): per user,
    * the full time-ordered event-type sequence is assembled as ONE
    * string under the (ts, event_id) total order, and behavioral
    * patterns are ordinary regexes over it — adjacency ("click then
    * purchase immediately"), gapped reachability ("a view eventually
    * converts"), and an anchor ("journey starts with signup"). One
    * user_id exchange; the sequence string is bounded by the per-user
    * event count (the events_paths / listagg group-size discipline:
    * cap by predicate or sessionize first when a key can be hot). The
    * digest ties the whole assembled sequence into the hash-check, so
    * the oracle verifies the ordering itself, not just the three
    * pattern bits. */
  def eventsPattern(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct($"ts", $"event_id", $"event_type"))),
          x => x.getField("event_type"))).as("seq"))
      .select($"user_id", $"n_events",
        $"seq".rlike("click purchase").as("direct_buy"),
        $"seq".rlike("view( [a-z]+)* purchase").as("view_to_buy"),
        $"seq".rlike("^signup").as("signup_first"),
        sha2($"seq", 256).as("seq_sha"))
  }

  /** A/B uplift report (Welch's t) — the experiment-readout aggregate:
    * purchase values split into two arms by the content-addressed
    * assignment user_id mod 2, per-arm COUNT/Σ/Σ² as exact integer
    * cents (the [[aggMoments]] discipline — order-independent
    * map-side-combinable sums), the mean lift as an integer division,
    * and the t-statistic derived from the integer sums through ONE
    * fixed expression tree (every double op — divide, subtract, sqrt —
    * is IEEE-correctly-rounded on exact integer inputs, so both engines
    * produce the identical double; contrast pow/ln which are not) and
    * then emitted integer-scaled to micro-units so the hash gate never
    * depends on how a harness canonicalizes a raw double.
    * One exchange on the 2-row arm key; the pivot to a single report
    * row is a 2-row conditional aggregate. */
  def eventsAb(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val arms = Tables.events(s, d).where($"event_type" === "purchase")
      .select(pmod($"user_id", lit(2L)).as("arm"),
        round($"value" * 100).cast("bigint").as("c"))
      .groupBy($"arm")
      .agg(count(lit(1)).as("n"), sum($"c").as("sc"), sum($"c" * $"c").as("sc2"))
    arms.agg(
        max(when($"arm" === 0, $"n")).as("n0"),
        max(when($"arm" === 0, $"sc")).as("s0"),
        max(when($"arm" === 0, $"sc2")).as("s20"),
        max(when($"arm" === 1, $"n")).as("n1"),
        max(when($"arm" === 1, $"sc")).as("s1"),
        max(when($"arm" === 1, $"sc2")).as("s21"))
      .select($"n0", $"s0", $"s20", $"n1", $"s1", $"s21",
        expr("(1000 * s1) div n1 - (1000 * s0) div n0").as("lift_millicents"),
        floor(expr("""(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                / sqrt((CAST(s21 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                         / CAST(n1 - 1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                       + (CAST(s20 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                         / CAST(n0 - 1 AS DOUBLE) / CAST(n0 AS DOUBLE))""") * lit(1e6))
          .cast("bigint").as("t_stat_micro"))
  }

  /** Sample-ratio mismatch check (SRM — the A/B randomization health
    * gate every experimentation platform runs BEFORE reading any
    * metric; Fabijan et al. 2019): under a 50/50 split the one-degree
    * chi-square statistic is (n0 − n1)²/(n0 + n1), and a value past
    * 3.841459 (95th percentile of χ²₁) means the assignment itself is
    * broken — nothing downstream (events_ab, events_cuped,
    * events_did) is interpretable. EXACT integers end to end: the
    * statistic is emitted as ((n0−n1)²·10⁶) div (n0+n1) micro-units
    * (DECIMAL(38,0) — (n0−n1)²·10⁶ wraps BIGINT past ~3·10⁶ users of
    * pure imbalance, and user counts at 100 TB do), and the verdict is
    * the cross-multiplied integer rule (n0−n1)²·10⁶ < 3841459·(n0+n1)
    * — no division, no doubles, both engines state the identical
    * comparison. Per-arm USER counts (not event counts — SRM is about
    * the unit of randomization), same arm convention as
    * [[eventsAb]]/[[eventsCuped]]. One distinct-user aggregate → one
    * 1-row reduce. */
  def eventsSrm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    Tables.events(s, d)
      .select(pmod($"user_id", lit(2L)).as("arm"), $"user_id")
      .distinct()
      .agg(
        sum(when($"arm" === 0, 1L).otherwise(0L)).as("n0"),
        sum(when($"arm" === 1, 1L).otherwise(0L)).as("n1"))
      .select($"n0", $"n1",
        expr("""CAST(CASE WHEN n0 + n1 = 0 THEN NULL
                 ELSE (CAST(n0 - n1 AS DECIMAL(38,0)) * (n0 - n1) * 1000000)
                      div (n0 + n1) END AS BIGINT)""").as("chi2_micro"),
        expr("""CAST(CASE WHEN n0 + n1 = 0 THEN NULL
                 ELSE CAST(n0 - n1 AS DECIMAL(38,0)) * (n0 - n1) * 1000000
                      < CAST(3841459 AS DECIMAL(38,0)) * (n0 + n1) END AS BIGINT)""")
          .as("srm_ok"))
  }

  /** CUPED variance-reduced A/B readout (Deng et al., WSDM 2013 — the
    * industry-standard experiment-sensitivity trick): adjust each
    * user's post-period metric Y by their PRE-period covariate X,
    * Ŷ = Y − θ(X − X̄) with θ = cov(X,Y)/var(X), which cuts metric
    * variance by exactly ρ²(X,Y) without biasing the lift (treatment
    * is independent of the pre-period). Same arm/cutoff/cents
    * conventions as [[eventsAb]]/[[eventsDid]] (user_id % 2,
    * 2024-01-15, round(value·100)).
    *
    * Exactness: the [[eventsAb]] discipline — per-user (x, y) cents
    * from one user-grain aggregate, then ONE map-side-combined moments
    * row (n, Σx, Σy, Σxy, Σx², Σy², per-arm n/Σx/Σy) in DECIMAL(38,0)
    * (user-level products ride decimal MULTIPLY, not long — whale-user
    * totals square past 2⁶³ where per-event cents do not), and every
    * reported number is ONE shared double expression over those exact
    * moments, floor-scaled to micro/ppm — identical trees on both
    * engines, so the floors agree bit-for-bit. var(X) = 0, var(Y) = 0,
    * or an EMPTY ARM (n0 = 0 or n1 = 0) → NULL for the outputs they
    * degenerate (guarded on both engines, never arises at the fixture
    * SFs). θ is POOLED (both arms), the standard CUPED choice.
    * Reported variance reduction IS ρ²: var(Ŷ) = var(Y)·(1 − ρ²), an
    * algebraic identity — no second pass over adjusted rows.
    *
    * Scale: two exchanges total — the user-grain aggregate (billions
    * of users = one hash exchange of 3-long rows) and the single-row
    * moments reduce. */
  def eventsCuped(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cutoff = graft.core.Utc.ts("2024-01-15 00:00:00")
    val users = Tables.events(s, d).where($"event_type" === "purchase")
      .select(pmod($"user_id", lit(2L)).as("arm"), $"user_id",
        when($"ts" < lit(cutoff), round($"value" * 100).cast("bigint"))
          .otherwise(0L).as("xc"),
        when($"ts" >= lit(cutoff), round($"value" * 100).cast("bigint"))
          .otherwise(0L).as("yc"))
      .groupBy($"user_id", $"arm")
      .agg(sum($"xc").as("x"), sum($"yc").as("y"))
    cupedOf(users.select($"arm", $"x", $"y"))
  }

  /** Moments-and-readout core of [[eventsCuped]] over any user-grain
    * (arm, x, y) frame — the law spec feeds planted frames (X-shift
    * invariance, zero-covariate degeneration). */
  private[graft] def cupedOf(users: DataFrame): DataFrame = {
    val s = users.sparkSession
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val m = users.agg(
      count(lit(1)).as("n"),
      sum($"x").cast(dec).as("sx"), sum($"y").cast(dec).as("sy"),
      sum($"x".cast(dec) * $"y").as("sxy"),
      sum($"x".cast(dec) * $"x").as("sx2"),
      sum($"y".cast(dec) * $"y").as("sy2"),
      sum(when($"arm" === 0, 1L).otherwise(0L)).as("n0"),
      sum(when($"arm" === 1, 1L).otherwise(0L)).as("n1"),
      sum(when($"arm" === 0, $"x").otherwise(0L)).cast(dec).as("sx0"),
      sum(when($"arm" === 1, $"x").otherwise(0L)).cast(dec).as("sx1"),
      sum(when($"arm" === 0, $"y").otherwise(0L)).cast(dec).as("sy0"),
      sum(when($"arm" === 1, $"y").otherwise(0L)).cast(dec).as("sy1"))
    // shared double sub-expressions (texts must match the oracle verbatim)
    val covN = "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    val varxN = "(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    val varyN = "(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    val lift = """(CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE))"""
    val xgap = """(CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE))"""
    // empty-arm guard (ADVICE r11): an arm with zero purchase users makes
    // the per-arm means Infinity/NaN and floor(Inf)->BIGINT diverges
    // across engines (Spark NULL vs DuckDB error) — both engines state
    // the NULL verdict explicitly, like the var(X)=0 guard below
    m.select($"n0", $"n1",
      expr(s"""CAST(CASE WHEN n0 = 0 OR n1 = 0 THEN NULL
                ELSE floor($lift * 1e6) END AS BIGINT)""").as("lift_micro"),
      expr(s"""CAST(CASE WHEN $varxN = 0 THEN NULL
                ELSE floor($covN / $varxN * 1e6) END AS BIGINT)""").as("theta_micro"),
      expr(s"""CAST(CASE WHEN n0 = 0 OR n1 = 0 OR $varxN = 0 THEN NULL
                ELSE floor(($lift - $covN / $varxN * $xgap) * 1e6) END AS BIGINT)""")
        .as("adj_lift_micro"),
      expr(s"""CAST(CASE WHEN $varxN = 0 OR $varyN = 0 THEN NULL
                ELSE floor($covN * $covN / ($varxN * $varyN) * 1e6) END AS BIGINT)""")
        .as("var_reduction_ppm"))
  }

  /** Higher-order array functions as a first-class surface (transform /
    * filter / exists / forall / aggregate / zip_with) — the per-row
    * array algebra every feature-engineering pass leans on. All native
    * Catalyst expressions evaluated inline per row: zero exchanges, no
    * UDFs, arrays synthesized from row keys so the oracle can rebuild
    * them exactly. The zip_with case folds the array against its own
    * reverse — an alignment join inside one row. */
  def fnLambda(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_linenumber",
        sequence(lit(1L), lit(1L) + pmod($"l_orderkey" + $"l_linenumber", lit(6L))).as("a"),
        round($"l_quantity").cast("bigint").as("q"))
      .select($"l_orderkey", $"l_linenumber",
        size($"a").cast("bigint").as("n"),
        expr("aggregate(a, 0L, (acc, x) -> acc + x * q)").as("wsum"),
        expr("size(filter(a, x -> x % 2 = 0))").cast("long").as("n_even"),
        expr("exists(a, x -> x * q > 40)").as("any_big"),
        expr("forall(a, x -> x <= 7)").as("all_small"),
        expr("aggregate(zip_with(a, reverse(a), (x, y) -> x * y), 0L, (acc, x) -> acc + x)")
          .as("palindot"))
  }

  /** Quantified sequence patterns over RUNS — the MATCH_RECOGNIZE
    * workload (`PATTERN (A B+ C)`) expressed relationally, one level up
    * from [[eventsPattern]]'s regex-on-strings: consecutive same-type
    * events collapse to runs (gaps-and-islands: a type-change flag
    * cumulatively summed under the (ts, event_id) total order), and the
    * pattern becomes a predicate over ADJACENT runs — here
    * signup → view+ → purchase, where the B+ quantifier is simply the
    * view-run's length. Runs carry measures a flat regex can't
    * (per-quantifier lengths, positions), which is exactly what
    * MATCH_RECOGNIZE's MEASURES clause exists for. Two exchanges, both
    * on user_id-prefixed keys: the run collapse groups by
    * (user_id, run_id) and the adjacency scan windows by user_id —
    * per-user state is bounded by the run count, never materializing
    * the event sequence as one value (the events_pattern string cap
    * concern disappears). */
  def eventsQuantPattern(s: SparkSession, d: String): DataFrame =
    eventsQuantPatternOf(Tables.events(s, d))

  /** Core over any (user_id, ts, event_id, event_type) frame — the
    * declared query + AnalyticsSpec's planted-sequence law drive this. */
  def eventsQuantPatternOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val runs = events
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("chg",
        when(lag($"event_type", 1).over(w).isNull
          || lag($"event_type", 1).over(w) =!= $"event_type", 1L).otherwise(0L))
      .withColumn("run_id", sum($"chg").over(w))
      .groupBy($"user_id", $"run_id")
      .agg(max($"event_type").as("rtype"), count(lit(1)).as("rlen"))
    val wr = Window.partitionBy($"user_id").orderBy($"run_id".asc)
    runs
      .withColumn("t1", lead($"rtype", 1).over(wr))
      .withColumn("t2", lead($"rtype", 2).over(wr))
      .withColumn("b_len", lead($"rlen", 1).over(wr))
      .where($"rtype" === "signup" && $"t1" === "view" && $"t2" === "purchase")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_matches"),
        sum($"b_len").as("total_view_len"),
        max($"b_len").as("max_view_len"),
        min($"run_id").as("first_match_run"))
  }

  /** Time-interval rolling aggregates (RANGE frames over event time) —
    * the "7-day rolling spend" feature every behavioral model ingests:
    * per purchase, the sum/count of the user's purchases in the
    * trailing 7 days INCLUDING this one, as a RANGE BETWEEN frame over
    * epoch micros. RANGE (not ROWS) is the semantic point: two
    * purchases at the SAME microsecond see the same frame whichever
    * shuffles first, so the result is deterministic without any
    * tie-break column. One user_id exchange; frame evaluation is the
    * running two-pointer pass inside each sorted partition — O(rows),
    * never O(rows × frame width) (the window_frames discipline).
    * Integer cents end to end. */
  def tsRolling(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val MicrosPerDay = 86400000000L
    val w = Window.partitionBy($"user_id").orderBy($"ts_us".asc)
      .rangeBetween(-7L * MicrosPerDay, 0L)
    Tables.events(s, d)
      .where($"event_type" === "purchase")
      .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
        round($"value" * 100).cast("bigint").as("cents"))
      .select($"user_id", $"event_id", $"ts_us", $"cents",
        sum($"cents").over(w).as("roll7_cents"),
        count(lit(1)).over(w).as("roll7_n"))
  }

  /** RFM scoring (recency / frequency / monetary quintiles) — the
    * customer-segmentation aggregate behind every curation-by-behavior
    * split: per user, days since last purchase (recency, against the
    * corpus-wide max event day as "now" so the query is deterministic),
    * purchase count, and integer-cents spend; each dimension then ranked
    * into quintiles under an EXPLICIT total order (metric, then
    * user_id — ranking on a non-total order would tie-break by
    * partition layout, the agg_mode lesson).
    *
    * Scale shape (round-9/10 rewrite — this was one of the three
    * flagged single-partition `ntile(5) OVER (ORDER BY …)` windows):
    * each dimension gets an exact distributed global rank via
    * [[DistRank.withRank]] (range-repartition + zipWithIndex offsets),
    * and the quintile is the pure-integer position formula
    * [[DistRank.ntileFromRank]] over that rank and the broadcast 1-row
    * user count — bit-identical to SQL ntile (tie-SPLITTING included,
    * which value-based percentile cuts cannot reproduce; equivalence
    * pinned in DistRankSpec). The per-user profile is ranked three
    * times (3 range exchanges of |users| narrow rows, all P-way
    * parallel); no window anywhere touches an unbounded single
    * partition. */
  def eventsRfm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // ONE events scan (round-10: the previous shape scanned events twice
    // — once for the corpus-wide max ts, once for the per-user profile —
    // but the corpus max IS the max of the per-user maxes, so it rides
    // the same aggregate): per-user last-purchase ts + count + cents,
    // cached once for its three consumers (the "now" scalar, the rank
    // chain, the user count; multi-consumer rule), |users| narrow rows
    val perUser = Tables.events(s, d)
      .where($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(max($"ts").as("last_ts"),
        count(lit(1)).as("frequency"),
        sum(round($"value" * 100).cast("bigint")).as("monetary_cents"))
      .localCheckpoint(eager = false)
    val per = perUser
      .crossJoin(broadcast(perUser.agg(max($"last_ts").as("now_ts")))) // 1-row scalar
      .select($"user_id",
        datediff($"now_ts", $"last_ts").cast("bigint").as("recency_days"),
        $"frequency", $"monetary_cents")
    val ranked = Seq[(String, Seq[org.apache.spark.sql.Column])](
      ("__rk_r", Seq($"recency_days".asc, $"user_id".asc)),
      ("__rk_f", Seq($"frequency".desc, $"user_id".asc)),
      ("__rk_m", Seq($"monetary_cents".desc, $"user_id".asc))
    ).foldLeft(per) { case (df, (out, keys)) => DistRank.withRank(df, keys, out) }
    ranked
      .crossJoin(broadcast(perUser.agg(count(lit(1)).as("__n")))) // 1-row scalar
      .select($"user_id", $"recency_days", $"frequency", $"monetary_cents",
        DistRank.ntileFromRank($"__rk_r", $"__n", 5).as("r_quintile"),
        DistRank.ntileFromRank($"__rk_f", $"__n", 5).as("f_quintile"),
        DistRank.ntileFromRank($"__rk_m", $"__n", 5).as("m_quintile"))
  }

  /** Cohort LTV curves — the revenue view of [[eventsRetention]]'s cohort
    * grid: users cohorted by their FIRST event week (any type — the
    * acquisition moment), purchase revenue bucketed by week offset from
    * the cohort week, then the running cumulative (the LTV curve every
    * growth dashboard plots) and a floor-divided per-user figure. Integer
    * cents end to end; the cumulative window orders by week_offset, a
    * total order because the groupBy already collapsed to one row per
    * (cohort_week, week_offset). `div` is safe here (non-negative
    * numerators — the graft determinism rule #6). Shuffle profile: one
    * user_id exchange for first-week, one (cohort, offset) exchange for
    * the grid; the cumsum window partitions by cohort_week — at 100 TB
    * cohorts are weeks, so parallelism is |weeks|, and the heavy work
    * stays in the two hash aggregates before it. */
  def eventsCohortLtv(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, d)
    val cohort = e
      .groupBy($"user_id")
      .agg(min(date_trunc("week", $"ts")).as("cohort_week"))
    val rev = e.where($"event_type" === "purchase")
      .join(cohort, "user_id")
      .select($"cohort_week",
        expr("datediff(date_trunc('week', ts), cohort_week) div 7")
          .cast("bigint").as("week_offset"),
        round($"value" * 100).cast("bigint").as("cents"))
      .groupBy($"cohort_week", $"week_offset")
      .agg(sum($"cents").as("rev_cents"))
    val sizes = cohort.groupBy($"cohort_week")
      .agg(count(lit(1)).as("cohort_users"))
    val w = Window.partitionBy($"cohort_week").orderBy($"week_offset".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.join(sizes, "cohort_week")
      .select($"cohort_week", $"week_offset", $"rev_cents", $"cohort_users",
        sum($"rev_cents").over(w).as("cum_rev_cents"))
      .withColumn("cum_cents_per_user", expr("cum_rev_cents div cohort_users"))
  }

  /** Skyline (Pareto frontier) of users on (purchase frequency, integer-
    * cents spend) — the classic dominance query (Börzsönyi et al., ICDE
    * 2001): keep u iff no v has f ≥ f_u ∧ m ≥ m_u with one strict. NOT
    * the naive O(n²) dominance self-join: collapse to one candidate row
    * per distinct frequency (only max-spend users at each f can survive),
    * run a running-max over frequencies in ONE window pass (rows frame,
    * O(|distinct f|)), then broadcast the surviving frontier back onto
    * the per-user aggregate. At 100 TB the per-user aggregate is the only
    * big shuffle; the frontier itself is ≤ |distinct f| rows — tiny by
    * construction — so the final join is a broadcast semi-join, and the
    * one-partition window never sees more rows than that. Ties on BOTH
    * dims are mutually non-dominating and all kept (standard skyline).
    * The oracle deliberately states the SPEC instead (NOT EXISTS
    * dominance) so the window rewrite is checked against the definition,
    * not against itself. */
  def eventsSkyline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val per = Tables.events(s, d)
      .where($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("frequency"),
        sum(round($"value" * 100).cast("bigint")).as("monetary_cents"))
    val perF = per.groupBy($"frequency")
      .agg(max($"monetary_cents").as("best_m"))
    val wf = Window.orderBy($"frequency".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perF
      .withColumn("best_gt", max($"best_m").over(wf))
      .where($"best_gt".isNull || $"best_m" > $"best_gt")
      .select($"frequency", $"best_m")
    per.join(broadcast(frontier),
        per("frequency") === frontier("frequency")
          && $"monetary_cents" === $"best_m", "left_semi")
      .select($"user_id", $"frequency", $"monetary_cents")
  }

  /** Rolling active users (DAU / WAU-7 / MAU-28 + stickiness) — the
    * product-health staple every event pipeline reports first. All three
    * actives come out of ONE two-level distinct aggregate: each distinct
    * (user, day) is exploded to the ≤28 anchor days whose lookback
    * window it enters, and per (anchor, user) only the MIN lookback
    * offset is kept — the windows NEST, so min-off = 0 ⟺ DAU member,
    * ≤ 6 ⟺ WAU, present at all ⟺ MAU, and three conditional counts
    * read the tiers off the deduped frame. stickiness = DAU·10⁶ div MAU
    * (truncating on non-negatives ≡ DuckDB `//`). The oracle is the
    * INDEPENDENT formulation — three per-window range joins with
    * count(DISTINCT) — so the min-offset tier algebra is what the
    * hash-compare checks.
    *
    * Scale shape: the corpus collapses to distinct (user, day) first
    * (map-side partial dedup, the only fact-sized exchange); the ×28
    * calendar explode multiplies USER-DAYS, not events, and the
    * per-(anchor, user) min is map-side combinable, so the "count
    * distinct per day" skew trap (|days| reducers each seeing |users|
    * rows) never forms — the second exchange is keyed on (anchor, user),
    * uniform by construction, and the final per-day counts combine
    * map-side. Anchors ride back as a calendar-bounded broadcast. */
  def eventsActiveUsers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ud = Tables.events(s, d)
      .select(to_date($"ts").as("day"), $"user_id").distinct()
      // consumed by the anchor calendar AND the explode: dedup once
      .localCheckpoint(eager = false)
    val anchors = ud.select($"day").distinct() // |days| rows
    val perAU = ud
      .select($"user_id", $"day", explode(expr("sequence(0, 27)")).as("off"))
      .groupBy(date_add($"day", $"off").as("day"), $"user_id")
      .agg(min($"off").as("mn"))
    perAU.join(broadcast(anchors), "day") // windows anchor on ACTIVE days
      .groupBy($"day")
      .agg(sum(when($"mn" === 0, 1L).otherwise(0L)).as("dau"),
        sum(when($"mn" <= 6, 1L).otherwise(0L)).as("wau"),
        count(lit(1)).as("mau"))
      .select($"day", $"dau", $"wau", $"mau",
        expr("CAST(dau * 1000000 div mau AS BIGINT)").as("stickiness_ppm"))
  }

  /** Event-type association lift over user-days — the market-basket
    * measure (Agrawal et al.'s association-rule lift) on behavioral
    * "baskets": a basket is one (user, day), and for every unordered
    * type pair lift = P(a,b) / (P(a)·P(b)), reported as exact floor ppm
    * of (n_both · n_baskets · 10⁶) / (n_a · n_b). Lift < 1 means the
    * types repel within a day; > 1 means they travel together — the
    * co-occurrence screen run before any pairwise feature is built.
    * Scale shape: ONE distinct over (user, day, type) — a map-side
    * combinable aggregate — then a self-join on (user, day) whose
    * per-basket fanout is capped at |types|² (25 here: baskets are
    * SETS of types, so the join is |baskets|·|types|² rows max, never
    * quadratic in events); margins and the basket count are ≤|types|
    * rows and ride back by broadcast. The ppm product goes through
    * DECIMAL(38,0) `div` (DuckDB replays with HUGEINT `//` — the
    * skew_report precedent): BIGINT would wrap at ~10⁹ baskets, exactly
    * the regime this screen exists for. */
  def eventsLift(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ut = Tables.events(s, d)
      .select($"user_id", to_date($"ts").as("day"), $"event_type")
      .distinct()
      // consumed by the basket count, the margins, and BOTH sides of
      // the pair join: cache the distinct once (multi-consumer rule)
      .localCheckpoint(eager = false)
    val tot = ut.select($"user_id", $"day").distinct()
      .agg(count(lit(1)).as("n_ud")) // 1-row scalar
    val per = ut.groupBy($"event_type").agg(count(lit(1)).as("n")) // ≤|types| rows
    val pair = ut.as("a").join(ut.as("b"), Seq("user_id", "day"))
      .where($"a.event_type" < $"b.event_type")
      .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pair
      .join(broadcast(per.select($"event_type".as("type_a"), $"n".as("n_a"))), "type_a")
      .join(broadcast(per.select($"event_type".as("type_b"), $"n".as("n_b"))), "type_b")
      .crossJoin(broadcast(tot))
      .select($"type_a", $"type_b", $"n_a", $"n_b", $"n_both", $"n_ud",
        expr("cast(n_both * cast(n_ud as decimal(38,0)) * 1000000 div (n_a * n_b) as bigint)")
          .as("lift_ppm"))
  }

  /** Kaplan–Meier conversion survival (Kaplan & Meier 1958) — the
    * censoring-correct answer to "how long until a user makes their
    * first big purchase?", which a naive converted-only histogram gets
    * WRONG (it silently drops the 30/150 users who never convert —
    * survivorship bias by construction). Subjects enter at their first
    * event; the event is the first purchase with value ≥ 100;
    * non-converters are RIGHT-CENSORED at the corpus horizon and leave
    * the risk set at their censoring duration, exactly like a clinical
    * trial's lost-to-follow-up. Estimate, exact integer ppm:
    *   S(t) = Π over event times t' ≤ t of (n_risk − n_conv)/n_risk,
    * as the recurrence s ← s·(n_risk−n_conv) div n_risk (truncating
    * div, replayed bit-for-bit by the oracle's recursive CTE — an
    * INDEPENDENT formulation that computes each n_risk with a
    * correlated ≥-count instead of this fold).
    *
    * Scale shape: corpus → per-user aggregate (map-side combinable,
    * |users| narrow rows) → day-duration histogram (map-side
    * combinable, ≤ |calendar days| rows) → ONE bounded `aggregate` HOF
    * fold that produces n_risk via N − prefix-count (suffix counts
    * without any window — no unpartitioned-window allowlist needed)
    * and the survival product in the same pass. The 1-row collected
    * array is the ts_holt calendar-bounded class. */
  def eventsSurvival(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perU = Tables.events(s, d)
      .groupBy($"user_id")
      .agg(to_date(min($"ts")).as("t0"),
        to_date(min(when($"event_type" === "purchase" && $"value" >= 100, $"ts")))
          .as("fp"),
        to_date(max($"ts")).as("ld"))
      // consumed by the horizon scalar AND the subject frame
      .localCheckpoint(eager = false)
    val subj = perU
      .crossJoin(broadcast(perU.agg(max($"ld").as("maxd")))) // 1-row scalar
      .select(
        when($"fp".isNull, datediff($"maxd", $"t0"))
          .otherwise(datediff($"fp", $"t0")).cast("bigint").as("dur"),
        $"fp".isNotNull.cast("bigint").as("converted"))
    val hist = subj.groupBy($"dur")
      .agg(count(lit(1)).as("n_all"), sum($"converted").as("n_conv"))
    hist
      .agg(sort_array(collect_list(struct($"dur", $"n_all", $"n_conv"))).as("g"),
        sum($"n_all").as("n_total"))
      .select(expr("""
        aggregate(
          g,
          named_struct(
            'prefix', CAST(0 AS BIGINT), 's', CAST(1000000 AS BIGINT),
            'out', CAST(array() AS ARRAY<STRUCT<duration_days: BIGINT,
              n_risk: BIGINT, n_converted: BIGINT, surv_ppm: BIGINT>>)),
          (acc, x) -> named_struct(
            'prefix', acc.prefix + x.n_all,
            's', CASE WHEN x.n_conv > 0
              THEN (acc.s * ((n_total - acc.prefix) - x.n_conv))
                   div (n_total - acc.prefix)
              ELSE acc.s END,
            'out', CASE WHEN x.n_conv > 0
              THEN concat(acc.out, array(named_struct(
                'duration_days', x.dur,
                'n_risk', n_total - acc.prefix,
                'n_converted', x.n_conv,
                'surv_ppm', (acc.s * ((n_total - acc.prefix) - x.n_conv))
                            div (n_total - acc.prefix))))
              ELSE acc.out END),
          acc -> acc.out) AS h"""))
      .select(explode($"h").as("r"))
      .select($"r.duration_days", $"r.n_risk", $"r.n_converted", $"r.surv_ppm")
  }

  /** Event-type Markov transitions — the per-user behavioral bigram
    * table: consecutive (prev → cur) event-type pairs under the
    * (ts, event_id) total order, counted corpus-wide, with the row-
    * conditional transition probability emitted as floor parts-per-
    * million (integer `div` on non-negative terms — rule #6; never a
    * raw double division the hash gate would have to trust). One
    * user_id window exchange + one 25-row aggregate: the transition
    * matrix is |types|² however big the corpus, so at 100 TB this is a
    * map-side-combined aggregate into a broadcastable result. */
  def eventsMarkov(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.events(s, d)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("from_type", lag($"event_type", 1).over(w))
      .where($"from_type".isNotNull)
      .groupBy($"from_type", col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("denom", sum($"n").over(Window.partitionBy($"from_type")))
      .withColumn("ppm", expr("(n * 1000000) div denom").cast("bigint"))
      .drop("denom")
  }

  /** Edit-distance threshold for [[joinFuzzyEditdist]] (matches within
    * Levenshtein ≤ K are considered; the typo model sits at exactly 1). */
  val FuzzyEditK = 1

  /** Candidate generator for [[joinFuzzyEditdist]] — DELETION-
    * NEIGHBORHOOD blocking (the SymDelete / FastSS family): for K = 1,
    * ed(a, b) ≤ 1 ⟺ D(a) ∩ D(b) ≠ ∅ where D(s) = {s} ∪ {s with one
    * character deleted} (a deletion makes b ∈ D(a) ∩ D(b); a
    * substitution at i makes both i-deletions equal; an insertion is
    * the deletion case mirrored). Each side explodes into its |s|+1
    * variants keyed by xxhash64 (8-byte shuffle keys; a 2⁻⁶⁴ hash
    * collision can only ADD a candidate and the exact levenshtein
    * re-rank removes it), candidates are the variant-hash equi-join.
    *
    * Why not the q-gram prefix filter (SSJoin, the
    * [[Dedup.ngramJaccard]] discipline): measured at sf0.1 — TPC-H
    * names draw a ~92-word vocabulary, so even each name's RAREST
    * grams occur in hundreds of others and the K·Q+1-prefix join
    * admitted 1.21 M pairs for 541 probes (gram+length keys: 0.97 M);
    * variant blocking admits ~1.7 k, because the key is full-string
    * granular — variants collide only for genuine near-matches.
    *
    * Scale: the variant index is O(corpus × avg_len) rows of (hash,
    * id) — linear in corpus bytes, same class as a shingle index —
    * block-key cardinality grows with the corpus, and per-key
    * populations are the true near-match multiplicities (no fixed-
    * vocabulary hot keys). For general K the neighborhood is
    * O(lenᴷ) and the q-gram prefix filter becomes the path; at the
    * declared K = 1 the neighborhood is linear and strictly sharper. */
  private[graft] def fuzzyCandidates(probes: DataFrame, cands: DataFrame): DataFrame = {
    val s = probes.sparkSession
    import s.implicits._
    require(FuzzyEditK == 1,
      "deletion-neighborhood blocking is implemented for K = 1; use a q-gram prefix filter for K >= 2")
    def withVariantHash(df: DataFrame, name: String): DataFrame =
      df.withColumn("vh", explode(expr(
        s"transform(array_union(array($name), " +
          s"transform(sequence(1, length($name)), " +
          s"i -> concat(substring($name, 1, i-1), substring($name, i+1)))), " +
          "v -> xxhash64(v))")))
    withVariantHash(probes, "probe_name")
      .join(withVariantHash(cands, "cand_name"), "vh")
      .dropDuplicates("probe_key", "cand_key")
      .select($"probe_key", $"probe_name", $"cand_key", $"cand_name")
  }

  /** Fuzzy (edit-distance) join — entity resolution under typos, the
    * workload behind catalog/brand matching in data curation. A staged-
    * fixture query (the [[graft.operators.Curation]] PII pattern):
    * misspelled probes are synthesized deterministically IN-QUERY from
    * every 37th part (drop the name's 2nd character) and the same
    * injection is replayed verbatim in the oracle SQL, so the fixture
    * needs no typo column. Semantics are the SPEC, not the blocking:
    * the (distance, partkey)-minimal candidate within Levenshtein ≤
    * [[FuzzyEditK]] per probe — so the oracle deliberately states the
    * brute-force all-pairs definition and the prefix-filtered plan is
    * checked against it (the [[eventsSkyline]] oracle philosophy).
    * Candidates come from [[fuzzyCandidates]]' lossless deletion-
    * neighborhood blocking (recall 1.0 law), then exact `levenshtein`
    * (codegen'd, both engines) scores pairs and `row_number` keeps the
    * minimum per probe. */
  /** The fuzzy join's (probes, candidates) frames — exposed for the
    * AnalyticsSpec deletion-neighborhood recall-1.0 property, the
    * ScaleSpec candidate-volume bound, and the PlanShapeSpec
    * candidate-plan pin. */
  private[graft] def fuzzyFrames(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val parts = Tables.part(s, d)
    val probes = parts
      .where($"p_partkey" % 37 === 0)
      .select($"p_partkey".as("probe_key"),
        concat(substring($"p_name", 1, 1), expr("substring(p_name, 3)"))
          .as("probe_name"))
    val cands = parts
      .select($"p_partkey".as("cand_key"), $"p_name".as("cand_name"))
    (probes, cands)
  }

  def joinFuzzyEditdist(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (probes, cands) = fuzzyFrames(s, d)
    val scored = fuzzyCandidates(probes, cands)
      .select($"probe_key", $"probe_name", $"cand_key",
        levenshtein($"probe_name", $"cand_name").cast("bigint").as("dist"))
      .where($"dist" <= FuzzyEditK)
    val w = Window.partitionBy($"probe_key").orderBy($"dist".asc, $"cand_key".asc)
    scored.withColumn("rk", row_number().over(w))
      .where($"rk" === 1)
      .select($"probe_key", $"probe_name", $"cand_key".as("matched_key"), $"dist")
  }
}
