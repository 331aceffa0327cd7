package graft.operators

import graft.SparkSpec

/** Physical-plan shape assertions — the 100 TB questions, asserted at
  * test SF: are filters pushed to the scan, are dim joins broadcast, is
  * top-N a TakeOrderedAndProject (not a global sort), is the hot path in
  * whole-stage codegen? These lock the plans the operators were designed
  * around so a refactor that silently degrades them fails CI.
  */
class PlanShapeSpec extends SparkSpec {

  /** Final (post-AQE) physical plan: execute first so AdaptiveSparkPlan
    * re-plans and compiles codegen stages. */
  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("filter_pred pushes predicates into the parquet scan") {
    val p = plan("filter_pred")
    assert(p.contains("PushedFilters: [IsNotNull("), p)
  }

  test("proj_select prunes the scan to the referenced columns") {
    val p = plan("proj_select")
    assert(!p.contains("l_shipdate"), "scan should not read unreferenced columns\n" + p)
    assert(p.contains("ReadSchema"), p)
  }

  test("join_inner_bcast plans broadcast joins for all three dims") {
    val p = plan("join_inner_bcast")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("SortMergeJoin"), "dims must not sort-merge\n" + p)
  }

  test("join_range is a broadcast nested-loop join (tiny build side)") {
    val p = plan("join_range")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sort_limit plans TakeOrderedAndProject (no global sort)") {
    val p = plan("sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1_agg is a two-phase hash aggregate inside whole-stage codegen") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("*("), "whole-stage codegen stages expected\n" + p)
    assert(p.contains("partial_"), "map-side partial aggregation expected\n" + p)
  }

  test("join_semi/anti plan as semi/anti joins, not inner+distinct") {
    assert(plan("join_semi").contains("LeftSemi"), plan("join_semi"))
    assert(plan("join_anti").contains("LeftAnti"), plan("join_anti"))
  }

  test("bucketed join is shuffle-free on both join sides") {
    // at test SF Catalyst rightly broadcasts the tiny side; disable
    // broadcast to surface the plan a fact-fact join gets at 100 TB
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // AdaptiveSparkPlan.toString prints final + initial plans; count
      // exchanges in the final one only
      val p = plan("src_bucketed_join").split("== Initial Plan ==")(0)
      // the only exchange allowed is the one feeding the final groupBy agg;
      // without bucketing the join adds two more (one per side)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(p.contains("SortMergeJoin"), p)
      assert(exchanges <= 1, s"expected at most 1 exchange (post-join agg), got $exchanges\n$p")
      assert(p.contains("Bucketed: true"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("join_skew_salted spreads the build side across salts (no broadcast)") {
    val p = plan("join_skew_salted")
    assert(p.contains("Join"), p)
  }

  test("sort_global plans a range-partitioned distributed sort") {
    val p = plan("sort_global")
    assert(p.contains("rangepartitioning"), p)
    assert(p.contains("Sort ["), p)
  }

  test("simsearch brute force broadcasts the query side") {
    // the declared simsearch_topk reads the session-scoped exact-top-k
    // artifact; the plan contract lives on the compute path that writes it
    val df = SimSearch.bruteTopK(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("exact embedding all-pairs has no full-relation broadcast nested loop") {
    // the blocked B×B join must be an equi-join on the block cell — a
    // nested-loop or cartesian means the no-driver-ceiling design regressed
    val df = Dedup.embeddingCosineExact(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("events_funnel has no broadcast and a single user_id exchange") {
    // the funnel's per-user frames are O(total users) — round 2 broadcast
    // them, which OOMs the build side at 10⁹ users. The window shape must
    // keep everything on one hash partitioning: no broadcast anywhere and
    // exactly one exchange (windows + final agg all reuse it).
    val p = plan("events_funnel").split("== Initial Plan ==")(0)
    assert(!p.contains("Broadcast"), "no O(users) frame may be broadcast\n" + p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected one user_id exchange, got $exchanges\n$p")
  }

  test("join_asof runs on a single user_id exchange and one scan") {
    // round 3's tie-dedup added two per-side groupBy(user_id, ts) shuffles
    // before the window; the dedup now rides the window's own sort, so the
    // whole as-of is one scan of events + one hash exchange
    val p = plan("join_asof").split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly one user_id exchange, got $exchanges\n$p")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected one events scan, got $scans\n$p")
  }

  test("join_asof_forward keeps join_asof's one-exchange one-scan shape, time-reversed") {
    val p = plan("join_asof_forward").split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly one user_id exchange, got $exchanges\n$p")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected one events scan, got $scans\n$p")
  }

  test("join_asof_tolerance keeps join_asof's one-exchange one-scan shape") {
    // the tolerance variant adds a running match-ts and a per-row
    // comparison — if it ever costs a second scan or exchange, the
    // "same shape as join_asof" scale claim is broken
    val p = plan("join_asof_tolerance").split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected exactly one user_id exchange, got $exchanges\n$p")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected one events scan, got $scans\n$p")
  }

  test("events_sessionize rides a single user_id exchange end-to-end") {
    // lag flag, running sum, and the per-session groupBy must all reuse
    // the one hash partitioning — a second exchange means the window and
    // the aggregate stopped sharing it
    val p = plan("events_sessionize").split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected one user_id exchange, got $exchanges\n$p")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected one events scan, got $scans\n$p")
  }

  test("text_vocab_coverage bounds its windows behind a top-31 TakeOrderedAndProject") {
    val p = plan("text_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject(limit=31"),
      "the |vocab| profile must shrink to 31 rows via distributed top-k " +
        "BEFORE any rank/cumsum window (round-9 scale fix)\n" + p)
  }

  test("maint_weighted_sample plans per-partition top-k (TakeOrderedAndProject)") {
    // priority sampling must not global-sort the corpus: per-partition
    // top-k + single merge is the only shape that holds at 100 TB
    val p = plan("maint_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("rangepartitioning"), "no global sort exchange\n" + p)
  }

  test("text_inverted_index shares one gram exchange between rank and aggregate") {
    // the posting-head window and the df groupBy must reuse the same gram
    // hash partitioning; a second exchange means the single-pass design
    // regressed into rank-shuffle-then-agg-shuffle
    val p = plan("text_inverted_index").split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected one gram exchange, got $exchanges\n$p")
  }

  test("AQE OptimizeSkewedJoin engages: a planted skewed partition is split > 1 ways") {
    // join_skew_salted handles the KNOWN hot key by salting; the docs
    // defer unknown/emergent skew to AQE. This pins that the engine's
    // join shapes actually let OptimizeSkewedJoin fire: a shuffle join
    // whose one partition dwarfs the median must come out of adaptive
    // replanning as SortMergeJoin(skew=true) with the fat partition
    // split into >1 PartialReducerPartitionSpec reads. Thresholds are
    // production-sized (factor 5 / 256 MB); lowered here to surface the
    // behavior on a test-sized fixture — what's pinned is ELIGIBILITY of
    // the plan shape, same discipline as the bloom-filter pin.
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "4",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      // 30k of 40k rows share key 0 with a ~200-byte payload: the key-0
      // partition is ~6 MB vs a tiny median — unambiguous planted skew
      val big = spark.range(0, 40000)
        .select(when($"id" < 30000, 0L).otherwise($"id").as("k"),
                concat(lit("p"), lpad($"id".cast("string"), 200, "x")).as("payload"))
      val dim = spark.range(0, 40000).select($"id".as("k"), ($"id" * 2).as("v"))
      // the payload must survive column pruning into the shuffle (sum of
      // its length) or the skewed partition shrinks to bare join keys
      val j = big.join(dim, "k").groupBy(lit(1).as("one"))
        .agg(count(lit(1)).as("n"), sum($"v").as("sv"),
             sum(length($"payload")).as("sp"))
      j.collect()
      val p = j.queryExecution.executedPlan
      assert(p.toString.contains("skew=true"),
        "OptimizeSkewedJoin did not mark the join\n" + p)
      val finalPlan = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      // plain collect stops at QueryStageExec boundaries (stages expose
      // their subtree as `plan`, not as children) — descend explicitly
      def reads(n: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec] = {
        val self = n match {
          case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec => Seq(r)
          case _ => Seq.empty
        }
        val kids = n match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case _ => n.children
        }
        self ++ kids.flatMap(reads)
      }
      val splits = reads(finalPlan).map(_.partitionSpecs.count(
        _.isInstanceOf[org.apache.spark.sql.execution.PartialReducerPartitionSpec])).sum
      assert(splits > 1, s"skewed partition was split $splits ways; expected > 1\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("sql_q5_local broadcasts the dims and pushes the orderdate range to the scan") {
    val p = plan("sql_q5_local")
    // region/nation/supplier (and at test SF customer) ride broadcast
    // hash joins; the only shuffle a 100 TB run needs is the fact-fact
    // orderkey exchange
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "dimension chain must broadcast\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "orderdate range must reach the orders scan as a pushed filter\n" + p)
  }

  test("sql_q9_profit broadcasts the filtered part side and the dims") {
    val p = plan("sql_q9_profit")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "part (post-LIKE), supplier, nation must broadcast\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Contains(p_name"),
      "the mid-string LIKE must evaluate as a Contains filter above the part scan\n" + p)
  }

  test("sql_q7_volume joins the aliased nation dim twice as broadcasts — no cartesian") {
    val p = plan("sql_q7_volume")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "both nation aliases must broadcast\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sql_q18_large_orders plans the IN-subquery as a semi join on the HAVING aggregate") {
    val p = plan("sql_q18_large_orders")
    assert(p.contains("LeftSemi"),
      "IN (SELECT ... HAVING) must become a semi join, not inner+distinct\n" + p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sql_q4_order_priority decorrelates EXISTS to a left-semi hash join") {
    val p = plan("sql_q4_order_priority")
    assert(p.contains("LeftSemi"),
      "EXISTS must become a semi join, not a per-row subquery\n" + p)
    // the non-equi leg (shipdate > orderdate + 60d) rides the semi join as
    // a condition; a NestedLoop/Cartesian fallback here is the quadratic
    // decorrelation failure this pin exists to catch
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sql_q17_small_qty decorrelates the scalar avg to one aggregate + equi-join") {
    val p = plan("sql_q17_small_qty")
    // RewriteCorrelatedScalarSubquery: the per-part avg must come from ONE
    // aggregate over lineitem joined back on l_partkey — a NestedLoop or
    // Cartesian here means the subquery re-evaluates per outer row, the
    // quadratic shape this pin exists to catch
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), "the correlated avg must be a real aggregate\n" + p)
  }

  test("sql_q2_min_cost decorrelates the scalar min to one aggregate + equi-join") {
    val p = plan("sql_q2_min_cost")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), "the correlated min must be a real aggregate\n" + p)
  }

  test("sql_q19_discounted_revenue keeps the hash join under disjunctive predicates") {
    val p = plan("sql_q19_discounted_revenue")
    // the OR-of-conjunctions must NOT demote the partkey equality to a
    // nested-loop join condition: the equality is a common factor across
    // all three clauses, so the planner keeps a hash join and evaluates
    // the disjunction as a filter/residual
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashJoin"), "partkey equality must stay a hash join\n" + p)
  }

  test("sql_q6_forecast pushes all three scan predicates into the parquet reader") {
    val p = plan("sql_q6_forecast")
    // the 100 TB value of Q6 is row-group pruning: shipdate/discount/
    // quantity must appear as PushedFilters, not post-scan filters only
    // the plan string TRUNCATES the PushedFilters list, so assert the
    // leading entries only (all three columns' IsNotNull come first)
    assert(p.contains(
      "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity), GreaterThanOrEqual"), p)
  }

  test("sql_q21_waiting plans EXISTS as semi and NOT EXISTS as anti, both set-based") {
    val p = plan("sql_q21_waiting")
    assert(p.contains("LeftSemi"),
      "EXISTS (other supplier in order) must become a semi join\n" + p)
    assert(p.contains("LeftAnti"),
      "NOT EXISTS (other late supplier) must become an anti join\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the suppkey <> residual must not force a nested loop\n" + p)
  }

  test("sql_q22_global_sales plans NOT EXISTS as an anti join with scalar subqueries") {
    val p = plan("sql_q22_global_sales")
    assert(p.contains("LeftAnti"),
      "NOT EXISTS (recent order) must become an anti join\n" + p)
    assert(p.contains("Subquery") || p.contains("scalar-subquery"),
      "the exact-integer average threshold must stay a scalar subquery\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sql_q16_supplier_cnt plans NOT IN as a null-aware anti join on a broadcast build") {
    val p = plan("sql_q16_supplier_cnt")
    assert(p.contains("LeftAnti"), "NOT IN must become an anti join\n" + p)
    // the null-awareness is the point: the single-column NOT IN plans as
    // BroadcastHashJoin(..., LeftAnti, BuildRight, isNullAwareAntiJoin =
    // true) — the trailing flag is how Spark prints NAAJ; a plain
    // NOT-EXISTS-style anti join (flag false) gets NULL semantics wrong
    assert(p.contains("LeftAnti, BuildRight, true"),
      "NOT IN anti join must be null-aware (isNullAwareAntiJoin=true)\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "the excluded-key list must broadcast (NAAJ requires a broadcast build)\n" + p)
    assert(p.contains("Expand") || p.contains("distinct"),
      "count(DISTINCT) should plan the two-phase distinct aggregate\n" + p)
  }

  test("sql_join_hints: the three hints produce three different physical join operators") {
    val p = plan("sql_join_hints")
    assert(p.contains("BroadcastHashJoin"), "BROADCAST hint ignored\n" + p)
    assert(p.contains("SortMergeJoin"), "MERGE hint ignored\n" + p)
    assert(p.contains("ShuffledHashJoin"), "SHUFFLE_HASH hint ignored\n" + p)
  }

  test("sql_udf: the SQL-defined function inlines — no UDF eval node, codegen intact") {
    val p = plan("sql_udf")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      "SQL UDF must inline at analysis, not evaluate as an external UDF\n" + p)
    assert(p.contains("HashAggregate") && p.contains("*("),
      "inlined body must stay inside whole-stage codegen\n" + p)
  }

  test("sql_parameterized: bound parameters push into the scan like literals") {
    val p = plan("sql_parameterized")
    assert(p.contains("PushedFilters: [") && p.contains("GreaterThanOrEqual(l_shipdate"),
      "the bound :lo date must reach the parquet scan as a pushed filter\n" + p)
  }

  test("sql_q13_count_grouping keeps the filtered outer join and double aggregate") {
    val p = plan("sql_q13_count_grouping")
    assert(p.contains("LeftOuter"),
      "the ON-clause filter must not degrade LEFT JOIN to inner\n" + p)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "count-then-distribution needs two aggregate levels\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sql_q20_nested unnests both IN levels to semi joins with no cartesian product") {
    val p = plan("sql_q20_nested")
    // two IN levels → two semi joins (supplier ⋉ having-agg, lineitem ⋉
    // blue-parts); the scalar thresholds must arrive as subqueries, not
    // join-product blowups
    assert("LeftSemi".r.findAllIn(p).size >= 2,
      "both nested INs must unnest to semi joins\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Subquery") || p.contains("scalar-subquery"),
      "the exact-integer threshold must stay a scalar subquery\n" + p)
  }

  test("sql_pipe desugars onto the same aggregate plan shape as the ANSI form") {
    val p = plan("sql_pipe")
    assert(p.contains("HashAggregate"), p)
    // the pipe WHERE stage must still push to the parquet scan
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      p.contains("GreaterThanOrEqual(l_shipdate"), p)
  }

  test("sql_lateral decorrelates the windowed LIMIT subquery — no cartesian, set-based window") {
    val p = plan("sql_lateral")
    assert(p.contains("Window"),
      "correlated row_number must decorrelate to a set-based Window\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("join_scd2 broadcasts the versioned dim with the validity range as a residual filter") {
    val p = plan("join_scd2")
    assert(p.contains("BroadcastHashJoin"),
      "the dim must broadcast on the equi key\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // the range predicate rides the join as a residual condition, not a
    // post-join filter of a cross product
    assert(p.contains("valid_from") && p.contains("valid_to"), p)
  }

  test("window_running_distinct runs exactly two window exchanges, user partitioning last") {
    val p = plan("window_running_distinct")
    // (user, type) first-occurrence + (user) running sum = 2 hash
    // exchanges; a third would mean a redundant re-shuffle snuck in.
    // Count only the AQE FINAL plan — toString appends the Initial
    // Plan section too, which would double-count every exchange.
    val finalP = p.indexOf("== Initial Plan ==") match {
      case -1 => p; case i => p.substring(0, i)
    }
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalP).size
    assert(exchanges == 2, s"expected 2 window exchanges, got $exchanges\n" + p)
    assert("Window".r.findAllIn(finalP).size >= 2, p)
  }

  test("events_time_to_convert keeps the percentile picks on a broadcast scalar (no second events scan join)") {
    val p = plan("events_time_to_convert")
    assert(p.contains("BroadcastExchange"),
      "stats row must broadcast into the rank pass\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("src_partition_prune prunes the scan to one day partition at directory level") {
    val df = graft.SparkEntry.queries("src_partition_prune")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: ["), p)
    assert(p.contains("day#") && p.contains("2024-01-11"),
      "the day equality must be a partition filter, not a data filter\n" + p)
    // the read set is exactly the target partition's files. NOT
    // df.inputFiles — that lists the relation's whole FileIndex
    // ignoring partition filters; input_file_name() reflects the
    // files actually scanned post-pruning.
    import org.apache.spark.sql.functions.input_file_name
    val pruneDir = spark.conf.get("spark.graft.prune.dir")
    val files = spark.read.parquet(pruneDir)
      .where(org.apache.spark.sql.functions.col("day") === "2024-01-11")
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("day=2024-01-11")),
      files.mkString(", "))
  }

  test("sql_q5_local's join shapes stay eligible for injected runtime bloom filters") {
    // at 100 TB the dims stop broadcasting; the plan must then remain
    // ELIGIBLE for InjectRuntimeFilter so the selective region/orderdate
    // predicates still prune the fact scans before the shuffle. Disable
    // broadcast to surface that regime (thresholds lowered as in the
    // dim-filter pin above).
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = Sql.q5Local(spark, "/root/testdata/sf0.01")
      df.collect()
      val lp = df.queryExecution.optimizedPlan.toString
      assert(lp.contains("might_contain") && lp.contains("bloom_filter_agg"),
        "no runtime bloom filter injected into the 6-table join\n" + lp)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("Catalyst injects a runtime bloom filter from a selective dim filter") {
    // the 100 TB scan-pruning path: a selective predicate on the orders
    // side should inject bloom_filter_might_contain onto the lineitem
    // scan, so the fact side drops non-joining rows BEFORE the shuffle.
    // Thresholds are production-sized (10 MB / 10 GB), far above the test
    // fixture, so they are lowered here to surface the plan; the point
    // pinned is that the engine's join shapes remain ELIGIBLE (equi-join,
    // shuffle join, selective creation side) for the optimization.
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val li = graft.core.Tables.lineitem(spark, "/root/testdata/sf0.01")
      val o = graft.core.Tables.orders(spark, "/root/testdata/sf0.01")
        .where($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 200000.0)
      val j = li.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      j.collect()
      // the injected filter prints as might_contain(scalar-subquery ...)
      // over a bloom_filter_agg build on the creation side
      val lp = j.queryExecution.optimizedPlan.toString
      assert(lp.contains("might_contain") && lp.contains("bloom_filter_agg"),
        "runtime bloom filter was not injected\n" + lp)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("curate_filter_funnel is a pure map — zero exchanges") {
    // the composed curation gate must stay map-side like its component
    // signals; an exchange means a signal regressed into an aggregation
    val p = plan("curate_filter_funnel")
    assert(!p.contains("Exchange"), p)
  }

  test("curate_contamination broadcasts the eval-gram set (no corpus-gram shuffle join)") {
    val p = plan("curate_contamination").split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "eval set must broadcast, not shuffle\n" + p)
  }

  test("text_repetition is a pure map — zero exchanges") {
    // the curation gate a 100 TB pass runs map-side before anything
    // shuffle-bearing; an exchange appearing here means the per-row HOF
    // design regressed into an aggregation
    val p = plan("text_repetition")
    assert(!p.contains("Exchange"), p)
  }

  test("text_pack shuffles once (per-shard window), never globally sorts") {
    val p = plan("text_pack").split("== Initial Plan ==")(0)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected one shard exchange, got $exchanges\n$p")
    assert(!p.contains("rangepartitioning"),
      "packing must not serialize through a global sort\n" + p)
  }

  test("ngram jaccard candidate join is an equi-join with no cartesian") {
    // assert on the candidate-generation frame itself: the declared query
    // eagerly checkpoints it, so its executed plan would not show the
    // candidate self-join at all (a cartesian regression could hide there)
    val idx = Dedup.ngramPrefixIndex(graft.core.Tables.documents(spark, sf), 0.8)
    val cands = Dedup.ngramCandidates(idx, 0.8)
    cands.collect()
    val p = cands.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join"), p)
  }

  test("fuzzy join candidate generation equi-joins on deletion variants — no cartesian") {
    // the round-5 shape blocked on a constant-cardinality key (~92 last
    // words); this pins the rework: candidates come from an equi-join on
    // deletion-variant hashes (full-string granularity), never a
    // cartesian or nested-loop pairing of probes × parts
    val (probes, cands) = Relational.fuzzyFrames(spark, sf)
    val c = Relational.fuzzyCandidates(probes, cands)
    c.collect()
    val p = c.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join"), p)
  }

  test("grouped UDTF rides exactly one group-key exchange") {
    // flatMapGroups must have a keyed aggregate's shuffle profile: one
    // hash exchange on the group key, then group-local compute — a
    // second exchange (or a broadcast) means the typed path re-shuffled
    val p = plan("udtf_order_gaps").split("== Initial Plan ==")(0)
    assert(!p.contains("Broadcast"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one group-key exchange, got $exchanges\n$p")
  }

  test("cogroup UDTF co-partitions both inputs — two exchanges, no join blowup") {
    // cogroup's contract: each side shuffles ONCE to the shared key
    // partitioning; no broadcast, no join operator materializing the
    // pair blowup before the function sees the groups
    val p = plan("udtf_cogroup_reconcile").split("== Initial Plan ==")(0)
    assert(!p.contains("Broadcast"), p)
    assert(!p.contains("CartesianProduct"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"expected one exchange per cogrouped side, got $exchanges\n$p")
  }

  test("LSH kNN-graph edge builder equi-joins on (table, bucket) — no cartesian") {
    // the artifact-backed declared query would hide the build plan; pin
    // the builder itself: multiprobe pairs must ride the bucket
    // equi-join, never a nested-loop pairing of the corpus with itself
    val (c, bucketIdx) = SimSearch.knnGraphLshEdgesWithIndex(spark, sf)
    try c.collect() finally bucketIdx.unpersist()
    val p = c.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join"), p)
  }

  test("simsearch_filtered_topk rides the label equi-key as a broadcast hash join") {
    // the filter is what makes this plan BETTER than brute force: the
    // metadata equi-condition must become the join key (hash join on
    // label), never degrade to the all-pairs nested loop brute uses
    val p = plan("simsearch_filtered_topk")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("spatial radius pairs meet on the cell equi-join — no cartesian") {
    // all-pairs-within-R must ride the (cx, cy) grid key; a nested-loop
    // pairing would be corpus-quadratic at every cell density
    val df = graft.operators.Spatial.radiusJoin(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join"), p)
  }

  test("exact kNN graph pairs meet on the slot equi-join — no cartesian") {
    // every-vector-vs-every-vector must ride the blocked slot key, never
    // a nested-loop pairing (the broadcast-cross shape caps at one task)
    val df = SimSearch.knnGraph(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join"), p)
  }

  test("maint_purge anti-joins via broadcast — the fact side never shuffles") {
    val df = Maintenance.purge(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("curate_blocklist_bloom probes a broadcast bitmap (no corpus-side merge join)") {
    val p = plan("curate_blocklist_bloom")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("curate_quality_prune threshold is a one-row broadcast, not a join by sort") {
    val p = plan("curate_quality_prune")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("events_attribution reads the event log once, on one user_id exchange") {
    // a union-of-filtered-branches shape scans the fact table per branch;
    // the per-row conditional shape must not (2 scans of a 100 TB log is
    // the whole query cost); window + final small agg ⇒ ≤2 exchanges
    val p = plan("events_attribution").split("== Initial Plan ==")(0)
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected one events scan, got $scans\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected window + final agg exchanges, got $exchanges\n$p")
  }

  test("events_anomaly and events_dips ride a single user_id exchange") {
    for (q <- Seq("events_anomaly", "events_dips")) {
      val p = plan(q).split("== Initial Plan ==")(0)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges == 1, s"$q: expected one user_id exchange, got $exchanges\n$p")
      val scans = "FileScan parquet".r.findAllIn(p).size
      assert(scans == 1, s"$q: expected one events scan, got $scans\n$p")
    }
  }

  test("agg_moments is one exchange (map-side-combinable integer sums)") {
    val p = plan("agg_moments").split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one group exchange, got $exchanges\n$p")
    assert(p.contains("HashAggregate"), p)
  }

  test("ts_interpolate shares one (user, day) exchange after the checkpointed daily agg") {
    // without the localCheckpoint, Catalyst duplicates the scan+agg
    // subtree into both the calendar derivation and the join probe —
    // two full scans of the event log
    val p = plan("ts_interpolate").split("== Initial Plan ==")(0)
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans <= 1, s"daily agg must not be recomputed per consumer, got $scans scans\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"both window frames must share one exchange, got $exchanges\n$p")
  }

  test("dedup_normalized stages variants in the same single corpus scan") {
    val p = plan("dedup_normalized").split("== Initial Plan ==")(0)
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected one documents scan, got $scans\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one hash-group exchange, got $exchanges\n$p")
  }

  test("curate_pipeline: one scan, no joins — gate is a filter, dedup one window") {
    val df = graft.SparkEntry.queries("curate_pipeline")(spark, sf)
    df.collect()
    // AQE prints Final + Initial sections; count scans in the final only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the whole chain composes without a single join: gate = Filter,
    // dedup = window on the content hash, split = per-row arithmetic
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    assert(p.split("Scan parquet").length - 1 === 1, s"expected one scan:\n$p")
  }

  test("join_interval rides one l_partkey exchange: group agg, sweep window, final agg") {
    // hash-partitioning on l_partkey alone must satisfy the (part,d0,d1)
    // group agg, the window AND the per-part aggregate — a second
    // exchange means the interval grouping stopped reusing it
    val p = plan("join_interval").split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one l_partkey exchange, got $exchanges\n$p")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected one lineitem scan, got $scans\n$p")
    assert(!p.contains("Join"), "the sweep must not plan a join\n" + p)
  }

  test("ts_resample shares one (user, day) exchange between both frames and the agg") {
    val p = plan("ts_resample").split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one (user, day) exchange, got $exchanges\n$p")
    val scans = "FileScan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected one events scan, got $scans\n$p")
  }

  test("fn_variant is a pure per-row map — zero exchanges") {
    val p = plan("fn_variant").split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange"), "variant path access must not shuffle\n" + p)
  }

  test("simsearch_range broadcasts only the query batch — no shuffle, no window") {
    val p = plan("simsearch_range").split("== Initial Plan ==")(0)
    assert("BroadcastExchange".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Exchange hashpartitioning"),
      "radius search must not shuffle the corpus\n" + p)
    assert(!p.contains("Window"), "threshold filter needs no window\n" + p)
  }

  test("agg_weighted_median rides one (priority) exchange through both windows and the agg") {
    val p = plan("agg_weighted_median").split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one priority exchange, got $exchanges\n$p")
  }

  test("dedup_phash pairs meet on the (band, key) equi-join — no cartesian, one decode") {
    // image near-dup candidates must come from the 4×16-bit band-bucket
    // equi-join (per-bucket quadratic, bounded by bucket population) —
    // a nested-loop or cartesian here is the corpus-quadratic regression
    // the banding exists to prevent; the fused decode+hash runs once
    // behind the lazy localCheckpoint, not once per join side
    val p = plan("dedup_phash").split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join"), p)
    assert(!p.contains("FileScan parquet"),
      "both join sides must read the checkpointed hashes, not re-scan+decode\n" + p)
  }

  test("events_active_users keys its distinct exchange on (anchor, user) — the day-skew trap never forms") {
    // post-checkpoint: explode → (anchor, user) min-offset agg →
    // broadcast anchor semi-filter → per-day tier counts. Two hash
    // exchanges max; the per-day exchange carries already-deduped
    // rows with map-side partial counts — never |users| rows per day
    val p = plan("events_active_users").split("== Initial Plan ==")(0)
    assert(!p.contains("FileScan parquet"),
      "consumers must read the checkpointed distinct, not re-scan events\n" + p)
    // three exchanges, each safe: (anchor, user) min-offset agg —
    // uniform keys; |days|-row anchor dedup feeding the broadcast;
    // per-day exchange of already-partial-counted tier rows
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 3, s"expected (anchor,user) + anchors + day exchanges, got $exchanges\n$p")
    assert("Exchange hashpartitioning\\([^)]*user_id".r.findAllIn(p).nonEmpty,
      "the min-offset aggregate must key its exchange on (anchor, user), " +
        "never day alone over raw user rows\n" + p)
    assert(p.contains("BroadcastHashJoin"), "anchors must broadcast\n" + p)
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "tier counts must combine map-side\n" + p)
  }

  test("ml_linreg is one exchange over map-side-combined moments (the q1_agg profile)") {
    // five moment sums, all partial-aggregated before the shuffle; the
    // slope expression runs on |groups| rows after the final agg
    val p = plan("ml_linreg").split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one group exchange, got $exchanges\n$p")
    assert(p.contains("partial_sum"), "moments must combine map-side\n" + p)
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
  }

  test("ml_feature_bins reads the checkpointed slim projection — no re-scan, scalar-only broadcasts") {
    // width and depth (plus their scalars) must all consume the one
    // lazily-checkpointed 3-column projection; the only nested-loop
    // joins allowed are the 1-row scalar crossJoins
    val p = plan("ml_feature_bins").split("== Initial Plan ==")(0)
    assert(!p.contains("FileScan parquet"),
      "every consumer must read the checkpointed projection, not re-scan+decode\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2 &&
      p.contains("IdentityBroadcastMode"),
      "only the 1-row scalar crossJoins may nested-loop\n" + p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected one (method,bin) exchange, got $exchanges\n$p")
  }

  test("ml_eval_confusion's fact stage is one exchange over a map-side-combined profile") {
    // the only fact-sized work is the (truth, pred) aggregate; every
    // metric derives from the ≤(|langs|+1)² profile behind a checkpoint
    val df = MlFeatures.confusionProfile(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one (truth, pred) exchange, got $exchanges\n$p")
    assert(p.contains("partial_count"), "profile must combine map-side\n" + p)
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
  }

  test("ml_eval_auc is one score exchange + a bounded fold — no rank window, no per-row rank") {
    // the midrank recurrence must run over the VALUE-bounded score
    // profile (one map-side aggregate), never as a global rank/window
    // over corpus rows
    val p = plan("ml_eval_auc").split("== Initial Plan ==")(0)
    assert(!p.contains("Window"), "no window may touch fact rows\n" + p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one score exchange, got $exchanges\n$p")
    assert(p.contains("partial_count"), "profile must combine map-side\n" + p)
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
  }

  test("agg_percentile_exact picks rows via a broadcast rank join — no window, no value buffering") {
    // the whole point vs native percentile_disc: no task ever buffers
    // the corpus — DistRank's range partitioning does the ordering and
    // a 5-row broadcast picks the targets
    val p = plan("agg_percentile_exact").split("== Initial Plan ==")(0)
    assert(!p.contains("Window"), "no window may touch fact rows\n" + p)
    assert(!p.contains("percentile"), "must not fall back to the buffering aggregate\n" + p)
    assert(p.contains("BroadcastHashJoin"), "targets must broadcast\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("FileScan parquet"), p)
  }

  test("dedup_containment joins candidates on the shingle equi-key only — no cartesian") {
    val p = plan("dedup_containment").split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "containment candidates must come from the shingle equi-join\n" + p)
  }

  test("fn_struct collapses to a pure per-row map — zero exchanges") {
    val p = plan("fn_struct").split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange"),
      "struct algebra must optimize to flat projections\n" + p)
  }

  test("ts_ewma rides a single user_id exchange and one events scan") {
    val p = plan("ts_ewma").split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one user_id exchange, got $exchanges\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
  }

  test("text_rake ranks via distributed top-20, word stats join on the token equi-key") {
    val p = plan("text_rake").split("== Initial Plan ==")(0)
    assert(p.contains("TakeOrderedAndProject(limit=20"),
      "the final ranking must be a distributed top-k, not a global sort\n" + p)
    assert(!p.contains("rangepartitioning"), "no global sort exchange\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("text_bm25 ranks via TakeOrderedAndProject with broadcast scalars, no cartesian") {
    val p = plan("text_bm25").split("== Initial Plan ==")(0)
    assert(p.contains("TakeOrderedAndProject"),
      "final ranking must be a top-k draw, not a global sort\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("search_rrf matches terms via a broadcast hash equi-join — no cartesian") {
    val p = plan("search_rrf").split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"), p)
    // the one nested-loop join allowed is the 1-row n_docs scalar
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1 &&
      p.contains("IdentityBroadcastMode"),
      "only the scalar crossJoin may nested-loop\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "keyword match must be a broadcast term equi-join\n" + p)
  }

  test("join_bloom filters the fact side below its exchange in the no-broadcast regime") {
    val p = plan("join_bloom").split("== Initial Plan ==")(0)
    assert(p.contains("SortMergeJoin"),
      "the hint must pin the dim-too-big-to-broadcast regime\n" + p)
    assert(!p.contains("BroadcastHashJoin"), p)
    val ex = p.indexOf("Exchange")
    val bl = p.indexOf("bloom_might_contain")
    assert(bl >= 0, "bloom predicate missing from the physical plan\n" + p)
    assert(ex >= 0 && bl > ex,
      "bloom filter must sit BELOW the fact-side exchange (children print " +
        "after parents), so the shuffle moves only rows that can match\n" + p)
  }

  test("join_dpp inserts a dynamicpruning subquery into the fact scan's partition filters") {
    val df = graft.SparkEntry.queries("join_dpp")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruningexpression"),
      "Catalyst must prune fact partitions from the runtime dim key set — " +
        "without it a 100 TB date-partitioned fact is scanned whole\n" + p)
    assert(p.contains("PartitionFilters: [isnotnull(day"), p)
  }

  test("simsearch_index_delta's batch plan is one delta exchange, broadcast-only joins") {
    val p = plan("simsearch_index_delta").split("== Initial Plan ==")(0)
    // the per-batch cost model: ONE hash exchange (the K-row per-cell
    // aggregate of the assigned delta); the centroid matrix and the
    // K-row index join ride broadcasts — at 100 TB the ingest batch
    // never sort-merges or re-shuffles the base
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "the delta assignment must shuffle exactly once (per-cell agg)\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "index maintenance must not sort-merge anything\n" + p)
  }

  test("agg_corr_matrix is one scan into one partial-aggregated reduce") {
    val p = plan("agg_corr_matrix").split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(p).size == 1,
      "the full matrix must cost ONE pass over lineitem\n" + p)
    assert(p.contains("partial_"), "map-side partial aggregation expected\n" + p)
  }

  test("spatial candidate generation meets on cell EQUI-joins — never a " +
    "cartesian or nested-loop product") {
    // the radius pairs key AND the capped label-path edge generator: the
    // grid cover's whole point is that candidates meet on (cx, cy)
    // equality, so any cartesian/BNLJ in these plans means the cover
    // degraded to all-pairs — the 100 TB failure mode
    val p1 = plan("join_spatial_radius")
    assert(!p1.contains("CartesianProduct") && !p1.contains("BroadcastNestedLoopJoin"), p1)
    val df = Spatial.spatialEdges(
      Spatial.stagedPoints(graft.core.Tables.customer(spark, sf)))
    df.collect()
    val p2 = df.queryExecution.executedPlan.toString
    assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"), p2)
  }
  test("dedup_semantic_ann's candidate stage is cell equi-joins only " +
    "(never cartesian) and verifies through the codegen cosine kernel") {
    // plan the ANN pair generator directly (the declared key's summary
    // reduces it away): hot-path discipline for the 100 TB probe
    val lists = SimSearch.ivfListsShared(spark, sf)
    val pairs = Dedup.semanticAnnPairs(lists, tau = 0.45)
    pairs.collect()
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the cell probe must be equi-joins only\n" + p)
    assert(p.contains("vec_dot"),
      "the verify must run the codegen FloatVecDot kernel\n" + p)
  }

  test("graph-ANN distributed topBeam (dedup + per-query trim) shares one exchange") {
    // round-15 (guide §2.4): repartition by q_id ALONE seeds a
    // HashPartitioning(q_id) that satisfies BOTH the (q_id, n_id) dedup
    // aggregate's clustered distribution and the q_id window's — one
    // exchange per beam round where groupBy(q_id, n_id) followed by the
    // window planned two. This pins the Spark planning property
    // graphAnnSearchDistributed's topBeam relies on (same shape inline:
    // the search core is round-checkpointed, so its own executed plan
    // only shows the last round).
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val cand = Seq((1L, 2L, 0.5), (1L, 2L, 0.5), (1L, 3L, 0.4), (2L, 3L, 0.9))
      .toDF("q_id", "n_id", "cos")
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"n_id".asc)
    val df = cand.repartition($"q_id")
      .groupBy($"q_id", $"n_id").agg(max($"cos").as("cos"))
      .withColumn("rk", row_number().over(w)).where($"rk" <= 2)
      .select($"q_id", $"n_id", $"cos")
    assert(df.collect().length === 3) // (1,2) deduped, all within beam 2
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1,
      s"dedup agg + window must share the q_id exchange, got $exchanges\n$p")
  }

}
