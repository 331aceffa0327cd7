package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, LocalLimitExec, LocalTableScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Repo-wide window-discipline sweep (round-9 CI invariant): NO query
  * may plan an unpartitioned window (`WindowExec`/`WindowGroupLimitExec`
  * with an empty partitionSpec — "Moving all data to a single
  * partition") over an input whose cardinality is not bounded by
  * construction. Round 8 shipped three such scale-killers
  * (events_rfm's ntile×3, events_time_to_convert's global row_number,
  * text_vocab_coverage's full-|vocab| cumsum) that every per-query plan
  * pin missed because none watched this CLASS; this sweep walks all 260
  * declared plans so reintroducing the shape fails CI.
  *
  * "Bounded by construction" is decided structurally on the physical
  * plan under the window:
  *  - a limit node (GlobalLimit/LocalLimit/CollectLimit/
  *    TakeOrderedAndProject) caps cardinality;
  *  - an ungrouped aggregate emits exactly one row;
  *  - an aggregate grouping ONLY on `__pid` is the [[DistRank]] offset
  *    profile — ≤ spark.sql.shuffle.partitions rows, bounded by cluster
  *    config, not data (DistRank is the only producer of `__pid`);
  *  - a small LocalTableScan (inline literal frame) is bounded;
  *  - joins/unions/generates are bounded iff ALL inputs are (a
  *    broadcast of a bounded frame cannot unbound a product);
  *  - any other node passes the question to its children; leaves
  *    (file/RDD scans) are UNbounded.
  *
  * Frames that are bounded by DATA SEMANTICS invisible to the plan
  * (calendar-capped profiles, distinct-frequency frontiers) must be
  * enrolled in [[allowlisted]] with the justification inline; the
  * sweep also fails on STALE allowlist entries, so the list can only
  * shrink or stay honest.
  */
class WindowDisciplineSpec extends SparkSpec {

  /** key -> justification for an unpartitioned window the structural
    * rule cannot see is bounded. Keep justifications concrete: what
    * bounds the frame, and why that bound survives 100 TB. */
  private val allowlisted: Map[String, String] = Map(
    "ts_seasonal_dow" ->
      ("window input is the groupBy(iso_dow) profile: ISO weekdays cap " +
        "it at 7 rows by the calendar, at 100 TB as at 100 MB — the " +
        "structural rule cannot see a domain bound carried by a value " +
        "range, only by plan shape"),
    "ts_forecast_baselines" ->
      ("lag windows run over the day-grain revenue grid (groupBy(day) " +
        "aggregate, eagerly checkpointed so the plan shows an RDD leaf): " +
        "|rows| ≤ |calendar days| — ~3.7k at ten years — at 100 TB as at " +
        "100 MB; the corpus-sized work is the aggregate below the " +
        "checkpoint, which stays fully partitioned"),
    "events_skyline" ->
      ("window input is the per-DISTINCT-frequency candidate set " +
        "(groupBy(frequency) of per-user purchase counts): it grows " +
        "like max purchases per user (heavy-tailed, ~10²–10³ even at " +
        "10⁹ users), not like users — the frontier docstring at " +
        "Relational.eventsSkyline has the full argument; the big " +
        "per-user aggregate stays fully partitioned and the frontier " +
        "rejoins by broadcast"))

  private def isLimit(p: SparkPlan): Boolean = p match {
    case _: GlobalLimitExec | _: LocalLimitExec | _: CollectLimitExec |
        _: TakeOrderedAndProjectExec => true
    case _ => false
  }

  private def groupingNames(p: SparkPlan): Option[Seq[String]] = p match {
    case a: HashAggregateExec => Some(a.groupingExpressions.map(_.name))
    case a: ObjectHashAggregateExec => Some(a.groupingExpressions.map(_.name))
    case a: SortAggregateExec => Some(a.groupingExpressions.map(_.name))
    case _ => None
  }

  private def bounded(p: SparkPlan): Boolean =
    if (isLimit(p)) true
    else groupingNames(p) match {
      case Some(g) if g.isEmpty => true // scalar aggregate: 1 row
      case Some(g) if g == Seq("__pid") => true // DistRank offsets: ≤P rows
      case _ =>
        p match {
          case l: LocalTableScanExec => l.rows.size <= 1000
          case other =>
            other.children.nonEmpty && other.children.forall(bounded)
        }
    }

  test("no query plans an unpartitioned window over unbounded input") {
    val offenders = scala.collection.mutable.Map[String, List[String]]()
    // AQE off for the sweep: executedPlan is then the fully-PREPARED
    // non-adaptive plan (subqueries planned physical, so
    // collectWithSubqueries can walk into them) without executing it
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      sweep(offenders)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    val unexpected = offenders.keySet -- allowlisted.keySet
    val stale = allowlisted.keySet -- offenders.keySet
    assert(unexpected.isEmpty,
      s"unpartitioned window over UNBOUNDED input (single-partition " +
        s"scale-killer) in: ${unexpected.toSeq.sorted.map(k => s"$k -> ${offenders(k)}").mkString("; ")}")
    assert(stale.isEmpty,
      s"stale allowlist entries (shape no longer present — remove): ${stale.toSeq.sorted.mkString(", ")}")
  }

  private def sweep(offenders: scala.collection.mutable.Map[String, List[String]]): Unit =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan
      val bad = plan.collectWithSubqueries {
        case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
          w.windowExpression.map(_.sql).mkString(", ").take(120)
        case w: WindowGroupLimitExec
            if w.partitionSpec.isEmpty && !bounded(w.child) =>
          s"WindowGroupLimit(${w.rankLikeFunction.sql})".take(120)
      }
      if (bad.nonEmpty) offenders(name) = bad.toList
    }
}
