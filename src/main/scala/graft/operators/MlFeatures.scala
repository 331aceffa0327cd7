package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Exact, Tables}

/** Supervised-learning primitives over the fixtures: exact per-group
  * OLS trend screening and feature binning (the passes every tabular
  * feature pipeline runs before any model sees the data), plus the
  * model-quality scoreboard — confusion metrics and exact midrank ROC
  * AUC for the langid heuristic against ground truth. Everything
  * follows the graft exactness discipline (integer moments, sign-safe
  * truncating division, DECIMAL(38,0) where BIGINT cross-products
  * wrap) so DuckDB replays each result bit-for-bit.
  */
object MlFeatures {

  /** Per-group simple linear regression (exact OLS slope) — the trend
    * screen "is order value drifting over time, per priority class?",
    * answered from the four classic integer moments (n, Σx, Σy, Σxy,
    * Σxx) with x = days since the corpus epoch and y = integer cents.
    * slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²), reported as exact
    * sign-safe floor-of-magnitude ppm: sign(num) · (|num|·10⁶ div den)
    * — truncating division on NON-NEGATIVE magnitudes, so Spark's
    * DECIMAL `div` and DuckDB's HUGEINT `//` agree bit-for-bit even
    * though the two engines round negative quotients differently (the
    * events_lift precedent, extended to signed numerators).
    *
    * Scale shape: ONE map-side-combinable aggregate over the fact scan
    * (five moment sums per group, |groups| = |priorities| rows out) —
    * the same profile as q1_agg; nothing after the aggregate touches
    * fact-sized data. Moment products ride DECIMAL(38,0): at 10⁹ rows
    * per group with day ≤ 2·10⁴ and cents ≤ 10⁹, n·Σxy ≤ ~10³³ and
    * |num|·10⁶ ≤ ~10³⁹·ε — inside 38 digits, where BIGINT partials
    * would wrap at ~10⁵ rows (the skew_report wrap-safety rationale).
    */
  def mlLinreg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val x = datediff(to_date($"o_orderdate"), lit("1992-01-01").cast("date"))
      .cast("bigint")
    val y = Exact.cents($"o_totalprice")
    Tables.orders(s, d)
      .select($"o_orderpriority", x.as("x"), y.as("y"))
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum($"x").as("sum_x"),
        sum($"y").as("sum_y"),
        sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"),
        sum(($"x" * $"x").cast("decimal(38,0)")).as("sxx"))
      .select($"o_orderpriority", $"n", $"sum_x", $"sum_y",
        // the moment-sum cross products (Σx·Σy etc.) are the first
        // terms to wrap: BIGINT overflows them at ~10⁵ rows/group
        // (measured at sf0.1), so promote to DECIMAL(38,0) BEFORE
        // multiplying — n·sxy/n·sxx promote via the decimal operand
        expr("""
          CAST(CASE WHEN n * sxx - CAST(sum_x AS DECIMAL(38,0)) * sum_x = 0 THEN NULL
               ELSE CASE WHEN n * sxy - CAST(sum_x AS DECIMAL(38,0)) * sum_y < 0
                         THEN -1 ELSE 1 END
                    * (abs(n * sxy - CAST(sum_x AS DECIMAL(38,0)) * sum_y) * 1000000
                       div (n * sxx - CAST(sum_x AS DECIMAL(38,0)) * sum_x)) END AS BIGINT)
        """).as("slope_ppm_per_day"))
  }

  /** Feature binning, both flavors side by side over the same measure
    * (lineitem extended price in cents): equi-WIDTH — bin = (v − lo)·k
    * div (hi − lo + 1), pure per-row integer arithmetic once the 2-value
    * (lo, hi) scalar broadcasts back — and equi-DEPTH — SQL-standard
    * ntile(k) under the TOTAL order (cents, l_orderkey, l_linenumber),
    * computed by [[DistRank.withRank]] + [[DistRank.ntileFromRank]]
    * because a bare `ntile() OVER (ORDER BY …)` is the single-partition
    * scale-killer the window-discipline sweep bans. Output is the 2k-row
    * bin profile (method, bin, n, min/max cents) — the artifact a
    * feature store persists, not the per-row assignment (that is the
    * rank frame itself, one more column away).
    *
    * Scale shape: one slim 3-column projection of the fact scan feeds
    * both flavors (checkpointed once, multi-consumer rule); width is a
    * broadcast-scalar map + one k-group aggregate; depth is DistRank's
    * single range exchange + zipWithIndex over the SAME slim frame —
    * the ADVICE.md wide-frame caveat doesn't bite because the ranked
    * frame IS the 3 columns the binning needs, no join-back. DistRank
    * here ranks a FACT-sized frame (not an aggregate profile): that is
    * exactly its design envelope — P-way parallel local sorts, P-long
    * driver offsets. */
  def featureBins(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val buckets = 10
    val v = Tables.lineitem(s, d)
      .select(Exact.cents($"l_extendedprice").as("cents"),
        $"l_orderkey", $"l_linenumber")
      // consumed by the (lo, hi, n) scalar, the width map, and the
      // depth rank: cache the slim projection once
      .localCheckpoint(eager = false)
    val scalars = v.agg(min($"cents").as("lo"), max($"cents").as("hi"),
      count(lit(1)).as("n_total"))
    val width = v.crossJoin(broadcast(scalars))
      .select(lit("width").as("method"),
        DistRank.idiv(($"cents" - $"lo") * buckets, $"hi" - $"lo" + 1)
          .cast("bigint").as("bin"),
        $"cents")
    val depth = DistRank
      .withRank(v, Seq($"cents".asc, $"l_orderkey".asc, $"l_linenumber".asc), "rk")
      .crossJoin(broadcast(scalars))
      .select(lit("depth").as("method"),
        (DistRank.ntileFromRank($"rk", $"n_total", buckets) - 1).as("bin"),
        $"cents")
    width.unionByName(depth)
      .groupBy($"method", $"bin")
      .agg(count(lit(1)).as("n"),
        min($"cents").as("min_cents"), max($"cents").as("max_cents"))
  }

  /** GLOBAL exact percentiles via distributed rank — the 100 TB twin of
    * the ordered-set `sql_percentile_disc` path: Spark's native
    * `percentile_disc` aggregate BUFFERS every value of its group, so a
    * global (ungrouped) exact percentile OOMs one task when the corpus
    * outgrows executor memory; here [[DistRank.withRank]] range-
    * partitions the total order P ways and each target percentile is
    * the row at rank ceil(p·n) — the integer rule (p·n + 99) div 100,
    * which equals the SQL-standard "smallest value whose cume_dist ≥ p"
    * (the AnalyticsSpec percentile_disc index pin) and is verified
    * against DuckDB's native ordered-set aggregate at every shipped SF.
    * Tiebreak ids make ranks unique; the VALUE at the target position
    * is tiebreak-invariant.
    *
    * Scale shape: one slim projection (checkpointed — consumed by the
    * n-scalar and the rank), DistRank's single range exchange + P-way
    * spill-safe local sorts, then a 5-row broadcast target join picks
    * the answers — no task ever holds more than its |rows|/P slice. */
  def percentileExact(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pcts = Seq(25, 50, 75, 90, 99)
    val v = Tables.lineitem(s, d)
      .select(Exact.cents($"l_extendedprice").as("cents"),
        $"l_orderkey", $"l_linenumber")
      .localCheckpoint(eager = false)
    val targets = v.agg(count(lit(1)).as("n"))
      .select(explode(lit(pcts.toArray)).as("pct"), $"n")
      .select($"pct".cast("bigint").as("pct"),
        DistRank.idiv($"pct" * $"n" + 99L, lit(100L)).as("rk"))
    DistRank.withRank(v, Seq($"cents".asc, $"l_orderkey".asc, $"l_linenumber".asc), "rk")
      .join(broadcast(targets), "rk")
      .select($"pct", $"cents".as("pct_cents"))
  }

  /** Classifier evaluation (confusion metrics) — the scoreboard every
    * model-quality loop reads: per-class n_truth / n_pred / true
    * positives plus precision, recall, and F1, for the [[TextAnalysis
    * .langPredOf]] language-ID heuristic scored against the corpus's
    * ground-truth `lang` label (truth and prediction live on the SAME
    * row, so no join touches fact-sized data). Exact integer ppm:
    * P = tp div n_pred, R = tp div n_truth, and F1 collapses to
    * 2·tp div (n_truth + n_pred) — the harmonic mean of two ratios
    * with a common numerator needs NO floating point. A `__all__` row
    * carries micro accuracy (= micro P = R = F1). Zero denominators
    * emit NULL (guarded on both engines — ANSI Spark and DuckDB both
    * raise on integer div-by-zero).
    *
    * Scale shape: ONE map-side-combinable (truth, pred) aggregate over
    * the corpus scan — the confusion profile is ≤ (|langs|+1)² rows —
    * and every metric derives from that profile; the class/metric
    * joins are profile-sized. */
  /** The fact-sized stage of [[evalConfusion]] — one map-side-combinable
    * (truth, pred) aggregate over the corpus scan. Exposed so the plan
    * pin can assert the single-exchange shape the checkpoint boundary
    * would otherwise hide. */
  private[graft] def confusionProfile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"lang".as("truth"),
        TextAnalysis.langPredOf(TextAnalysis.toks($"text")).as("pred"))
      .groupBy($"truth", $"pred").agg(count(lit(1)).as("n"))
  }

  def evalConfusion(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val conf = confusionProfile(s, d)
      // profile-sized, consumed by five derivations
      .localCheckpoint(eager = false)
    val classes = conf.select($"truth".as("class"))
      .unionByName(conf.select($"pred".as("class"))).distinct()
    val nTruth = conf.groupBy($"truth".as("class")).agg(sum($"n").as("n_truth"))
    val nPred = conf.groupBy($"pred".as("class")).agg(sum($"n").as("n_pred"))
    val tp = conf.where($"truth" === $"pred")
      .select($"truth".as("class"), $"n".as("tp"))
    def ppm(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den === 0, lit(null)).otherwise(call_function("div", num * 1000000L, den))
        .cast("bigint")
    val per = classes
      .join(nTruth, Seq("class"), "left")
      .join(nPred, Seq("class"), "left")
      .join(tp, Seq("class"), "left")
      .na.fill(0L, Seq("n_truth", "n_pred", "tp"))
      .select($"class", $"n_truth", $"n_pred", $"tp",
        ppm($"tp", $"n_pred").as("precision_ppm"),
        ppm($"tp", $"n_truth").as("recall_ppm"),
        ppm($"tp" * 2, $"n_truth" + $"n_pred").as("f1_ppm"))
    val all = conf.agg(sum($"n").as("total"),
        sum(when($"truth" === $"pred", $"n").otherwise(0L)).as("tp"))
      .select(lit("__all__").as("class"), $"total".as("n_truth"),
        $"total".as("n_pred"), $"tp",
        ppm($"tp", $"total").as("precision_ppm"),
        ppm($"tp", $"total").as("recall_ppm"),
        ppm($"tp", $"total").as("f1_ppm"))
    per.unionByName(all)
  }

  /** Exact ROC AUC (midrank/Mann–Whitney form) for the langid 'en'
    * hit-count score against the binary ground truth lang = 'en' — the
    * threshold-free companion to [[evalConfusion]]'s scoreboard. AUC =
    * (Σ_pos midrank − n_pos(n_pos+1)/2) / (n_pos·n_neg), and with
    * integer midranks doubled (midrank·2 = r_lo + r_hi per tie group)
    * the whole statistic is EXACT integer arithmetic — ties get the
    * standard 1/2 credit with no floating point anywhere; the oracle's
    * rank()-window formulation and an all-pairs brute-force law
    * (MlFeaturesSpec) both replay it bit-for-bit.
    *
    * Scale shape: per-row score map → ONE map-side-combinable
    * per-score aggregate. The score is a bounded small integer (a
    * stopword hit count ≤ tokens per document), so the profile is
    * VALUE-bounded — |distinct scores| never grows with the corpus —
    * and the rank-offset recurrence runs as one bounded fold over the
    * sorted profile (the events_survival class), not a window and not
    * a per-row rank. The doubled-midrank sum m2 ≈ 2·N·n_pos itself
    * ACCUMULATES in DECIMAL(38,0) inside the fold (BIGINT would wrap
    * near ~3·10⁹ positive docs — short of the 100 TB envelope), and the
    * oracle mirrors it in HUGEINT; only the row counts, bounded by
    * BIGINT at any realistic corpus, stay long. */
  def evalAuc(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val prof = Tables.documents(s, d)
      .select(
        TextAnalysis.hitCount(TextAnalysis.toks($"text"),
          TextAnalysis.StopwordSets.head._2).cast("bigint").as("score"),
        ($"lang" === "en").cast("bigint").as("pos"))
      .groupBy($"score").agg(count(lit(1)).as("cnt"), sum($"pos").as("cp"))
    prof
      .agg(sort_array(collect_list(struct($"score", $"cnt", $"cp"))).as("g"),
        sum($"cp").as("np"), sum($"cnt").as("n"))
      .select(
        $"np".as("n_pos"), ($"n" - $"np").as("n_neg"),
        // r_lo + r_hi of a tie group starting after `off` rows with
        // `cnt` members is 2·off + cnt + 1; positives contribute cp of
        // those doubled midranks
        expr("""
          aggregate(
            g,
            named_struct('off', CAST(0 AS BIGINT), 'm2', CAST(0 AS DECIMAL(38,0))),
            (acc, e) -> named_struct(
              'off', acc.off + e.cnt,
              'm2', acc.m2 + CAST(e.cp AS DECIMAL(38,0)) * (2 * acc.off + e.cnt + 1)),
            acc -> acc.m2)
        """).as("mid2"))
      .select($"n_pos", $"n_neg",
        expr("""
          CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
               ELSE (mid2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1))
                    * 1000000 div (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg)
               END AS BIGINT)
        """).as("auc_ppm"))
  }

  private def stopListSql(l: String): String =
    TextAnalysis.StopwordSets.toMap.apply(l)
      .map(w => s"'$w'").mkString("[", ",", "]")
  private def hitsSql(l: String): String =
    s"len(list_filter(toks, t -> list_contains(${stopListSql(l)}, t)))"

  /** DuckDB replays: identical integer moments / bin arithmetic; the
    * depth flavor uses DuckDB's NATIVE ntile under the same total order,
    * so the DistRank decomposition is checked against the SQL-standard
    * operator itself (the events_rfm discipline, on a fact-sized
    * frame); the confusion oracle regenerates the langid prediction
    * from the same [[TextAnalysis.StopwordSets]] constants (the
    * generated-oracle discipline — the two sides cannot
    * desynchronize). */
  /** Calibration / reliability bins for the English-stopword-density
    * score against the labeled truth (`lang = 'en'`) — the diagram that
    * tells you whether a classifier's score is TRUSTWORTHY as a
    * probability (do 70 %-score docs come out English 70 % of the
    * time?), the standard companion to [[mlEvalAuc]]'s ranking view
    * and `ml_eval_confusion`'s threshold view. Score = en-stopword
    * hits ·10⁶ div tokens (the [[TextAnalysis.langId]] tokenization
    * and marker set, shared not copy-pasted); decile bins with the top
    * edge folded into bin 9; per-bin mean score and observed-English
    * rate as exact non-negative floor-div ppm. ONE map-side-combined
    * aggregate over the docs scan → ≤10 rows; BIGINT score sums are
    * safe to ~10¹² docs (score ≤ 10⁶/row). */
  def calibrationBins(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = TextAnalysis.toks($"text")
    val en = TextAnalysis.hitCount(t, TextAnalysis.StopwordSets.head._2)
    Tables.documents(s, d)
      .select(($"lang" === "en").cast("bigint").as("is_en"),
        (en.cast("bigint") * 1000000L).as("hits6"),
        size(t).cast("bigint").as("n_toks"))
      .select($"is_en", expr("hits6 div n_toks").as("score_ppm"))
      .select($"is_en", $"score_ppm",
        least(lit(9L), expr("score_ppm div 100000")).as("bin"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(sum(score_ppm) div count(*) AS BIGINT)").as("mean_score_ppm"),
        expr("CAST(sum(is_en) * 1000000 div count(*) AS BIGINT)").as("observed_en_ppm"))
  }

  private val BoostRounds = 3
  private val BoostFeatures = Seq("disc", "qty", "tax") // ASC string order = tie order

  /** Gradient-boosted decision STUMPS (Friedman 2001, squared loss,
    * depth-1 trees, unit learning rate, [[BoostRounds]] rounds) fitting
    * price cents from the three domain-bounded lineitem measures — the
    * minimal honest GBM: each round finds the (feature, threshold)
    * split maximizing the SSE reduction S²_L/n_L + S²_R/n_R over the
    * current RESIDUALS, fits left/right constants, and subtracts.
    *
    * Exactness contract: residuals stay exact BIGINT cents end-to-end
    * (leaf constants are sign-safe truncating divisions — the
    * ml_linreg rule); split gains are computed as ONE identical double
    * expression on both engines from exact integer moments (S² rides
    * DECIMAL(38,0)/HUGEINT — ~10³⁷ at 100 TB, inside both; the double
    * rounding of the same exact integer is the same double), with ties
    * broken (feature ASC, threshold ASC). So the full 3-round model
    * REPLAYS bit-for-bit, and the oracle is a GENERATED unrolled
    * DuckDB program of the identical recurrence (the ml_kmeans /
    * ml_pca_power discipline).
    *
    * Scale shape: candidate thresholds are the features' DOMAINS
    * (50+11+9 values — bounded however large the corpus), so each
    * round is one fact-sized map-side-combined (feature-value →
    * n, Σr) aggregate per feature over the checkpointed residual
    * frame; the prefix-sum split search runs on the ≤70-row collected
    * profile on the driver (the kmeans-centroid class of collect).
    * Residual update is a per-row `when` against two broadcast leaf
    * constants. Driver traffic per round: ≤70 rows + one stump. */
  def boostedStumps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    var cur = Tables.lineitem(s, d).select(
      round($"l_discount" * 100).cast("bigint").as("disc"),
      round($"l_quantity" * 100).cast("bigint").as("qty"),
      round($"l_tax" * 100).cast("bigint").as("tax"),
      Exact.cents($"l_extendedprice").as("r"))
      .localCheckpoint() // re-consumed by every round's profile aggs
    val stumps = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long, Long, Long)]
    def truncDiv(a: BigInt, n: BigInt): BigInt =
      if (a < 0) -((-a) / n) else a / n
    for (round <- 1 to BoostRounds) {
      // per-feature residual profiles — domain-bounded rows out
      val profiles = BoostFeatures.map { f =>
        f -> cur.groupBy(col(f).as("v"))
          .agg(count(lit(1)).as("n"), sum($"r".cast(dec)).as("s"))
          .collect()
          .map(x => (x.getLong(0), x.getLong(1), BigInt(x.getDecimal(2).toBigInteger)))
          .sortBy(_._1)
      }
      val nTot = profiles.head._2.map(_._2).sum
      val sTot = profiles.head._2.map(_._3).sum
      // split search on the collected profiles: exact prefix moments,
      // gain as the shared double expression, (gain DESC, f ASC, v ASC)
      val candidates = profiles.flatMap { case (f, prof) =>
        prof.scanLeft(("", 0L, 0L, BigInt(0))) { case ((_, _, nl, sl), (v, n, sv)) =>
          (f, v, nl + n, sl + sv)
        }.drop(1).dropRight(1) // thresholds with non-empty both sides
          .map { case (_, v, nl, sl) =>
            val (nr, sr) = (nTot - nl, sTot - sl)
            val gain = (sl * sl).toDouble / nl + (sr * sr).toDouble / nr
            (f, v, nl, sl, nr, sr, gain)
          }
      }
      val best = candidates.minBy { case (f, v, _, _, _, _, g) => (-g, f, v) }
      val (f, v, nl, sl, nr, sr, _) = best
      val (pl, pr) = (truncDiv(sl, nl).toLong, truncDiv(sr, nr).toLong)
      stumps += ((round.toLong, f, v, nl, pl, pr))
      cur = cur.select($"disc", $"qty", $"tax",
        ($"r" - when(col(f) <= v, pl).otherwise(pr)).as("r"))
        .localCheckpoint()
    }
    stumps.toSeq.toDF("round", "feature", "threshold", "n_left",
      "pred_left_cents", "pred_right_cents")
  }

  /** Generated DuckDB replay of [[boostedStumps]], unrolled per round
    * so rounds/features/loss constants cannot desynchronize. */
  private def oracleBoostedStumps: String = {
    def round(k: Int): String = {
      val prev = s"rr${k - 1}"
      val cands = BoostFeatures.map(f =>
        s"""SELECT '$f' AS f, $f AS v, count(*) AS n,
               CAST(sum(r) AS HUGEINT) AS sv FROM $prev GROUP BY 2""")
        .mkString("\n          UNION ALL ")
      s"""
      cand$k AS ($cands),
      pref$k AS (
        SELECT f, v,
               sum(n) OVER (PARTITION BY f ORDER BY v) AS nl,
               sum(sv) OVER (PARTITION BY f ORDER BY v) AS sl,
               sum(n) OVER (PARTITION BY f) AS nf
        FROM cand$k),
      tot$k AS (SELECT count(*) AS n, CAST(sum(r) AS HUGEINT) AS s FROM $prev),
      best$k AS (
        SELECT f, v, nl, sl, t.n - nl AS nr, t.s - sl AS sr
        FROM pref$k, tot$k t
        WHERE nl > 0 AND t.n - nl > 0
        QUALIFY row_number() OVER (ORDER BY
          CAST(CAST(sl*sl AS DOUBLE)/nl + CAST((t.s-sl)*(t.s-sl) AS DOUBLE)/(t.n-nl)
               AS DOUBLE) DESC, f ASC, v ASC) = 1),
      p$k AS (
        SELECT f, v, nl,
               CASE WHEN sl < 0 THEN -((-sl) // CAST(nl AS HUGEINT))
                    ELSE sl // CAST(nl AS HUGEINT) END AS pl,
               CASE WHEN sr < 0 THEN -((-sr) // CAST(nr AS HUGEINT))
                    ELSE sr // CAST(nr AS HUGEINT) END AS pr
        FROM best$k),
      rr$k AS (
        SELECT disc, qty, tax,
               r - (CASE WHEN (CASE p.f WHEN 'disc' THEN disc
                                        WHEN 'qty' THEN qty
                                        ELSE tax END) <= p.v
                         THEN p.pl ELSE p.pr END) AS r
        FROM $prev, p$k p)"""
    }
    val head = """
      WITH rr0 AS (
        SELECT CAST(round(l_discount * 100) AS BIGINT) AS disc,
               CAST(round(l_quantity * 100) AS BIGINT) AS qty,
               CAST(round(l_tax * 100) AS BIGINT) AS tax,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS r
        FROM lineitem)"""
    val rounds = (1 to BoostRounds).map(round).mkString(",", ",", "")
    val out = (1 to BoostRounds).map(k =>
      s"""SELECT CAST($k AS BIGINT) AS round, f AS feature,
             CAST(v AS BIGINT) AS threshold, CAST(nl AS BIGINT) AS n_left,
             CAST(pl AS BIGINT) AS pred_left_cents,
             CAST(pr AS BIGINT) AS pred_right_cents FROM p$k""")
      .mkString("\n      UNION ALL ")
    head + rounds + "\n      " + out
  }

  /** Depth-2 CART classification tree (Breiman et al. 1984) over the
    * three domain-bounded lineitem measures — the single-tree sibling
    * of [[boostedStumps]]'s regression ensemble: a root split and two
    * child splits chosen by exact GINI impurity reduction, four leaves
    * with majority-class predictions.
    *
    * The label is PLANTED (the staged-fixture discipline — the fixture's
    * columns are mutually independent, so no honest learnable target
    * exists in the raw data): y = qty_cents + orderkey-keyed zero-mean
    * noise (±1200) > 2550 — quantity carries the signal, disc/tax are
    * distractors, and the noise band makes the boundary leaves impure.
    * The tree must RECOVER the planted boundary: root and both child
    * splits land on qty, boundary leaves are impure, outer leaves are
    * near-pure, and the leaf predictions differ (0,0,1,1) —
    * all law-checked, and the oracle replays the staging verbatim.
    *
    * Exactness contract (the boostedStumps discipline applied to
    * classification): per-node split gain is equivalent to maximizing
    * Σ_child (p_c² + (n_c − p_c)²) / n_c over exact integer class
    * moments (p = positives; minimizing weighted Gini drops the
    * constant Σ n_c), computed as ONE identical double expression on
    * both engines from exact integers (squares ride BigInt/HUGEINT —
    * p² wraps BIGINT past ~3·10⁹ positives, the evalAuc magnitude),
    * ties broken (feature ASC, threshold ASC); leaf predictions are
    * pure integer majority votes (2·pos > n, tie → 0). The whole tree
    * REPLAYS bit-for-bit and the oracle is a GENERATED unrolled DuckDB
    * program: root search, child datasets conditioned through the
    * chosen split via CASE-on-feature, child searches, leaf aggregates.
    *
    * Scale shape: candidate thresholds are the bounded feature DOMAINS
    * (≤70 profile rows per node however large the corpus), so the tree
    * costs THREE fact-sized map-side-combined (value → n, pos)
    * aggregates — root, left child, right child — each a conditioned
    * scan of the same checkpointed frame; the split search itself runs
    * on collected ≤70-row profiles (the kmeans-centroid class of
    * driver traffic) and LEAF stats fall out of the child profiles'
    * prefix sums, no fourth pass. Degenerate unsplittable nodes
    * REQUIRE-fail loudly (fixture contract: 50/11/9-value domains
    * always split at depth ≤ 2) rather than silently diverging from
    * the oracle. */
  def decisionTree(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.lineitem(s, d).select(
      round($"l_discount" * 100).cast("bigint").as("disc"),
      round($"l_quantity" * 100).cast("bigint").as("qty"),
      round($"l_tax" * 100).cast("bigint").as("tax"),
      (round($"l_quantity" * 100).cast("bigint")
        + $"l_orderkey".cast("bigint") * 7919L % 2400L - 1200L > 2550L)
        .cast("bigint").as("y"))
      .localCheckpoint() // re-scanned by the three node profiles
    // collected per-feature class profile → best (f, v, nl, pl, nr, pr)
    def splitSearch(df: DataFrame): (String, Long, Long, BigInt, Long, BigInt) = {
      val profiles = BoostFeatures.map { f =>
        f -> df.groupBy(col(f).as("v"))
          .agg(count(lit(1)).as("n"), sum($"y").as("p"))
          .collect()
          .map(x => (x.getLong(0), x.getLong(1), BigInt(x.getLong(2))))
          .sortBy(_._1)
      }
      val nTot = profiles.head._2.map(_._2).sum
      val pTot = profiles.head._2.map(_._3).sum
      val candidates = profiles.flatMap { case (f, prof) =>
        prof.scanLeft(("", 0L, 0L, BigInt(0))) { case ((_, _, nl, pl), (v, n, pv)) =>
          (f, v, nl + n, pl + pv)
        }.drop(1).dropRight(1)
          .map { case (_, v, nl, pl) =>
            val (nr, pr) = (nTot - nl, pTot - pl)
            val (ql, qr) = (BigInt(nl) - pl, BigInt(nr) - pr)
            val score = (pl * pl + ql * ql).toDouble / nl +
              (pr * pr + qr * qr).toDouble / nr
            (f, v, nl, pl, nr, pr, score)
          }
      }
      require(candidates.nonEmpty, "degenerate node: no splittable feature")
      val (f, v, nl, pl, nr, pr, _) =
        candidates.minBy { case (f, v, _, _, _, _, g) => (-g, f, v) }
      (f, v, nl, pl, nr, pr)
    }
    val (rf, rv, rnl, rpl, rnr, rpr) = splitSearch(base)
    val left = base.where(col(rf) <= rv).localCheckpoint()
    val right = base.where(col(rf) > rv).localCheckpoint()
    val (lf, lv, lnl, lpl, _, _) = splitSearch(left)
    val (rf2, rv2, rnl2, rpl2, _, _) = splitSearch(right)
    def leaf(path: String, cf: String, cv: Long, n: Long, p: BigInt) =
      (path, rf, rv, cf, cv, n, p.toLong,
        if (BigInt(2) * p > BigInt(n)) 1L else 0L)
    Seq(
      leaf("LL", lf, lv, lnl, lpl),
      leaf("LR", lf, lv, rnl - lnl, rpl - lpl),
      leaf("RL", rf2, rv2, rnl2, rpl2),
      leaf("RR", rf2, rv2, rnr - rnl2, rpr - rpl2)
    ).toDF("path", "root_feature", "root_threshold", "feature",
      "threshold", "n", "n_pos", "pred")
  }

  /** Generated DuckDB replay of [[decisionTree]]: one
    * cand/pref/tot/best CTE quartet per node (root, then each child
    * conditioned through the chosen root split via CASE-on-feature),
    * leaves re-aggregated from the child datasets — an independent
    * derivation of the stats the engine reads off its prefix sums. */
  private def oracleDecisionTree: String = {
    def featCase(alias: String): String =
      s"(CASE $alias.f WHEN 'disc' THEN disc WHEN 'qty' THEN qty ELSE tax END)"
    def search(node: String, from: String): String = {
      val cands = BoostFeatures.map(f =>
        s"""SELECT '$f' AS f, $f AS v, count(*) AS n,
               CAST(sum(y) AS HUGEINT) AS p FROM $from GROUP BY 2""")
        .mkString("\n          UNION ALL ")
      s"""
      cand$node AS ($cands),
      pref$node AS (
        SELECT f, v,
               sum(n) OVER (PARTITION BY f ORDER BY v) AS nl,
               sum(p) OVER (PARTITION BY f ORDER BY v) AS pl
        FROM cand$node),
      tot$node AS (SELECT count(*) AS n, CAST(sum(y) AS HUGEINT) AS p FROM $from),
      best$node AS (
        SELECT f, v, nl, pl, t.n - nl AS nr, t.p - pl AS pr
        FROM pref$node, tot$node t
        WHERE nl > 0 AND t.n - nl > 0
        QUALIFY row_number() OVER (ORDER BY
          CAST(CAST(pl AS HUGEINT)*pl + CAST(nl-pl AS HUGEINT)*(nl-pl) AS DOUBLE)/nl
          + CAST(CAST(t.p-pl AS HUGEINT)*(t.p-pl)
                 + CAST(t.n-nl-(t.p-pl) AS HUGEINT)*(t.n-nl-(t.p-pl)) AS DOUBLE)
            /(t.n-nl) DESC, f ASC, v ASC) = 1)"""
    }
    def leafOut(path: String, from: String, node: String, cmp: String): String =
      s"""SELECT '$path' AS path,
             (SELECT f FROM bestT) AS root_feature,
             (SELECT CAST(v AS BIGINT) FROM bestT) AS root_threshold,
             b.f AS feature, CAST(b.v AS BIGINT) AS threshold,
             count(*) AS n, CAST(sum(d.y) AS BIGINT) AS n_pos,
             CAST(CASE WHEN 2 * sum(d.y) > count(*) THEN 1 ELSE 0 END AS BIGINT) AS pred
      FROM $from d, best$node b
      WHERE ${featCase("b")} $cmp b.v
      GROUP BY b.f, b.v"""
    s"""
      WITH d0 AS (
        SELECT CAST(round(l_discount * 100) AS BIGINT) AS disc,
               CAST(round(l_quantity * 100) AS BIGINT) AS qty,
               CAST(round(l_tax * 100) AS BIGINT) AS tax,
               CAST(CAST(round(l_quantity * 100) AS BIGINT)
                    + CAST(l_orderkey AS BIGINT) * 7919 % 2400 - 1200 > 2550
                 AS BIGINT) AS y
        FROM lineitem),
      ${search("T", "d0")},
      dL AS (SELECT d0.* FROM d0, bestT b WHERE ${featCase("b")} <= b.v),
      dR AS (SELECT d0.* FROM d0, bestT b WHERE ${featCase("b")} > b.v),
      ${search("L", "dL")},
      ${search("R", "dR")}
      ${leafOut("LL", "dL", "L", "<=")}
      UNION ALL ${leafOut("LR", "dL", "L", ">")}
      UNION ALL ${leafOut("RL", "dR", "R", "<=")}
      UNION ALL ${leafOut("RR", "dR", "R", ">")}"""
  }

  val oracle: Map[String, String] = Map(
    "ml_boosted_stumps" -> oracleBoostedStumps,
    "ml_decision_tree" -> oracleDecisionTree,

    "ml_calibration_bins" -> """
      WITH t AS (
        SELECT CAST(lang = 'en' AS BIGINT) AS is_en,
               string_split(lower(text), ' ') AS toks
        FROM documents),
      sc AS (
        SELECT is_en,
               len(list_filter(toks, x -> list_contains(
                 ['the','a','of','and','to','in','is','that','for','it'], x)))
                 * 1000000 // len(toks) AS score_ppm
        FROM t),
      b AS (SELECT is_en, score_ppm,
                   least(9, score_ppm // 100000) AS bin FROM sc)
      SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
             CAST(sum(score_ppm) // count(*) AS BIGINT) AS mean_score_ppm,
             CAST(sum(is_en) * 1000000 // count(*) AS BIGINT) AS observed_en_ppm
      FROM b GROUP BY 1""",

    // INDEPENDENT formulation: DuckDB's native SQL-standard ordered-set
    // aggregate — the engine's ceil(p·n) rank pick must equal it
    "agg_percentile_exact" -> """
      WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
                 FROM lineitem)
      SELECT CAST(25 AS BIGINT) AS pct,
             CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS pct_cents FROM v
      UNION ALL SELECT 50, CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY cents) AS BIGINT) FROM v
      UNION ALL SELECT 75, CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents) AS BIGINT) FROM v
      UNION ALL SELECT 90, CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY cents) AS BIGINT) FROM v
      UNION ALL SELECT 99, CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY cents) AS BIGINT) FROM v""",

    // INDEPENDENT formulation: per-row rank() windows (r_lo, and r_hi
    // via the per-score partition count) instead of the engine's
    // profile fold — the midrank algebra is what the hash-compare checks
    "ml_eval_auc" -> s"""
      WITH sc AS (
        SELECT doc_id,
               len(list_filter(string_split(lower(text), ' '),
                   t -> list_contains(${stopListSql("en")}, t))) AS score,
               CAST(lang = 'en' AS BIGINT) AS pos
        FROM documents),
      r AS (
        SELECT score, pos,
               rank() OVER (ORDER BY score) AS r_lo,
               rank() OVER (ORDER BY score)
                 + count(*) OVER (PARTITION BY score) - 1 AS r_hi
        FROM sc),
      agg AS (
        SELECT CAST(sum(CASE WHEN pos = 1 THEN r_lo + r_hi ELSE 0 END) AS HUGEINT) AS mid2,
               CAST(sum(pos) AS BIGINT) AS np,
               CAST(count(*) - sum(pos) AS BIGINT) AS nn
        FROM r)
      SELECT np AS n_pos, nn AS n_neg,
             CASE WHEN np = 0 OR nn = 0 THEN NULL
                  ELSE CAST((mid2 - np * (np + 1)) * 1000000
                            // (2 * np * nn) AS BIGINT) END AS auc_ppm
      FROM agg""",
    "ml_eval_confusion" -> s"""
      WITH pr AS (
        SELECT truth,
               CASE WHEN c_en = best AND best > 0 THEN 'en'
                    WHEN c_de = best AND best > 0 THEN 'de'
                    WHEN c_es = best AND best > 0 THEN 'es'
                    WHEN c_fr = best AND best > 0 THEN 'fr'
                    WHEN c_zh = best AND best > 0 THEN 'zh'
                    ELSE 'und' END AS pred
        FROM (SELECT truth, c_en, c_de, c_es, c_fr, c_zh,
                     greatest(c_en, c_de, c_es, c_fr, c_zh) AS best
              FROM (SELECT lang AS truth,
                           ${hitsSql("en")} AS c_en, ${hitsSql("de")} AS c_de,
                           ${hitsSql("es")} AS c_es, ${hitsSql("fr")} AS c_fr,
                           ${hitsSql("zh")} AS c_zh
                    FROM (SELECT lang, string_split(lower(text), ' ') AS toks
                          FROM documents) t) s) b),
      conf AS (SELECT truth, pred, count(*) AS n FROM pr GROUP BY 1, 2),
      classes AS (SELECT truth AS c FROM conf UNION SELECT pred FROM conf),
      m AS (SELECT c,
              CAST((SELECT coalesce(sum(n), 0) FROM conf WHERE truth = c) AS BIGINT) AS n_truth,
              CAST((SELECT coalesce(sum(n), 0) FROM conf WHERE pred = c) AS BIGINT) AS n_pred,
              CAST((SELECT coalesce(sum(n), 0) FROM conf
                    WHERE truth = c AND pred = c) AS BIGINT) AS tp
            FROM classes)
      SELECT c AS class, n_truth, n_pred, tp,
        CASE WHEN n_pred = 0 THEN NULL
             ELSE CAST(tp * 1000000 // n_pred AS BIGINT) END AS precision_ppm,
        CASE WHEN n_truth = 0 THEN NULL
             ELSE CAST(tp * 1000000 // n_truth AS BIGINT) END AS recall_ppm,
        CASE WHEN n_truth + n_pred = 0 THEN NULL
             ELSE CAST(2 * tp * 1000000 // (n_truth + n_pred) AS BIGINT) END AS f1_ppm
      FROM m
      UNION ALL
      SELECT '__all__',
        CAST((SELECT sum(n) FROM conf) AS BIGINT),
        CAST((SELECT sum(n) FROM conf) AS BIGINT),
        CAST((SELECT coalesce(sum(n), 0) FROM conf WHERE truth = pred) AS BIGINT),
        CAST((SELECT coalesce(sum(n), 0) FROM conf WHERE truth = pred) * 1000000
             // (SELECT sum(n) FROM conf) AS BIGINT),
        CAST((SELECT coalesce(sum(n), 0) FROM conf WHERE truth = pred) * 1000000
             // (SELECT sum(n) FROM conf) AS BIGINT),
        CAST((SELECT coalesce(sum(n), 0) FROM conf WHERE truth = pred) * 1000000
             // (SELECT sum(n) FROM conf) AS BIGINT)""",

    "ml_linreg" -> """
      WITH m AS (
        SELECT o_orderpriority,
               count(*) AS n,
               sum(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))) AS sx,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sy,
               sum(CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                   * CAST(round(o_totalprice * 100) AS BIGINT)) AS sxy,
               sum(CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                   * datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))) AS sxx
        FROM orders GROUP BY 1)
      SELECT o_orderpriority, n,
             CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
             CAST(CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                  ELSE CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END
                       * (abs(n * sxy - sx * sy) * 1000000
                          // (n * sxx - sx * sx)) END AS BIGINT)
               AS slope_ppm_per_day
      FROM m""",

    "ml_feature_bins" -> """
      WITH v AS (
        SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               l_orderkey, l_linenumber
        FROM lineitem),
      b AS (SELECT min(cents) AS lo, max(cents) AS hi FROM v),
      width AS (
        SELECT 'width' AS method,
               CAST((cents - lo) * 10 // (hi - lo + 1) AS BIGINT) AS bin,
               cents
        FROM v CROSS JOIN b),
      depth AS (
        SELECT 'depth' AS method,
               CAST(ntile(10) OVER (ORDER BY cents, l_orderkey, l_linenumber)
                    AS BIGINT) - 1 AS bin,
               cents
        FROM v)
      SELECT method, bin, count(*) AS n,
             min(cents) AS min_cents, max(cents) AS max_cents
      FROM (SELECT * FROM width UNION ALL SELECT * FROM depth)
      GROUP BY 1, 2""")
}
