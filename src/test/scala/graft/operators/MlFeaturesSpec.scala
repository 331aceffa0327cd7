package graft.operators

import graft.SparkSpec

/** Internal-consistency laws for the ml feature primitives — the oracle
  * gate proves cross-engine agreement on the fixture; these pin what the
  * DEFINITIONS guarantee on ANY input (planted slopes, bin-size
  * invariants), so a fixture regeneration that happens to hash-match a
  * subtly wrong formulation still gets caught.
  */
class MlFeaturesSpec extends SparkSpec {

  test("ml_linreg recovers a planted integer slope exactly and NULLs a zero-variance x") {
    import spark.implicits._
    // staged orders fixture: priority A is exactly linear with slope 3
    // cents/day (ppm must be exactly 3_000_000 — OLS through exact
    // points IS the line); B has slope -2 (sign-safe magnitude path);
    // C puts every order on one day (den = 0 → NULL slope)
    val tmp = java.nio.file.Files.createTempDirectory("graft_linreg_law").toString
    val base = graft.core.Utc.ts("1992-01-01 00:00:00")
    def day(i: Int) = graft.core.Utc.ts(s"1992-01-${"%02d".format(i + 1)} 00:00:00")
    val rows =
      (0 until 10).map(i => (i.toLong, 0L, "O", (100.00 + 0.03 * i), day(i), "A")) ++
      (0 until 10).map(i => (100L + i, 0L, "O", (500.00 - 0.02 * i), day(i), "B")) ++
      (0 until 5).map(i => (200L + i, 0L, "O", (50.00 + i), base, "C"))
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = MlFeatures.mlLinreg(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("A").getLong(4) == 3000000L, out("A").toString)
    assert(out("B").getLong(4) == -2000000L, out("B").toString)
    assert(out("C").isNullAt(4), out("C").toString)
    // the emitted moments are the plain sums they claim to be
    assert(out("A").getLong(1) == 10L && out("A").getLong(2) == (0 until 10).sum.toLong)
    assert(out("A").getLong(3) == (0 until 10).map(i => 10000L + 3 * i).sum)
  }

  test("ml_feature_bins: both flavors cover the corpus, depth sizes differ by ≤1, values are bin-monotone") {
    val rows = graft.SparkEntry.queries("ml_feature_bins")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = graft.core.Tables.lineitem(spark, sf).count()
    for (m <- Seq("width", "depth")) {
      val bins = rows.filter(_._1 == m).sortBy(_._2)
      assert(bins.map(_._2).forall(b => b >= 0 && b <= 9), bins.mkString(","))
      assert(bins.map(_._3).sum == total, s"$m bins must cover every row")
      // bin value ranges are internally sane and monotone across bins
      bins.foreach { case (_, _, n, lo, hi) => assert(n > 0 && lo <= hi) }
      bins.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4,
          s"$m bins overlap: ${a._2} max=${a._5} vs ${b._2} min=${b._4}")
        case _ => ()
      }
    }
    // equi-depth: SQL ntile's exact size law — first n % k tiles get
    // one extra row, the rest n div k
    val depth = rows.filter(_._1 == "depth").sortBy(_._2)
    assert(depth.length == 10)
    val (q, r) = (total / 10, total % 10)
    depth.foreach { case (_, b, n, _, _) =>
      assert(n == (if (b < r) q + 1 else q), s"depth bin $b size $n (n=$total)")
    }
  }

  test("ml_eval_confusion: counts conserve, tp bounds hold, and preds agree with text_langid") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("ml_eval_confusion")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(6)) None else Some(r.getLong(6)))).toMap
    val (allT, allP, allTp, allF1) = rows("__all__")
    val per = rows - "__all__"
    // conservation: per-class truth, pred, and tp columns each sum to
    // the micro row's totals
    assert(per.values.map(_._1).sum == allT)
    assert(per.values.map(_._2).sum == allP && allP == allT)
    assert(per.values.map(_._3).sum == allTp)
    assert(allF1.contains(allTp * 1000000L / allT), "micro F1 must be accuracy")
    per.foreach { case (c, (nt, np, tp, _)) =>
      assert(tp <= math.min(nt, np), s"$c: tp=$tp nt=$nt np=$np")
    }
    // cross-operator consistency: n_pred per class equals the declared
    // text_langid query's prediction distribution
    val langid = graft.SparkEntry.queries("text_langid")(spark, sf)
      .groupBy(col("lang_pred")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    per.foreach { case (c, (_, np, _, _)) =>
      assert(np == langid.getOrElse(c, 0L), s"$c: n_pred=$np langid=${langid.get(c)}")
    }
  }

  test("ml_eval_auc replays the brute-force pairwise definition and nails planted separations") {
    // fixture run: the midrank fold must equal the Mann–Whitney
    // pairwise count (wins + half-ties) computed driver-side
    val Array(row) = graft.SparkEntry.queries("ml_eval_auc")(spark, sf).collect()
    val (np, nn, auc) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val stop = graft.operators.TextAnalysis.StopwordSets.head._2.toSet
    val sc = graft.core.Tables.documents(spark, sf)
      .select("text", "lang").collect()
      .map(r => (r.getString(0).toLowerCase.split(" ", -1).count(stop), r.getString(1) == "en"))
    val pos = sc.filter(_._2).map(_._1)
    val neg = sc.filterNot(_._2).map(_._1)
    assert(np == pos.length.toLong && nn == neg.length.toLong)
    val wins2 = pos.map(p => 2L * neg.count(_ < p) + neg.count(_ == p)).sum
    assert(auc == wins2 * 1000000L / (2L * np * nn),
      s"fold AUC $auc != pairwise ${wins2 * 1000000L / (2L * np * nn)}")
    // planted extremes on a staged corpus: perfect separation → 10⁶,
    // inverted → 0, all-tied scores → exactly 500000
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_auc_law").toString
    def stage(rows: Seq[(Long, String, String)]): Long = {
      rows.toDF("doc_id", "text", "lang")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      MlFeatures.evalAuc(spark, tmp).collect()(0).getLong(2)
    }
    val en = "the of and"  // 3 stopword hits
    val de = "wort nicht hier klar" // 0 'en' stopword hits
    assert(stage(Seq((1L, en, "en"), (2L, en, "en"), (3L, de, "de"))) == 1000000L)
    assert(stage(Seq((1L, de, "en"), (2L, en, "de"))) == 0L)
    assert(stage(Seq((1L, en, "en"), (2L, en, "de"), (3L, en, "de"))) == 500000L)
  }

  test("agg_percentile_exact replays the ceil(p·n) sorted pick and satisfies the cume_dist spec") {
    val got = graft.SparkEntry.queries("agg_percentile_exact")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val vals = graft.core.Tables.lineitem(spark, sf)
      .select(graft.core.Exact.cents(org.apache.spark.sql.functions.col("l_extendedprice")))
      .collect().map(_.getLong(0)).sorted
    val n = vals.length.toLong
    assert(got.map(_._1).toSeq == Seq(25L, 50L, 75L, 90L, 99L))
    got.foreach { case (p, c) =>
      val k = (p * n + 99) / 100
      assert(c == vals((k - 1).toInt), s"p$p: $c != sorted[${k - 1}]")
      // SQL-standard spec: smallest value whose cume_dist >= p
      assert(vals.count(_ <= c) >= k && vals.count(_ < c) < k, s"p$p cume_dist spec")
    }
    assert(got.map(_._2).sliding(2).forall(w => w(0) <= w(1)), "percentiles must be monotone")
  }

  test("ml_decision_tree recovers the planted qty boundary and improves purity") {
    import org.apache.spark.sql.functions._
    val rows = MlFeatures.decisionTree(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(rows.keySet == Set("LL", "LR", "RL", "RR"))
    // planted recovery: the signal feature wins every split, and the
    // root threshold sits inside the noise band around the planted cut
    rows.values.foreach { case (rf, rv, cf, _, _, _, _) =>
      assert(rf == "qty" && cf == "qty")
      assert(math.abs(rv - 2550L) <= 1200L, s"root threshold $rv outside the noise band")
    }
    // majority predictions split exactly at the boundary: below-left
    // leaves say 0, above-right leaves say 1 (and match the 2p>n rule)
    assert(Seq("LL", "LR", "RL", "RR").map(rows(_)._7) == Seq(0L, 0L, 1L, 1L))
    rows.values.foreach { case (_, _, _, _, n, p, pred) =>
      assert(pred == (if (2 * p > n) 1L else 0L))
    }
    // the four leaves PARTITION the corpus: counts and positives conserve
    val base = graft.core.Tables.lineitem(spark, sf).select(
      (round(col("l_quantity") * 100).cast("bigint")
        + col("l_orderkey").cast("bigint") * 7919L % 2400L - 1200L > 2550L)
        .cast("bigint").as("y"))
      .agg(count(lit(1)), sum(col("y"))).head()
    assert(rows.values.map(_._5).sum == base.getLong(0))
    assert(rows.values.map(_._6).sum == base.getLong(1))
    // splitting helped: weighted leaf Gini strictly below the root's
    def gini(n: Long, p: Long): Double = {
      val (pd, nd) = (p.toDouble / n, n.toDouble)
      2 * pd * (1 - pd) * nd
    }
    val leafG = rows.values.map { case (_, _, _, _, n, p, _) => gini(n, p) }.sum
    val rootG = gini(base.getLong(0), base.getLong(1))
    assert(leafG < rootG, s"leaf Gini $leafG must beat root $rootG")
  }
}
