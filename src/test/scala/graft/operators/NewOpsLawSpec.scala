package graft.operators

import graft.SparkSpec

/** Internal-consistency laws for the round-10 breadth operators — the
  * oracle gate proves cross-engine agreement on the fixture; these pin
  * properties the DEFINITIONS guarantee on ANY input, so a fixture
  * regeneration that happens to hash-match a subtly wrong formulation
  * still gets caught (the AnalyticsSpec discipline).
  */
class NewOpsLawSpec extends SparkSpec {

  test("events_survival: S is antitone, risk sets shrink, counts conserve") {
    val rows = graft.SparkEntry.queries("events_survival")(spark, sf)
      .orderBy("duration_days").collect()
    assert(rows.nonEmpty)
    // survival starts at most at 1.0 and never increases
    assert(rows.head.getLong(3) <= 1000000L)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(3) <= a.getLong(3), "S(t) must be non-increasing")
        assert(b.getLong(1) <= a.getLong(1) - a.getLong(2),
          "risk set must shrink by at least the converted at each step")
      case _ => ()
    }
    // every step's conversions fit inside its risk set
    rows.foreach(r => assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1)))
    // replay the ppm recurrence from the emitted (n_risk, n_converted)
    var s = 1000000L
    rows.foreach { r =>
      s = s * (r.getLong(1) - r.getLong(2)) / r.getLong(1)
      assert(r.getLong(3) == s, s"surv_ppm drifted at t=${r.getLong(0)}")
    }
  }

  test("ts_holt: fitted is the one-step forecast and the recurrence replays") {
    val rows = graft.SparkEntry.queries("ts_holt")(spark, sf)
      .orderBy("day").collect()
    assert(rows.length >= 3)
    // first row: level = obs, trend = 0, fitted = obs
    assert(rows.head.getLong(2) == rows.head.getLong(1))
    assert(rows.head.getLong(3) == 0L)
    rows.sliding(2).foreach {
      case Array(p, c) =>
        assert(c.getLong(4) == p.getLong(2) + p.getLong(3),
          "fitted(t) must equal level(t-1) + trend(t-1)")
      case _ => ()
    }
  }

  test("ts_stl_lite: floor-mean seasonal leaves per-weekday residual remainders in [0, n)") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("ts_stl_lite")(spark, sf)
    // obs = trend + seasonal + residual by construction; the LAW is that
    // per ISO weekday the residuals sum to the floor-division remainder:
    // 0 <= sum(resid) < n (truncating div of the non-negative... the
    // detrended sum may be negative, so the remainder matches Spark's
    // TRUNCATING div: sum(resid) = sum(detrended) - n*(sum(detrended) div n))
    val bad = out
      .groupBy((weekday(col("day")) + 1).as("dow"))
      .agg(sum(col("resid_cents")).as("r"), count(lit(1)).as("n"),
        sum(col("obs_cents") - col("trend_cents")).as("det"))
      .collect()
      .filter { row =>
        val (r, n, det) = (row.getLong(1), row.getLong(2), row.getLong(3))
        r != det - n * (det / n) // Scala / on Long truncates like Spark div
      }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("events_lift: margins bound the joint and the pair grid is complete") {
    val rows = graft.SparkEntry.queries("events_lift")(spark, sf).collect()
    val types = rows.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct
    assert(rows.length == types.length * (types.length - 1) / 2,
      "one row per unordered type pair")
    rows.foreach { r =>
      val (na, nb, both, nud) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(both <= math.min(na, nb) && math.max(na, nb) <= nud)
      assert(r.getString(0) < r.getString(1), "canonical a < b orientation")
    }
  }

  test("join_asof_tolerance: the flag and the nullable match agree; inner asof is a sub-result") {
    import org.apache.spark.sql.functions._
    val tol = graft.SparkEntry.queries("join_asof_tolerance")(spark, sf)
    assert(tol.where(
      (col("within_tol") === 1 && col("signup_id").isNull) ||
        (col("within_tol") === 0 && col("signup_id").isNotNull)).isEmpty)
    // every tolerance-match must be join_asof's match for that click
    // (tolerance only NULLs matches, never changes them)
    val strict = graft.SparkEntry.queries("join_asof")(spark, sf)
      .select(col("click_id"), col("signup_id").as("strict_signup"))
    assert(tol.where(col("within_tol") === 1).join(strict, "click_id")
      .where(col("signup_id") =!= col("strict_signup")).isEmpty)
  }

  test("curate_dup_weights: each group's total weight is ~one document (floor loss < group size)") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("curate_dup_weights")(spark, sf)
    val bad = out.groupBy(col("dedup_group"))
      .agg(sum(col("weight_ppm")).as("w"), max(col("group_size")).as("n"),
        count(lit(1)).as("members"))
      .where(col("members") =!= col("n") ||
        col("w") > 1000000L || col("w") <= lit(1000000L) - col("n"))
      .collect()
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("events_active_users: tiers nest and every row replays against a brute-force set union") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("events_active_users")(spark, sf)
      .orderBy("day").collect()
    assert(out.nonEmpty)
    // dau ⊆ wau ⊆ mau and the stickiness quotient replays
    out.foreach { r =>
      val (dau, wau, mau) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dau >= 1 && dau <= wau && wau <= mau, r.toString)
      assert(r.getLong(4) == dau * 1000000L / mau, r.toString)
    }
    // brute-force replay from the raw distinct (user, day) pairs —
    // independent of the engine's min-offset tier algebra
    val ud = graft.core.Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val byDay = ud.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { r =>
      val d = r.getDate(0).toLocalDate
      def active(k: Int) =
        (0 until k).flatMap(i => byDay.getOrElse(d.minusDays(i.toLong), Set.empty)).toSet.size
      assert(r.getLong(1) == active(1).toLong, s"dau mismatch at $d")
      assert(r.getLong(2) == active(7).toLong, s"wau mismatch at $d")
      assert(r.getLong(3) == active(28).toLong, s"mau mismatch at $d")
    }
    // every active day appears exactly once
    assert(out.map(_.getDate(0)).distinct.length == out.length)
    assert(out.length == byDay.size, "one row per ACTIVE day")
  }

  test("text_rake: the top-20 replays against an independent driver-side RAKE") {
    // full independent reimplementation (island split, deg/freq ppm
    // scores, phrase-sum, total-order top-20) over the raw corpus —
    // instance-score uniformity is implicit: the replay scores phrase
    // TEXT once while the engine min-aggregates per-instance scores,
    // so any instance divergence would break the comparison
    val stop = TextAnalysis.StopwordSets.head._2.toSet
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase)
    val phrases = docs.flatMap { case (_, txt) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val run = scala.collection.mutable.ArrayBuffer.empty[String]
      def flush(): Unit = {
        if (run.nonEmpty && run.length <= TextAnalysis.RakeMaxWords)
          out += run.mkString(" ")
        run.clear()
      }
      txt.split(" ", -1).foreach(t => if (stop(t)) flush() else run += t)
      flush(); out
    }
    val deg = scala.collection.mutable.Map.empty[String, Long]
    val freq = scala.collection.mutable.Map.empty[String, Long]
    phrases.foreach { p =>
      val ws = p.split(" "); ws.foreach { t =>
        deg(t) = deg.getOrElse(t, 0L) + ws.length
        freq(t) = freq.getOrElse(t, 0L) + 1L
      }
    }
    def wscore(t: String) = deg(t) * 1000000L / freq(t)
    val expected = phrases.groupBy(identity).view
      .map { case (p, in) => (p, in.length.toLong, p.split(" ").map(wscore).sum) }
      .toSeq
      .sortBy { case (p, _, sc) => (-sc, p) }.take(20)
    val got = graft.SparkEntry.queries("text_rake")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected,
      s"engine:\n${got.mkString("\n")}\nreplay:\n${expected.mkString("\n")}")
  }

  test("join_asof_forward replays the brute-force next-touch definition") {
    import org.apache.spark.sql.functions._
    val ev = graft.core.Tables.events(spark, sf)
      .where(col("event_type").isin("click", "purchase"))
      .select("user_id", "ts", "event_type", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getString(2), r.getLong(3)))
    // dedup to max event_id per (user, ts, type) — the declared tie rule
    def dedup(t: String) = ev.filter(_._3 == t)
      .groupBy(e => (e._1, e._2)).view.mapValues(_.map(_._4).max).toMap
    val clicks = dedup("click"); val purchases = dedup("purchase")
    val expected = clicks.flatMap { case ((u, ts), cid) =>
      val later = purchases.keys.filter(k => k._1 == u && k._2 >= ts)
      if (later.isEmpty) None
      else { val k = later.minBy(_._2); Some((u, cid, purchases(k))) }
    }.toSet
    val got = graft.SparkEntry.queries("join_asof_forward")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"engine=${got.size} replay=${expected.size}; diff=${(got diff expected) ++ (expected diff got)}")
  }

  test("graph_wcc: components are closed over the 1-NN edges and labeled by their min") {
    import org.apache.spark.sql.functions._
    val comp = graft.SparkEntry.queries("graph_wcc")(spark, sf)
    val edges = SimSearch.knnGraphShared(spark, sf, k = 1)
      .select(col("q_id").as("a"), col("n_id").as("b"))
    // endpoints of every edge share a component
    val ca = comp.select(col("vec_id").as("a"), col("component").as("comp_a"))
    val cb = comp.select(col("vec_id").as("b"), col("component").as("comp_b"))
    assert(edges.join(ca, "a").join(cb, "b")
      .where(col("comp_a") =!= col("comp_b")).isEmpty,
      "an edge crosses two components")
    // the label is a member of its own component (hence its minimum,
    // since labels only ever decrease to the component min)
    assert(comp.groupBy(col("component")).agg(min(col("vec_id")).as("mn"))
      .where(col("component") =!= col("mn")).isEmpty)
  }

  test("ts_anomaly_mad: med/MAD replay as lower medians and the flag rule replays") {
    val rows = graft.SparkEntry.queries("ts_anomaly_mad")(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)
    rows.groupBy(_._1).foreach { case (tpe, grp) =>
      val med = lowerMedian(grp.map(_._3).toSeq)
      val mad = lowerMedian(grp.map(g => math.abs(g._3 - med)).toSeq)
      grp.foreach { g =>
        assert(g._4 == med, s"$tpe med drifted: ${g._4} vs replay $med")
        assert(g._5 == mad, s"$tpe mad drifted: ${g._5} vs replay $mad")
        val adev = math.abs(g._3 - med)
        val want = if (mad == 0) adev > 0 else 6745L * adev > 15000L * mad
        assert(g._6 == (if (want) 1L else 0L), s"$tpe flag rule drifted at ${g._2}")
      }
    }
    // both flag values must be exercised at the gate SF, else the
    // threshold is untestable (the curate_k_anonymity discipline)
    assert(rows.exists(_._6 == 1L) && rows.exists(_._6 == 0L))
  }

  test("agg_corr_matrix: corrs replay from raw cents via exact BigInt moments") {
    val got = graft.SparkEntry.queries("agg_corr_matrix")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got.size == 18) // 3 flags x 6 pairs
    val base = graft.core.Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag",
        "CAST(round(l_quantity * 100) AS BIGINT)",
        "CAST(round(l_extendedprice * 100) AS BIGINT)",
        "CAST(round(l_discount * 100) AS BIGINT)",
        "CAST(round(l_tax * 100) AS BIGINT)")
      .collect().map(r => (r.getString(0),
        Map("quantity" -> r.getLong(1), "price" -> r.getLong(2),
            "discount" -> r.getLong(3), "tax" -> r.getLong(4))))
    got.foreach { case ((flag, cx, cy), (n, corr)) =>
      val grp = base.filter(_._1 == flag).map(_._2)
      assert(n == grp.length.toLong)
      val xs = grp.map(m => BigInt(m(cx))); val ys = grp.map(m => BigInt(m(cy)))
      val bn = BigInt(grp.length)
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val vx = bn * xs.map(a => a * a).sum - sx * sx
      val vy = bn * ys.map(a => a * a).sum - sy * sy
      if (vx == 0 || vy == 0) assert(corr.isEmpty, s"$flag/$cx/$cy must be NULL")
      else {
        val want = (bn * sxy - sx * sy).toDouble /
          (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble))
        assert(corr.isDefined && math.abs(corr.get - want) < 1e-12,
          s"$flag/$cx/$cy: ${corr} vs replay $want")
      }
    }
  }

  test("join_bloom: bloom reduction is invisible (≡ plain join) yet actually prunes") {
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("join_bloom")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val dim = graft.core.Tables.supplier(spark, sf)
      .where(col("s_nationkey").isin(3, 9)).select(col("s_suppkey"), col("s_name"))
    val plain = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("rev_cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == plain, "bloom semi-join reduction changed the join result")
    // the filter must actually prune: dim covers ≤ a few suppliers of the
    // fixture's ~10-100, so with fpp=0.01 the pass-rate stays well under half
    val nKeys = math.max(dim.count(), 64L)
    val bf = dim.stat.bloomFilter("s_suppkey", nKeys, 0.01)
    val bc = spark.sparkContext.broadcast(bf)
    val fact = graft.core.Tables.lineitem(spark, sf).select(col("l_suppkey"))
    val passed = fact.where(
      graft.functions.BloomFunctions.mightContain(spark, bc, col("l_suppkey"))).count()
    val total = fact.count()
    assert(passed.toDouble / total < 0.5,
      s"bloom prefilter passed $passed of $total fact rows — no reduction")
    // and it never drops a matching row (no false negatives, by Bloom law)
    val matching = graft.core.Tables.lineitem(spark, sf)
      .join(dim, col("l_suppkey") === col("s_suppkey")).count()
    assert(passed >= matching)
  }

  test("ml_pca_power: loadings replay from a driver-side power iteration") {
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("ml_pca_power")(spark, sf).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1))).sortBy(_._1).map(_._2)
    assert(got.length == 64)
    // max-normalization: every loading in [-1e6, 1e6] and some |v| == 1e6
    assert(got.forall(v => math.abs(v) <= 1000000L))
    assert(got.exists(v => math.abs(v) == 1000000L),
      "the max-|w| component must normalize to exactly ±1e6")
    // replay the exact integer iteration over the collected quantized corpus
    val x: Array[Array[Long]] = graft.core.Tables.embeddings(spark, sf)
      .select(transform(col("embedding"),
        e => round(e.cast("double") * 1000L).cast("bigint")).as("e"))
      .collect().map(_.getSeq[Long](0).toArray)
    var v = Array.fill(64)(BigInt(1000000L))
    for (_ <- 1 to 4) {
      val w = Array.fill(64)(BigInt(0))
      x.foreach { row =>
        var s = BigInt(0)
        var j = 0
        while (j < 64) { s += BigInt(row(j)) * v(j); j += 1 }
        j = 0
        while (j < 64) { w(j) += BigInt(row(j)) * s; j += 1 }
      }
      val mx = w.map(_.abs).max
      if (mx > 0) v = w.map(_ * 1000000L / mx)
    }
    assert(got.toSeq == v.map(_.toLong).toSeq,
      s"engine loadings diverge from the integer replay")
  }

  test("ml_pca_top2: the two components are near-orthogonal (|cos| < 0.01)") {
    val rows = graft.SparkEntry.queries("ml_pca_top2")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2)))
    assert(rows.length == 128, "expected 2 components x 64 dims")
    def comp(c: Long): Array[Double] =
      rows.filter(_._1 == c).sortBy(_._2).map(_._3.toDouble)
    val v1 = comp(1L); val v2 = comp(2L)
    assert(v1.length == 64 && v2.length == 64)
    // both max-normalized to ppm: some |loading| == 1e6 in each component
    assert(v1.exists(x => math.abs(x) == 1e6) && v2.exists(x => math.abs(x) == 1e6))
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    val n1 = math.sqrt(v1.map(x => x * x).sum)
    val n2 = math.sqrt(v2.map(x => x * x).sum)
    val cos = math.abs(dot / (n1 * n2))
    // per-round integer Gram–Schmidt leaves only ppm-quantization residue
    assert(cos < 0.01, s"|cos(v1, v2)| = $cos — deflation failed to orthogonalize")
  }

  test("graph_scc: labels replay from a driver-side functional-graph walk") {
    import org.apache.spark.sql.functions.col
    val got = graft.SparkEntry.queries("graph_scc")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.nonEmpty)
    val succ = SimSearch.knnGraphShared(spark, sf, k = 1)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // functional-graph SCC by direct orbit walk: v is on a cycle iff its
    // far-forward orbit returns to it; its scc is then the cycle min
    def orbitCycle(v: Long): Option[Set[Long]] = {
      var seen = Vector.empty[Long]; var cur = v
      val idx = scala.collection.mutable.HashMap.empty[Long, Int]
      while (!idx.contains(cur)) { idx(cur) = seen.length; seen :+= cur; cur = succ(cur) }
      val cyc = seen.drop(idx(cur)).toSet
      if (cyc.contains(v)) Some(cyc) else None
    }
    got.foreach { case (v, sccId, onCycle) =>
      orbitCycle(v) match {
        case Some(cyc) =>
          assert(onCycle == 1L, s"$v is on a cycle but flagged 0")
          assert(sccId == cyc.min, s"$v: scc $sccId != cycle min ${cyc.min}")
        case None =>
          assert(onCycle == 0L && sccId == v, s"tail node $v must be a singleton")
      }
    }
    // closure: the successor of an on-cycle node is on-cycle with the same label
    val byId = got.map(t => t._1 -> t).toMap
    got.filter(_._3 == 1L).foreach { case (v, sccId, _) =>
      val (_, s2, oc2) = byId(succ(v))
      assert(oc2 == 1L && s2 == sccId, s"cycle not closed at $v -> ${succ(v)}")
    }
  }

  test("maint_incremental_agg: the partial-state merge equals a direct single pass") {
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("maint_incremental_agg")(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val direct = graft.core.Tables.events(spark, sf)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        min(col("cents")).as("mn"), max(col("cents")).as("mx"),
        countDistinct(col("day")).as("nd"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == direct, s"merge(partials) != direct recompute:\n$got\n$direct")
  }

  test("ts_forecast_baselines: metrics replay and sMAPE stays in [0, 2e6]") {
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("ts_forecast_baselines")(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val daily = graft.core.Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .orderBy("day").collect().map(_.getLong(1))
    def replay(lagN: Int): (Long, Long, Long) = {
      val pairs = daily.drop(lagN).zip(daily.dropRight(lagN)) // (obs, forecast)
      val n = pairs.length.toLong
      val mae = pairs.map { case (o, f) => math.abs(f - o) }.sum / n
      val sm = pairs.map { case (o, f) => 2L * math.abs(f - o) * 1000000L / (f + o) }.sum / n
      (n, mae, sm)
    }
    Seq("naive" -> 1, "snaive7" -> 7).foreach { case (m, l) =>
      val (n, mae, sm) = replay(l)
      val (gn, gmae, gsm) = (got(m)._1, got(m)._2, got(m)._3)
      assert((gn, gmae, gsm) == ((n, mae, sm)), s"$m drifted: got ${got(m)}, want ($n,$mae,$sm)")
      assert(gsm >= 0 && gsm <= 2000000L)
    }
  }

  test("ml_dbscan_ivf: verified candidates are a subset of the exact pairs") {
    import org.apache.spark.sql.functions.col
    val r = graft.SparkEntry.queries("ml_dbscan_ivf")(spark, sf).collect()(0)
    assert(r.getLong(1) == 1L && r.getLong(3) == 1L, "recall floors must hold")
    // the IVF stage can only LOSE pairs (cell-split), never invent them:
    // every emitted candidate passed the same exact cosine predicate
    val exact = Dedup.embeddingCosineExact(spark, sf, 0.35)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r.getLong(0) == exact.size.toLong, "n_exact_pairs drifted")
  }

  test("ml_dbscan_ivf: cell cap sub-buckets an over-cap cell, leaves cold cells whole") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // plant one hot cell (3 * cap members) and one cold cell (100)
    val n = 3 * Dedup.DbscanCellCap
    val planted = ((1 to n).map(i => (i.toLong, 0L)) ++
      (1 to 100).map(i => (10000L + i, 1L))).toDF("vec_id", "cluster")
    val bucketed = Dedup.capCells(planted)
      .select(col("cluster"), col("sub")).groupBy("cluster", "sub").count()
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // cold cell: untouched — exactly one sub-bucket, sub = 0
    assert(bucketed.keySet.filter(_._1 == 1L) == Set((1L, 0L)))
    assert(bucketed((1L, 0L)) == 100L)
    // hot cell: exactly ceil(pop/cap) = 3 sub-buckets, partitioning it
    val hot = bucketed.filter(_._1._1 == 0L)
    assert(hot.keySet.map(_._2) == Set(0L, 1L, 2L), hot.keySet.toString)
    assert(hot.values.sum == n.toLong)
    // and no md5 sub-bucket concentrates the cell: a uniform 3-way hash
    // split of 1536 stays far under 2x the target size (binomial tails)
    assert(hot.values.max < 2L * Dedup.DbscanCellCap, hot.toString)
  }

  test("ml_dbscan_ivf: at the law SF every cell is cold — capped ≡ uncapped, " +
    "found = exact ∩ same-cell") {
    import org.apache.spark.sql.functions.col
    val c = Dedup.dbscanIvfCounts(spark, sf).collect()(0)
    val cells = Clustering.lloyd(Clustering.quantized(spark, sf))._1
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cells.groupBy(_._2).values.map(_.size).max <= Dedup.DbscanCellCap,
      "law-SF premise broke: a cell exceeds the cap — re-derive this law")
    val exact = Dedup.embeddingCosineExact(spark, sf, 0.35)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val sameCell = exact.count { case (a, b) => cells(a) == cells(b) }
    assert(c.getLong(1) == sameCell.toLong,
      s"cold-regime candidates must be exactly the same-cell exact pairs: " +
        s"${c.getLong(1)} vs $sameCell")
  }

  test("dedup_clusters_incremental: incremental labels ≡ full recompute, row for row") {
    import org.apache.spark.sql.functions.col
    def labels(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("cluster_rep")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val incr = labels(graft.SparkEntry.queries("dedup_clusters_incremental")(spark, sf))
    val full = labels(graft.SparkEntry.queries("dedup_minhash_clusters")(spark, sf))
    assert(incr == full,
      s"incremental partition diverged from recompute: " +
        s"${(incr.toSet diff full.toSet).take(3)} vs ${(full.toSet diff incr.toSet).take(3)}")
    // and the split is non-trivial at the law SF: the delta side exists,
    // so the identity is exercised across base-star + cross + delta edges
    val docs = graft.core.Tables.documents(spark, sf)
    assert(docs.where(Maintenance.bucketCol >= 90).count() > 0,
      "law premise: the fixture must have a non-empty delta")
  }

  test("text_dedup_spans_incremental: era-equivalence — when delta ids exceed base ids, " +
    "incremental ≡ full recompute on the union, restricted to the delta") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // a shared 8-gram passage in the base, copied by one delta doc; a
    // delta-only boilerplate passage shared by two delta docs; one clean doc
    val passage = "alpha beta gamma delta epsilon zeta eta theta"
    val boiler = "one two three four five six seven eight"
    val base = Seq(
      (1L, s"intro $passage outro xx yy"),
      (2L, "completely unrelated words nothing shared here at all ok")).toDF("doc_id", "text")
    val delta = Seq(
      (1001L, s"copy starts $passage copy ends zz"),
      (1002L, s"$boiler tail a b c"),
      (1003L, s"head $boiler q r s"),
      (1004L, "a fully clean document with no duplicated passages inside it")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("n_tokens"), col("n_spans"),
        col("removed_tokens"), col("cleaned")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1)
    val incr = rows(TextAnalysis.dedupSpansDeltaOf(TextAnalysis.gramSetOf(base), delta))
    val full = rows(TextAnalysis.dedupSpansOf(spark, base.union(delta))
      .where(col("doc_id") >= 1000L))
    // delta ids all exceed base ids, so first-seen ownership ≡ global-min
    // ownership and the two pipelines must agree row for row
    assert(incr.toSeq == full.toSeq,
      s"era split diverged from recompute:\n$incr\nvs\n$full")
    // and the planted removals actually happened: 1001 loses the base
    // passage, exactly one of {1002, 1003} keeps the boilerplate
    val byId = incr.map(r => r._1 -> r).toMap
    assert(byId(1001L)._3 == 1 && byId(1001L)._4 >= 8, s"${byId(1001L)}")
    assert(byId(1002L)._4 == 0 && byId(1003L)._4 >= 8, "min delta doc owns the boilerplate")
    assert(byId(1004L)._3 == 0 && byId(1004L)._4 == 0)
  }

  test("simsearch_index_delta: populations conserve and drift replays from the artifact") {
    import org.apache.spark.sql.functions.col
    val rows = graft.SparkEntry.queries("simsearch_index_delta")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(rows.length == 4, "one row per published cell")
    // every vector lands in exactly one cell on exactly one side
    val total = graft.core.Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum + rows.map(_._3).sum == total,
      "base + delta populations must partition the corpus")
    // drift is present exactly where the delta reached a trained cell
    rows.foreach { case (_, nBase, nDelta, dInertia, drift) =>
      assert((drift.isEmpty) == (nDelta == 0L || nBase == 0L),
        s"drift nullability contract broke: nBase=$nBase nDelta=$nDelta")
      if (nDelta == 0L) assert(dInertia == 0L)
    }
  }

  test("simsearch_index_delta: a planted far-away batch drives drift_ppm ≫ 10⁶") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // base: a tight cell at the origin (unit jitter); delta: the same
    // cell's vectors displaced 100× — incoming data the index no longer
    // represents. drift = delta mean d / base mean d must explode.
    val dim = 64
    def vec(offset: Long, jitter: Long) =
      (0 until dim).map(i => offset + (if (i % 2 == 0) jitter else -jitter)).toArray
    val base = (1 to 8).map(i => (i.toLong, vec(0L, i.toLong)))
    val cents = Array(vec(0L, 4L).map(identity): Seq[Long]) // the published centroid
    def assignedMeanD(rows: Seq[(Long, Array[Long])]) = {
      val df = rows.toDF("vec_id", "e")
      val a = graft.operators.Clustering.assignTo(df, cents).collect()
      a.map(_.getLong(2)).sum / a.length
    }
    val baseMean = assignedMeanD(base)
    val deltaMean = assignedMeanD(base.map { case (id, e) =>
      (id + 100L, e.map(_ + 1000L)) })
    assert(deltaMean / math.max(baseMean, 1L) > 100L,
      s"planted displacement must dominate: base $baseMean delta $deltaMean")
  }

  test("text_shift_tv: identical sides give TV = 0, disjoint vocabularies give exactly 10⁶") {
    import spark.implicits._
    val words = Seq("a", "b", "c", "a", "b", "a")
    val same = (words.map(t => (false, t)) ++ words.map(t => (true, t)))
      .toDF("isd", "token")
    assert(TextAnalysis.shiftTvOf(same).collect().forall(r =>
      r.getLong(4) == 0L && r.getLong(3) == 0L), "identical distributions must read 0")
    val disjoint = (words.map(t => (false, t)) ++
      Seq("x", "y", "z", "x").map(t => (true, t))).toDF("isd", "token")
    assert(TextAnalysis.shiftTvOf(disjoint).collect().forall(_.getLong(4) == 1000000L),
      "disjoint supports are the TV maximum: exactly 1.0")
  }

  test("text_shift_tv: tv and movers replay from a driver-side count of the raw corpus") {
    import org.apache.spark.sql.functions.col
    val rows = graft.SparkEntry.queries("text_shift_tv")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 10)
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def bucket(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(4)
      (h.foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))) % 100
    }
    val (base, delta) = docs.partition { case (id, _) => bucket(id) < 90 }
    def counts(ds: Array[(Long, String)]) = ds
      .flatMap(_._2.toLowerCase.split(" ", -1)).groupBy(identity)
      .map { case (t, a) => t -> BigInt(a.length) }
    val (cb, cd) = (counts(base), counts(delta))
    val (nb, nd) = (cb.values.sum, cd.values.sum)
    val num = (cb.keySet ++ cd.keySet).toSeq.map { t =>
      t -> ((cb.getOrElse(t, BigInt(0)) * nd) - (cd.getOrElse(t, BigInt(0)) * nb)).abs
    }.toMap
    val tvWant = (num.values.sum * 1000000 / (2 * nb * nd)).toLong
    assert(rows.forall(_._5 == tvWant), s"tv_ppm drifted (want $tvWant)")
    // the reported movers are exactly the numerator top-10 under the
    // (num desc, token asc) total order — a deterministic SET
    val want = num.toSeq.sortBy { case (t, n) => (-n, t) }.take(10).map(_._1)
    assert(rows.map(_._1).sorted.toSeq == want.sorted,
      s"movers diverged: ${rows.map(_._1).toSeq} vs $want")
  }

  test("text_textrank: ranks replay from a driver-side graph walk of the raw corpus") {
    import org.apache.spark.sql.functions.col
    val rows = graft.SparkEntry.queries("text_textrank")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20)
    // damping floor: no rank can fall below the (1-d) term
    assert(rows.forall(_._3 >= 150000L))
    val stop = TextAnalysis.StopwordSets.head._2.toSet
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val edges = scala.collection.mutable.Set[(String, String)]()
    docs.foreach { t =>
      val tk = t.toLowerCase.split(" ", -1).filter(w => w.nonEmpty && !stop(w))
      tk.zip(tk.drop(1)).foreach { case (a, b) =>
        if (a != b) edges += ((if (a < b) a else b, if (a < b) b else a))
      }
    }
    val nbr = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (w, ps) => w -> ps.map(_._2) }
    val deg = nbr.map { case (w, us) => w -> BigInt(us.length) }
    var pr = deg.map { case (w, _) => w -> BigInt(1000000) }
    for (_ <- 1 to 3) pr = deg.map { case (w, _) =>
      w -> (BigInt(150000) +
        BigInt(850000) * nbr(w).map(u => pr(u) / deg(u)).sum / BigInt(1000000))
    }
    val want = pr.toSeq.sortBy { case (w, p) => (-p, w) }.take(20)
      .map { case (w, p) => (w, deg(w).toLong, p.toLong) }
    assert(rows.sortBy(r => (-r._3, r._1)).toSeq == want,
      s"textrank diverged from the driver replay:\n${rows.toSeq}\nvs\n$want")
  }

  test("events_cuped: X-shift invariance and the zero-variance guard") {
    import spark.implicits._
    val base = Seq((0L, 10L, 100L), (0L, 20L, 150L), (1L, 12L, 160L),
      (1L, 25L, 240L), (0L, 18L, 90L), (1L, 8L, 130L)).toDF("arm", "x", "y")
    def row(df: org.apache.spark.sql.DataFrame) = df.collect()(0)
    val r0 = row(Relational.cupedOf(base))
    // shifting every user's covariate by a constant changes neither the
    // lift, nor theta (cov and var are shift-free), nor the adjustment
    val shifted = base.selectExpr("arm", "x + 1000 AS x", "y")
    val r1 = row(Relational.cupedOf(shifted))
    for (i <- 2 to 5) assert(r0.getLong(i) == r1.getLong(i),
      s"col $i not shift-invariant: ${r0.getLong(i)} vs ${r1.getLong(i)}")
    // a constant covariate has var(X) = 0: adjusted outputs must be NULL,
    // the raw lift must survive
    val flat = base.selectExpr("arm", "7 AS x", "y")
    val rf = row(Relational.cupedOf(flat))
    assert(!rf.isNullAt(2) && rf.isNullAt(3) && rf.isNullAt(4) && rf.isNullAt(5))
    assert(rf.getLong(2) == r0.getLong(2), "raw lift must not depend on X")
  }

  test("events_cuped: the full readout replays from a driver-side moment pass") {
    import org.apache.spark.sql.functions.col
    val r = graft.SparkEntry.queries("events_cuped")(spark, sf).collect()(0)
    val cutoff = graft.core.Utc.ts("2024-01-15 00:00:00").getTime
    val per = graft.core.Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value")).collect()
      .map(x => (x.getLong(0), x.getTimestamp(1).getTime, math.round(x.getDouble(2) * 100)))
      .groupBy(_._1).map { case (uid, es) =>
        (uid % 2,
          BigInt(es.filter(_._2 < cutoff).map(_._3).sum),
          BigInt(es.filter(_._2 >= cutoff).map(_._3).sum))
      }.toSeq
    val n = per.length.toDouble
    val sx = per.map(_._2).sum; val sy = per.map(_._3).sum
    val sxy = per.map(u => u._2 * u._3).sum
    val sx2 = per.map(u => u._2 * u._2).sum; val sy2 = per.map(u => u._3 * u._3).sum
    def arm(a: Long) = per.filter(_._1 == a)
    val (n0, n1) = (arm(0).length.toDouble, arm(1).length.toDouble)
    val lift = arm(1).map(_._3).sum.toDouble / n1 - arm(0).map(_._3).sum.toDouble / n0
    val xgap = arm(1).map(_._2).sum.toDouble / n1 - arm(0).map(_._2).sum.toDouble / n0
    val cov = n * sxy.toDouble - sx.toDouble * sy.toDouble
    val varx = n * sx2.toDouble - sx.toDouble * sx.toDouble
    val vary = n * sy2.toDouble - sy.toDouble * sy.toDouble
    assert(r.getLong(0) == arm(0).length && r.getLong(1) == arm(1).length)
    assert(r.getLong(2) == math.floor(lift * 1e6).toLong, "lift drifted")
    assert(r.getLong(3) == math.floor(cov / varx * 1e6).toLong, "theta drifted")
    assert(r.getLong(4) == math.floor((lift - cov / varx * xgap) * 1e6).toLong,
      "adjusted lift drifted")
    assert(r.getLong(5) == math.floor(cov * cov / (varx * vary) * 1e6).toLong,
      "variance reduction (rho^2) drifted")
    // and CUPED earned its keep at the law SF: some reduction, lift sign kept
    assert(r.getLong(5) >= 0 && r.getLong(5) <= 1000000L)
  }

  test("events_srm: the chi-square and verdict replay from a driver-side user count") {
    import org.apache.spark.sql.functions.col
    val r = graft.SparkEntry.queries("events_srm")(spark, sf).collect()(0)
    val users = graft.core.Tables.events(spark, sf)
      .select(col("user_id")).distinct().collect().map(_.getLong(0))
    val n0 = users.count(_ % 2 == 0).toLong; val n1 = users.count(_ % 2 == 1).toLong
    assert(r.getLong(0) == n0 && r.getLong(1) == n1)
    val d = BigInt(n0 - n1)
    assert(r.getLong(2) == (d * d * 1000000 / (n0 + n1)).toLong, "chi2 drifted")
    assert(r.getLong(3) == (if (d * d * 1000000 < BigInt(3841459) * (n0 + n1)) 1L else 0L),
      "verdict must be the cross-multiplied 3.841459 rule")
    // the fixture's content-addressed split is healthy by construction
    assert(r.getLong(3) == 1L, "fixture split should pass SRM")
  }

  test("ml_knn_classifier: votes replay from the exact top-5 and labels") {
    import org.apache.spark.sql.functions.col
    val got = graft.SparkEntry.queries("ml_knn_classifier")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.length == SimSearch.NumQueries)
    val labels = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val topk = SimSearch.bruteTopKShared(spark, sf, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (q, pred, truth, correct) =>
      val nb = topk.filter(_._1 == q)
      assert(nb.length == 5)
      val byLang = nb.groupBy(x => labels(x._2)).view
        .mapValues(g => (g.length, g.map(_._3).min)).toSeq
      val want = byLang.minBy { case (l, (v, br)) => (-v, br, l) }._1
      assert(pred == want, s"q=$q vote drifted: $pred vs $want")
      assert(truth == labels(q) && correct == (if (pred == truth) 1L else 0L))
    }
  }

  test("ml_dbscan: roles and labels replay from the pair set by definition") {
    import org.apache.spark.sql.functions.col
    val got = graft.SparkEntry.queries("ml_dbscan")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    // replay: exact pairs at the operator's eps from the blocked join
    val pairs = Dedup.embeddingCosineExact(spark, sf, 0.35)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (pairs ++ pairs.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val cores = nbrs.filter(_._2.size >= 3).keySet
    // CC over core-core edges by fixpoint min-label
    var lab = cores.map(c => c -> c).toMap
    var changed = true
    while (changed) {
      changed = false
      cores.foreach { c =>
        val m = (nbrs(c).intersect(cores).map(lab) + lab(c)).min
        if (m < lab(c)) { lab += c -> m; changed = true }
      }
    }
    got.foreach { case (v, role, cl) =>
      if (cores(v)) assert(role == "core" && cl == lab(v), s"core $v drifted")
      else nbrs.get(v).map(_.intersect(cores)).filter(_.nonEmpty) match {
        case Some(cn) =>
          assert(role == "border" && cl == cn.map(lab).min, s"border $v drifted")
        case None => assert(role == "noise" && cl == -1L, s"noise $v drifted")
      }
    }
    // all three roles exercised at the gate SF (the threshold choice's point)
    val roles = got.map(_._2).toSet
    assert(roles == Set("core", "border", "noise"), roles.toString)
  }

  test("agg_gini: ppm impurity replays and respects the 1 - 1/k ceiling") {
    val rows = graft.SparkEntry.queries("agg_gini")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (n, k, gini, dom) =>
      assert(gini >= 0 && gini < 1000000L)
      // gini ≤ 1 - 1/k for k categories (equality at the uniform mix)
      assert(gini <= 1000000L - 1000000L / k)
      assert(dom * k >= 1000000L - k, s"dominant share must be >= 1/k (dom=$dom k=$k)")
      assert(dom <= 1000000L && n >= 1)
    }
  }

  test("ml_boosted_stumps: the full fit replays and training SSE is monotone") {
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("ml_boosted_stumps")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(got.length == 3)
    val rows = graft.core.Tables.lineitem(spark, sf).select(
      expr("CAST(round(l_discount * 100) AS BIGINT)"),
      expr("CAST(round(l_quantity * 100) AS BIGINT)"),
      expr("CAST(round(l_tax * 100) AS BIGINT)"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect()
      .map(x => (Map("disc" -> x.getLong(0), "qty" -> x.getLong(1),
        "tax" -> x.getLong(2)), x.getLong(3)))
    var cur = rows
    def sse(rs: Seq[(Map[String, Long], Long)]): BigInt =
      rs.map(x => BigInt(x._2) * x._2).sum
    var lastSse = sse(cur)
    def truncDiv(a: BigInt, n: Long): BigInt = if (a < 0) -((-a) / n) else a / n
    got.foreach { case (_, f, v, nLeft, pl, pr) =>
      // replay the argmax over all (feature, threshold) candidates
      val cands = Seq("disc", "qty", "tax").flatMap { ff =>
        val prof = cur.groupBy(_._1(ff)).view
          .mapValues(g => (g.length.toLong, g.map(x => BigInt(x._2)).sum))
          .toSeq.sortBy(_._1)
        val (nT, sT) = (cur.length.toLong, cur.map(x => BigInt(x._2)).sum)
        prof.scanLeft((0L, 0L, BigInt(0))) { case ((_, nl, sl), (vv, (n, sv))) =>
          (vv, nl + n, sl + sv)
        }.drop(1).dropRight(1).map { case (vv, nl, sl) =>
          val (nr, sr) = (nT - nl, sT - sl)
          (ff, vv, nl, (sl * sl).toDouble / nl + (sr * sr).toDouble / nr, sl, sr, nr)
        }
      }
      val b = cands.minBy(c => (-c._4, c._1, c._2))
      assert((b._1, b._2, b._3) == (f, v, nLeft),
        s"stump drifted: engine ($f,$v,$nLeft) vs replay (${b._1},${b._2},${b._3})")
      assert(truncDiv(b._5, nLeft).toLong == pl && truncDiv(b._6, b._7).toLong == pr)
      cur = cur.map { case (fs, r) =>
        (fs, r - (if (fs(f) <= v) pl else pr))
      }
      val s2 = sse(cur)
      assert(s2 <= lastSse, "training SSE must not increase")
      lastSse = s2
    }
  }

  test("events_did: cells and effect replay from the raw purchase slice") {
    import org.apache.spark.sql.functions.col
    val r = graft.SparkEntry.queries("events_did")(spark, sf).collect()(0)
    val cutoff = graft.core.Utc.ts("2024-01-15 00:00:00").getTime
    val raw = graft.core.Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value")).collect()
      .map(x => (x.getLong(0) % 2, if (x.getTimestamp(1).getTime >= cutoff) 1 else 0,
        math.round(x.getDouble(2) * 100)))
    def cell(t: Long, po: Int) = raw.filter(x => x._1 == t && x._2 == po)
    def meanPpm(t: Long, po: Int) = {
      val c = cell(t, po); BigInt(c.map(_._3).sum) * 1000000 / c.length
    }
    assert(r.getLong(0) == cell(0, 0).length && r.getLong(3) == cell(1, 1).length)
    val (m00, m01, m10, m11) =
      (meanPpm(0, 0), meanPpm(0, 1), meanPpm(1, 0), meanPpm(1, 1))
    assert(r.getLong(4) == m00.toLong && r.getLong(7) == m11.toLong)
    assert(r.getLong(8) == ((m11 - m10) - (m01 - m00)).toLong, "did_ppm drifted")
  }

  test("events_jackknife: loo means and variance replay from the bucket partials") {
    val rows = graft.SparkEntry.queries("events_jackknife")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val k = rows.length
    assert(k >= 2 && k <= 20)
    val nTot = rows.map(_._2).sum; val sTot = rows.map(x => BigInt(x._3)).sum
    rows.foreach { case (_, nB, sB, loo, _) =>
      assert(loo == ((sTot - sB) * 1000000 / (nTot - nB)).toLong, "loo mean drifted")
    }
    val mbar = rows.map(x => BigInt(x._4)).sum / k
    val varWant = (rows.map(x => (BigInt(x._4) - mbar) * (BigInt(x._4) - mbar)).sum
      * (k - 1) / k).toLong
    assert(rows.forall(_._5 == varWant), s"jackknife variance drifted (want $varWant)")
    assert(varWant >= 0)
  }

  test("events_jackknife: K-sensitivity — the estimator replays and centers at K = 5/10/20") {
    for (k <- Seq(5, 10, 20)) {
      val rows = Relational.jackknifeByK(spark, sf, k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val kk = rows.length
      assert(kk >= 2 && kk <= k, s"K=$k produced $kk buckets")
      val nTot = rows.map(_._2).sum; val sTot = rows.map(x => BigInt(x._3)).sum
      // the replay law holds at every K, not just the declared 20
      rows.foreach { case (_, nB, sB, loo, _) =>
        assert(loo == ((sTot - sB) * 1000000 / (nTot - nB)).toLong,
          s"K=$k loo mean drifted")
      }
      val mbar = rows.map(x => BigInt(x._4)).sum / kk
      val varWant = (rows.map(x => (BigInt(x._4) - mbar) * (BigInt(x._4) - mbar)).sum
        * (kk - 1) / kk).toLong
      assert(rows.forall(_._5 == varWant), s"K=$k jackknife variance drifted")
      // sensitivity: delete-one-bucket means center on the FULL-sample
      // mean whatever the bucketing — mbar within 1% of the global ppm
      // mean at every K (the estimate measures the data, not the K knob)
      val globalPpm = sTot * 1000000 / nTot
      assert((mbar - globalPpm).abs * 100 <= globalPpm.abs,
        s"K=$k mbar $mbar strays >1% from global mean $globalPpm")
    }
  }

  test("ml_calibration_bins: bins partition the corpus and means respect bin edges") {
    val rows = graft.SparkEntry.queries("ml_calibration_bins")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.forall(r => r._1 >= 0 && r._1 <= 9))
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == nDocs, "bins must partition every doc")
    rows.foreach { case (bin, _, mean, obs) =>
      assert(mean >= bin * 100000 &&
        (mean < (bin + 1) * 100000 || (bin == 9 && mean <= 1000000)),
        s"bin $bin mean $mean outside its edges")
      assert(obs >= 0 && obs <= 1000000)
    }
  }

  test("ts_acf: values lie in [-1, 1] and lag coverage shrinks with lag") {
    val rows = graft.SparkEntry.queries("ts_acf")(spark, sf)
      .orderBy("lag_d").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(rows.length == 10)
    rows.foreach { case (_, n, acf) =>
      assert(n >= 1)
      acf.foreach(a => assert(a >= -1.0 - 1e-12 && a <= 1.0 + 1e-12))
    }
    // each +1 lag drops at most one paired day (contiguous grid: exactly one)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._2 <= a._2, "pair count must be antitone in lag")
      case _ => ()
    }
  }

  // ---- MinhashBandCap laws (round-12): the LABEL-path band cap --------

  /** Builds a planted near-dup clique: `m` docs sharing a ~700-char base
    * of UNIQUE tokens (repeats would collapse the DISTINCT shingle set)
    * plus a tiny per-doc suffix; pairwise char-12-shingle jaccard ≈
    * 708/(708 + 2·15) ≈ 0.96 — comfortably over 0.9 — so the ≥0.9 graph
    * is a clique and its exhaustive CC label is the min id for every
    * member. `suffix = false` plants VERBATIM copies (jac = 1, every
    * band bucket shared by all m — the boilerplate regime). */
  private def plantedClique(m: Int, idOffset: Long = 0L, tag: String = "alpha",
                            suffix: Boolean = true) = {
    import spark.implicits._
    val base = (1 to 80).map(i => f"$tag$i%03d").mkString(" ")
    (1 to m).map(i =>
      (idOffset + i, if (suffix) s"$base x$i" else base)).toDF("doc_id", "text")
  }

  test("lshCandidatesCapped: a mega-clique over the PRODUCTION cap emits " +
    "linear star candidates and the exact exhaustive labels") {
    import org.apache.spark.sql.functions.col
    val m = Dedup.MinhashBandCap + 38 // 550 > every bucket's cap
    // VERBATIM copies: every band bucket holds all 550 — the boilerplate
    // regime (real crawls plant exactly this; suffixes would scatter ~23%
    // of members into cold per-band buckets and dodge the production cap)
    val docs = plantedClique(m, suffix = false).localCheckpoint()
    val bands = Dedup.lshBands(Dedup.sigsOf(docs), "doc_id", "sig")
      .localCheckpoint()
    val capped = Dedup.lshCandidatesCapped(bands, "doc_id").localCheckpoint()
    val cappedN = capped.count()
    val uncappedN = Dedup.lshCandidates(bands, "doc_id").count()
    // linear vs quadratic: ≤ one star edge per (band, member) vs m(m-1)/2
    assert(cappedN <= 32L * (m - 1),
      s"capped candidates $cappedN exceed the 32·(m-1) star bound")
    assert(uncappedN > (m.toLong * (m - 1)) / 4,
      s"uncapped candidates $uncappedN — clique premise broke, re-derive")
    assert(cappedN * 8 < uncappedN,
      s"cap bought < 8x on a planted mega-clique ($cappedN vs $uncappedN)")
    // every star edge verifies (clique-through-min premise) and CC labels
    // every member 1 — EXACTLY the exhaustive full-recompute answer
    import spark.implicits._
    val edges = Dedup.verifyJaccard(capped, docs,
      Dedup.charShingles(col("text"), 12))
    assert(edges.where(col("jac") < 0.9).isEmpty,
      "a planted-clique star edge failed verification — clique premise broke")
    val labels = Dedup.connectedComponents(edges.select($"a", $"b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length == m && labels.forall(_._2 == 1L),
      "capped labels must equal the exhaustive closure's (all -> doc 1)")
  }

  test("lshCandidatesCapped: mixed hot/cold graph — labels ≡ uncapped labels") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 40-clique (hot at cap=8) + a separate cold 2-clique + a singleton
    val docs = plantedClique(40)
      .union(plantedClique(2, 9000L, tag = "omega"))
      .union(Seq((9500L, "a lone document with nothing like it anywhere near"))
        .toDF("doc_id", "text"))
      .localCheckpoint()
    val bands = Dedup.lshBands(Dedup.sigsOf(docs), "doc_id", "sig")
      .localCheckpoint()
    def labelsOf(cands: org.apache.spark.sql.DataFrame) =
      Dedup.connectedComponents(
        Dedup.verifyJaccard(cands, docs, Dedup.charShingles(col("text"), 12))
          .where(col("jac") >= 0.9).select($"a", $"b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cappedCands = Dedup.lshCandidatesCapped(bands, "doc_id", cap = 8).localCheckpoint()
    val uncappedCands = Dedup.lshCandidates(bands, "doc_id").localCheckpoint()
    val capped = labelsOf(cappedCands)
    val uncapped = labelsOf(uncappedCands)
    assert(capped == uncapped,
      s"capped/uncapped label drift: ${(capped diff uncapped) ++ (uncapped diff capped)}")
    // the hot regime actually engaged, and the cold 2-clique survived it
    assert(cappedCands.count() < uncappedCands.count(),
      "cap=8 did not engage on a 40-clique — premise broke")
    assert(capped.contains((9002L, 9001L)), "cold 2-clique must cluster")
  }

  test("lshCrossCapped: hot bucket stars delta members from the set min " +
    "plus one base attach edge; cold bucket keeps the exact cross") {
    import spark.implicits._
    val baseBands = (100L to 139L).map(i => (i, 0, 7L))
      .toDF("doc_id", "band_id", "band_key")
    val deltaBands = ((1000L to 1009L).map(i => (i, 0, 7L)) ++
      (2000L to 2019L).map(i => (i, 1, 9L)))
      .toDF("doc_id", "band_id", "band_key")
    // hot combined bucket (50 > 8): star = (min base = 100) -> each delta
    val hot = Dedup.lshCrossCapped(baseBands, deltaBands, cap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantHot = (1000L to 1009L).map(d => (100L, d)).toSet ++
      (2001L to 2019L).map(d => (2000L, d)).toSet // delta-only hot bucket
    assert(hot == wantHot, s"hot star shape wrong: $hot")
    // cold (cap=100): the exact base x delta cross for the shared bucket
    val cold = Dedup.lshCrossCapped(baseBands, deltaBands, cap = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantCold = (for (b <- 100L to 139L; d <- 1000L to 1009L) yield (b, d)).toSet
    assert(cold == wantCold, s"cold cross shape wrong: size ${cold.size}")
  }

  test("text_dedup_substring: over-threshold planted run excised from the " +
    "non-owner only; sub-threshold shared run survives everywhere") {
    import spark.implicits._
    val shared = (1 to 16).map(i => f"dup$i%02d").mkString(" ") // 16·5+15 = 95 chars ≥ 50
    val small = "tiny shared bit below the window size" // 37 chars < 50
    val docs = Seq(
      (1L, s"owner prefix text $shared and an owner tail"),
      (2L, s"later document leading words $shared trailing remainder"),
      (3L, s"unrelated body entirely $small plus padding that is unique here"),
      (4L, s"another unrelated text with $small and different padding words")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupSubstringOf(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // owner (min doc 1) keeps everything
    assert(out(1L)._2 == 0 && out(1L)._3 == 0, s"owner lost material: ${out(1L)}")
    // doc 2 loses exactly one span covering the shared run's window union
    assert(out(2L)._2 == 1, s"doc 2 spans: ${out(2L)}")
    assert(out(2L)._3 >= shared.length, s"doc 2 removed_chars: ${out(2L)}")
    assert(!out(2L)._4.contains("dup01"), "shared run must be excised from doc 2")
    // sub-threshold shared run survives in BOTH docs 3 and 4
    assert(out(3L)._3 == 0 && out(4L)._3 == 0,
      s"sub-threshold run was excised: ${out(3L)} ${out(4L)}")
    assert(out(3L)._4.contains(small) && out(4L)._4.contains(small))
    // removed chars reconcile with the cleaned length
    out.foreach { case (id, (n, _, rm, cl)) =>
      assert(cl.length == n - rm, s"doc $id cleaned length mismatch")
    }
  }

  test("text_dedup_substring_incremental: era-equivalence — when delta ids " +
    "exceed base ids, incremental ≡ full recompute on the union (delta rows)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // a shared ≥50-char run in the base, copied by one delta doc; a
    // delta-only ≥50-char boilerplate shared by two delta docs; a clean doc
    val run = (1 to 12).map(i => f"base$i%02d").mkString(" ") // 12·7-1 = 83 chars
    val boiler = (1 to 12).map(i => f"boil$i%02d").mkString(" ")
    val base = Seq(
      (1L, s"intro text $run and an outro"),
      (2L, "completely unrelated words nothing shared here at all ok")).toDF("doc_id", "text")
    val delta = Seq(
      (1001L, s"copy starts $run copy ends"),
      (1002L, s"$boiler tail words"),
      (1003L, s"leading $boiler trailing"),
      (1004L, "a fully clean document with no duplicated runs inside it at all")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1)
    val incr = rows(TextAnalysis.dedupSubstringDeltaOf(
      TextAnalysis.substrGramSetOf(base), delta))
    val full = rows(TextAnalysis.dedupSubstringOf(base.union(delta))
      .where(col("doc_id") >= 1000L))
    assert(incr.toSeq == full.toSeq,
      s"era split diverged from recompute:\n${incr.toSeq}\nvs\n${full.toSeq}")
    // and the rule actually fired: 1001 loses the base run, 1003 loses the
    // delta boilerplate (1002 = min delta owner keeps it), 1004 untouched
    val m = incr.map(r => r._1 -> r).toMap
    assert(m(1001L)._4 >= run.length && m(1003L)._4 >= boiler.length)
    assert(m(1002L)._4 == 0 && m(1004L)._4 == 0)
  }

  test("dedup_clusters_incremental: frontier-restricted batch ≡ full recompute") {
    val full = Dedup.minhashClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = Dedup.minhashClustersIncremental(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == full,
      s"delta ≠ recompute: ${(inc diff full) ++ (full diff inc)}")
  }
  test("dedup_semantic_ann: over-cap cell stars keep mega-clique labels " +
    "≡ uncapped, unverified chaff stays singleton, work stays linear") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val cap = 8
    // planted IVF-lists frame: a 30-member IDENTICAL-embedding clique
    // (the pasted-boilerplate regime the cap exists for) and 20 chaff
    // vectors in the SAME cell that are orthogonal to everything — the
    // cell is hot (pop 50 > cap) WITHOUT the chaff being near-dups of
    // the cell min (the AdversarialBoundSpec:94 collision regime)
    val dim = 64
    val dupVec = Array.tabulate(dim)(j => if (j == 0) 1f else 0f)
    val rows =
      (0 until 30).map(i => (100L + i, 7L, 8L, 9L, dupVec)) ++
      (0 until 20).map(i => (300L + i, 7L, 8L, 9L,
        Array.tabulate(dim)(j => if (j == 10 + i) 1f else 0f))) ++
      // two cold singleton cells for the untouched-cold-path premise
      (0 until 2).map(i => (500L + i, 60L + i, 70L + i, 80L + i,
        Array.tabulate(dim)(j => if (j == 40 + i) 1f else 0f)))
    val lists = rows.toDF("vec_id", "c_id", "c_id2", "c_id3", "embedding")
    def labelsOf(c: Int): Map[Long, Long] =
      Dedup.connectedComponents(
          Dedup.semanticAnnPairs(lists, tau = 0.45, cap = c)
            .select(col("vec_a").as("a"), col("vec_b").as("b")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // work bound: the hot cell emits pop-1 = 49 star CANDIDATES (both
    // assignment slots dedup to the same star), the verify keeps only
    // the 29 true clique edges — never the 50*49/2 quadratic set
    val capped = Dedup.semanticAnnPairs(lists, tau = 0.45, cap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.size == 29, s"expected the 29 verified star edges, got ${capped.size}")
    assert(capped.forall { case (a, b) => a == 100L && b > 100L && b < 130L })
    // label law: capped ≡ uncapped — the clique collapses to its min
    // either way (identical members all verify against the cell min);
    // chaff and cold singletons never appear in any component
    val cl = labelsOf(cap)
    val un = labelsOf(Int.MaxValue)
    assert(cl == un, s"capped labels diverged: ${(cl.toSet diff un.toSet) ++ (un.toSet diff cl.toSet)}")
    assert((100L until 130L).forall(v => cl(v) == 100L))
    assert(!cl.keySet.exists(_ >= 300L), "chaff/singletons must stay unclustered")
    // and the uncapped generator really was quadratic where the cap is
    // linear: 29 star edges vs the 435-pair clique closure
    val uncappedPairs = Dedup.semanticAnnPairs(lists, tau = 0.45, cap = Int.MaxValue).count()
    assert(uncappedPairs == 435L, s"uncapped should be the full 30-clique, got $uncappedPairs")
  }

}
