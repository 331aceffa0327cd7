package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Laws for the batch-6 analytics operators. The oracle gate proves
  * cross-engine agreement on the fixtures; these prove internal
  * consistency (conservation, equivalence of independent formulations,
  * planted-structure recovery) that a hash-match alone can't localize. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("dedup_spans: planted duplication is excised from later docs only, overlaps merge, disjoint passages stay separate spans") {
    // P1 (8 tokens) planted in docs 1, 2, 6; P2 (10 tokens — three
    // overlapping dup grams that must merge to ONE span) in docs 4, 5, 6.
    val p1 = "c d e f g h i j"
    val p2 = "m n o p q r s t u v"
    val docs = Seq(
      (1L, s"a b $p1 k l"),           // owner of P1: untouched
      (2L, s"x y $p1 z w"),           // one P1 span excised
      (3L, "p q r s t u v w"),        // no duplication
      (4L, s"aa bb $p2 cc"),          // owner of P2: untouched
      (5L, s"dd $p2 ee ff"),          // one merged 10-token span
      (6L, s"q1 $p1 q2 $p2 q3")       // BOTH passages, separated: 2 spans
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupSpansOf(spark, docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // owners and the clean doc are byte-identical to their (lowercased) text
    assert(out(1L) === ((12L, 0L, 0L, s"a b $p1 k l")))
    assert(out(3L) === ((8L, 0L, 0L, "p q r s t u v w")))
    assert(out(4L) === ((13L, 0L, 0L, s"aa bb $p2 cc")))
    // single planted passage → one span of exactly the passage's tokens
    assert(out(2L) === ((12L, 1L, 8L, "x y z w")))
    // 10-token passage = 3 overlapping dup grams → merged into ONE span
    assert(out(5L) === ((13L, 1L, 10L, "dd ee ff")))
    // two disjoint passages → two spans, both excised
    assert(out(6L) === ((21L, 2L, 18L, "q1 q2 q3")))
    // conservation on every doc: kept + removed = total
    out.values.foreach { case (n, _, removed, cleaned) =>
      val kept = if (cleaned.isEmpty) 0 else cleaned.split(" ").length
      assert(kept + removed === n)
    }
  }

  test("approx_topk: fixture vocabulary stays far below the sketch k, so top-10 containment is tie-proof") {
    // agg_approx_topk's in_sketch=1 oracle assumes the exact top-10 is
    // contained in approx_top_k's returned items. With k (128) ≥ the
    // whole vocabulary, containment holds regardless of count ties at
    // any rank — this pin fails if a fixture regeneration ever grows the
    // vocabulary toward k, BEFORE the unspecified sketch tiebreak can
    // silently flip the oracle flag.
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .where(col("tok") =!= "")
      .agg(countDistinct(col("tok"))).head.getLong(0)
    assert(vocab <= 64, s"vocabulary $vocab is within 2x of approx_top_k's k=128; " +
      "raise k in aggApproxTopK before the containment assumption breaks")
  }

  test("time_to_convert: counts survive a conversion-free input (stats drive the output row)") {
    // the ADVICE-flagged latent mismatch: with no converted users the
    // percentile picks are empty, and aggregating over the empty cross
    // product nulled n_anchored too. The stats frame now drives — replay
    // the operator's shape on a staged conversion-free slice (views only).
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    val lat = Tables.events(spark, sf)
      .where(col("event_type") =!= "purchase") // no one can convert
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "purchase" && col("ts") > col("t1"), col("ts"))).over(w))
      .where(col("t1").isNotNull)
      .groupBy(col("user_id"))
      .agg((unix_micros(max(col("t2"))) - unix_micros(max(col("t1")))).as("lat_us"))
    // replay the operator's fixed final shape: stats drives, picks ride
    val ranked = lat.where(col("lat_us").isNotNull).withColumn("rk",
      row_number().over(Window.orderBy(col("lat_us").asc, col("user_id").asc)))
    val stats = lat.agg(count(lit(1)).as("n_anchored"),
      count(col("lat_us")).as("n_converted"),
      min(col("lat_us")).as("min_us"), max(col("lat_us")).as("max_us"))
    val picks = ranked.crossJoin(broadcast(stats))
      .agg(max(when(col("rk") === expr("((n_converted - 1) * 50) div 100 + 1"),
        col("lat_us"))).as("p50_us"),
        max(when(col("rk") === expr("((n_converted - 1) * 90) div 100 + 1"),
          col("lat_us"))).as("p90_us"))
    val row = stats.crossJoin(broadcast(picks)).head
    assert(row.getLong(row.fieldIndex("n_anchored")) > 0,
      "anchored count must survive an empty converted set")
    assert(row.getLong(row.fieldIndex("n_converted")) == 0)
    assert(row.isNullAt(row.fieldIndex("p50_us")),
      "percentiles are empty-scalar NULL when no one converts")
    // and the live operator on the full fixture still emits its one row
    val out = graft.SparkEntry.queries("events_time_to_convert")(spark, sf).collect()
    assert(out.length == 1)
    assert(!out(0).isNullAt(out(0).fieldIndex("n_anchored")))
  }

  test("cross-correlation: every lag's corr is a valid Pearson value with consistent moments") {
    val rows = Relational.tsCrossCorrelation(spark, sf).collect()
    assert(rows.length == 7) // lags -3..3
    rows.foreach { r =>
      val (n, sx, sy, sxy) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n > 0)
      if (r.isNullAt(5)) {
        // the operator's documented zero-variance semantics: corr is
        // NULL exactly when a series is constant at this lag — assert
        // the moments agree instead of unboxing a null (round-8 ADVICE)
        assert(sx == 0 || sy == 0,
          s"NULL corr with nonzero variances sx=$sx sy=$sy")
      } else {
        val corr = r.getDouble(5)
        assert(sx > 0 && sy > 0)
        // Cauchy-Schwarz on the centered sums: |corr| ≤ 1 (+ε for the one
        // double division); a violation means the integer moments drifted
        assert(math.abs(corr) <= 1.0 + 1e-12, s"corr $corr out of range")
        // the cross moment is bounded by the raw magnitudes
        assert(sxy > 0 && sxy <= sx * sy)
      }
    }
  }

  test("sql_percentile_disc picks the SQL-standard ceil(p*n) element on the live group sizes") {
    // Round-8 ADVICE pin: Spark's percentile_disc (smallest value with
    // cume_dist >= p) and DuckDB's quantile_disc-backed one must select
    // the same 1-based index ceil(p*n). Both engines compute it in
    // doubles, so a (p, n) pair where p*n lands ON an integer is the
    // divergence risk after a fixture regen. This test recomputes each
    // pick with EXACT integer arithmetic — idx = ceil(a*n/b) =
    // (a*n + b - 1) div b for p = a/b — against the live fixture group
    // sizes, so whichever engine drifts off the standard rule fails
    // loudly here or in the oracle gate (which pins the DuckDB side).
    val got = graft.SparkEntry.queries("sql_percentile_disc")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val groups = Tables.lineitem(spark, sf)
      .select($"l_returnflag",
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).sorted }
    def pick(sorted: Array[Long], a: Long, b: Long): Long = {
      val n = sorted.length.toLong
      val idx = ((a * n + b - 1) / b).max(1L) // exact ceil(a*n/b), 1-based
      sorted((idx - 1).toInt)
    }
    assert(groups.nonEmpty && groups.keySet == got.keySet)
    groups.foreach { case (flag, sorted) =>
      val (p25, p50, p90) = got(flag)
      assert(p25 == pick(sorted, 1, 4), s"$flag p25 n=${sorted.length}")
      assert(p50 == pick(sorted, 1, 2), s"$flag p50 n=${sorted.length}")
      assert(p90 == pick(sorted, 9, 10), s"$flag p90 n=${sorted.length}")
    }
  }

  test("kll quantile_ok band: tie mass at the exact p50 stays far below the rank tolerance") {
    // agg_kll_quantile's quantile_ok/rank_ok ±0.03 rank flags assume the
    // value distribution puts well under 3% of its mass on the exact p50
    // cents value: the INCLUSIVE rank of the smallest value with F≥0.5 is
    // 0.5 + tie mass, so a fixture regeneration concentrating ≥3% on the
    // median would flip the oracle's constant-1 flags with a PERFECT
    // sketch. Pin at half the band so drift fails HERE first.
    val cents = Tables.events(spark, sf)
      .select(round(col("value") * 100).cast("bigint").as("cents"))
    val n = cents.count()
    val p50 = cents.stat.approxQuantile("cents", Array(0.5), 0.0)(0).toLong
    val tie = cents.where(col("cents") === p50).count()
    assert(tie.toDouble / n <= 0.015,
      s"$tie/$n rows tie at the exact p50 cents value — within 2x of the " +
        "±0.03 rank band; widen the band or re-derive it before the oracle flags flip")
  }

  test("theta sketches stay in their exact regime: fixture user cardinality far below nominal entries") {
    // agg_theta_diff emits estimates as hash-checked BIGINTs, which is
    // only sound while the sketches never downsample — exact mode holds
    // up to 2^12 nominal entries; pin the margin so a fixture
    // regeneration toward that edge fails HERE, not as a flaky estimate
    val users = Tables.events(spark, sf)
      .agg(countDistinct(col("user_id"))).head.getLong(0)
    assert(users <= 2048, s"$users distinct users is within 2x of the theta " +
      "sketch's 4096 nominal entries; agg_theta_diff's exact-BIGINT contract erodes")
  }

  test("retention: the offset-0 cell is exactly the cohort size, and caps every later cell") {
    val ret = Relational.eventsRetention(spark, sf)
      .collect().map(r => ((r.getTimestamp(0), r.getLong(1)), r.getLong(2))).toMap
    val cohorts = Tables.events(spark, sf)
      .select($"user_id", date_trunc("week", $"ts").as("week"))
      .groupBy($"user_id").agg(min($"week").as("cohort"))
      .groupBy($"cohort").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    assert(cohorts.nonEmpty)
    for ((cw, n) <- cohorts) assert(ret((cw, 0L)) == n)
    for (((cw, _), n) <- ret) assert(n <= cohorts(cw))
  }

  test("attribution: purchases and revenue are conserved across campaigns") {
    val att = Relational.eventsAttribution(spark, sf).collect()
    val purchases = Tables.events(spark, sf).where($"event_type" === "purchase")
      .agg(count(lit(1)), sum(round($"value" * 100).cast("bigint")))
      .head()
    assert(att.map(_.getLong(1)).sum == purchases.getLong(0))
    assert(att.map(_.getLong(2)).sum == purchases.getLong(1))
    // campaigns are props.k values (0..99) or the unattributed bucket −1
    assert(att.map(_.getLong(0)).forall(k => k == -1L || (k >= 0L && k < 100L)))
  }

  test("paths: transitions are conserved — one per consecutive event pair per user") {
    val total = Relational.eventsPaths(spark, sf).agg(sum($"n")).head().getLong(0)
    val e = Tables.events(spark, sf)
    val expected = e.count() - e.select($"user_id").distinct().count()
    assert(total == expected)
  }

  test("moments: correlation derived from the integer sums matches Spark's corr") {
    val rows = Relational.aggMoments(spark, sf).collect()
    val sparkCorr = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(corr($"l_quantity", $"l_discount").as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, sq, sq2, sd, sd2, sqd) =
        (r.getLong(1).toDouble, r.getLong(2).toDouble, r.getLong(3).toDouble,
         r.getLong(4).toDouble, r.getLong(5).toDouble, r.getLong(6).toDouble)
      val derived = (n * sqd - sq * sd) /
        (math.sqrt(n * sq2 - sq * sq) * math.sqrt(n * sd2 - sd * sd))
      // disc_pc = discount·100; correlation is scale-invariant
      assert(math.abs(derived - sparkCorr(r.getString(0))) < 1e-9)
    }
  }

  test("mode: the picked segment has the true max count, smallest-value ties") {
    val modes = Relational.aggMode(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val counts = Tables.customer(spark, sf)
      .groupBy($"c_nationkey".cast("long").as("nk"), $"c_mktsegment".as("seg"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byNation = counts.groupBy(_._1)
    assert(modes.keySet == byNation.keySet)
    for ((nk, (seg, n)) <- modes) {
      val best = byNation(nk).map(_._3).max
      assert(n == best)
      val tied = byNation(nk).filter(_._3 == best).map(_._2).min
      assert(seg == tied)
    }
  }

  test("interpolate: observed days pass through; gaps stay within the bracket") {
    val interp = Relational.tsInterpolate(spark, sf)
    val daily = Tables.events(spark, sf)
      .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
      .agg(sum(round($"value" * 100).cast("bigint")).as("cents"))
    // observed days: interp == the day's own cents
    val mismatch = interp.where($"n_events" > 0)
      .join(daily, Seq("user_id", "day"))
      .where($"interp_cents" =!= $"cents").count()
    assert(mismatch == 0)
    // gap days exist at this SF and interpolate within the user's daily range
    val gaps = interp.where($"n_events" === 0)
    assert(gaps.count() > 0)
    val range = daily.groupBy($"user_id")
      .agg(min($"cents").as("lo"), max($"cents").as("hi"))
    val outOfRange = gaps.join(range, "user_id")
      .where($"interp_cents" < $"lo" || $"interp_cents" > $"hi").count()
    assert(outOfRange == 0)
  }

  test("collocations: lift matches an independent join-based recomputation") {
    val got = TextAnalysis.collocations(spark, sf)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    val stop = TextAnalysis.StopwordSets.head._2
    val toksF = filter(split(lower($"text"), " "),
      t => !t.isin(stop.map(lit): _*) && t =!= "")
    val big = Tables.documents(spark, sf)
      .select(explode(Dedup.wordShinglesOf(toksF, 2)).as("g"))
      .groupBy($"g").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nn = big.values.sum
    val cx = big.groupBy(_._1.split(" ")(0)).view.mapValues(_.values.sum).toMap
    val cy = big.groupBy(_._1.split(" ")(1)).view.mapValues(_.values.sum).toMap
    for (((w1, w2), (n, lift)) <- got) {
      assert(n == big(s"$w1 $w2") && n >= 5)
      assert(lift == n * nn * 1000000L / (cx(w1) * cy(w2)))
    }
    assert(big.count(_._2 >= 5) == got.size)
  }

  test("normalized dedup: every staged variant groups with its base doc") {
    val groups = Dedup.normalizedDedup(spark, sf).collect()
      .map(r => r.getString(2).split(",").map(_.toLong).toSet)
    val variantIds = groups.flatten.filter(_ >= 1000000L)
    assert(variantIds.nonEmpty)
    for (v <- variantIds)
      assert(groups.exists(g => g.contains(v) && g.contains(v - 1000000L)))
  }

  test("triangles: degree-oriented enumeration equals the id-ordered formulation on a planted graph") {
    // K4 on {1..4} (4 triangles) + a path 5-6-7 (none) + pendant 8
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L), (1L, 8L)).toDF("doc_a", "doc_b")
    val got = Dedup.trianglesOf(edges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // id-ordered independent count
    val e = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = e.flatMap(p => Set(p._1, p._2)).toSeq.sorted
    val tris = for {
      a <- nodes; b <- nodes if a < b && e((a, b))
      c <- nodes if b < c && e((b, c)) && e((a, c))
    } yield (a, b, c)
    val perNode = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(tris.size == 4)
    for ((id, (deg, nt)) <- got) {
      assert(nt == perNode.getOrElse(id, 0L))
      assert(deg == e.count(p => p._1 == id || p._2 == id).toLong)
    }
    // handshake + 3×-membership conservation
    assert(got.values.map(_._1).sum == 2L * e.size)
    assert(got.values.map(_._2).sum == 3L * tris.size)
  }

  test("compression ratio: repetition deflates hard, high-entropy bytes do not") {
    val defl = new java.util.zip.Deflater(6)
    val rep = ("the quick brown fox " * 100).getBytes("UTF-8") // 2000 B
    val repC = TextAnalysis.deflateLen(defl, rep)
    assert(repC * 20 < rep.length, s"repetition ratio ${repC}/${rep.length}") // < 5%
    val rnd = new scala.util.Random(11)
    val noise = Array.fill(2000)(rnd.nextInt(256).toByte)
    val noiseC = TextAnalysis.deflateLen(defl, noise)
    assert(noiseC * 10 > noise.length * 9, s"noise ratio ${noiseC}/${noise.length}") // ≥ 90%
    // worst-case expansion bound holds even for incompressible input
    assert(noiseC <= noise.length + noise.length / 1000 + 64)
    // and the reused (reset) codec is deterministic
    assert(TextAnalysis.deflateLen(defl, rep) == repC)
  }

  test("streaks: planted consecutive-day runs recover exactly, duplicate-day events collapse") {
    import java.sql.Timestamp
    def t(day: String, h: Int) = Timestamp.valueOf(s"2024-01-$day $h:00:00")
    // user 1: days 01,02,03 (streak 3), 05 (streak 1), 10,11 (streak 2);
    //   day 02 has two events — must collapse to one active day
    // user 2: a single day
    val ev = Seq(
      (1L, t("01", 9)), (1L, t("02", 9)), (1L, t("02", 18)), (1L, t("03", 9)),
      (1L, t("05", 9)), (1L, t("10", 9)), (1L, t("11", 9)),
      (2L, t("20", 12))).toDF("user_id", "ts")
    val got = Relational.eventsStreaksOf(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((6L, 3L, 3L)))
    assert(got(2L) == ((1L, 1L, 1L)))
  }

  test("readability: closed-form scores on planted prose, fragment, and word-less docs") {
    // doc 1: 9 words, 3 sentences, 9 vowel groups →
    //   206835 − (1015·9)÷3 − (84600·9)÷9 = 206835 − 3045 − 84600 = 119190
    // doc 2: fragment, no [.!?] → sentence floor 1; "xyzzy" = 1 word,
    //   2 vowel groups (y, y) → 206835 − 1015 − 169200 = 36620
    // doc 3: word-less → divisor floors to 1, score = 206835
    val docs = Seq(
      (1L, "The cat sat. It ran off! Did it nap?"),
      (2L, "Xyzzy"),
      (3L, "1234 !!")).toDF("doc_id", "text")
    val got = TextAnalysis.readabilityOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(1L) == ((9L, 3L, 9L, 119190L, 1L)))
    assert(got(2L) == ((1L, 1L, 2L, 36620L, 0L)))
    assert(got(3L) == ((0L, 1L, 0L, 206835L, 1L)))
  }

  test("clustering coefficient: closed forms on clique, path, star vertices") {
    // K4 on {1..4} + path 5-6-7 + pendant 8 off vertex 1 (same planted
    // graph as the triangles law). Closed forms: an interior K4 vertex
    // {2,3,4} has lcc = 2·3/(3·2) = 1 exactly (10^6 ppm); vertex 1 has
    // degree 4 (K4 + pendant) and 3 triangles → 2·3·10^6 div (4·3) =
    // 500000; path interior 6 has deg 2, 0 triangles → 0; pendants
    // (deg 1) are defined 0.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L), (1L, 8L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusteringCoeffOf(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(2L) == 1000000L && got(3L) == 1000000L && got(4L) == 1000000L)
    assert(got(1L) == 500000L)
    assert(got(6L) == 0L && got(5L) == 0L && got(7L) == 0L && got(8L) == 0L)
  }

  test("anomaly: integer flag set matches the double-precision 3-sigma rule") {
    val flagged = Relational.eventsAnomaly(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pts = Tables.events(spark, sf)
      .select($"user_id", $"event_id", round($"value" * 100).cast("bigint").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = pts.groupBy(_._1)
    for ((u, rows) <- byUser; if rows.length >= 2) {
      val n = rows.length.toDouble
      val mu = rows.map(_._3).sum / n
      val sigma = math.sqrt(rows.map(p => (p._3 - mu) * (p._3 - mu)).sum / n)
      for ((_, eid, c) <- rows) {
        val z = if (sigma == 0) 0.0 else math.abs(c - mu) / sigma
        if (z > 3 + 1e-9) assert(flagged((u, eid)))
        if (z < 3 - 1e-9) assert(!flagged((u, eid)))
      }
    }
    assert(flagged.nonEmpty)
  }

  test("skew report: summary row matches a local recomputation of the key profile") {
    val r = Maintenance.skewReport(spark, sf).head()
    val cnts = Tables.lineitem(spark, sf)
      .groupBy($"l_suppkey").agg(count(lit(1)).as("n"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .sortBy(x => (x._2, x._1)).map(_._2)
    val nk = cnts.length
    assert(r.getLong(0) == nk && r.getLong(1) == cnts.sum)
    assert(r.getLong(2) == cnts.min && r.getLong(3) == cnts.max)
    assert(r.getLong(4) == cnts((nk - 1) * 50 / 100))
    assert(r.getLong(5) == cnts((nk - 1) * 99 / 100))
    assert(r.getLong(6) == cnts.max * nk * 1000000L / cnts.sum)
  }

  test("url: every row reconstructs from its parsed components") {
    // NULL components would silently drop out of a =!= predicate — a
    // parser regression returning NULL everywhere must FAIL, not pass.
    // One aggregation pass yields both the row count and the violations.
    val violation =
      $"host".isNull || $"path".isNull || $"query".isNull || $"ref".isNull ||
      $"url" =!= concat(lit("https://"), $"host", $"path", lit("?"), $"query") ||
      !$"query".contains(concat(lit("ref="), $"ref"))
    val r = Relational.fnUrl(spark, sf)
      .agg(count(lit(1)).as("total"),
           sum(when(violation, 1L).otherwise(0L)).as("bad"))
      .head()
    assert(r.getLong(1) == 0 && r.getLong(0) > 0)
  }

  test("dup passages: per-doc duplicated-shingle counts match a local recomputation") {
    val rows = TextAnalysis.dupPassages(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val sh = Tables.documents(spark, sf)
      .select($"doc_id", explode(Dedup.wordShingles($"text", 8)).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val df = sh.groupBy(_._2).view.mapValues(_.size).toMap
    val expect = sh.groupBy(_._1).map { case (doc, ss) =>
      val nd = ss.count(p => df(p._2) >= 2).toLong
      doc -> (ss.size.toLong, nd, nd * 1000000L / ss.size)
    }
    assert(rows == expect)
    assert(rows.values.exists(_._2 > 0)) // fixture has duplicated passages
  }

  test("cms: probe estimates are invariant to how the build was partitioned") {
    val li = Tables.lineitem(spark, sf).select($"l_suppkey")
    def sketchOf(parts: Int): Array[Byte] = li.repartition(parts)
      .agg(expr("count_min_sketch(l_suppkey, CAST(0.001 AS DOUBLE), CAST(0.999 AS DOUBLE), 42)"))
      .head().getAs[Array[Byte]](0)
    def est(b: Array[Byte], k: Long) =
      org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(b)).estimateCount(k)
    val keys = li.distinct().collect().map(_.getLong(0))
    val (s1, s7) = (sketchOf(1), sketchOf(7))
    assert(keys.nonEmpty)
    for (k <- keys) assert(est(s1, k) == est(s7, k))
    // and the single-partition sketch (= plain sequential CMS) never undercounts
    val exact = li.groupBy($"l_suppkey").agg(count(lit(1)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (k <- keys) assert(est(s1, k) >= exact(k))
  }

  test("pq: a planted near-copy of a query is shortlisted by ADC and re-ranked to top-1") {
    val rnd = new scala.util.Random(77)
    val base = (0 until 60).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val planted = (100L, base(0)._2.map(x => x + 0.001f))
    val df = (base :+ planted).toDF("vec_id", "embedding")
    val top = SimSearch.pqTopKOf(df, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(top.count(_._1 == 0L) == 5)
    assert(top.exists(t => t._1 == 0L && t._2 == 100L && t._3 == 1L))
  }

  test("stream anomaly: incremental flags equal the batch prefix-window rule") {
    val streamed = graft.streaming.Streams.anomaly(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val batch = Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"ts",
        round($"value" * 100).cast("bigint").as("c"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sc", sum($"c").over(w))
      .withColumn("sc2", sum($"c" * $"c").over(w))
      .where($"n" >= 2 &&
        ($"n" * $"c" - $"sc") * ($"n" * $"c" - $"sc") >
          lit(9L) * ($"n" * $"sc2" - $"sc" * $"sc"))
      .select($"user_id", $"event_id", $"c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("dips: flagged local minima match a local recomputation") {
    val got = Relational.eventsDips(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", round($"value" * 100).cast("bigint").as("c"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getLong(3)))
    val expect = rows.groupBy(_._1).flatMap { case (u, es) =>
      val s = es.sortBy(e => (e._2, e._3)).map(_._4)
      val dips = (1 until s.length - 1)
        .filter(i => s(i - 1) > s(i) && s(i + 1) > s(i))
        .map(i => math.min(s(i - 1), s(i + 1)) - s(i))
      if (dips.isEmpty) None else Some(u -> (dips.size.toLong, dips.max))
    }
    assert(got == expect && got.nonEmpty)
  }

  test("hll intersect: inclusion-exclusion estimate is within the declared bound") {
    val r = Relational.aggHllIntersect(spark, sf).head()
    val e = Tables.events(spark, sf)
    val clicks = e.where($"event_type" === "click")
      .select($"user_id").collect().map(_.getLong(0)).toSet
    val buys = e.where($"event_type" === "purchase")
      .select($"user_id").collect().map(_.getLong(0)).toSet
    assert(r.getLong(0) == (clicks & buys).size.toLong)
    assert(r.getLong(1) == 1L)
  }

  test("bigram LM: one document's mean micro-nat score matches a local recomputation") {
    val got = TextAnalysis.bigramLm(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = Tables.documents(spark, sf).select($"doc_id", lower($"text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def bigramsOf(t: String) = {
      val tk = t.split(" ", -1).filter(_.nonEmpty)
      tk.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    }
    val all = docs.flatMap(d => bigramsOf(d._2))
    val cb = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cl = all.groupBy(_.split(" ")(0)).view.mapValues(_.size.toLong).toMap
    // V = vocabulary observed in bigram contexts (the operator's contract)
    val v = all.flatMap(_.split(" ")).distinct.size.toLong
    for ((docId, text) <- docs.take(25); bgs = bigramsOf(text); if bgs.nonEmpty) {
      val lis = bgs.map { bg =>
        val li = math.round(-math.log((cb(bg) + 1).toDouble /
          (cl(bg.split(" ")(0)) + v)) * 1e6)
        li
      }
      assert(got(docId) == (bgs.size.toLong, lis.sum / bgs.size))
    }
  }

  test("common neighbors: planted K4 yields full overlap on every edge") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L)).toDF("doc_a", "doc_b")
    val got = Dedup.commonNeighborsOf(edges)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    // every K4 edge: 2 common neighbors, |N(a) U N(b)| = 3+3-2 = 4
    for (e <- Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
      assert(got(e) == (2L, 2L * 1000000L / 4L))
    // path edges share nothing
    assert(got((5L, 6L)) == (0L, 0L) && got((6L, 7L)) == (0L, 0L))
  }

  test("nearest join: every purchase pairs with the true abs-distance minimum click") {
    val got = Relational.joinNearest(spark, sf)
      .collect().map { r =>
        (r.getLong(0), r.getLong(1)) ->
          (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3))))
      }.toMap
    val ev = Tables.events(spark, sf)
      .where($"event_type".isin("click", "purchase"))
      .select($"user_id", $"event_id", unix_micros($"ts"), $"event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val dayUs = 86400000000L
    val byUser = ev.groupBy(_._1)
    var matched = 0
    for ((u, rows) <- byUser; (_, pid, pts, _) <- rows.filter(_._4 == "purchase")) {
      val cands = rows.filter(_._4 == "click")
        .map(c => (c._2, c._3 - pts)) // (click_id, signed dt)
        .filter(c => math.abs(c._2) <= dayUs)
      val best =
        if (cands.isEmpty) None
        // min |dt|; ties prefer the earlier click (negative dt), then the
        // window's pick inside one side: latest before / earliest after
        else {
          val m = cands.map(c => math.abs(c._2)).min
          val tied = cands.filter(c => math.abs(c._2) == m)
          val before = tied.filter(_._2 <= 0)
          Some(if (before.nonEmpty) before.maxBy(c => (c._2, c._1))
               else tied.minBy(c => (c._2, c._1)))
        }
      assert(got((u, pid)) == best, s"user $u purchase $pid")
      if (best.nonEmpty) matched += 1
    }
    assert(matched > 0)
  }

  test("entropy: per-doc micro-nat entropy matches a local recomputation and its bounds") {
    val got = TextAnalysis.entropy(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sf).select($"doc_id", lower($"text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    for ((id, text) <- docs.take(25)) {
      val tks = text.split(" ", -1).filter(_.nonEmpty)
      if (tks.nonEmpty) {
        val n = tks.length.toLong
        val tf = tks.groupBy(identity).view.mapValues(_.size.toLong)
        val h = tf.values.map(f => math.round(f * math.log(n.toDouble / f) * 1e6)).sum / n
        assert(got(id) == (n, tf.size.toLong, h))
        assert(h >= 0 && h <= math.round(math.log(n.toDouble) * 1e6))
      }
    }
    assert(got.nonEmpty)
  }

  test("triangles: fixture graph agrees with the id-ordered join formulation") {
    val pairs = Dedup.minhashLshShared(spark, sf).select($"doc_a", $"doc_b")
    val got = Dedup.trianglesOf(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val e = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = e.flatMap(p => Set(p._1, p._2))
    val tris = for {
      (a, b) <- e.toSeq
      c <- nodes if b < c && e((b, c)) && e((a, c))
    } yield (a, b, c)
    val perNode = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = nodes.map { id =>
      (id, e.count(p => p._1 == id || p._2 == id).toLong, perNode.getOrElse(id, 0L))
    }
    assert(got == expected)
  }

  test("interval sweep equals the quadratic overlap join, interval by interval") {
    val got = Relational.joinInterval(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val rows = Tables.lineitem(spark, sf)
      .select($"l_partkey",
        datediff(to_date($"l_shipdate"), to_date(lit("1970-01-01"))).cast("long").as("d0"),
        (datediff(to_date($"l_shipdate"), to_date(lit("1970-01-01")))
          + lit(1) + pmod($"l_suppkey", lit(14))).cast("long").as("d1"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byPart = rows.groupBy(_._1)
    assert(got.keySet == byPart.keySet)
    for ((p, (np, mc, ni)) <- got) {
      val ivs = byPart(p)
      assert(ni == ivs.size.toLong, s"part $p interval count")
      val pairs = (for {
        i <- ivs.indices; j <- (i + 1) until ivs.size
        if ivs(i)._2 <= ivs(j)._3 && ivs(j)._2 <= ivs(i)._3
      } yield 1).size.toLong
      assert(np == pairs, s"part $p overlap pairs")
      // peak concurrency is attained at some interval's start day
      val peak = ivs.map(s => ivs.count(o => o._2 <= s._2 && o._3 >= s._2)).max.toLong
      assert(mc == peak, s"part $p peak concurrency")
    }
  }

  test("resample: OHLC bounds hold and events/volume are conserved") {
    val bars = Relational.tsResample(spark, sf).collect()
    assert(bars.nonEmpty)
    for (r <- bars) {
      val (n, o, h, l, c) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(n >= 1)
      assert(l <= o && o <= h, s"open outside [low, high]")
      assert(l <= c && c <= h, s"close outside [low, high]")
      if (n == 1) assert(o == c && o == h && o == l)
    }
    val totals = Tables.events(spark, sf)
      .agg(count(lit(1)), sum(round($"value" * 100).cast("bigint"))).head()
    assert(bars.map(_.getLong(2)).sum == totals.getLong(0))
    assert(bars.map(_.getLong(7)).sum == totals.getLong(1))
  }

  test("kcore: planted pendant chain peels away, the clique survives with in-core degrees") {
    import spark.implicits._
    // K4 on 1..4 plus a chain 4-10-11-12 hanging off vertex 4: the 2-core
    // is exactly the K4 (each chain round peels one pendant vertex), and
    // every in-core degree is 3
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 10L), (10L, 11L), (11L, 12L)).toDF("doc_a", "doc_b")
    val core = Dedup.kcoreOf(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kcore: the fixture peel reaches a true fixpoint (every core degree ≥ k)") {
    // if KcoreRounds were too few, some surviving vertex would still have
    // degree < k — the fixpoint condition IS min(core_deg) ≥ k
    val degs = Dedup.kcore(spark, sf).collect().map(_.getLong(1))
    assert(degs.forall(_ >= Dedup.KcoreK))
  }

  test("lpa: a bridge edge does NOT merge two planted cliques (where WCC would)") {
    import spark.implicits._
    // two K4s joined by the single edge 4–10: reachability says one
    // component, density says two communities — the bridge's one vote
    // loses to each clique's three
    val k4s = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L))
    val bridged = (k4s :+ (4L, 10L)).toDF("a", "b")
    val comm = Dedup.lpaOnUnd(Dedup.undirect(bridged))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comm == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
    val cc = Dedup.connectedComponents(bridged.select($"a", $"b"))
      .collect().map(_.getLong(1)).distinct
    assert(cc.length == 1, "WCC must see ONE component across the bridge")
  }

  test("lpa: planted structure converges inside the round budget; fixed rounds stay the contract") {
    import spark.implicits._
    // on the bridged K4s one extra round is a no-op — where real
    // community structure exists the budget suffices. (On the
    // near-uniform fixture 1-NN graph synchronous LPA 2-CYCLES —
    // Raghavan et al. §3's bipartite oscillation — which is why the
    // declared contract is a FIXED round count, never run-until-stable.)
    val k4s = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L))
    val und = Dedup.undirect((k4s :+ (4L, 10L)).toDF("a", "b"))
    def run(r: Int) = Dedup.lpaOnUnd(und, r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(run(Dedup.LpaRounds) == run(Dedup.LpaRounds + 1))
  }

  test("lpa: the fixture run replays the synchronous min-tie rule exactly (driver reference)") {
    import spark.implicits._
    val und = Dedup.undirect(graft.operators.SimSearch.knnGraphShared(spark, sf, k = 1)
      .select($"q_id".as("a"), $"n_id".as("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = und.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var lbl = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to Dedup.LpaRounds) {
      lbl = adj.map { case (v, ns) =>
        val cnt = ns.groupBy(lbl).map { case (l, g) => l -> g.length }
        v -> cnt.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val got = Dedup.labelPropagation(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == lbl)
  }

  test("modularity: the single-community partition scores exactly zero") {
    import spark.implicits._
    val und = Dedup.undirect(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L),
      (1L, 3L)).toDF("a", "b"))
    val one = und.select($"a".as("v")).distinct().select($"v", lit(0L).as("lbl"))
    val row = Dedup.modularityOnUnd(und, one).collect()
    assert(row.length == 1 && row.head.getLong(4) == 0L)
  }

  test("modularity: two disconnected K4s under their clique labels score 1/4 + 1/4") {
    import spark.implicits._
    val k4s = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L))
    val und = Dedup.undirect(k4s.toDF("a", "b"))
    // LPA itself recovers the cliques, and each contributes exactly
    // 12·10⁶÷24 − 12²·10⁶÷24² = 250000: the textbook Q = 1/2 split
    val rows = Dedup.modularityOnUnd(und, Dedup.lpaOnUnd(und))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(rows == Set((1L, 4L, 12L, 12L, 250000L), (10L, 4L, 12L, 12L, 250000L)))
  }

  test("spatial radius join: cell-boundary pairs survive the grid cover, just-outside pairs don't") {
    import spark.implicits._
    // (0,0)–(5000,0) sit in DIFFERENT lat cells at exactly d2 = R²
    // (boundary INCLUSIVE — only the neighbor probe can find them);
    // (2000,102000)–(-1500,98500) is an in-radius pair across a cell
    // CORNER (cells differ in BOTH axes → only the diagonal offset finds
    // it, d2 = 2·3500² = 24500000); (5001,300000)–(0,300000) is 1 µ°
    // outside R and must be confirmed away
    val pts = Seq(
      (1L, 0L, 0L),
      (2L, 5000L, 0L),                           // boundary: d2 = R²
      (3L, 5001L, 200000L),                      // isolated (far in lon)
      (4L, 2000L, 102000L), (5L, -1500L, 98500L), // diagonal corner pair
      (6L, 5001L, 300000L), (7L, 0L, 300000L)    // 1 µ° outside R
    ).toDF("pid", "lat", "lon")
    val got = Spatial.radiusJoinOf(pts).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 2L) -> 25000000L, (4L, 5L) -> 24500000L))
  }

  test("spatial radius join: fixture run equals the quadratic driver replay (cover losslessness)") {
    val pts = Spatial.stagedPoints(Tables.customer(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val r2 = Spatial.RadiusMicroDeg * Spatial.RadiusMicroDeg
    val want = (for {
      (a, la, lo) <- pts; (b, lb, lob) <- pts if a < b
      d2 = (la - lb) * (la - lb) + (lo - lob) * (lo - lob) if d2 <= r2
    } yield ((a, b), d2)).toMap
    val got = Spatial.radiusJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(want.nonEmpty && got == want)
  }

  test("spatial incremental probe equals the full join restricted to cross-bucket pairs") {
    import spark.implicits._
    val bkt = Spatial.stagedPoints(Tables.customer(spark, sf))
      .select($"pid", (Maintenance.md5Hex32Col($"pid") % 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // full run, reoriented: keep pairs with exactly one delta-era pid,
    // emit (base_id, delta_id, d2)
    val want = Spatial.radiusJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .flatMap { case (a, b, d2) =>
        (bkt(a) < 90, bkt(b) < 90) match {
          case (true, false) => Some(((a, b), d2))
          case (false, true) => Some(((b, a), d2))
          case _ => None
        }
      }.toMap
    val got = Spatial.radiusJoinIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(want.nonEmpty && got == want)
  }

  test("modularity: fixture contributions are bounded (each ≤ 10⁶, Σ ≤ 10⁶) and degrees conserve") {
    val rows = Dedup.modularity(spark, sf).collect()
    assert(rows.nonEmpty)
    val qs = rows.map(_.getLong(4))
    assert(qs.forall(_ <= 1000000L) && qs.sum <= 1000000L)
    // Σ deg_total = 2m = Σ intra2 + cross edges; Σ n_nodes = graph nodes
    val m2 = rows.map(_.getLong(3)).sum
    assert(rows.map(_.getLong(2)).sum <= m2)
    import spark.implicits._
    val nv = Dedup.undirect(graft.operators.SimSearch.knnGraphShared(spark, sf, k = 1)
      .select($"q_id".as("a"), $"n_id".as("b")))
      .select($"a").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nv)
  }

  test("weighted median: matches the brute-force definition in every priority group") {
    val got = Relational.aggWeightedMedian(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = Tables.orders(spark, sf)
      .select($"o_orderpriority",
        round($"o_totalprice" * 100).cast("bigint").as("cents"),
        (lit(1L) + pmod($"o_orderkey", lit(7L))).as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byPrio = rows.groupBy(_._1)
    assert(got.keySet == byPrio.keySet)
    for ((p, (med, totw)) <- got) {
      val vs = byPrio(p).map(t => (t._2, t._3)).sortBy(_._1)
      val tot = vs.map(_._2).sum
      assert(totw == tot, s"$p total weight")
      // lower weighted median: smallest v with weight-below-or-at(v) ≥ tot/2
      val expect = vs.find { case (v, _) =>
        2 * vs.takeWhile(_._1 <= v).map(_._2).sum >= tot }.get._1
      assert(med == expect, s"$p weighted median")
    }
  }

  test("listagg: equals the sorted collect_list reconstruction per nation") {
    val got = Relational.aggListagg(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val recon = Tables.customer(spark, sf).where($"c_acctbal" > 9000)
      .groupBy($"c_nationkey".cast("long").as("nk"))
      .agg(count(lit(1)).as("n"),
        array_join(sort_array(collect_list($"c_name")), ",").as("csv"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got.nonEmpty && got == recon)
  }

  test("recursive CTE: ancestor count and root replay the digit-chain arithmetic") {
    val got = Sql.sqlRecursive(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val keys = Tables.supplier(spark, sf).select($"s_suppkey".cast("long"))
      .collect().map(_.getLong(0))
    assert(got.keySet == keys.toSet)
    def anc(v: Long): Seq[Long] = if (v < 10) Seq(v) else v +: anc(v / 10)
    for (k <- keys) {
      assert(got(k)._1 == anc(k).size.toLong, s"supplier $k ancestor count")
      assert(got(k)._2 == anc(k).min, s"supplier $k root")
    }
  }

  test("containment: a planted sub-document scores full containment in its source only") {
    import spark.implicits._
    // doc 2 is the first six words of doc 1 (4 word-3 shingles, all ⊂ doc 1's
    // 8); doc 3 shares nothing. Expected: one row (1, 2) with
    // cont(1→2) = 4/8 and cont(2→1) = 4/4
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w1 w2 w3 w4 w5 w6"),
      (3L, "x1 x2 x3 x4 x5 x6")).toDF("doc_id", "text")
    val rows = Dedup.containmentOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, 2L, 500000L, 1000000L)))
  }

  test("range search: scores agree with an independent HOF cosine and clear the radius") {
    val rows = SimSearch.rangeSearch(spark, sf)
    val cnt = rows.count()
    assert(cnt > 0)
    // recompute cosine via zip_with/aggregate (independent of the codegen
    // kernel) and require agreement to 1e-9
    val e = Tables.embeddings(spark, sf)
    val recheck = rows
      .join(e.select($"vec_id".as("q_id"), $"embedding".as("qe")), "q_id")
      .join(e.select($"vec_id".as("n_id"), $"embedding".as("ne")), "n_id")
      .select($"cos",
        (aggregate(zip_with($"qe", $"ne", (a, b) => a.cast("double") * b.cast("double")),
          lit(0.0), (acc, x) => acc + x) /
         sqrt(aggregate($"qe", lit(0.0), (a, x) => a + x.cast("double") * x.cast("double"))) /
         sqrt(aggregate($"ne", lit(0.0), (a, x) => a + x.cast("double") * x.cast("double"))))
          .as("cos2"))
    val bad = recheck.where(abs($"cos" - $"cos2") > 1e-9 || $"cos" < SimSearch.RangeTau).count()
    assert(bad == 0L)
  }

  test("variant: typed path extraction reproduces the staged fields on every row") {
    val bad = Relational.fnVariant(spark, sf)
      .join(Tables.documents(spark, sf), "doc_id")
      .where($"id_v" =!= $"doc_id" || $"lang_v" =!= $"lang" ||
             $"n_v" =!= $"n_chars" || $"tag0" =!= $"source" ||
             $"tag1" =!= concat(lit("t"), pmod($"doc_id", lit(5L)).cast("string")) ||
             $"missing_v".isNotNull)
      .count()
    assert(bad == 0L)
  }

  test("struct: the withField/dropFields chain reproduces the direct flat computation") {
    val direct = Tables.orders(spark, sf).select(
      $"o_orderkey",
      round($"o_totalprice" * 100).cast("bigint").as("price_c"),
      pmod($"o_custkey", lit(7L)).as("bucket"),
      $"o_orderstatus".as("st"),
      ($"o_orderpriority" === "1-URGENT").as("urgent"))
    assert(Relational.fnStruct(spark, sf).exceptAll(direct).isEmpty)
    assert(direct.exceptAll(Relational.fnStruct(spark, sf)).isEmpty)
  }

  test("ewma: every row replays the truncated dyadic smoother exactly") {
    val got = Relational.tsEwma(spark, sf)
      .collect().map(r => (r.getLong(2), (r.getLong(4), r.getLong(5)))).toMap
    val rows = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id",
        round($"value" * 100).cast("bigint").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
    assert(got.size == rows.length)
    for ((_, series) <- rows.groupBy(_._1)) {
      val ordered = series.sortBy(t => (t._2.getTime, t._3)).map(t => (t._3, t._4))
      for (i <- ordered.indices) {
        val hist = ordered.slice(math.max(0, i - Relational.EwmaFrame + 1), i + 1)
        val num = hist.zipWithIndex.map { case ((_, c), j) => c * (1L << j) }.sum
        val den = (1L << hist.size) - 1
        assert(got(ordered(i)._1) == (hist.size.toLong, 1000 * num / den),
          s"event ${ordered(i)._1}")
      }
    }
  }

  test("bm25: ranking replays the exact-rational formula from raw tokens") {
    val got = TextAnalysis.bm25(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
      .collect().map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty).toSeq).toMap
    val tf = docs.toSeq.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, o) => (id, t, o.size.toLong) } }
    val dl = tf.groupBy(_._1).map { case (id, xs) => id -> xs.map(_._3).sum }
    val (n, t) = (dl.size.toLong, dl.values.sum)
    val byTok = tf.groupBy(_._2)
    val qterms = byTok.toSeq
      .map { case (tok, xs) => (tok, xs.map(_._3).sum, xs.size.toLong) }
      .sortBy { case (tok, ctot, _) => (-ctot, tok) }.take(TextAnalysis.Bm25QTerms)
    val scored = qterms.flatMap { case (tok, _, df) =>
      val idf = math.round(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * 1e6)
      byTok(tok).map { case (id, _, f) =>
        id -> idf * f * 22 * t / (10 * f * t + 3 * t + 9 * dl(id) * n) }
    }.groupBy(_._1).map { case (id, xs) => (id, xs.size.toLong, xs.map(_._2).sum) }
    val expect = scored.toSeq.sortBy { case (id, _, sc) => (-sc, id) }
      .take(TextAnalysis.Bm25TopDocs).zipWithIndex
      .map { case ((id, nq, sc), i) => (id, nq, sc, i + 1L) }
    assert(got.toSeq == expect)
  }

  test("rrf: fused scores decompose into legal reciprocal-rank contributions") {
    val legal = (1 to SimSearch.RrfTopK)
      .map(r => 1000000L / (SimSearch.RrfConst + r)).toSet
    val sums = (legal.map(Seq(_, 0L)) ++
      (for (a <- legal; b <- legal) yield Seq(a, b))).map(_.sum)
    val rows = SimSearch.rrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == SimSearch.NumQueries * SimSearch.RrfTopK)
    assert(rows.forall { case (_, _, s, _) => sums.contains(s) })
    // per query: ranks are exactly 1..k and scores non-increasing in rank
    for ((_, qs) <- rows.groupBy(_._1)) {
      val byRank = qs.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1L to SimSearch.RrfTopK.toLong))
      assert(byRank.sliding(2).forall(p => p.head._3 >= p.last._3))
    }
    // the vector list genuinely contributes: some fused row carries a
    // vector-side reciprocal (score includes a both-lists sum or the
    // vector-only path) — check against the materialized exact top-k
    val vec = SimSearch.bruteTopKShared(spark, sf, SimSearch.RrfTopK)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.exists { case (q, nid, _, _) => vec.contains((q, nid)) })
  }

  test("shortest paths: planted two-source chain relaxes to the true BFS layers") {
    import spark.implicits._
    // chain 10-11-12-13-20 with sources {10, 20} (≡0 mod 10), plus a
    // disconnected sourceless edge (5, 6) that must stay unreached
    val pairs = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 20L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.shortestPathsOf(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 0L, 20L -> 0L, 11L -> 1L, 13L -> 1L, 12L -> 2L))
  }

  test("shortest paths: the fixture walk converges inside the round budget") {
    // a vertex at distance BfsRounds would imply possibly-unfinished
    // layers beyond it; strictly smaller ⇒ the frontier exhausted early
    // and one extra round is a no-op
    val dists = Dedup.shortestPaths(spark, sf).collect().map(_.getLong(1))
    assert(dists.nonEmpty && dists.max < Dedup.BfsRounds)
  }

  test("quant pattern: a planted signup view+ purchase sequence matches with the right measures") {
    import java.sql.Timestamp
    def t(i: Int) = new Timestamp(1700000000000L + i * 60000L)
    // u1: signup [view view] purchase → 1 match, B+ len 2;
    //     then signup [view] purchase → 2nd match, B+ len 1
    // u2: signup purchase (no view run between) → no match
    // u3: view purchase signup → no match
    val events = Seq(
      (1L, t(0), 10L, "signup"), (1L, t(1), 11L, "view"), (1L, t(2), 12L, "view"),
      (1L, t(3), 13L, "purchase"), (1L, t(4), 14L, "signup"), (1L, t(5), 15L, "view"),
      (1L, t(6), 16L, "purchase"),
      (2L, t(0), 20L, "signup"), (2L, t(1), 21L, "purchase"),
      (3L, t(0), 30L, "view"), (3L, t(1), 31L, "purchase"), (3L, t(2), 32L, "signup"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Relational.eventsQuantPatternOf(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(1L -> ((2L, 3L, 2L)))) // 2 matches, Σb_len 3, max b_len 2
  }

  test("quant pattern: fixture measures are internally consistent") {
    val rows = Relational.eventsQuantPattern(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, total, mx) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n >= 1 && mx >= 1 && mx <= total && total >= n && total <= n * mx)
    }
  }

  test("rolling: every 7-day frame sum matches a driver-side two-pointer replay") {
    val rows = Relational.tsRolling(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val week = 7L * 86400000000L
    for ((u, rs) <- rows.groupBy(_._1); (_, _, ts, _, roll, n) <- rs) {
      val in = rs.filter(x => x._3 >= ts - week && x._3 <= ts)
      assert(n == in.length && roll == in.map(_._4).sum)
    }
  }

  test("rfm: quintiles balanced to ±1 and totals conserved") {
    val rows = Relational.eventsRfm(spark, sf).collect()
    val purchases = Tables.events(spark, sf).where($"event_type" === "purchase")
      .agg(count(lit(1)), sum(round($"value" * 100).cast("bigint"))).head()
    assert(rows.map(_.getLong(2)).sum == purchases.getLong(0))
    assert(rows.map(_.getLong(3)).sum == purchases.getLong(1))
    val nUsers = rows.length
    for (col <- Seq(4, 5, 6)) {
      val byQ = rows.groupBy(_.getLong(col)).view.mapValues(_.length)
      assert(byQ.keySet.subsetOf(Set(1L, 2L, 3L, 4L, 5L)))
      // ntile: bucket sizes differ by at most 1
      assert(byQ.values.max - byQ.values.min <= 1)
      assert(byQ.values.sum == nUsers)
    }
  }

  test("bitmap: the merged-bitmap distinct count equals Spark's count_distinct") {
    val bm = Relational.aggBitmap(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, sf)
      .groupBy($"o_orderpriority")
      .agg(count_distinct($"o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bm.nonEmpty && bm == exact)
  }

  test("pattern: flags and digest match a driver-side sequence replay") {
    val got = Relational.eventsPattern(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getString(5))).toMap
    val seqs = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime, r.getLong(2), r.getString(3))))
      .groupBy(_._1)
      .map { case (u, rows) =>
        u -> rows.map(_._2).sortBy(t => (t._1, t._2, t._3)).map(_._3).mkString(" ")
      }
    assert(seqs.nonEmpty && got.keySet == seqs.keySet)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    for ((u, seq) <- seqs) {
      val (n, direct, viaView, signupFirst, sha) = got(u)
      assert(n == seq.split(" ").length)
      assert(direct == "click purchase".r.findFirstIn(seq).isDefined)
      assert(viaView == "view( [a-z]+)* purchase".r.findFirstIn(seq).isDefined)
      assert(signupFirst == seq.startsWith("signup"))
      assert(sha == md.digest(seq.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }
  }

  test("ab: arm sums, lift, and micro-scaled Welch t match a driver-side replay") {
    val r = Relational.eventsAb(spark, sf).head()
    val purchases = Tables.events(spark, sf)
      .where($"event_type" === "purchase")
      .select($"user_id", round($"value" * 100).cast("bigint").as("c"))
      .collect().map(x => (x.getLong(0) % 2, x.getLong(1)))
    val Seq((n0, s0, s20), (n1, s1, s21)) = Seq(0L, 1L).map { arm =>
      val cs = purchases.filter(_._1 == arm).map(_._2)
      (cs.length.toLong, cs.sum, cs.map(c => c * c).sum)
    }
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((n0, s0, s20)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == ((n1, s1, s21)))
    assert(r.getLong(6) == 1000 * s1 / n1 - 1000 * s0 / n0)
    val t = (s1.toDouble / n1 - s0.toDouble / n0) /
      math.sqrt((s21 - s1.toDouble * s1 / n1) / (n1 - 1).toDouble / n1
        + (s20 - s0.toDouble * s0 / n0) / (n0 - 1).toDouble / n0)
    assert(r.getLong(7) == math.floor(t * 1e6).toLong)
  }

  test("lambda: every higher-order result matches its closed form over a = 1..m") {
    // a = sequence(1, m) with m = 1 + (orderkey + linenumber) mod 6, so
    // each HOF has an exact closed form: Σa = m(m+1)/2, Σa² = m(m+1)(2m+1)/6,
    // palindot = Σ i·(m+1−i) = (m+1)·Σa − Σa².
    // (l_orderkey, l_linenumber) is NOT unique in the fixture, so the
    // law is a multiset compare: rebuild every output column from the
    // closed forms (no higher-order function anywhere) and exceptAll.
    val got = Relational.fnLambda(spark, sf)
    val expected = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_linenumber",
        (lit(1L) + pmod($"l_orderkey" + $"l_linenumber", lit(6L))).as("m"),
        round($"l_quantity").cast("bigint").as("q"))
      .select($"l_orderkey", $"l_linenumber",
        $"m".as("n"),
        ($"q" * $"m" * ($"m" + 1) / 2).cast("long").as("wsum"),
        ($"m" / 2).cast("long").as("n_even"),
        ($"m" * $"q" > 40).as("any_big"), // max element is m
        ($"m" <= 7).as("all_small"),
        (($"m" + 1) * ($"m" * ($"m" + 1) / 2)
          - $"m" * ($"m" + 1) * ($"m" * 2 + 1) / 6).cast("long").as("palindot"))
    assert(got.count() > 0)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("cohort LTV: revenue conserved, cumulative replays, per-user division exact") {
    val rows = Relational.eventsCohortLtv(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // conservation: the grid's revenue sums to the corpus purchase total
    val total = Tables.events(spark, sf).where($"event_type" === "purchase")
      .agg(sum(round($"value" * 100).cast("bigint"))).head().getLong(0)
    assert(rows.map(_._3).sum == total)
    // cohort sizes: check against an independently computed cohort-size
    // map (min event week per user) — only cohorts present in the LTV grid
    // appear there (a purchase-free cohort week legitimately has no rows),
    // so assert per-cohort equality plus the grid total never exceeding
    // the user population
    val nUsers = Tables.events(spark, sf).select($"user_id").distinct().count()
    val cohortSizes = Tables.events(spark, sf)
      .groupBy($"user_id").agg(min(date_trunc("week", $"ts")).as("w"))
      .groupBy($"w").count().collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    val gridSizes = rows.groupBy(_._1).view.mapValues(_.head._4)
    for ((cw, users) <- gridSizes) assert(users == cohortSizes(cw))
    assert(gridSizes.values.sum <= nUsers)
    for ((_, grid) <- rows.groupBy(_._1)) {
      var cum = 0L
      for ((_, _, rev, users, cumGot, perUser) <- grid.sortBy(_._2)) {
        cum += rev
        assert(cumGot == cum && perUser == Math.floorDiv(cum, users))
      }
    }
  }

  test("skyline: exactly the non-dominated users of the per-user aggregate") {
    val per = Tables.events(spark, sf).where($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("f"), sum(round($"value" * 100).cast("bigint")).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = per.filter { case (_, f, m) =>
      !per.exists { case (_, f2, m2) =>
        f2 >= f && m2 >= m && (f2 > f || m2 > m) }
    }.map(_._1).toSet
    val got = Relational.eventsSkyline(spark, sf).collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got == want)
  }

  test("markov: transitions replay driver-side and rows/ppm are exact") {
    // replay orders by the full microsecond timestamp (unix_micros), not
    // Timestamp.getTime's milliseconds — matching the operator's
    // (ts, event_id) order exactly even for same-millisecond events
    val events = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts"), $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val bigrams = events.groupBy(_._1).values.flatMap { es =>
      val types = es.sortBy(e => (e._2, e._3)).map(_._4)
      types.zip(types.drop(1))
    }.toSeq
    val want = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val denoms = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = Relational.eventsMarkov(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == want.keySet)
    for ((k, (n, ppm)) <- got) {
      assert(n == want(k))
      assert(ppm == Math.floorDiv(n * 1000000L, denoms(k._1)))
    }
    // conservation: per-user transition count is (events − 1)
    assert(got.values.map(_._1).sum ==
      events.length - events.map(_._1).distinct.length)
  }

  test("fuzzy join: one row per probe, the brute-force spec minimum") {
    val parts = Tables.part(spark, sf)
      .select($"p_partkey", $"p_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // the SPEC: minimum over ALL parts within dist ≤ K — no blocking in
    // the expectation, so the prefix filter is checked against the
    // definition (same philosophy as the operator's oracle SQL)
    val want = parts.filter(_._1 % 37 == 0).map { case (k, name) =>
      val probe = name.take(1) + name.drop(2)
      val cands = parts
        .filter(c => math.abs(probe.length - c._2.length) <= 2)
        .map(c => (lev(probe, c._2).toLong, c._1))
        .filter(_._1 <= Relational.FuzzyEditK)
      k -> cands.min
    }.toMap
    val got = Relational.joinFuzzyEditdist(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(2))).toMap
    assert(got.nonEmpty && got == want)
    // the typo model drops one char, so the true part is always within 1
    assert(got.values.forall(_._1 <= 1))
  }

  test("boolean aggregates: implications and per-group replay") {
    val rows = Relational.aggBool(spark, sf).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val sizes = Tables.lineitem(spark, sf).groupBy($"l_returnflag").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    for ((flag, allPos, someDisc, taxCap, nTaxFree, nHeavy) <- rows) {
      // counters are bounded by the group size; count_if(pred) > 0 and
      // bool_or(pred) must agree when the predicates coincide in truth
      assert(nTaxFree >= 0 && nTaxFree <= sizes(flag))
      assert(nHeavy >= 0 && nHeavy <= sizes(flag))
      assert(allPos, s"fixture quantities are positive; group $flag")
      // replay one group driver-side
      val g = Tables.lineitem(spark, sf).where($"l_returnflag" === flag)
        .select($"l_quantity", $"l_discount", $"l_tax").collect()
        .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
      assert(someDisc == g.exists(_._2 > 0.05))
      assert(taxCap == g.forall(_._3 <= 0.08))
      assert(nTaxFree == g.count(_._3 == 0.0))
      assert(nHeavy == g.count(_._1 >= 25.0))
    }
  }

  test("deletion-neighborhood blocking: recall 1.0 for ANY single edit (property)") {
    // the kernel's claim is ed(a,b) ≤ 1 ⟹ D(a) ∩ D(b) ≠ ∅ for every
    // edit kind, not just the fixture's drop-2nd-char model — checked
    // driver-side against the same variant construction the operator
    // uses (string-level; the xxhash64 keying can only merge variants)
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    import org.scalatest.prop.Configuration
    def variants(s: String): Set[String] =
      Set(s) ++ (0 until s.length).map(i => s.substring(0, i) + s.substring(i + 1))
    val alpha = Gen.alphaLowerChar
    val word = Gen.chooseNum(1, 12).flatMap(n => Gen.stringOfN(n, alpha))
    val edited = for {
      s <- word
      kind <- Gen.oneOf("del", "ins", "sub")
      i <- Gen.chooseNum(0, math.max(0, s.length - 1))
      c <- alpha
    } yield (s, kind match {
      case "del" => s.substring(0, i) + s.substring(i + 1)
      case "ins" => s.substring(0, i) + c + s.substring(i)
      case "sub" => s.substring(0, i) + c + s.substring(i + 1)
    })
    val prop: Prop = forAll(edited) { case (a, b) =>
      variants(a).intersect(variants(b)).nonEmpty
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(result.passed, result.status.toString)
  }

  test("fuzzy join candidates: recall 1.0 under the typo model") {
    // every probe's TRUE part (edit distance exactly 1 — the dropped
    // character) must survive the deletion-neighborhood blocking; a
    // lossy block key fails here before it can corrupt the join result
    val (probes, cands) = Relational.fuzzyFrames(spark, sf)
    val got = Relational.fuzzyCandidates(probes, cands)
      .select($"probe_key", $"cand_key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val probeKeys = probes.select($"probe_key").collect().map(_.getLong(0))
    assert(probeKeys.nonEmpty)
    val missing = probeKeys.filterNot(k => got.contains((k, k)))
    assert(missing.isEmpty, s"true pairs lost by the prefix filter: ${missing.take(5).mkString(",")}")
  }
}
