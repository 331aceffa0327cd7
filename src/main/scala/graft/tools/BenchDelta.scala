package graft.tools

import scala.io.Source

/** Diff a Bench artifact against BASELINE.md's recorded per-query table
  * and print per-query ratios — the divergence triage the judge rebuilt by
  * hand in rounds 2 and 3.
  *
  * Round-7 hardening: the GATE is the MIN rep, not the median. Machine
  * contention only ever inflates a rep time, so a query whose fastest rep
  * is at baseline is at baseline — three consecutive driver-side bench
  * runs were contention-poisoned and false-flagged 4 → 13 → 30 queries by
  * median-of-3 (one contended rep out of three shifts the median), each
  * costing a judge adjudication. Median ratios are still printed alongside
  * as the reported number; only min-rep ratios count as flags.
  *
  * Round-10 hardening: the tool also ADJUDICATES RUN HEALTH from the
  * artifact's pass-order reps (and per-pass totals when present). Two
  * straight driver rounds were environmentally degraded with 100% of
  * queries monotone-increasing across identical interleaved passes — a
  * signature random contention cannot produce (P(strictly increasing) =
  * 1/6 per query under exchangeable noise, so ~17% expected, not 100%).
  * When well over half the queries are monotone-increasing the run is
  * labeled DEGRADED, the evidence is printed, and median-based ratios
  * are explicitly marked untrustworthy — min-rep remains the only gate
  * either way.
  *
  * Caveat on error runs: Bench's passes[].total sums every timing taken
  * in that pass, including timings of queries that error in a LATER
  * pass, while the per-query aggregates exclude errored queries
  * entirely — so on a run with errors the pass totals can exceed the
  * summed per-query reps. Pass totals are a health signal, not an
  * accounting identity; reconcile against per_query only on zero-error
  * runs.
  *
  * Usage: runMain graft.tools.BenchDelta [benchJson] [baselineMd]
  * (defaults: bench_out.json, BASELINE.md). Exit code 0 always — this is
  * a diagnostic, not a gate; the 2x regression gate is the driver's.
  */
object BenchDelta {
  def main(args: Array[String]): Unit = {
    val benchPath = if (args.length > 0) args(0) else "bench_out.json"
    val basePath = if (args.length > 1) args(1) else "BASELINE.md"

    val benchText = {
      val src = Source.fromFile(benchPath, "UTF-8")
      try src.getLines().mkString("\n") finally src.close()
    }
    def mapOf(key: String): Map[String, Double] =
      (s""""$key"\\s*:\\s*\\{([^}]*)\\}""").r
        .findFirstMatchIn(benchText)
        .map(_.group(1))
        .map { body =>
          """"([A-Za-z0-9_]+)"\s*:\s*(-?[0-9.]+)""".r
            .findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }.getOrElse(Map.empty)
    // run-health: fraction of queries whose pass-order reps strictly
    // increase (requires a round-10+ artifact where reps are pass-order)
    val repsRe = """"([A-Za-z0-9_]+)"\s*:\s*\{"median":[^}]*"reps":\[([0-9.,]+)\]""".r
    val repSeqs = repsRe.findAllMatchIn(benchText)
      .map(m => m.group(1) -> m.group(2).split(",").map(_.toDouble).toSeq)
      .toMap
    val multi = repSeqs.filter(_._2.size >= 3)
    val monotone = multi.count { case (_, ts) =>
      ts.sliding(2).forall { case Seq(a, b) => b > a; case _ => true } }
    val passTotals = """"passes"\s*:\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(benchText).map(_.group(1)).toSeq
      .flatMap(b => """"total":(-?[0-9.]+)""".r.findAllMatchIn(b).map(_.group(1).toDouble))
    val degraded = multi.nonEmpty && monotone.toDouble / multi.size > 0.5
    if (multi.nonEmpty) {
      val pct = 100.0 * monotone / multi.size
      val label = if (degraded) "DEGRADED" else "healthy"
      println(f"run health: $label — $monotone/${multi.size} queries ($pct%.0f%%) monotone-increasing across passes" +
        (if (passTotals.nonEmpty) s"; pass totals ${passTotals.map(t => f"$t%.1f").mkString(" -> ")} s" else ""))
      if (degraded)
        println("  (environmental degradation signature: median ratios below are " +
          "UNTRUSTWORTHY; only min-rep ratios are meaningful on this run)")
    } else println("run health: unknown (no pass-order reps in artifact — pre-round-10 format)")

    // contention adjudication from DATA (round-13 artifacts carry
    // telemetry): per-rep loadavg at rep end per query, plus per-pass
    // process-CPU cores. loadavg is a ~1-min EWMA that INCLUDES this
    // process's own burn, so the external estimate compares the
    // pass-average loadavg against the pass-level sustained core burn
    // (cpu_sec/wall) — comparing against a short rep's instantaneous
    // cores would count the bench's own just-finished heavy queries as
    // "external" and false-label idle-machine passes CONTENDED.
    val telRe = ("""\"([A-Za-z0-9_]+)\"\s*:\s*\{\"median\":[^}]*""" +
      """\"cpu_cores\":\[(-?[0-9.,\-]+)\],\"load\":\[(-?[0-9.,\-]+)\]""").r
    val telSeqs = telRe.findAllMatchIn(benchText).map { m =>
      m.group(1) -> (m.group(2).split(",").map(_.toDouble).toSeq,
        m.group(3).split(",").map(_.toDouble).toSeq)
    }.toMap
    val telMulti = telSeqs.filter { case (_, (c, l)) =>
      c.nonEmpty && c.size == l.size && c.forall(_ >= 0) && l.forall(_ >= 0) }
    // per-pass sustained core burn + hypervisor steal from the passes
    // array. Two distinct contention signatures: external RUNNABLE
    // threads (loadavg >> own cores) and hypervisor STEAL (low loadavg,
    // low own cores, uniform slowdown — steal% is the only direct
    // witness; observed in round 13 as a 40%-slower run with clean
    // loadavg).
    val passCores = """"pass":(\d+)[^}]*"cpu_cores":(-?[0-9.]+)""".r
      .findAllMatchIn(benchText)
      .map(m => m.group(1).toInt -> m.group(2).toDouble).toMap
    val passSteal = """"pass":(\d+)[^}]*"steal_pct":(-?[0-9.]+)""".r
      .findAllMatchIn(benchText)
      .map(m => m.group(1).toInt -> m.group(2).toDouble).toMap
    // external-cores threshold scales to the RECORDING machine's core
    // count (host_cores, in round-14+ artifacts): ~4 external cores is
    // catastrophic on a 4-core box and noise on 64 — 12.5% of cores
    // (4 on the 32-core rig, preserving the historical gate there),
    // floored at 2 so tiny rigs still flag. Older artifacts without
    // host_cores fall back to the absolute 4.0. (ADVICE r14)
    val hostCores = """"host_cores":(\d+)""".r
      .findFirstMatchIn(benchText).map(_.group(1).toInt)
    val extGate = hostCores.map(c => math.max(2.0, 0.125 * c)).getOrElse(4.0)
    if (telMulti.nonEmpty) {
      val nPasses = telMulti.values.map(_._1.size).max
      for (p <- 0 until nPasses) {
        val loads = telMulti.values.toSeq.collect { case (c, l) if l.size > p => l(p) }
        val own = passCores.getOrElse(p + 1, -1.0)
        val steal = passSteal.getOrElse(p + 1, -1.0)
        val avgLoad = loads.sum / math.max(1, loads.size)
        val ext = if (own < 0) -1.0 else math.max(0.0, avgLoad - own)
        val lbl = if (ext > extGate || steal > 10.0) "CONTENDED"
          else if (ext < 0) "unknown" else "clean"
        val stealTxt = if (steal < 0) "" else f", steal $steal%.1f%%"
        // the 1-min loadavg EWMA lags ~1 min: pass 1 inherits whatever was
        // runnable BEFORE the run started, so its label can be stale high
        val ewmaTxt = if (p == 0) " [pass-1 caveat: 1-min EWMA may carry pre-run load]" else ""
        println(f"pass ${p + 1}: $lbl — avg loadavg $avgLoad%.1f vs own sustained $own%.1f cores => ~$ext%.1f external cores (gate $extGate%.1f)$stealTxt$ewmaTxt")
      }
      println("  (a >2x min-rep flag on a pass labeled CONTENDED above is " +
        "environmental unless it reproduces on a clean pass)")
    } else println("contention telemetry: absent (pre-round-13 artifact)")

    val med = mapOf("queries")
    // pre-round-7 artifacts have no "min" map — fall back to medians so the
    // tool still reads historical bench_out.json files
    val minM = mapOf("min") match {
      case m if m.nonEmpty => m
      case _ => med
    }
    if (med.isEmpty) sys.error(s"no \"queries\" object in $benchPath")

    // BASELINE.md rows: | query | median sec | spread |
    val baseSrc = Source.fromFile(basePath, "UTF-8")
    val base = try {
      baseSrc.getLines().flatMap { l =>
        """\|\s*([a-z][A-Za-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|\s*[0-9.]+\s*\|""".r
          .findFirstMatchIn(l).map(m => m.group(1) -> m.group(2).toDouble)
      }.toMap
    } finally baseSrc.close()

    val rows = (med.keySet ++ base.keySet).toSeq.map { q =>
      (q, med.get(q), base.get(q))
    }
    val ratioed = rows.collect {
      case (q, Some(b), Some(r)) if b >= 0 && r > 0 =>
        val mRep = minM.getOrElse(q, b)
        (q, b, mRep, r, mRep / r, b / r)
    }.sortBy(-_._5)

    println(f"${"query"}%-28s ${"median"}%8s ${"min"}%8s ${"recorded"}%9s ${"minratio"}%9s ${"medratio"}%9s")
    ratioed.foreach { case (q, b, mRep, r, minRatio, medRatio) =>
      val flag = if (minRatio > 2.0) "  <-- >2x (min-rep)" else ""
      println(f"$q%-28s $b%8.3f $mRep%8.3f $r%9.3f $minRatio%8.2fx $medRatio%8.2fx$flag")
    }
    val over = ratioed.count(_._5 > 2.0)
    val overMed = ratioed.count(_._6 > 2.0)
    val benchTotal = ratioed.map(_._2).sum
    val minTotal = ratioed.map(_._3).sum
    val baseTotal = ratioed.map(_._4).sum
    println(f"%nshared queries: ${ratioed.size}; bench median total $benchTotal%.1f s / min total $minTotal%.1f s vs recorded $baseTotal%.1f s (med ${benchTotal / baseTotal}%.2fx, min ${minTotal / baseTotal}%.2fx)")
    println(s"flags: $over queries >2x by MIN rep (the gate); $overMed by median (contention-sensitive, reported only)")
    rows.collect { case (q, Some(_), None) => q } match {
      case Seq() => ()
      case added => println(s"not in baseline: ${added.sorted.mkString(", ")}")
    }
    rows.collect { case (q, None, Some(_)) => q } match {
      case Seq() => ()
      case gone => println(s"not in bench run: ${gone.sorted.mkString(", ")}")
    }
    rows.collect { case (q, Some(b), _) if b < 0 => q } match {
      case Seq() => ()
      case err => println(s"errored in bench run: ${err.sorted.mkString(", ")}")
    }
  }
}
