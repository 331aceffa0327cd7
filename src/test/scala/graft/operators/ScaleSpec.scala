package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Measured candidate-growth laws for the candidate-generating operators
  * — turning the "survives 100×" prose into measured curves (SCALE.md
  * § "Measured candidate growth").
  *
  * Why NOT a bare sub-quadratic exponent on the fixtures: the test corpora
  * plant duplication densities that stay CONSTANT as the corpus grows
  * (part has a fixed 64-name vocabulary — same-name pairs alone are 31 k
  * at sf0.01 and 3.1 M at sf0.1, exactly quadratic; documents plant
  * near-dup groups proportional to corpus size), so the TRUE output of a
  * similarity join on them grows ~quadratically by construction and any
  * lossless candidate set must too. A raw α < 2 assertion would either
  * flake or quietly test the fixture, not the blocking. What blocking
  * actually owes you at 100 TB, and what IS asserted here:
  *
  *  1. candidate overhead over the true output stays a bounded constant
  *     (lossless blockers: ngram prefix-filter, fuzzy deletion-
  *     neighborhood) — candidates track real duplication, never n²;
  *  2. a structural cap makes candidates LINEAR in corpus size by
  *     theorem (containment's df-cap: each capped shingle contributes
  *     ≤ cap−1 partners per occurrence) — asserted against the measured
  *     occurrence count at every SF;
  *  3. the tunable index knob does what its sizing story claims
  *     (LSH: +2 bucket bits ⇒ ~¼ the candidates on the SAME corpus —
  *     the n²/2^bits model that keeps per-bucket work flat when bits
  *     grow with log₂ n).
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("ngram prefix+positional filter: candidates stay within 4x of (verified pairs + corpus) at every SF") {
    // The bound's shape: verified-pair tracking plus a per-doc linear
    // allowance. sf0.1 measured 12,784 candidates / 256 verified / 5,000
    // docs — 2.4x headroom under the bound, and a REGRESSION in either
    // lossless filter trips it (without the round-7 PPJoin positional
    // filter the same corpus produced 43,543 candidates, >2x over).
    // The residual false candidates (J < 0.1 pairs sharing one rare
    // prefix shingle) are a fixed-vocabulary fixture artifact: shingle
    // df grows with corpus only because the generator's vocabulary does
    // not — see SCALE.md "Measured candidate growth" for why a bare
    // sub-quadratic exponent is not assertable on such a fixture and
    // what the 100 TB story actually rests on.
    sfs.foreach { d =>
      val docs = Tables.documents(spark, d)
      val n = docs.count()
      val c = Dedup.ngramCandidates(Dedup.ngramPrefixIndex(docs, 0.8), 0.8).count()
      val v = Dedup.ngramJaccardPairs(docs, 0.8).count()
      info(s"$d: n=$n candidates=$c verified=$v overhead=${if (v > 0) f"${c.toDouble / v}%.2f" else "-"}x")
      assert(c <= 4 * (v + n),
        s"$d: $c candidates vs $v verified pairs over $n docs — a lossless filter regressed")
    }
  }

  test("fuzzy deletion-neighborhood: candidates stay within 2x of true edit-distance matches (plus probe floor) at every SF") {
    sfs.foreach { d =>
      val (probes, cands) = Relational.fuzzyFrames(spark, d)
      val p = probes.count()
      val c = Relational.fuzzyCandidates(probes, cands)
      val cn = c.count()
      // recall-1.0 law (AnalyticsSpec ScalaCheck property) guarantees
      // candidates ⊇ true matches, so truth is countable from candidates
      val t = c.where(levenshtein($"probe_name", $"cand_name") <= Relational.FuzzyEditK).count()
      info(s"$d: probes=$p candidates=$cn true=$t overhead=${if (t > 0) f"${cn.toDouble / t}%.2f" else "-"}x")
      assert(cn <= 2 * t + p,
        s"$d: $cn candidates vs $t true matches — variant-hash blocking admitting unrelated names")
    }
  }

  test("containment df-cap: candidates obey the linear structural bound at every SF") {
    sfs.foreach { d =>
      val sh = Tables.documents(spark, d)
        .select($"doc_id", explode(Dedup.wordShingles($"text", 3)).as("s"))
      // the capped occurrence count: the bound's linear-in-corpus side
      val occ = sh.groupBy($"s").agg(count(lit(1)).as("df"))
        .where($"df" <= Dedup.ContainDfCap)
        .agg(coalesce(sum($"df"), lit(0L))).head().getLong(0)
      val c = Dedup.containmentCommonOf(sh).count()
      val bound = (Dedup.ContainDfCap - 1).toLong * occ / 2
      info(s"$d: cappedOccurrences=$occ candidates=$c bound=$bound headroom=${if (c > 0) f"${bound.toDouble / c}%.1f" else "-"}x")
      assert(c <= bound,
        s"$d: $c candidate pairs exceed the df-cap theorem bound $bound — cap not applied before the self-join")
    }
  }

  test("LSH kNN graph: +2 bucket bits cut candidates to ~1/4 on the same corpus (the bits-scaling knob)") {
    val d = sfs.last // largest corpus: the regime where the knob matters
    val e = Tables.embeddings(spark, d)
    def candsAt(bits: Int): Long = SimSearch.knnLshCandidatePairs(
      Dedup.lshBucketsWith(e, dim = 64, seed = 11L, Dedup.LshTables, bits), bits).count()
    val c8 = candsAt(8)
    val c10 = candsAt(10)
    info(s"$d: candidates bits=8: $c8, bits=10: $c10 (ratio ${f"${c10.toDouble / c8}%.2f"})")
    // model: pairs ∝ (1+bits)·n²/2^bits → expected ratio (11/9)/4 ≈ 0.31;
    // assert the knob delivers at least a halving (dedup across tables and
    // planted near-dups soften the ideal ratio)
    assert(c10 * 2 < c8,
      s"+2 bits only took candidates $c8 -> $c10 — bucket sizing knob not effective")
  }
}
