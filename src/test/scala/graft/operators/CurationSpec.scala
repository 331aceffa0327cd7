package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge-case/invariant tests for the round-3 curation operators (the
  * oracle hash-checks the fixture behavior; these pin the contracts the
  * fixture can't reach). */
class CurationSpec extends SparkSpec {

  test("ip blocklist: planted user ids land in each CIDR class, clean ids pass") {
    import spark.implicits._
    // derived from the octet arithmetic (o1 = uid%223+1, o2 = 7·uid%256):
    //   16 → 17.x.x.x    (17.0.0.0/8)
    //   49 → 50.x.x.x    (50.0.0.0/8)
    //   1882 → 99.118.x.x  (99.112.0.0/12: top-12 bits 99·16+7)
    //   18182 → 120.42.x.x (120.42.0.0/16)
    //   5 → 6.35.x.x     (no match — clean)
    val ev = Seq(16L, 49L, 1882L, 18182L, 5L)
      .map(u => ("click", u)).toDF("event_type", "user_id")
    val flags = Curation.ipFlagsOf(ev).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(flags == Map(16L -> 1L, 49L -> 1L, 1882L -> 1L,
      18182L -> 1L, 5L -> 0L), flags.toString)
    // aggregate view: 5 events, 4 blocked, 4 distinct users blocked
    val agg = Curation.ipBlocklistOf(ev).collect().head
    assert((agg.getLong(1), agg.getLong(2), agg.getLong(3), agg.getLong(4))
      == ((5L, 4L, 4L, 1L)))
  }

  test("repetition: single-token and fully-repeated docs hit the bounds") {
    import spark.implicits._
    val docs = Seq(
      (1L, "word"),                       // 1 token: no bigrams
      (2L, "a a a a a a a a"),            // degenerate: all one token
      (3L, "one two three four five six") // all-distinct
    ).toDF("doc_id", "text")
    // drives the PRODUCTION code path (repetitionOf), not a copy of it
    val out = TextAnalysis.repetitionOf(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) === ((1L, 0.0, 1.0)))          // no bigrams, trivially top-heavy
    assert(out(2L)._2 > 0.85 && out(2L)._3 === 1.0) // "a a": 7 bigrams, 1 distinct
    assert(out(3L)._2 === 0.0 && out(3L)._3 < 0.2)  // no repetition at all
  }

  test("sequence packing: bins are contiguous and cuts respect the budget") {
    val packed = TextAnalysis.sequencePack(spark, sf, budget = 512).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3))) // shard, doc, toks, bin
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      // bin ids are non-decreasing along doc order and start at 0
      assert(ordered.head._4 === 0L)
      ordered.sliding(2).foreach { case Array((_, _, _, b1), (_, _, _, b2)) =>
        assert(b2 >= b1)
      }
      // a doc STARTS in bin floor(prefix/budget): prefix tokens before it
      var cum = 0L
      ordered.foreach { case (_, _, toks, bin) =>
        assert(bin === cum / 512, s"cum=$cum bin=$bin")
        cum += toks
      }
    }
  }

  test("hash split: partitions the corpus and is ingestion-order stable") {
    val out = Maintenance.hashSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(out.values.sum === total, s"splits must partition: $out")
    assert(out.keySet === Set("train", "val", "test"))
    // ~90/5/5: loose binomial bounds at sf0.001 (500 docs)
    assert(out("train").toDouble / total > 0.8 && out("train").toDouble / total < 0.97, out.toString)
  }

  test("group sample: exactly min(k, |group|) per group, repartition-stable") {
    val docs = graft.core.Tables.documents(spark, sf)
    val got = Maintenance.groupSampleOf(docs, 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perGroup = got.groupBy(_._1).view.mapValues(_.size).toMap
    sizes.foreach { case (src, n) =>
      assert(perGroup.getOrElse(src, 0) === math.min(3L, n), s"group $src")
    }
    // content-addressed: the same set regardless of physical layout
    val reshuffled = Maintenance.groupSampleOf(docs.repartition(7), 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(reshuffled === got)
  }

  test("contamination flags a planted exact duplicate of an eval doc at rate 1.0") {
    // doc 9991 duplicates eval doc 1's text verbatim; doc 9992 is clean
    import spark.implicits._
    val evalText = graft.core.Tables.documents(spark, sf)
      .where(col("doc_id") === 1L).select("text").head().getString(0)
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
      .unionByName(Seq((9991L, evalText),
        (9992L, "totally novel words nowhere else written ever once more")).toDF("doc_id", "text"))
    // same pipeline as the declared query, over the augmented frame
    val grams = docs.select($"doc_id", explode(Dedup.wordShingles($"text", 5)).as("g"))
    val ev = grams.where($"doc_id" < Curation.EvalDocs).select("g").distinct()
    val out = grams.where($"doc_id" >= Curation.EvalDocs)
      .join(broadcast(ev.withColumn("hit", lit(1L))), Seq("g"), "left")
      .groupBy($"doc_id")
      .agg(sum(coalesce($"hit", lit(0L))).as("ns"), count(lit(1)).as("ng"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(9991L)._1 === out(9991L)._2, "verbatim dup must be fully contained")
    assert(out(9992L)._1 === 0L, "novel text must not be flagged")
  }

  test("pii scrub leaves no unredacted email/ip/phone behind") {
    val scrubbed = Curation.piiScrub(spark, sf)
    val leftover = scrubbed.where(
      col("scrubbed").rlike(Curation.EmailRe) ||
      col("scrubbed").rlike(Curation.Ipv4Re) ||
      col("scrubbed").rlike(Curation.PhoneRe)).count()
    assert(leftover === 0L)
    assert(scrubbed.where(col("scrubbed").contains("<EMAIL>") &&
      col("scrubbed").contains("<IP>") &&
      col("scrubbed").contains("<PHONE>")).count() === scrubbed.count())
  }

  test("mix plan: weights sum to ~1 and targets never exceed the budget") {
    val plan = Curation.mixPlan(spark, sf, budget = 1000L).collect()
    // weight_ppm is integer parts-per-million; floor-div leaks < 1 ppm/source
    val wSum = plan.map(_.getLong(2)).sum
    assert(wSum > 1000000L - plan.length && wSum <= 1000000L, s"ppm sum $wSum")
    assert(plan.map(_.getLong(3)).sum <= 1000L, "floor() keeps targets under budget")
    // alpha=0.5 up-weights small sources: weight/count must be decreasing in count
    val byN = plan.map(r => r.getLong(1).toDouble -> r.getLong(2).toDouble).sortBy(_._1)
    byN.sliding(2).foreach { case Array((n1, w1), (n2, w2)) =>
      if (n2 > n1) assert(w2 / n2 < w1 / n1, "temperature must flatten the mix")
      case _ => ()
    }
  }

  test("filter funnel agrees with the standalone quality keep flag on length+stopword") {
    import spark.implicits._
    val funnel = Curation.filterFunnel(spark, sf).select($"doc_id", $"reason")
    val q = TextAnalysis.quality(spark, sf).select($"doc_id", $"keep".as("q_keep"))
    // quality's keep = NOT(too_short) AND NOT(low_stopword); the funnel's
    // first two rules are exactly those signals, so: q_keep=false ⟺
    // funnel reason ∈ {too_short, low_stopword}
    val disagree = funnel.join(q, "doc_id")
      .where(($"q_keep" && $"reason".isin("too_short", "low_stopword")) ||
             (!$"q_keep" && !$"reason".isin("too_short", "low_stopword")))
      .count()
    assert(disagree === 0L)
  }

  test("orc roundtrip preserves the supplier table bit-exactly") {
    val back = graft.sources.Sources.orcRoundtrip(spark, sf)
    val orig = graft.core.Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("xml roundtrip preserves the part table bit-exactly") {
    val back = graft.sources.Sources.xmlRoundtrip(spark, sf)
    val orig = graft.core.Tables.part(spark, sf)
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("binary files round-trip every document's bytes (size + sha both match)") {
    import spark.implicits._
    val back = graft.sources.Sources.binaryFiles(spark, sf)
    val orig = graft.core.Tables.documents(spark, sf)
      .select($"doc_id",
        length(encode($"text", "UTF-8")).cast("long").as("length"),
        sha2(encode($"text", "UTF-8"), 256).as("sha"))
    assert(back.count() == orig.count()) // one blob per document, all re-listed
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("bloom blocklist never misses a planted duplicate (no false negatives)") {
    import spark.implicits._
    // plant exact copies of blocklist docs under fresh ids that are NOT
    // themselves on the blocklist (offset ≡ 1 mod 10): each copy is a
    // non-blocklist doc whose text IS blocklisted — it must bloom-hit
    // (the structural no-false-negative guarantee, here end-to-end)
    val docs = graft.core.Tables.documents(spark, sf).select($"doc_id", $"text")
    val planted = docs.where(pmod($"doc_id", lit(10L)) === 0)
      .select(($"doc_id" + 1000001L).as("doc_id"), $"text")
    val n = docs.count(); val np = planted.count()
    val out = Curation.blocklistBloomOf(docs.union(planted)).head()
    assert(out.getAs[Long]("n_docs") === n + np)
    assert(out.getAs[Long]("n_members") === 2 * np) // originals + copies
    assert(out.getAs[Long]("no_false_neg_ok") === 1L)
    assert(out.getAs[Long]("fp_ok") === 1L)
  }
}
