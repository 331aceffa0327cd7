package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge-case/invariant tests for the round-3 curation operators (the
  * oracle hash-checks the fixture behavior; these pin the contracts the
  * fixture can't reach). */
class CurationSpec extends SparkSpec {

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

  test("orc roundtrip preserves the supplier table bit-exactly") {
    val back = graft.sources.Sources.orcRoundtrip(spark, sf)
    val orig = graft.core.Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }
}
