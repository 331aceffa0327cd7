package graft.operators

import graft.SparkSpec
import org.scalatest.prop.TableDrivenPropertyChecks
import scala.util.Random

/** Laws for the two-pass Misra-Gries heavy-hitter operator. The fixture
  * corpus has a near-uniform 31-token vocabulary, so the sketch's skew
  * behavior is pinned here on planted Zipf streams instead.
  */
class HeavyHitterSpec extends SparkSpec with TableDrivenPropertyChecks {
  import org.apache.spark.sql.functions._

  /** Synthetic corpus with a known Zipf-ish token distribution: token i
    * (of v) appears ~ n/(i+1) times, shuffled deterministically. */
  private def plantedDocs(n: Int, v: Int, seed: Int) = {
    val rnd = new Random(seed)
    val stream = rnd.shuffle(
      (0 until v).flatMap(i => Seq.fill(n / (i + 1))(s"w$i")).toVector)
    val docs = stream.grouped(20).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toSeq
    spark.createDataFrame(docs).toDF("doc_id", "text")
  }

  test("result equals the exact heavy-hitter set on a planted Zipf stream") {
    val docs = plantedDocs(2000, 50, seed = 7)
    for (k <- Seq(5, 20, 40)) {
      val got = TextAnalysis.heavyHittersOf(docs, k).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // exact reference: full groupBy count over the same tokenization
      val toksDf = docs.select(explode(split(lower(col("text")), " ")).as("tok"))
        .where(col("tok") =!= "")
      val n = toksDf.count()
      val want = toksDf.groupBy("tok").count().collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .filter { case (_, c) => c * k > n }.toMap
      assert(got === want, s"k=$k")
      assert(want.nonEmpty, s"planted stream must actually have hitters at k=$k")
    }
  }

  test("result is invariant to partitioning (MG candidates are not, the confirm pass is)") {
    val docs = plantedDocs(1500, 30, seed = 11)
    val a = TextAnalysis.heavyHittersOf(docs.repartition(1), 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val b = TextAnalysis.heavyHittersOf(docs.repartition(17), 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("Misra-Gries fold law: seeding from a prefix summary equals one pass over the whole stream") {
    // the streaming contract (Streams.heavyHitters): carrying the MG map
    // as keyed state across microbatches must be EXACTLY equivalent to
    // running MG over the concatenated stream — per-element transitions
    // depend only on the current map, so any split point is invisible
    val rnd = new Random(11)
    for (trial <- 1 to 25) {
      val n = 200 + rnd.nextInt(800)
      val c = 2 + rnd.nextInt(12)
      val stream = Vector.fill(n)(s"w${rnd.nextInt(30)}")
      val whole = TextAnalysis.misraGriesFrom(stream.iterator, c, Map.empty)
      val cuts = Seq.fill(2 + rnd.nextInt(3))(rnd.nextInt(n + 1)).sorted
      val pieces = (0 +: cuts :+ n).sliding(2).map { case Seq(a, b) => stream.slice(a, b) }
      val folded = pieces.foldLeft(Map.empty[String, Long]) {
        (st, piece) => TextAnalysis.misraGriesFrom(piece.iterator, c, st)
      }
      assert(folded === whole, s"trial $trial: split at $cuts diverged")
    }
  }

  test("Misra-Gries retention law: every item with freq > n/(c+1) survives the summary") {
    val rnd = new Random(3)
    for (trial <- 1 to 200) {
      val c = 1 + rnd.nextInt(8)
      val n = 50 + rnd.nextInt(300)
      // skewed alphabet so some items actually cross the threshold
      val stream = Vector.fill(n)(s"i${(rnd.nextInt(30) * rnd.nextDouble()).toInt}")
      val kept = TextAnalysis.misraGries(stream.iterator, c).toSet
      val counts = stream.groupBy(identity).map { case (k, v) => k -> v.size }
      val mustKeep = counts.filter { case (_, cnt) => cnt > n.toDouble / (c + 1) }.keySet
      assert(mustKeep.subsetOf(kept),
        s"trial $trial: c=$c n=$n missing=${mustKeep -- kept}")
    }
  }
}
