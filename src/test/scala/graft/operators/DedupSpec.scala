package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-duplicate recall for the approximate dedup paths (the oracle
  * gate already proves exact agreement on the fixtures; these prove the
  * sketches actually FIND duplicates). */
class DedupSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill every single morning"

  test("minhash LSH finds a planted near-duplicate and skips unrelated docs") {
    val docs = docsDf(Seq(
      1L -> base,
      2L -> (base + " today"), // near-dup of 1
      3L -> "completely different content about spark catalyst optimizer rules and physical plans",
      4L -> "yet another unrelated document mentioning parquet files and shuffle partitions"))
    val pairs = Dedup.minhashPairs(docs, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash: identical docs at hamming 0; near-dup within 3; unrelated filtered") {
    val docs = docsDf(Seq(
      1L -> base,
      2L -> base,
      3L -> (base + " maybe"),
      4L -> "totally distinct words nothing shared with anything else whatsoever in vocabulary"))
    val got = Dedup.simhashPairs(docs, 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 0L)
    assert(got.keySet.forall { case (a, b) => Set(1L, 2L, 3L).contains(a) && Set(1L, 2L, 3L).contains(b) })
  }

  test("embedding LSH recovers planted near-identical vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(123)
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat))
    }
    // plant: vec 100 = vec 0 + tiny noise
    val planted = (100L, vecs(0)._2.map(x => x + 0.001f))
    val df = (vecs :+ planted).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingExactPairs(df, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingLshPairs(df, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.contains((0L, 100L)))
    assert(lsh == exact) // near-identical pairs: multi-table miss prob ≈ 0
  }

  test("charShingles of short text is empty, not a descending-sequence artifact") {
    import spark.implicits._
    val r = Seq(("x" * 5)).toDF("t").select(Dedup.charShingles($"t", 12)).head.getSeq[String](0)
    assert(r.isEmpty)
  }

  test("connectedComponents matches union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 40
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      // reference union-find, always attaching the larger root under the
      // smaller → every tree's root is its component's min node id
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v.toInt).toLong).toMap
      val got = Dedup.connectedComponents(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"trial $trial")
    }
  }

  test("prefix-filtered ngram jaccard equals the exhaustive all-pairs result") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def randDoc(len: Int): Vector[String] = Vector.fill(len)(vocab(rnd.nextInt(vocab.size)))
    // 20 random docs + mutated near-dups of the first few (1-token edits)
    val bases = (0 until 20).map(i => i.toLong -> randDoc(12 + rnd.nextInt(8)))
    val mutated = (0 until 6).map { i =>
      val (id, toks) = bases(i)
      val t2 = toks.updated(rnd.nextInt(toks.size), vocab(rnd.nextInt(vocab.size)))
      (100L + id) -> t2
    }
    val all = (bases ++ mutated).map { case (id, toks) => (id, toks.mkString(" ")) }
    // exhaustive reference on word-3-gram sets
    def grams(toks: Seq[String]): Set[String] =
      toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val sets = all.map { case (id, text) => id -> grams(text.split(" ").toSeq) }.toMap
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b && sa.nonEmpty
      c = (sa intersect sb).size.toDouble
      j = c / (sa.size + sb.size - c) if j >= 0.8
    } yield (a, b)).toSet
    val got = Dedup.ngramJaccardPairs(all.toDF("doc_id", "text"), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(want.nonEmpty, "test corpus must contain qualifying near-dups")
  }

  test("connectedComponents labels every node with its component's min id") {
    import spark.implicits._
    // components: {1,2,3,4} (path), {10,11}, {20,21,22} (triangle)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("hits: score conservation against the k-NN edge set") {
    // unnormalized integer HITS has exact conservation laws the output
    // hash can't localize: with hub_0 = 1 everywhere, auth_1(v) is v's
    // IN-degree, so Σ auth_1 = |edges|; after the final round,
    // Σ hub = Σ_{(u,v)∈E} auth(v) — each round is a pure edge-sum.
    val edges = SimSearch.knnGraphShared(spark, sf)
      .select(col("q_id").as("src"), col("n_id").as("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val out = Dedup.hits(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val auth = out.map(t => (t._1, t._3)).toMap
    val hub = out.map(t => (t._1, t._2)).toMap
    // final-round consistency: hub(u) = Σ auth(v) over u's out-edges
    val hubExpected = edges.groupBy(_._1).view.mapValues(_.map(e => auth(e._2)).sum)
    assert(out.forall { case (v, h, _) => hubExpected.getOrElse(v, 0L) == h })
    // every corpus vector appears exactly once; out-degree-0 is impossible
    // in a k-NN graph (k ≥ 1), so every hub is positive
    assert(out.length == graft.core.Tables.embeddings(spark, sf).count())
    assert(out.forall(_._2 > 0))
  }

  test("pagerank: hub outranks leaves, mass is conserved-ish, layout-invariant") {
    import spark.implicits._
    // star 1-{2,3,4,5} plus a detached edge 10-11
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.pagerankOf(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 7)
    // the hub holds strictly more mass than any leaf; symmetric leaves tie
    assert(Seq(2L, 3L, 4L, 5L).forall(l => got(1L) > got(l)))
    assert(Seq(3L, 4L, 5L).forall(l => got(l) === got(2L)))
    assert(got(10L) === got(11L))
    // integer truncation leaks ≤1 ppb per edge per round: total stays
    // within a tight band under S = 1e9
    val total = got.values.sum
    assert(total > 990000000L && total <= 1000000000L, s"mass=$total")
    // bit-identical under a different physical layout
    val got2 = Dedup.pagerankOf(pairs.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === got)
  }
}
