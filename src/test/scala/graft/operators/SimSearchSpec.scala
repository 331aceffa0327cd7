package graft.operators

import graft.SparkSpec

/** Recall checks for the approximate similarity-search paths against the
  * exact brute-force baseline (all at sf0.001). The fixtures' embeddings
  * are near-uniform on the sphere — the hardest case for ANN — so the
  * thresholds are deliberately loose; what's asserted is that the index
  * actually finds true neighbors (far above the ~k/N random-guess floor),
  * not production recall. */
class SimSearchSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exact: Set[(Long, Long)] = pairs(SimSearch.bruteTopK(spark, sf))

  test("LSH top-k recall beats the random-guess floor by 10x") {
    val approx = pairs(SimSearch.lshTopK(spark, sf))
    val recall = (exact intersect approx).size.toDouble / exact.size
    val corpus = graft.core.Tables.embeddings(spark, sf).count()
    assert(recall > 10.0 * 5 / corpus, s"recall=$recall corpus=$corpus")
  }

  test("IVF top-k recall beats the random-guess floor by 10x") {
    val approx = pairs(SimSearch.ivfTopK(spark, sf))
    val recall = (exact intersect approx).size.toDouble / exact.size
    val corpus = graft.core.Tables.embeddings(spark, sf).count()
    assert(recall > 10.0 * 5 / corpus, s"recall=$recall corpus=$corpus")
  }

  test("int8 quantization stores bytes in [-127,127] and keeps recall near 1") {
    val q = SimSearch.quantizedCorpus(graft.core.Tables.embeddings(spark, sf))
    // storage really is int8 (the 4x footprint claim)
    assert(q.schema("qvec").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType, true))
    import org.apache.spark.sql.functions._
    val bad = q.where(exists(col("qvec"), x => abs(x) > 127)).count()
    assert(bad === 0L)
    // every vector hits |q|=127 at its max-|x| coordinate (scale is per-vector)
    val noMax = q.where(!array_contains(transform(col("qvec"), x => abs(x)), 127)).count()
    assert(noMax === 0L)
    val approx = pairs(SimSearch.quantizedTopK(spark, sf))
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.85, s"quantized recall=$recall")
  }

  test("approximate results are always true neighbors (no fabricated ids)") {
    val ids = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = pairs(SimSearch.ivfTopK(spark, sf))
    assert(approx.forall { case (q, n) => ids(q) && ids(n) && q != n })
  }

  test("exact kNN graph equals a driver-side brute-force replay") {
    val emb = graft.core.Tables.embeddings(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = emb.keys.flatMap { q =>
      emb.keys.filter(_ != q).toSeq
        .map(n => (n, cos(emb(q), emb(n))))
        .sortBy { case (n, c) => (-c, n) }
        .take(SimSearch.KnnGraphK)
        .zipWithIndex
        .map { case ((n, _), i) => (q, n, (i + 1).toLong) }
    }.toSet
    val got = SimSearch.knnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("LSH kNN graph edges are true edges and recall clears the declared floor") {
    val exactGraph = pairs(SimSearch.knnGraphShared(spark, sf))
    val row = SimSearch.knnGraphLsh(spark, sf).head()
    assert(row.getLong(0) == graft.core.Tables.embeddings(spark, sf).count())
    assert(row.getLong(1) == 1L, "kNN-graph LSH recall fell below the declared floor")
    assert(exactGraph.nonEmpty)
  }

  test("MMR breaks up a planted duplicate clique that plain top-k would return verbatim") {
    import spark.implicits._
    // query 0 plus a 3-copy duplicate clique (21,22,23), one diverse
    // near-neighbor (24), one off-topic vector (25). Exact top-k order:
    // 21,22,23,24,25 — three copies first. MMR must interleave: after
    // picking 21, the copies carry penalty sim=1.0 and the DIVERSE 24
    // wins step 2.
    val dup = Array(0.9f, 0.1f, 0f, 0f)
    val e = Seq(
      0L -> Array(1f, 0f, 0f, 0f),
      21L -> dup, 22L -> dup, 23L -> dup,
      24L -> Array(0.8f, 0f, 0.3f, 0f),
      25L -> Array(0f, 1f, 0f, 0f)).toDF("vec_id", "embedding")
    val got = SimSearch.mmrOf(e).collect()
      .map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 21L, 2L -> 24L, 3L -> 22L, 4L -> 23L, 5L -> 25L))
  }

  test("MMR fixture invariants: step 1 is the exact rank-1, steps are 1..K, picks come from the pool") {
    val rows = SimSearch.mmrTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == SimSearch.NumQueries)
    val exactRank = SimSearch.bruteTopK(spark, sf, k = SimSearch.MmrPool).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rank1 = exactRank.filter(_._3 == 1L).map(t => t._1 -> t._2).toMap
    val poolByQ = exactRank.groupBy(_._1).map { case (q, es) => q -> es.map(_._2).toSet }
    for ((q, sel) <- byQ) {
      assert(sel.map(_._3).sorted.toSeq == (1L to SimSearch.MmrK.toLong))
      assert(sel.find(_._3 == 1L).get._2 == rank1(q), s"step 1 of q=$q is not the exact rank-1")
      assert(sel.map(_._2).toSet.subsetOf(poolByQ(q)), s"q=$q picked outside the pool")
    }
  }
  test("graph-ANN: hops buy recall (T5 > T1), results are true graph-or-seed " +
    "nodes, and ranks are a clean 1..k per query") {
    import spark.implicits._
    def got(rounds: Int): Set[(Long, Long)] =
      SimSearch.graphAnnTopK(spark, sf, rounds = rounds)
        .select($"q_id", $"n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SimSearch.bruteTopKShared(spark, sf).select($"q_id", $"n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r1 = (exact & got(1)).size
    val rT = (exact & got(SimSearch.GraphAnnRounds)).size
    // navigability: walking the graph must find neighbors the seed
    // scoring alone cannot — the whole point of the index
    assert(rT > r1, s"hops bought nothing: T1=$r1, T${SimSearch.GraphAnnRounds}=$rT")
    val res = SimSearch.graphAnnTopK(spark, sf).collect()
    // ranks are a permutation of 1..k per query
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.map(_.getLong(2)).sorted.sameElements(1L to 5L)))
    // no fabricated ids: every result is a corpus vector and never the query
    val ids = graft.core.Tables.embeddings(spark, sf)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(res.forall(r => ids.contains(r.getLong(1)) && r.getLong(1) != r.getLong(0)))
  }

  test("graph-ANN distributed beam search returns EXACTLY the driver " +
    "variant's results, and its hop scans partition-prune the adjacency") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the navigable index (shared by both variants) is bucket-partitioned;
    // an Int-literal In on the partition column must prune to those
    // buckets' files only (ADVICE r14: Long literals wrapped the inferred
    // IntegerType partition attribute in a cast, leaving pruning to
    // Spark's cast-unwrap goodwill — pin it)
    val adj = SimSearch.graphAnnIndexShared(spark, sf)
    // inputFiles reports the relation's files UNpruned — the witness is
    // the physical scan's selected partitions
    val scan = adj.where($"bucket".isin(0, 1)).queryExecution.sparkPlan
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .head
    val chosen = scan.selectedPartitions.partitionCount
    assert(chosen == 2,
      s"bucket filter did not partition-prune: read $chosen partitions " +
        s"of ${adj.inputFiles.length} files")
    // equivalence law: DataFrame beam state (the |Q| >> 1e3 batch path)
    // must reproduce the driver-heap variant bit-for-bit — same cosine
    // kernel, same (cos desc, n_id asc) order, same seeds
    val driver = SimSearch.graphAnnTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val queries = graft.core.Tables.embeddings(spark, sf)
      .where($"vec_id" < SimSearch.NumQueries)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val seeds = SimSearch.ivfCentroidsShared(spark, sf)
      .select($"c_id".as("n_id"), $"c_emb".as("n_emb"))
    val dist = SimSearch.graphAnnSearchDistributed(
      adj, queries, seeds, 5, SimSearch.GraphAnnBeam, SimSearch.GraphAnnRounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(dist == driver,
      s"distributed != driver: only-dist=${(dist -- driver).take(5)} " +
        s"only-driver=${(driver -- dist).take(5)}")
  }

  test("graph-ANN insert: every delta node links exactly k BASE nodes " +
    "(never another delta or itself) and the split conserves the corpus") {
    import spark.implicits._
    val counts = SimSearch.graphAnnInsertCounts(spark, sf).head()
    val (nBase, nDelta, nEdges) = (counts.getLong(0), counts.getLong(1), counts.getLong(2))
    val nAll = graft.core.Tables.embeddings(spark, sf).count()
    assert(nBase + nDelta == nAll && nDelta > 0, s"split broke: $nBase + $nDelta != $nAll")
    // round-15 degree rule: inserts link graphDegree(n_base) edges each
    val deg = SimSearch.graphDegree(nBase)
    assert(nEdges == nDelta * deg,
      s"every insert must link exactly deg edges: $nEdges != $nDelta * $deg")
    // the inserted neighbors come from the PUBLISHED base graph only —
    // every edge is delta → base (never delta-delta, never self): the
    // insert path may not link nodes the index has not published yet
    val vb = org.apache.spark.sql.functions.expr(
      "cast(conv(substring(md5(cast(cast(vec_id as string) as binary)), 1, 8), 16, 10) as bigint) % 100")
    val baseIds = graft.core.Tables.embeddings(spark, sf)
      .where(vb < 90).select($"vec_id").collect().map(_.getLong(0)).toSet
    val deltaIds = graft.core.Tables.embeddings(spark, sf)
      .where(vb >= 90).select($"vec_id").collect().map(_.getLong(0)).toSet
    assert((baseIds & deltaIds).isEmpty)
    val edges = SimSearch.graphAnnInsertedEdges(spark, sf)
      .select($"q_id", $"n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    assert(edges.forall { case (q, n) => deltaIds.contains(q) && baseIds.contains(n) },
      "every inserted edge must run delta -> base")
  }

}
