package graft.operators

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Laws for the k-means operator the oracle hash can't localize:
  * clustering is a PARTITION of the corpus, replay is bit-stable, and
  * the iterated centroids actually improved on the seed (the point of
  * running Lloyd at all). */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("ml_kmeans: clusters partition the corpus, ids in range, replay is bit-stable") {
    val out1 = Clustering.kmeansEmbed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    val total = Tables.embeddings(spark, sf).count()
    assert(out1.map(_._2).sum == total, "every vector lands in exactly one cluster")
    assert(out1.forall { case (c, _, _, _) => c >= 0 && c < 4 })
    assert(out1.map(_._1).distinct.length == out1.length, "one row per cluster")
    // replay: the fixed seed + integer arithmetic make the whole run a
    // pure function of the data — any nondeterminism (sum order, tie
    // break, collect order feeding the centroid update) breaks this
    val out2 = Clustering.kmeansEmbed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(out1.toSeq == out2.toSeq)
  }

  test("lloyd recovers planted well-separated clusters exactly") {
    // 4 planted centers at disjoint corners of the 64-dim cube (block j
    // of 16 dims is hot for cluster j), 50 vectors per cluster with
    // deterministic jitter far below the separation; vec_ids are laid
    // out so the K-smallest-ids seed starts with one vector per planted
    // cluster. Lloyd must then assign every vector to its planted
    // cluster — the end-to-end sanity the oracle hash can't express.
    val rows = (0 until 200).map { id =>
      val cluster = id % 4
      val e = (0 until 64).map { dim =>
        val hot = if (dim / 16 == cluster) 1000000L else 0L
        hot + ((id * 31 + dim * 7) % 100) // jitter ≤ 99 micro-units
      }
      (id.toLong, e)
    }
    val q = rows.toDF("vec_id", "e")
    val (assigned, cents) = Clustering.lloyd(q)
    val out = assigned.select($"vec_id", $"cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 200)
    // seed vector id=j lands in planted cluster j, so labels align
    assert(out.forall { case (id, c) => c == id % 4 },
      "every vector must recover its planted cluster")
    assert(cents.length == 4)
  }

  test("ml_kmeans: iterated inertia beats assigning against the raw seed centroids") {
    // the seed is K arbitrary vectors; three Lloyd rounds must produce a
    // strictly better quantizer on this fixture (each assignment step is
    // optimal for its centroids, so regression past the seed would mean
    // the update loop is feeding garbage centroids back)
    // reuse the operator's own quantization (same Scale constant) and
    // its broadcast-frame centroid form — the literal-array alternative
    // pays the multi-second codegen compile the operator engineered out
    val q = Clustering.quantized(spark, sf)
    val seed = q.orderBy($"vec_id").limit(4).select($"e").as[Seq[Long]].collect()
    val seedDists = transform($"cents",
      c => aggregate(zip_with($"e", c, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v))
    val seedInertia = q
      .crossJoin(broadcast(Seq(Tuple1(seed.map(_.toSeq).toSeq)).toDF("cents")))
      .select(array_min(seedDists).as("d"))
      .agg(sum($"d")).head().getLong(0)
    val finalInertia = Clustering.kmeansEmbed(spark, sf)
      .agg(sum($"inertia")).head().getLong(0)
    assert(finalInertia < seedInertia,
      s"3 Lloyd iterations did not improve on the seed: $finalInertia >= $seedInertia")
  }
}
