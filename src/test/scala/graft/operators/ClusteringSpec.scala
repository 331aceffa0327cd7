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

  test("ml_kmeans: iterated inertia beats assigning against the raw seed centroids") {
    // the seed is K arbitrary vectors; three Lloyd rounds must produce a
    // strictly better quantizer on this fixture (each assignment step is
    // optimal for its centroids, so regression past the seed would mean
    // the update loop is feeding garbage centroids back)
    val q = Tables.embeddings(spark, sf).select($"vec_id",
      transform($"embedding", x => round(x.cast("double") * 1000000L).cast("bigint")).as("e"))
    val seed = q.orderBy($"vec_id").limit(4).select($"e").as[Seq[Long]].collect()
    val seedDists = transform(
      array(seed.map(c => array(c.map(lit(_)): _*)): _*),
      c => aggregate(zip_with($"e", c, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v))
    val seedInertia = q.select(array_min(seedDists).as("d"))
      .agg(sum($"d")).head().getLong(0)
    val finalInertia = Clustering.kmeansEmbed(spark, sf)
      .agg(sum($"inertia")).head().getLong(0)
    assert(finalInertia < seedInertia,
      s"3 Lloyd iterations did not improve on the seed: $finalInertia >= $seedInertia")
  }
}
