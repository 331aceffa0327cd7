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
}
