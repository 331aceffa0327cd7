package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins [[DistRank]] to Spark's own window semantics — the equivalence
  * the Scaladoc promises. `withRank` must equal `row_number() OVER
  * (ORDER BY …)` and `ntileFromRank` must equal `ntile(b) OVER
  * (ORDER BY …)` on randomized profiles including heavy ties, n <
  * buckets, n == 1, and an empty frame — and the result must not
  * depend on the input's partition layout (the whole point of a
  * deterministic distributed rank). The oracle here is Spark's own
  * single-partition window, which is exact at test scale; at real
  * scale DistRank replaces it precisely because it cannot run there.
  */
class DistRankSpec extends SparkSpec {

  import spark.implicits._

  /** Randomized (id, v) profile with ties in v (v drawn from a small
    * domain); keys (v asc, id asc) form the required total order. */
  private def profile(n: Int, seed: Long, parts: Int) = {
    val rnd = new scala.util.Random(seed)
    val rows = (1L to n.toLong).map(i => (i, rnd.nextInt(7).toLong))
    rows.toDF("id", "v").repartition(parts)
  }

  private def check(n: Int, buckets: Int, seed: Long, parts: Int): Unit = {
    val df = profile(n, seed, parts)
    val keys = Seq($"v".asc, $"id".asc)
    val got = DistRank.withRank(df, keys, "rk")
      .crossJoin(broadcast(df.agg(count(lit(1)).as("cnt"))))
      .select($"id", $"rk",
        DistRank.ntileFromRank($"rk", $"cnt", buckets).as("nt"))
    val w = Window.orderBy(keys: _*)
    val want = df.select($"id",
      row_number().over(w).cast("bigint").as("rk"),
      ntile(buckets).over(w).cast("bigint").as("nt"))
    val diff = got.as("g").join(want.as("e"), Seq("id"), "full_outer")
      .where($"g.rk" =!= $"e.rk" || $"g.nt" =!= $"e.nt"
        || $"g.rk".isNull || $"e.rk".isNull)
    assert(diff.isEmpty,
      s"n=$n buckets=$buckets seed=$seed parts=$parts:\n" +
        diff.orderBy($"e.rk").limit(20).collect().mkString("\n"))
  }

  test("withRank + ntileFromRank equal Spark row_number + ntile on randomized tied profiles") {
    for (seed <- 1L to 3L; n <- Seq(16, 100, 257)) check(n, 5, seed, parts = 5)
  }

  test("n < buckets and n == 1 (every row its own tile, q = 0 branch)") {
    check(n = 3, buckets = 5, seed = 11L, parts = 4)
    check(n = 1, buckets = 5, seed = 12L, parts = 4)
    check(n = 4, buckets = 7, seed = 13L, parts = 2)
  }

  test("empty input yields an empty ranked frame") {
    val df = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(DistRank.withRank(df, Seq($"v".asc, $"id".asc), "rk").isEmpty)
  }

  test("ranks are invariant under input partition layout") {
    val base = profile(200, seed = 42L, parts = 1)
    val keys = Seq($"v".desc, $"id".asc)
    def ranksAt(parts: Int): Map[Long, Long] =
      DistRank.withRank(base.repartition(parts), keys, "rk")
        .select($"id", $"rk").as[(Long, Long)].collect().toMap
    val one = ranksAt(1)
    assert(ranksAt(3) == one)
    assert(ranksAt(7) == one)
  }

  test("output column collision is rejected, not corrupted") {
    val df = Seq((1L, 2L)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      DistRank.withRank(df, Seq($"id".asc), out = "v")
    }
  }
}
