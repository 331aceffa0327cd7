package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  test("TopK aggregator == window row_number top-3") {
    import spark.implicits._
    val got = TopK.topOrdersPerBucket(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val w = Window.partitionBy($"bucket").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val exp = graft.core.Tables.orders(spark, sf)
      .select(($"o_custkey" % 10).as("bucket"), $"o_orderkey", $"o_totalprice")
      .withColumn("rk", row_number().over(w).cast("long"))
      .where($"rk" <= 3)
      .select($"bucket", $"rk", $"o_orderkey", $"o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == exp)
  }

  test("buffer never exceeds k and merge keeps global order") {
    val agg = new TopK.TopKAgg(3)
    val b = (1L to 100L).foldLeft(agg.zero)((buf, v) => agg.reduce(buf, (v, 1000 - v)))
    assert(b.size == 3)
    assert(b.map(_._1) == Seq(100L, 99L, 98L))
    val merged = agg.merge(b, Seq((200L, 1L), (1L, 2L)))
    assert(merged.map(_._1) == Seq(200L, 100L, 99L))
  }

  test("ties broken by id ascending") {
    val agg = new TopK.TopKAgg(2)
    val b = agg.merge(agg.reduce(agg.reduce(agg.zero, (5L, 9L)), (5L, 3L)), Seq((5L, 7L)))
    assert(b == Seq((5L, 3L), (5L, 7L)))
  }
}
