package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for the grouped arbitrary-fanout UDTF path: the flatMapGroups
  * kernel must equal an independent window-lag replay (two different
  * execution paths, same total order), and the fanout must be exactly
  * n−1 rows per group. */
class GroupedUdtfSpec extends SparkSpec {
  import spark.implicits._

  test("grouped-UDTF order gaps equal the window-lag replay, fanout n-1 per group") {
    val o = graft.core.Tables.orders(spark, sf)
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val want = o.select($"o_custkey".cast("long").as("ck"),
        lag($"o_orderkey", 1).over(w).cast("long").as("prev_key"),
        $"o_orderkey".cast("long").as("order_key"),
        (unix_date($"o_orderdate".cast("date")) -
          unix_date(lag($"o_orderdate", 1).over(w).cast("date"))).cast("long").as("gap_days"))
      .where($"prev_key".isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val got = GroupedUdtf.orderGaps(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got.nonEmpty && got == want)
    // fanout law: one row per consecutive pair = orders − customers
    val nOrders = o.count()
    val nCust = o.select($"o_custkey").distinct().count()
    assert(got.size.toLong == nOrders - nCust)
    // gaps are non-negative under the (date, orderkey) total order
    assert(got.forall(_._4 >= 0L))
  }

  test("cogroup reconcile equals the join+aggregate replay, one row per order") {
    val o = graft.core.Tables.orders(spark, sf)
    val li = graft.core.Tables.lineitem(spark, sf)
    val want = o.select($"o_orderkey".as("okey"),
        round($"o_totalprice" * 100).cast("long").as("total_cents"))
      .join(li.select($"l_orderkey".as("okey"),
          ((round($"l_extendedprice" * 100).cast("long")
            * (lit(100L) - round($"l_discount" * 100).cast("long"))
            * (lit(100L) + round($"l_tax" * 100).cast("long"))) / lit(10000L))
            .cast("long").as("term")),
        Seq("okey"), "left")
      .groupBy($"okey", $"total_cents")
      .agg(count($"term").as("n"), coalesce(sum($"term"), lit(0L)).as("c"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val got = GroupedUdtf.cogroupReconcile(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty && got == want)
    assert(got.size.toLong == o.count(), "exactly one row per order")
  }
}
