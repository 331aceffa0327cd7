package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Grouped arbitrary-fanout UDTF (SURVEY.md §2.3 J): the Scala-native
  * analog of PySpark's `groupBy(...).applyInPandas(...)` / Flink's keyed
  * process function — a WHOLE GROUP in, an arbitrary data-dependent
  * number of rows out, output schema fixed by the callee's case class.
  * `KeyValueGroupedDataset.flatMapGroups` is Spark's typed form of that
  * contract: the group shuffles to one task, the function sees the full
  * iterator, and the Encoder carries the result schema — the escape
  * hatch for per-group logic a window/aggregate genuinely cannot
  * express (variable fanout, multi-pass over the group, external-model
  * scoring). The declared query keeps the kernel REPLAYABLE (consecutive
  * order gaps) precisely so the arbitrary-fanout path itself is
  * oracle-checked against a window replay — the plumbing is what's
  * under test, and a window CAN state the spec.
  *
  * Scale: one hash exchange on the group key, then group-local compute —
  * the same profile as every keyed aggregate; state is bounded by the
  * LARGEST GROUP (TPC-H: ≤ ~40 orders/customer). A group too big for
  * one task's memory needs the window form instead (which spills) —
  * documented trade-off of the applyInPandas class, not of this
  * implementation. */
object GroupedUdtf {

  final case class OrderRec(custkey: Long, orderkey: Long, day: Long)
  final case class GapRow(o_custkey: Long, prev_key: Long, order_key: Long,
    gap_days: Long)

  /** Per-customer consecutive order gaps via the grouped-UDTF path: sort
    * the group by (date, orderkey) — the iterator carries no order
    * contract — and emit one row per consecutive pair (fanout n−1 per
    * group, data-dependent). */
  def orderGaps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_custkey".cast("long").as("custkey"),
        $"o_orderkey".cast("long").as("orderkey"),
        unix_date($"o_orderdate".cast("date")).cast("long").as("day"))
      .as[OrderRec]
      .groupByKey(_.custkey)
      .flatMapGroups { (ck: Long, it: Iterator[OrderRec]) =>
        val rows = it.toArray.sortBy(r => (r.day, r.orderkey))
        (1 until rows.length).iterator.map { i =>
          GapRow(ck, rows(i - 1).orderkey, rows(i).orderkey,
            rows(i).day - rows(i - 1).day)
        }
      }
      .toDF()
  }

  val oracle: Map[String, String] = Map(
    // the window replay IS the spec: lag under the same total order
    "udtf_order_gaps" -> """
      SELECT o_custkey, prev_key, order_key, gap_days FROM (
        SELECT o_custkey,
               CAST(lag(o_orderkey) OVER w AS BIGINT) AS prev_key,
               CAST(o_orderkey AS BIGINT) AS order_key,
               CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS gap_days
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
      WHERE prev_key IS NOT NULL"""
  )
}
