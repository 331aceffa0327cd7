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

  final case class OrdRec(okey: Long, total_cents: Long)
  final case class ItemRec(okey: Long, ext_cents: Long, disc_h: Long, tax_h: Long)
  final case class ReconRow(order_key: Long, total_cents: Long, n_items: Long,
    computed_cents: Long)

  /** Cogrouped arbitrary-fanout UDTF — the `applyInPandas` COGROUP
    * parity path (`KeyValueGroupedDataset.cogroup`): TWO datasets
    * shuffle to the same key partitioning and the function sees both
    * group iterators at once — the shape of reconciliation, interleaved
    * merge, and feature-join kernels that a plain join + aggregate can
    * only express by materializing the pair blowup. The declared kernel
    * reconciles each order's header price against its lineitems'
    * integer-cents computed total, Σ ⌊ext·(100−d)·(100+t)/10⁴⌋ —
    * per-item floor division so both engines replay term-exact
    * (the graft determinism rule: never a double product the hash gate
    * must trust). Orders with no lineitems emit (0, 0); lineitem keys
    * with no order emit nothing (the reconciliation direction).
    *
    * Scale: one co-partitioned hash exchange per side — exactly a
    * shuffled join's profile; state bounds at the largest single key's
    * rows (TPC-H: ≤ 7 lineitems/order). */
  def cogroupReconcile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, d)
      .select($"o_orderkey".as("okey"),
        round($"o_totalprice" * 100).cast("long").as("total_cents"))
      .as[OrdRec]
    val items = Tables.lineitem(s, d)
      .select($"l_orderkey".as("okey"),
        round($"l_extendedprice" * 100).cast("long").as("ext_cents"),
        round($"l_discount" * 100).cast("long").as("disc_h"),
        round($"l_tax" * 100).cast("long").as("tax_h"))
      .as[ItemRec]
    orders.groupByKey(_.okey).cogroup(items.groupByKey(_.okey)) {
      (k: Long, os: Iterator[OrdRec], ls: Iterator[ItemRec]) =>
        val o = os.toSeq
        if (o.isEmpty) Iterator.empty
        else {
          val itemSeq = ls.toSeq
          val computed = itemSeq.iterator
            .map(li => li.ext_cents * (100L - li.disc_h) * (100L + li.tax_h) / 10000L)
            .sum
          Iterator(ReconRow(k, o.head.total_cents, itemSeq.size.toLong, computed))
        }
    }.toDF()
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
      WHERE prev_key IS NOT NULL""",

    // the join+aggregate replay IS the spec; per-item floor division
    // inside the sum matches the kernel term-exactly, and the sum is
    // cast back to BIGINT (DuckDB widens BIGINT sums to HUGEINT)
    "udtf_cogroup_reconcile" -> """
      SELECT o_orderkey AS order_key,
             CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
             count(l_orderkey) AS n_items,
             COALESCE(CAST(sum(
               (CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))
                 * (100 + CAST(round(l_tax * 100) AS BIGINT))) // 10000
             ) AS BIGINT), 0) AS computed_cents
      FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2"""
  )
}
