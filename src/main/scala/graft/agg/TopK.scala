package graft.agg

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import graft.core.Tables

/** Exact per-group top-k as a typed [[Aggregator]] (SURVEY.md §4.2 item 1)
  * — the custom-UDAF demonstration the reference expresses as a sorted
  * stream through reducer.py.
  *
  * Why an Aggregator instead of window row_number: the window plan
  * shuffles and sorts EVERY row of the group; this buffer keeps only k
  * entries per group on each map task and merges k-vs-k buffers at the
  * exchange — at 100 TB with k=3 that is the difference between a full
  * sort of the fact table and a shuffle of (groups × k) tuples.
  *
  * Ordering: value descending, id ascending tiebreak — total and
  * deterministic, so results are partition-invariant.
  */
object TopK {
  type Entry = (Long, Long) // (value, id)

  /** (value desc, id asc) — a strictly better than b. */
  private def beats(a: Entry, b: Entry): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** The buffer invariant: always sorted best-first, length ≤ k. `reduce`
    * is a bounded insertion — O(1) reject when the row can't make the
    * top-k (the overwhelmingly common case on a big group), O(k) splice
    * otherwise; `merge` is a two-pointer merge of two sorted buffers.
    * No per-row sort (round 1 sorted the whole buffer on EVERY input
    * row — the anti-pattern this demo UDAF is supposed to teach against). */
  class TopKAgg(k: Int) extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    def zero: Seq[Entry] = Nil
    def reduce(b: Seq[Entry], a: Entry): Seq[Entry] =
      if (b.size >= k && !beats(a, b.last)) b
      else {
        val (better, worse) = b.span(e => beats(e, a))
        (better ++ (a +: worse)).take(k)
      }
    def merge(b1: Seq[Entry], b2: Seq[Entry]): Seq[Entry] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
      var (x, y) = (b1, b2)
      while (out.size < k && (x.nonEmpty || y.nonEmpty)) {
        if (y.isEmpty || (x.nonEmpty && !beats(y.head, x.head))) {
          out += x.head; x = x.tail
        } else { out += y.head; y = y.tail }
      }
      out.toSeq
    }
    def finish(r: Seq[Entry]): Seq[Entry] = r
    def bufferEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    def outputEncoder: Encoder[Seq[Entry]] = bufferEncoder
  }

  /** Declared query: top-3 orders by (totalprice desc, orderkey asc) per
    * customer-key bucket. Oracle: window row_number over the same order. */
  def topOrdersPerBucket(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions._
    val agg = new TopKAgg(3)
    implicit val entryEnc: Encoder[Entry] = Encoders.product[Entry]
    Tables.orders(s, d)
      .select(($"o_custkey" % 10).as("bucket"),
              round($"o_totalprice" * 100).cast("long").as("cents"),
              $"o_orderkey")
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("top"))
      .flatMap { case (bucket, top) =>
        top.zipWithIndex.map { case ((cents, id), i) => (bucket, (i + 1).toLong, id, cents / 100.0) }
      }
      .toDF("bucket", "rk", "o_orderkey", "o_totalprice")
  }

  val oracle: Map[String, String] = Map(
    "agg_topk_group" -> """
      SELECT bucket, rk, o_orderkey, o_totalprice FROM (
        SELECT o_custkey % 10 AS bucket, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey % 10
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        FROM orders
      ) t WHERE rk <= 3"""
  )
}
