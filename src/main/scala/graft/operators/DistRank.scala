package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact global ranking — the replacement for every
  * `row_number()/ntile() over (ORDER BY …)` single-partition window
  * (the `WindowExec: No Partition Defined` scale-killer class flagged
  * in round 8).
  *
  * Shape (the classic range-partitioned rank, the same decomposition
  * `zipWithIndex` uses, kept in the DataFrame algebra so codegen and
  * AQE still apply):
  *
  *  1. `repartitionByRange` on the total order — rows land in P
  *     range-contiguous partitions (P = `spark.sql.shuffle.partitions`,
  *     so parallelism scales with the cluster, never 1);
  *  2. tag each row with its range-partition id and `localCheckpoint`
  *     ONCE — both consumers below must see the SAME boundaries (range
  *     partitioning samples its splits, so re-evaluating it per subtree
  *     could disagree; the checkpoint also stops Catalyst re-running
  *     the upstream aggregate per consumer, the multi-consumer rule);
  *  3. local `row_number` per range partition (a partitioned window —
  *     P-way parallel sort of |rows|/P each, spill-safe);
  *  4. per-partition row counts, cumulative-summed into start offsets.
  *     This profile has AT MOST P rows (bounded by cluster config, not
  *     by data), so its unpartitioned cumsum window is the bounded-frame
  *     discipline, not a scale hazard;
  *  5. broadcast the ≤P-row offset table back and add.
  *
  * global_rank = partition_start_offset + local_rank: exact, total,
  * deterministic (callers pass a TOTAL order — metric plus a unique
  * tiebreak — per the graft determinism rules). Cost: one range
  * exchange + one pid exchange of the input, vs. the single-partition
  * window's one-executor sort of EVERYTHING. At 10⁹ users that is the
  * difference between a 1000-way sort and a driver-sized bottleneck.
  */
object DistRank {

  /** Adds BIGINT column `out` = exact 1-based global rank of each row
    * under the total order `keys` (Columns with sort direction, e.g.
    * `$"n".desc, $"tok".asc`). The order MUST be total (include a
    * unique tiebreak) or ranks within ties follow partition layout.
    */
  def withRank(df: DataFrame, keys: Seq[Column], out: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    // (2) pid tagged BEFORE any downstream exchange can renumber it,
    // then materialized so both subtrees read identical partitions
    val tagged = df
      .repartitionByRange(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // (3) P-way parallel local rank
    val local = tagged.withColumn("__rn",
      row_number().over(Window.partitionBy($"__pid").orderBy(keys: _*))
        .cast("bigint"))
    // (4) ≤P-row offset profile: rows in range partitions BEFORE mine
    val offsets = tagged
      .groupBy($"__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(
          sum($"__cnt").over(Window.orderBy($"__pid".asc)
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select($"__pid", $"__off")
    // (5) broadcast join back: rank = offset + local rank
    local.join(broadcast(offsets), "__pid")
      .withColumn(out, ($"__off" + $"__rn").cast("bigint"))
      .drop("__pid", "__rn", "__off")
  }

  /** SQL-standard `ntile(buckets)` from a precomputed global rank
    * (`withRank` output) and the total row count `n` (pass a broadcast
    * 1-row scalar column): the first `n % buckets` tiles get
    * `n div buckets + 1` rows, the rest `n div buckets` — exactly the
    * tie-SPLITTING position-based semantics of `ntile() OVER (ORDER BY …)`
    * that value-banding (percentile cuts) cannot reproduce. Pure integer
    * expression, so DuckDB's native ntile replays it bit-exactly
    * (equivalence to Spark's own ntile is pinned in DistRankSpec).
    * All-`bigint` math; the `rk > big` branch guards its `div q` from
    * q = 0 (only reachable when n >= buckets, where q >= 1).
    */
  def ntileFromRank(rk: Column, n: Column, buckets: Int): Column = {
    val b = lit(buckets.toLong)
    val q = idiv(n.cast("bigint"), b) // small-tile size
    val r = n.cast("bigint") % b // number of (q+1)-sized big tiles
    val bigRows = r * (q + lit(1L)) // rows covered by the big tiles
    when(rk <= bigRows, idiv(rk - lit(1L), q + lit(1L)) + lit(1L))
      .otherwise(r + idiv(rk - bigRows - lit(1L), q) + lit(1L))
      .cast("bigint")
  }

  /** Exact BIGINT integer division (SQL `div` — IntegralDivide, never
    * the double-returning `/`). Truncating, identical to floor for the
    * non-negative rank/count operands used here. */
  def idiv(a: Column, b: Column): Column = call_function("div", a, b)
}
