package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Pipeline-maintenance operators a training-data platform runs between
  * queries: small-file compaction and stratified sampling (data mixing).
  */
object Maintenance {

  /** Small-file compaction: the #1 operational chore of a 100 TB parquet
    * lake. The fixture is first written fragmented (64 files), then
    * compacted to a target file count with a round-robin repartition —
    * at scale the target is computed from bytes/`maxPartitionBytes`.
    * The round-trip is oracle-checked (content survives compaction
    * bit-exactly); `MaintenanceSpec` asserts the file counts. */
  def compact(s: SparkSession, d: String, targetFiles: Int = 4): DataFrame = {
    import s.implicits._
    val frag = Files.createTempDirectory("graft_frag").toString
    val out = Files.createTempDirectory("graft_compact").toString
    Tables.documents(s, d).repartition(64)
      .write.mode(SaveMode.Overwrite).parquet(frag)
    s.read.parquet(frag).repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(out)
    s.read.parquet(out).select($"doc_id", $"text")
  }

  /** Stratified sample (data mixing): per-status sampling fractions via
    * `sampleBy` — how a pipeline reweights sources/classes when
    * assembling a training mix. Bernoulli per row with a fixed seed:
    * deterministic for a given partitioning but engine-specific, so the
    * declared query emits the DRIVER-VISIBLE bound instead of raw rows
    * (round 1 left this rows-only): per stratum, the sampled count must
    * sit within 4 binomial standard deviations of fraction × stratum
    * size (+1 for the deterministic f=1.0 stratum). The oracle asserts
    * every rate_ok flag is 1; `MaintenanceSpec` keeps the raw-sample
    * determinism check. */
  def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fractions = Map("F" -> 0.5, "O" -> 0.25, "P" -> 1.0)
    val orders = Tables.orders(s, d)
    val sampled = rawStratifiedSample(s, d)
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n_sampled"))
    val fracs = fractions.toSeq.toDF("o_orderstatus", "f")
    orders.groupBy($"o_orderstatus").agg(count(lit(1)).as("n_total"))
      .join(fracs, "o_orderstatus")
      .join(sampled, Seq("o_orderstatus"), "left")
      .select($"o_orderstatus",
        (abs(coalesce($"n_sampled", lit(0L)) - $"f" * $"n_total") <=
          lit(4.0) * sqrt($"n_total" * $"f" * (lit(1.0) - $"f")) + 1.0)
          .cast("long").as("rate_ok"))
  }

  /** The raw sample itself (spec-checked for determinism and rates). */
  def rawStratifiedSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .stat.sampleBy("o_orderstatus", Map("F" -> 0.5, "O" -> 0.25, "P" -> 1.0), seed = 42L)
      .select($"o_orderkey", $"o_orderstatus")
  }

  val oracle: Map[String, String] = Map(
    "maint_compact" -> "SELECT doc_id, text FROM documents",
    "sample_stratified" -> """
      SELECT DISTINCT o_orderstatus, CAST(1 AS BIGINT) AS rate_ok
      FROM orders"""
  )
}
