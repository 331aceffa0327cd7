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
    * deterministic for a given partitioning but engine-specific → rows
    * are not oracle-comparable; `MaintenanceSpec` bounds the per-stratum
    * rates and asserts run-to-run determinism. */
  def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fractions = Map("F" -> 0.5, "O" -> 0.25, "P" -> 1.0)
    Tables.orders(s, d)
      .stat.sampleBy("o_orderstatus", fractions, seed = 42L)
      .select($"o_orderkey", $"o_orderstatus")
  }

  val oracle: Map[String, String] = Map(
    "maint_compact" -> "SELECT doc_id, text FROM documents"
  )
}
