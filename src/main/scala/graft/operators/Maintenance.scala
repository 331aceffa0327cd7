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
    // The 64-file fragmented input is FIXTURE STAGING (a real lake is
    // already fragmented); it is written once per (session, dir) so the
    // per-call measurement is the operator itself — read small files →
    // repartition → write target files → read back.
    val fragKey = "spark.graft.compact.fragdir"
    val fragSrcKey = "spark.graft.compact.src"
    if (!s.conf.getOption(fragSrcKey).contains(d)) {
      val frag = Files.createTempDirectory("graft_frag").toString
      Tables.documents(s, d).repartition(64)
        .write.mode(SaveMode.Overwrite).parquet(frag)
      graft.core.SessionArtifacts.resetDir(s, fragKey, frag)
      s.conf.set(fragSrcKey, d)
    }
    // ONE session-scoped output dir, overwritten per call — a fresh temp
    // dir per invocation would leak a compacted copy per bench rep
    val outKey = "spark.graft.compact.outdir"
    val out = s.conf.getOption(outKey).getOrElse {
      val o = Files.createTempDirectory("graft_compact").toString
      s.conf.set(outKey, o); o
    }
    s.read.parquet(s.conf.get(fragKey)).repartition(targetFiles)
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

  /** Snapshot upsert — the MERGE INTO pattern without a table format:
    * new snapshot = updates ∪ inserts FULL-OUTER-joined onto the base on
    * the key, taking the update side's values where present. This is how
    * a pipeline without Delta/Iceberg applies a CDC batch: one shuffle
    * on the key (broadcast the delta instead when it is small), then an
    * overwrite of the affected partitions. Updates bump price by exactly
    * 1.00 (integer cents — order-independent and oracle-exact); inserts
    * are key-shifted copies. */
  def upsert(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, d).select($"o_orderkey", $"o_orderstatus",
      round($"o_totalprice" * 100).cast("bigint").as("cents"))
    val delta = base.where($"o_orderkey" % 10 === 0)
      .select($"o_orderkey", lit("U").as("o_orderstatus"), ($"cents" + 100).as("cents"))
      .unionByName(base.where($"o_orderkey" % 7 === 0)
        .select(($"o_orderkey" + 10000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"), $"cents"))
    base.as("b").join(delta.as("u"), Seq("o_orderkey"), "full_outer")
      .select($"o_orderkey",
        coalesce($"u.o_orderstatus", $"b.o_orderstatus").as("o_orderstatus"),
        (coalesce($"u.cents", $"b.cents") / 100.0).as("o_totalprice"))
  }

  /** Deterministic hash-based dataset split (train/val/test): bucket =
    * first 32 bits of md5(doc_id) mod 100 → 90/5/5. Content-addressed
    * splits are how a training pipeline keeps membership stable as the
    * corpus grows — a doc's split never changes when neighbors are added
    * or the table is repartitioned, unlike randomSplit (partition-order
    * dependent) or modulo-on-id (correlated with ingestion order when
    * ids are sequential). Pure per-row arithmetic + one tiny aggregate;
    * md5 (not xxhash64) so DuckDB replays the bucketing bit-exactly. */
  def hashSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bucket = bucketCol
    Tables.documents(s, d)
      .select(when(bucket < 90, "train").when(bucket < 95, "val")
                .otherwise("test").as("split"),
              $"n_chars")
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
  }

  /** Per-doc view of [[hashSplit]]'s bucketing: (doc_id, bucket, split).
    * Exists so a hash-split mismatch localizes to specific rows instead of
    * an opaque 3-row aggregate — the debuggability the round-3 red row
    * lacked. Same expression as [[hashSplit]]; pure per-row arithmetic. */
  def hashSplitDocs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bucket = bucketCol
    Tables.documents(s, d)
      .select($"doc_id", bucket.as("bucket"),
        when(bucket < 90, "train").when(bucket < 95, "val")
          .otherwise("test").as("split"))
  }

  /** First 32 bits of md5(doc_id) mod 100, as a bigint column. */
  private[operators] def bucketCol: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col => c}
    conv(substring(md5(c("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("bigint") % 100
  }

  /** Exactly-K-per-group sample (fixed examples per source — the "take 3
    * docs from every source for the eval set" op): rank each group's
    * docs by md5(doc_id) and keep the first k. Content-addressed like
    * [[hashSplit]], so the selected set is stable under corpus growth,
    * repartitioning, and ingestion order — none of which hold for
    * sampleBy/randomSplit. One shuffle (window per group); for groups too
    * large to sort, the bounded-buffer Aggregator in `graft.agg.TopK` is
    * the same operation with O(k) memory per group. */
  def groupSample(s: SparkSession, d: String, k: Int = 3): DataFrame =
    groupSampleOf(Tables.documents(s, d), k)

  /** Core over any (source, doc_id, …) frame (the declared query and the
    * CurationSpec stability test both drive THIS code path). */
  def groupSampleOf(docs: DataFrame, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"source")
      .orderBy(md5($"doc_id".cast("string").cast("binary")).asc, $"doc_id".asc)
    docs
      .select($"source", $"doc_id")
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .where($"rk" <= k)
  }

  /** The raw sample itself (spec-checked for determinism and rates). */
  def rawStratifiedSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .stat.sampleBy("o_orderstatus", Map("F" -> 0.5, "O" -> 0.25, "P" -> 1.0), seed = 42L)
      .select($"o_orderkey", $"o_orderstatus")
  }

  /** Right-to-be-forgotten purge (GDPR/CCPA): delete every event of the
    * users on a deletion list. The list comes from the customer dim
    * (c_custkey % 10 == 7 stands in for the compliance queue) and is
    * BROADCAST into an anti-join — the fact table streams through
    * map-side, nothing shuffles, which is the only shape that works when
    * the purge scans 100 TB of events for a few thousand ids. */
  def purge(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dl = Tables.customer(s, d)
      .where(pmod($"c_custkey", lit(10L)) === 7)
      .select($"c_custkey".as("user_id"))
    Tables.events(s, d).join(broadcast(dl), Seq("user_id"), "left_anti")
  }

  /** The purge AUDIT a compliance pipeline must emit with the delete:
    * per event_type, rows before / purged / after. One pass over events
    * (broadcast left join + conditional count) — it never runs the scan
    * twice to count both sides. `MaintenanceSpec` asserts the audit's
    * n_after equals [[purge]]'s actual row counts. */
  def purgeAudit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dl = Tables.customer(s, d)
      .where(pmod($"c_custkey", lit(10L)) === 7)
      .select($"c_custkey".as("user_id"), lit(1L).as("del"))
    Tables.events(s, d).join(broadcast(dl), Seq("user_id"), "left")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_before"),
           sum(coalesce($"del", lit(0L))).as("n_purged"))
      .select($"event_type", $"n_before", $"n_purged",
        ($"n_before" - $"n_purged").as("n_after"))
  }

  /** First-32-bits-of-md5 mod 100 in version-stable SQL: each of the 8 hex
    * digits is decoded positionally via strpos over the hex alphabet (both
    * ANSI-ish and stable across DuckDB versions, unlike '0x'-string casts). */
  private[operators] val hexBucketSql: String = {
    val terms = (1 to 8).map { i =>
      val weight = 1L << (4 * (8 - i))
      s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1) * $weight"
    }
    "(" + terms.mkString("(", "\n               + ", ")") + " % 100)"
  }

  val oracle: Map[String, String] = Map(
    "maint_compact" -> "SELECT doc_id, text FROM documents",
    "maint_purge" -> """
      SELECT e.event_type, count(*) AS n_before,
             CAST(count(dl.user_id) AS BIGINT) AS n_purged,
             count(*) - count(dl.user_id) AS n_after
      FROM events e LEFT JOIN (
        SELECT c_custkey AS user_id FROM customer WHERE c_custkey % 10 = 7) dl
        USING (user_id)
      GROUP BY e.event_type""",
    "maint_group_sample" -> """
      SELECT source, doc_id, rk FROM (
        SELECT source, doc_id,
               row_number() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
                                           doc_id ASC) AS rk
        FROM documents) t
      WHERE rk <= 3""",

    // Hex → int via positional digit arithmetic (strpos on a hex-digit
    // alphabet), NOT the '0x'-string CAST whose semantics have varied
    // across DuckDB versions — round 3's only red row traced to that idiom.
    "maint_hash_split" -> s"""
      SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
                  ELSE 'test' END AS split,
             count(*) AS n_docs, sum(n_chars) AS sum_chars
      FROM (SELECT n_chars, $hexBucketSql AS b FROM documents)
      GROUP BY 1""",
    "maint_hash_split_docs" -> s"""
      SELECT doc_id, b AS bucket,
             CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id, $hexBucketSql AS b FROM documents)""",
    "maint_upsert" -> """
      WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      delta AS (
        SELECT o_orderkey, 'U' AS o_orderstatus, cents + 100 AS cents
        FROM base WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, 'N', cents
        FROM base WHERE o_orderkey % 7 = 0)
      SELECT COALESCE(u.o_orderkey, b.o_orderkey) AS o_orderkey,
             COALESCE(u.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
             COALESCE(u.cents, b.cents) / CAST(100 AS DOUBLE) AS o_totalprice
      FROM base b FULL OUTER JOIN delta u ON b.o_orderkey = u.o_orderkey""",
    "sample_stratified" -> """
      SELECT DISTINCT o_orderstatus, CAST(1 AS BIGINT) AS rate_ok
      FROM orders"""
  )
}
