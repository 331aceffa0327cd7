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

  /** Snapshot diff (change-data-feed shape): given two versions of a
    * keyed table, classify every key as inserted / deleted / updated /
    * unchanged and report per-class counts plus the exact money delta —
    * what a lakehouse's CDF emits between commits, computed here from
    * first principles with ONE full-outer join on the key and a
    * row-fingerprint compare (sha2 over the concatenated non-key
    * columns, so the diff shuffles 32-byte hashes + keys, not rows —
    * the dedup_exact economics). The "new version" is STAGED from the
    * base by deterministic rules (the upsert staging pattern: %10=3
    * repriced, %97=0 deleted, %50=0 cloned to a fresh key), so the
    * oracle replays every class analytically. */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, d).select($"o_orderkey", $"o_orderstatus",
      round($"o_totalprice" * 100).cast("bigint").as("cents"))
    val next = base
      .where($"o_orderkey" % 97 =!= 0) // deletes
      .select($"o_orderkey", $"o_orderstatus",
        when($"o_orderkey" % 10 === 3, $"cents" + 250).otherwise($"cents").as("cents"))
      .unionByName(base.where($"o_orderkey" % 50 === 0) // inserts (cloned keys)
        .select(($"o_orderkey" + 20000000L).as("o_orderkey"),
          $"o_orderstatus", $"cents"))
    def fp(df: org.apache.spark.sql.DataFrame) = df.select($"o_orderkey",
      sha2(concat_ws("|", $"o_orderstatus", $"cents"), 256).as("fp"), $"cents")
    fp(base).as("b").join(fp(next).as("n"), Seq("o_orderkey"), "full_outer")
      .select(
        when(col("b.fp").isNull, "insert")
          .when(col("n.fp").isNull, "delete")
          .when(col("b.fp") =!= col("n.fp"), "update")
          .otherwise("unchanged").as("change"),
        coalesce(col("n.cents"), lit(0L)) - coalesce(col("b.cents"), lit(0L)))
      .toDF("change", "delta")
      .groupBy($"change")
      .agg(count(lit(1)).as("n"), sum($"delta").as("cents_delta"))
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

  /** First 32 bits of md5(expr) as a bigint column — the Scala twin of
    * [[md5Hex32Sql]]; every content-addressed draw (split buckets,
    * sample priorities) derives from THIS one expression so a hash-scheme
    * change cannot skew Spark and oracle apart per-operator. */
  private[operators] def md5Hex32Col(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(e.cast("string").cast("binary")), 1, 8), 16, 10).cast("bigint")

  /** First 32 bits of md5(doc_id) mod 100, as a bigint column. */
  private[operators] def bucketCol: org.apache.spark.sql.Column =
    md5Hex32Col(org.apache.spark.sql.functions.col("doc_id")) % 100

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

  /** Deterministic weighted sample — priority sampling (Duffield, Lund &
    * Thorup, "Priority sampling for estimation of arbitrary subset sums",
    * JACM 2007): each doc draws a content-addressed uniform u from md5
    * (the same first-32-bits draw as [[hashSplit]]) and gets priority
    * q = w/u with weight w = n_chars; the sample is the global top-k by
    * q. Heavier docs get proportionally larger priorities, so inclusion
    * probability scales with weight — the "sample long documents more"
    * knob of a training-mix pipeline — while staying fully deterministic:
    * membership is stable under corpus repartition/growth (unlike
    * rand()-weighted reservoirs) and replayable by the oracle bit-exactly.
    * Numerics are engine-portable by construction: w·2³² is an exact
    * double (w < 2²¹), and one IEEE correctly-rounded division is
    * bit-identical everywhere — no transcendentals (the u^(1/w)
    * exponential-clocks formulation would hit libm differences).
    * Plan shape: per-partition top-k + single merge
    * (TakeOrderedAndProject, plan-asserted) — no global sort, no driver
    * ceiling; the final rank window runs on the k surviving rows only. */
  def weightedSample(s: SparkSession, d: String, k: Int = 100): DataFrame =
    weightedSampleOf(Tables.documents(s, d), k)

  /** Core over any (doc_id, source, n_chars) frame — the declared query
    * and MaintenanceSpec's stability/scale-invariance laws drive this. */
  def weightedSampleOf(docs: DataFrame, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val h = md5Hex32Col($"doc_id")
    val q = ($"n_chars".cast("double") * 4294967296.0) / ($"h" + 1).cast("double")
    docs
      .select($"doc_id", $"source", $"n_chars", h.as("h"))
      .select($"doc_id", $"source", $"n_chars", q.as("q"))
      .orderBy($"q".desc, $"doc_id".asc)
      .limit(k)
      // rank over the k-row result of the limit — bounded, not O(corpus)
      .withColumn("rk",
        row_number().over(Window.orderBy($"q".desc, $"doc_id".asc)).cast("bigint"))
  }

  /** Z-order (Morton) layout report: interleave the low 16 bits of
    * l_partkey (even bit positions) and l_suppkey (odd) into a Morton
    * code z, then aggregate per z-prefix bucket (z >> 12 — each bucket
    * models one file of a z-sorted write) the row count and the min/max
    * extent of BOTH dimensions. Z-ordering is how a 100 TB lake gets
    * multi-column data skipping: sorting by z makes every file's
    * (partkey, suppkey) bounding box small in BOTH dims, so min/max file
    * stats prune scans filtered on either column — a linear sort on
    * partkey alone leaves every file's suppkey extent spanning the full
    * domain ([[graft.operators.MaintenanceSpec]] asserts the z layout
    * beats it). Pure per-row shift/mask arithmetic (codegen, no UDF) +
    * one aggregation; the real write path is `repartitionByRange(z)` +
    * parquet, whose file stats this report mirrors deterministically. */
  def zorderLayout(s: SparkSession, d: String): DataFrame =
    zorderLayoutOf(Tables.lineitem(s, d))

  /** Core over any frame with (l_partkey, l_suppkey) — the declared query
    * and the MaintenanceSpec extent comparison both drive this path. */
  def zorderLayoutOf(li: DataFrame): DataFrame = {
    val s = li.sparkSession
    import s.implicits._
    val x = $"l_partkey".cast("bigint").bitwiseAND(0xFFFFL)
    val y = $"l_suppkey".cast("bigint").bitwiseAND(0xFFFFL)
    val z = (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(1L), 2 * i + 1)
    }.reduce(_ + _)
    li.select($"l_partkey", $"l_suppkey", z.as("z"))
      .groupBy(shiftright($"z", 12).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min($"l_partkey").as("min_part"), max($"l_partkey").as("max_part"),
        min($"l_suppkey").as("min_supp"), max($"l_suppkey").as("max_supp"))
  }

  /** Column-statistics collection (the ANALYZE TABLE ... FOR COLUMNS
    * pass): per column of orders, row/null counts, min/max, and distinct
    * count — the stats substrate a cost-based optimizer's join reorder /
    * broadcast decisions and a lake's file-skipping metadata both feed
    * on. Mixing four count_distinct into ONE aggregate makes Catalyst
    * plan an Expand that replicates every input row per distinct group
    * (×5 rows into the aggregation — measured as the most expensive
    * non-stream row of its batch). So the pass is split instead: one
    * distinct-free aggregate for rows/nulls/min/max, plus one
    * SINGLE-distinct aggregate per NDV column — a lone count_distinct
    * plans as a plain two-phase partial-distinct aggregation, no Expand,
    * and each pass's parquet scan prunes to exactly its one column, so
    * total scan bytes stay ~one full-scan's worth while the ×5 row
    * blow-up disappears. The five 1-row results meet in broadcast
    * nested-loop crossJoins (no exchange), and the independent stages
    * schedule concurrently. At 100 TB the NDV passes swap in
    * approx_count_distinct (mergeable HLL partials — see agg_approx's
    * oracle-checked bound), collapsing everything back into one pass.
    * Numeric min/max on o_totalprice use integer cents (engine-exact). */
  def analyzeStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
    val cents = round($"o_totalprice" * 100).cast("bigint")
    val base = o.agg(
      count(lit(1)).as("n_rows"),
      sum($"o_custkey".isNull.cast("long")).as("custkey_nulls"),
      min($"o_custkey").as("custkey_min"), max($"o_custkey").as("custkey_max"),
      min(cents).as("price_min_cents"), max(cents).as("price_max_cents"),
      min($"o_orderstatus").as("status_min"), max($"o_orderstatus").as("status_max"),
      min($"o_orderdate").as("date_min"), max($"o_orderdate").as("date_max"))
    base
      .crossJoin(o.agg(count_distinct($"o_custkey").as("custkey_ndv")))
      .crossJoin(o.agg(count_distinct(cents).as("price_ndv")))
      .crossJoin(o.agg(count_distinct($"o_orderstatus").as("status_ndv")))
      .crossJoin(o.agg(count_distinct($"o_orderdate").as("date_ndv")))
      .select($"n_rows", $"custkey_nulls", $"custkey_min", $"custkey_max",
        $"custkey_ndv", $"price_min_cents", $"price_max_cents", $"price_ndv",
        $"status_ndv", $"status_min", $"status_max",
        $"date_min", $"date_max", $"date_ndv")
  }

  /** Partition backfill/repair — dynamic partition overwrite, the lake
    * op that fixes one corrupted day without touching its neighbors:
    * the events table is staged day-partitioned once per (session, dir),
    * then corrected rows for ONE target day (cents doubled — the stand-in
    * repair) are written with `partitionOverwriteMode=dynamic`, which
    * replaces exactly the partitions present in the write and leaves
    * every other day's files untouched. Static overwrite mode — the
    * default — would TRUNCATE THE WHOLE TABLE first; at 100 TB that
    * single conf is the difference between rewriting one day and
    * rewriting the lake. The read-back per-day aggregate shows the
    * target day corrected and every other day bit-identical. Target day
    * = 11th distinct day (a one-string driver scalar, bounded like the
    * centroid draw). Counts + integer cents only. */
  def backfill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d).select($"event_id", $"user_id",
      round($"value" * 100).cast("bigint").as("cents"),
      date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
    val srcKey = "spark.graft.backfill.src"
    val dirKey = "spark.graft.backfill.dir"
    if (!s.conf.getOption(srcKey).contains(d)) {
      val dir = Files.createTempDirectory("graft_backfill").toString
      ev.write.mode(SaveMode.Overwrite).partitionBy("day").parquet(dir)
      graft.core.SessionArtifacts.resetDir(s, dirKey, dir)
      s.conf.set(srcKey, d)
    }
    val tbl = s.conf.get(dirKey)
    val target = ev.select($"day").distinct().orderBy($"day".asc)
      .limit(11).collect().last.getString(0)
    // corrected rows derive from the SOURCE, so re-running the repair is
    // idempotent (always source×2, never compounding)
    val fixed = ev.where($"day" === target).withColumn("cents", $"cents" * 2)
    // getOption on a registered SQL conf yields the effective default even
    // when never set, so restore is a plain set-back of that value
    val prev = s.conf.get("spark.sql.sources.partitionOverwriteMode")
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try fixed.write.mode(SaveMode.Overwrite).partitionBy("day").parquet(tbl)
    finally s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    s.read.parquet(tbl).groupBy($"day")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"))
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

  /** First 32 bits of md5(expr) as a BIGINT in version-stable SQL: each of
    * the 8 hex digits is decoded positionally via strpos over the hex
    * alphabet (both ANSI-ish and stable across DuckDB versions, unlike
    * '0x'-string casts). */
  private[operators] def md5Hex32Sql(expr: String): String = {
    val terms = (1 to 8).map { i =>
      val weight = 1L << (4 * (8 - i))
      s"(strpos('0123456789abcdef', substr(md5($expr), $i, 1)) - 1) * $weight"
    }
    terms.mkString("(", "\n               + ", ")")
  }

  /** First-32-bits-of-md5 mod 100 (see [[md5Hex32Sql]]). */
  private[operators] val hexBucketSql: String =
    "(" + md5Hex32Sql("CAST(doc_id AS VARCHAR)") + " % 100)"

  /** Shuffle-key skew profile: the pre-flight diagnostic for any big
    * join/aggregation — per-key row counts (here l_suppkey, the key a
    * supplier-side join would hash on) reduced to ONE summary row:
    * key count, total, min/max, exact discrete p50/p99 (explicit rank
    * rule: rank ⌊(n−1)·q⌋+1 in (count, key) order — no interpolated
    * percentile, whose index conventions differ across engines), and
    * max-over-mean in integer ppm. A max/mean ratio ≫ 1 is the salting
    * trigger; p99/p50 separates one hot key from a heavy tail. The heavy
    * aggregate is map-side combinable; ranking the |keys| profile
    * (suppliers here, but billions of keys for a user-keyed join) runs
    * through [[DistRank.withRank]] — P-way range-partitioned exact rank,
    * never a single-partition window (round-10 fix of the last
    * WindowDisciplineSpec offender). */
  def skewReport(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cnt = Tables.lineitem(s, d)
      .groupBy($"l_suppkey").agg(count(lit(1)).as("cnt"))
    val ranked = DistRank.withRank(cnt,
      Seq($"cnt".asc, $"l_suppkey".asc), "rk")
    // stats reads the ranked frame, not cnt: withRank's zipWithIndex
    // runs an eager job that materializes the range-partitioned sort's
    // shuffle files, so both consumers re-read that shuffle output
    // instead of re-running the lineitem scan+aggregate (multi-consumer
    // rule — the round-10 DistRank rewrite replaced the old explicit
    // localCheckpoint with this shuffle-file reuse)
    val stats = ranked.agg(
      count(lit(1)).as("n_keys"), sum($"cnt").as("total_rows"),
      min($"cnt").as("min_cnt"), max($"cnt").as("max_cnt"))
    ranked.crossJoin(broadcast(stats))
      .agg(
        max($"n_keys").as("n_keys"), max($"total_rows").as("total_rows"),
        max($"min_cnt").as("min_cnt"), max($"max_cnt").as("max_cnt"),
        max(when($"rk" === expr("((n_keys - 1) * 50) div 100 + 1"), $"cnt")).as("p50_cnt"),
        max(when($"rk" === expr("((n_keys - 1) * 99) div 100 + 1"), $"cnt")).as("p99_cnt"))
      .select($"n_keys", $"total_rows", $"min_cnt", $"max_cnt", $"p50_cnt", $"p99_cnt",
        // DECIMAL(38,0): max_cnt·n_keys·10⁶ passes 2⁶³ exactly in the
        // hot-key/many-keys regime this diagnostic exists to catch —
        // BIGINT would wrap to a no-skew reading on the skewed input
        expr("cast(max_cnt * cast(n_keys AS decimal(38,0)) * 1000000 div total_rows AS bigint)")
          .as("max_over_mean_ppm"))
  }

  /** Declarative data-quality expectation suite (the Deequ/dbt-test
    * shape): each expectation is one row (check, n_rows, n_violations,
    * passed) over the live tables — completeness (NOT NULL), uniqueness
    * (key duplication), domain (value range / allowed set), and
    * referential integrity (FK orphans via LEFT ANTI join). This is the
    * gate a 100 TB ingest runs BEFORE publishing a snapshot: per-table
    * column checks fold into ONE conditional-aggregate scan per table
    * (adding a check adds a column, not a scan; all map-side
    * combinable), and each RI check is a single anti-join whose build
    * side is the referenced key set (broadcast when small, shuffled
    * otherwise — Spark picks by size). Violation COUNTS, not violating
    * rows, travel to the result — the report is O(checks), never
    * O(rows). */
  def expectations(s: SparkSession, d: String): DataFrame =
    expectationsOf(Tables.orders(s, d), Tables.lineitem(s, d),
      Tables.documents(s, d), Tables.customer(s, d))

  /** In-flight pipeline instrumentation via `Dataset.observe` — the
    * production answer to "how many rows / how much value flowed through
    * this job" WITHOUT a second scan: named aggregate metrics ride the
    * pass as a `CollectMetrics` node (an AggregatingAccumulator the
    * executors update while the real pipeline runs), unlike
    * [[expectations]]' dedicated audit scan. The declared query runs a
    * real downstream aggregate (revenue per return flag), harvests the
    * observation AFTER that single action, and emits the per-flag rows
    * with the observed global metrics attached — row-conservation
    * (Σ per-flag n == observed n_rows) is then oracle-checkable, the
    * invariant a silent filter/join bug breaks first. At 100 TB the
    * metrics cost is one accumulator merge per task on a pass you were
    * already paying for; the observed values feed job-level expectations
    * without rereading anything. */
  def observeMetrics(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val obs = org.apache.spark.sql.Observation()
    val out = Tables.lineitem(s, d)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(round($"l_extendedprice" * 100).cast("bigint")).as("price_cents"),
        count(when($"l_discount" > 0.05, 1)).as("n_discounted"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(round($"l_extendedprice" * 100).cast("bigint")).as("flag_cents"))
    // ONE action drives both the pipeline and the metrics accumulator;
    // the observed scalars (a bounded 3-value map, never rows) come back
    // on the driver and ride the result as constants
    val rows = out.collect().toSeq // 3 flags — bounded
    val m = obs.get
    val base = s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      out.schema)
    base.withColumn("obs_rows", lit(m("n_rows").asInstanceOf[Long]))
      .withColumn("obs_price_cents", lit(m("price_cents").asInstanceOf[Long]))
      .withColumn("obs_discounted", lit(m("n_discounted").asInstanceOf[Long]))
  }

  /** Core over any four conforming frames — the declared query and
    * MaintenanceSpec's planted-violation law both drive this path. */
  def expectationsOf(orders: DataFrame, lineitem: DataFrame,
      documents: DataFrame, customer: DataFrame): DataFrame = {
    val s = orders.sparkSession
    import s.implicits._
    val o = orders
    // one scan, four checks: conditional counts + distinct-key count
    val orderChecks = o.agg(
      count(lit(1)).as("n_rows"),
      count(when($"o_custkey".isNull, 1)).as("v_null"),
      (count(lit(1)) - count_distinct($"o_orderkey")).as("v_dup"),
      count(when($"o_totalprice" <= 0, 1)).as("v_price"),
      count(when(!$"o_orderstatus".isin("O", "F", "P"), 1)).as("v_status"))
      .selectExpr("""stack(4,
        'orders.o_custkey.not_null',   n_rows, v_null,
        'orders.o_orderkey.unique',    n_rows, v_dup,
        'orders.o_totalprice.positive', n_rows, v_price,
        'orders.o_orderstatus.in_set', n_rows, v_status)
        AS (check_name, n_rows, n_violations)""")
    val l = lineitem
    val lineChecks = l.agg(
      count(lit(1)).as("n_rows"),
      count(when($"l_quantity" < 1 || $"l_quantity" > 50, 1)).as("v_qty"),
      count(when($"l_shipdate".isNull, 1)).as("v_ship"))
      .selectExpr("""stack(2,
        'lineitem.l_quantity.range_1_50', n_rows, v_qty,
        'lineitem.l_shipdate.not_null',   n_rows, v_ship)
        AS (check_name, n_rows, n_violations)""")
    val docs = documents
    val docChecks = docs.agg(
      count(lit(1)).as("n_rows"),
      count(when($"text".isNull || length($"text") === 0, 1)).as("v_empty"))
      .selectExpr("""stack(1,
        'documents.text.nonempty', n_rows, v_empty)
        AS (check_name, n_rows, n_violations)""")
    // RI: orphan counts via LEFT ANTI against the referenced key column
    def ri(name: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String): DataFrame = {
      val orphans = child.select(col(key))
        .join(parent.select(col(pkey).as(key)), Seq(key), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      child.agg(count(lit(1)).as("n_rows")).crossJoin(orphans)
        .select(lit(name).as("check_name"), $"n_rows", $"n_violations")
    }
    val riOrders = ri("orders.o_custkey.ref_customer",
      o, "o_custkey", customer, "c_custkey")
    val riLine = ri("lineitem.l_orderkey.ref_orders",
      l, "l_orderkey", o, "o_orderkey")
    orderChecks.unionByName(lineChecks).unionByName(docChecks)
      .unionByName(riOrders).unionByName(riLine)
      .select($"check_name", $"n_rows", $"n_violations",
        ($"n_violations" === 0).cast("bigint").as("passed"))
  }

  /** Morton interleave of (l_partkey & 0xFFFF) even bits / (l_suppkey &
    * 0xFFFF) odd bits as portable SQL — same shift/mask arithmetic as
    * [[zorderLayoutOf]], fully parenthesized against precedence drift. */
  private[operators] val zMortonSql: String =
    (0 until 16).map { i =>
      s"((((l_partkey & 65535) >> $i) & 1) << ${2 * i})" +
        s" + ((((l_suppkey & 65535) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", "\n             + ", ")")

  /** Incremental aggregate maintenance (SURVEY §2.3 — materialized-view
    * delta refresh, the daily-pipeline pattern: yesterday's rollup +
    * today's partition, never a full recompute): the per-type scoreboard
    * is assembled ONLY from two disjoint-slice PARTIAL states (events
    * before/after a cutoff date) re-aggregated with the metrics' own
    * combiners — counts and sums add, min/max fold, the distinct-day
    * set unions (calendar-bounded, the one distinct that is safe to
    * carry as a set; corpus-keyed distincts would ride a sketch
    * instead). At 100 TB with a date-partitioned fact the base partial
    * is yesterday's saved output and only the delta partition is
    * scanned — here both slices compute live, which IS one full scan
    * split in two. The oracle recomputes from scratch in one pass, so
    * the hash gate proves merge(partials) ≡ recompute — the algebraic
    * property incremental refresh rests on. MergedOnlyLaw
    * (NewOpsLawSpec) additionally pins that the merge path equals the
    * direct Spark single-pass aggregate. */
  def incrementalAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cutoff = graft.core.Utc.ts("2024-01-15 00:00:00")
    def partial(slice: DataFrame): DataFrame = slice
      .select($"event_type", round($"value" * 100).cast("bigint").as("cents"),
        date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"),
        min($"cents").as("mn_cents"), max($"cents").as("mx_cents"),
        collect_set($"day").as("days"))
    val ev = Tables.events(s, d)
    val base  = partial(ev.where($"ts" <  lit(cutoff)))
    val delta = partial(ev.where($"ts" >= lit(cutoff)))
    base.unionAll(delta)
      .groupBy($"event_type")
      .agg(sum($"n").as("n"), sum($"sum_cents").as("sum_cents"),
        min($"mn_cents").as("mn_cents"), max($"mx_cents").as("mx_cents"),
        size(array_distinct(flatten(collect_list($"days")))).cast("bigint").as("n_days"))
  }

  /** Stages the 3-commit artifact (v0/v1/v2 parquet + `_log.json`) into
    * `dir` — shared by [[timeTravel]], [[cdfVersions]] (same artifact)
    * and [[vacuum]] (its OWN copy, because vacuum physically deletes
    * commit files and must never corrupt the artifact the other keys
    * read in the same session). */
  private def stageCommitLog(s: SparkSession, d: String, dir: String): Unit = {
    import s.implicits._
    val base = Tables.orders(s, d).select($"o_orderkey".as("k"),
      $"o_orderstatus".as("status"),
      round($"o_totalprice" * 100).cast("bigint").as("cents"))
    // v0: the base snapshot, all rows upserts
    base.select($"k", $"status", $"cents",
      lit(0L).as("version"), lit("upsert").as("op"))
      .write.mode("overwrite").parquet(s"$dir/v0")
    // v1: reprice %10==0 (+100, status U) and clone-insert %7==0.
    // The insert-key offset is DERIVED as max(k)+1 (one bounded driver
    // scalar at staging time, the gen_sf stride discipline) — a fixed
    // constant collided with base keys past key ~10M (SF ≳ 1.7),
    // silently turning inserts into overwrites while the oracle's
    // analytic v1 kept both rows (ADVICE r12). The oracle derives the
    // same offset from the same max.
    val off = base.agg(max($"k")).head().getLong(0) + 1L
    base.where($"k" % 10 === 0)
      .select($"k", lit("U").as("status"), ($"cents" + 100L).as("cents"))
      .unionByName(base.where($"k" % 7 === 0)
        .select(($"k" + off).as("k"), lit("N").as("status"), $"cents"))
      .select($"k", $"status", $"cents", lit(1L).as("version"), lit("upsert").as("op"))
      .write.mode("overwrite").parquet(s"$dir/v1")
    // v2: delete %97==0; reprice %10==3 (+250) where not deleted —
    // deletes WIN on overlap, stated in both engines
    val v1state = timeTravelAsOf(s, Seq(s"$dir/v0", s"$dir/v1"))
    v1state.where($"k" % 97 === 0)
      .select($"k", lit(null).cast("string").as("status"),
        lit(null).cast("bigint").as("cents"),
        lit(2L).as("version"), lit("delete").as("op"))
      .unionByName(v1state.where($"k" % 97 =!= 0 && $"k" % 10 === 3)
        .select($"k", $"status", ($"cents" + 250L).as("cents"),
          lit(2L).as("version"), lit("upsert").as("op")))
      .write.mode("overwrite").parquet(s"$dir/v2")
    // the commit log: one JSON line per version listing its file
    val log = (0 to 2).map(v => s"""{"version": $v, "file": "v$v"}""").mkString("\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/_log.json"), log)
  }

  /** Session-memoized commit-log artifact shared by [[timeTravel]] and
    * [[cdfVersions]]; returns the artifact dir. */
  private def ensureCommitLog(s: SparkSession, d: String): String = {
    val srcKey = "spark.graft.timetravel.src"
    val dirKey = "spark.graft.timetravel.dir"
    if (!s.conf.getOption(srcKey).contains(d)) {
      val dir = java.nio.file.Files.createTempDirectory("graft_timetravel").toString
      stageCommitLog(s, d, dir)
      graft.core.SessionArtifacts.resetDir(s, dirKey, dir)
      s.conf.set(srcKey, d)
    }
    s.conf.get(dirKey)
  }

  /** Parses `_log.json` (bounded — one line per commit) into sorted
    * (version, absolute file path). The log, never a directory listing,
    * is the source of truth — exactly the Delta/Iceberg protocol rule
    * that makes reads immune to uncommitted/garbage files. */
  private[operators] def readLog(dir: String): Seq[(Long, String)] =
    java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/_log.json"))
      .split("\n").toSeq.map { line =>
        val v = "\"version\": (\\d+)".r.findFirstMatchIn(line).get.group(1).toLong
        val f = "\"file\": \"([^\"]+)\"".r.findFirstMatchIn(line).get.group(1)
        v -> s"$dir/$f"
      }.sortBy(_._1)

  /** COMMIT-LOG TIME TRAVEL (the lakehouse transaction-log mechanism —
    * Delta/Iceberg's jars are absent in this sandbox, so the PROTOCOL is
    * implemented from first principles over plain parquet): the table is
    * a MAINTAINED artifact of immutable commit files plus a JSON log —
    * v0 = the base snapshot, v1 = an upsert/insert commit, v2 = a
    * delete+reprice commit (the `upsert`/`snapshotDiff` staging rules,
    * now as a SEQUENCE) — and a version-addressed read reconstructs the
    * table AS OF v by MERGE-ON-READ: union the log's files with
    * version ≤ v, keep each key's highest-version row (one map-side-
    * combinable struct-max aggregate — the exchange shuffles slim keyed
    * rows), drop delete tombstones. The declared query emits the
    * (version, n_rows, sum_cents) summary AS OF every version from one
    * session, proving reads are version-addressed rather than
    * latest-only; the oracle recomputes each version ANALYTICALLY from
    * the staging rules — the log/merge machinery must be invisible in
    * the result. MaintenanceSpec additionally pins that an AS-OF-v read
    * never opens files of later commits (`inputFiles` law — the
    * log-pruning contract that makes time travel O(live files), not
    * O(history)). At 100 TB: commits are the unit of retention/audit,
    * merge-on-read amortizes via periodic compaction (`maint_compact`),
    * and the per-key argmax is the same one-exchange profile as
    * dedup_exact. */
  def timeTravel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = ensureCommitLog(s, d)
    // version-addressed reads DRIVE OFF THE LOG: prune to files ≤ v,
    // merge-on-read
    val files = readLog(dir)
    (0L to 2L).map { v =>
      timeTravelAsOf(s, files.filter(_._1 <= v).map(_._2))
        .agg(count(lit(1)).as("n_rows"), sum($"cents").as("sum_cents"))
        .select(lit(v).as("version"), col("n_rows"), col("sum_cents"))
    }.reduce(_ unionByName _)
  }

  /** Merge-on-read reconstruction over commit files: per key keep the
    * highest-version row (struct-max — versions are unique per key by
    * the commit rules, so the argmax is total), then drop tombstones. */
  private[operators] def timeTravelAsOf(s: SparkSession, files: Seq[String]): DataFrame = {
    import s.implicits._
    s.read.parquet(files: _*)
      .groupBy($"k")
      .agg(max(struct($"version", $"op", $"status", $"cents")).as("m"))
      .where($"m.op" === "upsert")
      .select($"k", $"m.status".as("status"), $"m.cents".as("cents"))
  }

  /** CHANGE DATA FEED between commit-log versions (the Delta CDF /
    * Iceberg changelog read, wired through the same `_log.json` +
    * commit files as [[timeTravel]]): for each version v, the row-level
    * changes v introduced — (version, k, change ∈ insert|update|delete,
    * pre_cents, post_cents). The commit file IS the change set; the
    * only extra work is classifying insert-vs-update and attaching the
    * pre-image, and that join is KEY-PRUNED: the prior state is
    * merge-on-read over files < v SEMI-JOINED to the commit's keys
    * BEFORE the per-key argmax, so per-version work is ∝ |commit| (the
    * files < v scan is pruned to commit keys at the scan-side join,
    * never reconstructing the full table) — the property that makes CDF
    * consumable incrementally at 100 TB where "diff two snapshots"
    * ([[snapshotDiff]]) re-reads the world. Oracle: the analytic change
    * sets from the staging rules — log, pruning, and merge machinery
    * must be invisible. */
  def cdfVersions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = ensureCommitLog(s, d)
    val files = readLog(dir)
    (1L to 2L).map { v =>
      val commit = s.read.parquet(files.filter(_._1 == v).map(_._2): _*)
      val keys = commit.select($"k").distinct()
      val pre = s.read.parquet(files.filter(_._1 < v).map(_._2): _*)
        .join(keys, Seq("k"), "left_semi")
        .groupBy($"k")
        .agg(max(struct($"version", $"op", $"status", $"cents")).as("m"))
        .where($"m.op" === "upsert")
        .select($"k", $"m.cents".as("pre_cents"))
      commit.join(pre, Seq("k"), "left")
        .select(lit(v).as("version"), $"k",
          when($"op" === "delete", lit("delete"))
            .when($"pre_cents".isNull, lit("insert"))
            .otherwise(lit("update")).as("change"),
          $"pre_cents",
          when($"op" === "delete", lit(null).cast("bigint"))
            .otherwise($"cents").as("post_cents"))
    }.reduce(_ unionByName _)
  }

  /** CHECKPOINT + VACUUM under a retention horizon (the lakehouse
    * retention protocol over the same commit-log shape — Delta's
    * `VACUUM` after checkpointing, Iceberg's `expire_snapshots`): on its
    * OWN staged copy of the artifact (vacuum deletes files; the shared
    * copy must stay intact for [[timeTravel]]/[[cdfVersions]]), the
    * maintenance pass (1) MATERIALIZES the merge-on-read state as of the
    * horizon h = 1 into a checkpoint commit (rows re-tagged version h —
    * compact: tombstones are resolved away, merge-on-read above the
    * checkpoint still works because later commits carry higher
    * versions), (2) REWRITES the log to [checkpoint@h] + commits > h,
    * (3) physically DELETES every file the rewritten log no longer
    * references (version ≤ h — the checkpoint supersedes the horizon
    * commit itself). Reads
    * as of v ≥ h still reconstruct bit-identically (the declared query
    * emits the v1/v2 summaries, hash-gated against the same analytic
    * recompute as [[timeTravel]]); reads below the horizon are GONE by
    * contract — that is what retention means. MaintenanceSpec pins the
    * inverted inputFiles law: post-vacuum reads open ONLY the checkpoint
    * (+ later commits), and the sub-horizon files no longer exist on
    * disk. At 100 TB this pass is the storage-cost lever: history is
    * bounded by the horizon, and the checkpoint keeps as-of reads
    * O(live files), not O(all history ever written). */
  def vacuum(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val srcKey = "spark.graft.vacuum.src"
    val dirKey = "spark.graft.vacuum.dir"
    val horizon = 1L
    if (!s.conf.getOption(srcKey).contains(d)) {
      val dir = java.nio.file.Files.createTempDirectory("graft_vacuum").toString
      stageCommitLog(s, d, dir)
      val files = readLog(dir)
      // (1) checkpoint: the state as of the horizon, re-tagged version h
      timeTravelAsOf(s, files.filter(_._1 <= horizon).map(_._2))
        .select($"k", $"status", $"cents",
          lit(horizon).as("version"), lit("upsert").as("op"))
        .write.mode("overwrite").parquet(s"$dir/ckpt$horizon")
      // (2) rewrite the log: checkpoint@h + commits > h, PRESERVING the
      // parsed file names (regenerating "v$v" from version numbers would
      // corrupt a log whose entries already carry non-v$v names — e.g. a
      // previously vacuumed artifact's checkpoint; round-13 review)
      val log = (s"""{"version": $horizon, "file": "ckpt$horizon"}""" +:
        files.filter(_._1 > horizon).map { case (v, path) =>
          s"""{"version": $v, "file": "${path.stripPrefix(s"$dir/")}"}""" })
        .mkString("\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/_log.json"), log)
      // (3) delete every file the rewritten log no longer references —
      // version ≤ h, INCLUDING the horizon commit the checkpoint
      // supersedes (deleting only < h left a full commit of retained
      // garbage per vacuum, round-13 review; Delta/Iceberg delete all
      // unreferenced files)
      files.filter(_._1 <= horizon).foreach { case (_, path) =>
        val p = java.nio.file.Paths.get(path)
        if (java.nio.file.Files.exists(p)) {
          import scala.jdk.CollectionConverters._
          // Files.walk holds a directory fd until closed (try/finally, the
          // SessionArtifacts.deleteIfArtifactDir pattern) — vacuuming many
          // commits must not leak one fd per deleted directory
          val walk = java.nio.file.Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(java.nio.file.Files.delete)
          finally walk.close()
        }
      }
      graft.core.SessionArtifacts.resetDir(s, dirKey, dir)
      s.conf.set(srcKey, d)
    }
    val dir = s.conf.get(dirKey)
    val files = readLog(dir)
    (horizon to 2L).map { v =>
      timeTravelAsOf(s, files.filter(_._1 <= v).map(_._2))
        .agg(count(lit(1)).as("n_rows"), sum($"cents").as("sum_cents"))
        .select(lit(v).as("version"), col("n_rows"), col("sum_cents"))
    }.reduce(_ unionByName _)
  }

  /** RESTORE TO VERSION (Delta `RESTORE TABLE ... VERSION AS OF` /
    * Iceberg rollback — the fourth and last rung of the commit-log
    * protocol after time travel, CDF, and vacuum): restoring to v = 1
    * appends a NEW commit v3 containing exactly the ANTI-DIFF between
    * the current state (as of 2) and the target state (as of 1) —
    * upserts for keys whose target row is missing or different in the
    * current state (un-deleting v2's tombstoned keys, un-repricing its
    * updates), tombstones for keys the target lacks — so history is
    * preserved (time travel to v2 still works; restore is a forward
    * commit, never a rewrite) and the restore WRITE is ∝ |diff|, never
    * a table copy (MaintenanceSpec pins |v3 commit| = |changed keys|,
    * and that post-restore state ≡ the v1 state exactly). Runs on its
    * OWN artifact copy (it appends a commit; the shared artifact must
    * stay 3-commit for the other keys). The declared query emits the
    * (version, n_rows, sum_cents) summaries as of v2 and v3 — v3 must
    * hash-match the ANALYTIC V1 recompute, making "restore ≡ the state
    * it names" the oracle-gated contract. */
  def restore(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val srcKey = "spark.graft.restore.src"
    val dirKey = "spark.graft.restore.dir"
    if (!s.conf.getOption(srcKey).contains(d)) {
      val dir = java.nio.file.Files.createTempDirectory("graft_restore").toString
      stageCommitLog(s, d, dir)
      val files = readLog(dir)
      val tgt = timeTravelAsOf(s, files.filter(_._1 <= 1L).map(_._2))
        .select($"k", $"status".as("t_status"), $"cents".as("t_cents"),
          lit(true).as("in_t"))
      val cur = timeTravelAsOf(s, files.filter(_._1 <= 2L).map(_._2))
        .select($"k", $"status".as("c_status"), $"cents".as("c_cents"),
          lit(true).as("in_c"))
      // in_t/in_c are lit(true) on their own side and NULL on a
      // full-join miss — isNull/isNotNull state the membership intent
      // directly (the three-valued coalesce(!x, true) trick was
      // edit-fragile, round-13 review)
      val diff = tgt.join(cur, Seq("k"), "full")
      diff.where($"in_t".isNotNull &&
          ($"in_c".isNull || $"t_cents" =!= $"c_cents" ||
            $"t_status" =!= $"c_status"))
        .select($"k", $"t_status".as("status"), $"t_cents".as("cents"),
          lit(3L).as("version"), lit("upsert").as("op"))
        .unionByName(diff.where($"in_c".isNotNull && $"in_t".isNull)
          .select($"k", lit(null).cast("string").as("status"),
            lit(null).cast("bigint").as("cents"),
            lit(3L).as("version"), lit("delete").as("op")))
        .write.mode("overwrite").parquet(s"$dir/v3")
      // preserve the parsed file names when appending (see vacuum's
      // log-rewrite note)
      val log = (files.map { case (v, path) =>
        s"""{"version": $v, "file": "${path.stripPrefix(s"$dir/")}"}""" } :+
        s"""{"version": 3, "file": "v3"}""").mkString("\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/_log.json"), log)
      graft.core.SessionArtifacts.resetDir(s, dirKey, dir)
      s.conf.set(srcKey, d)
    }
    val dir = s.conf.get(dirKey)
    val files = readLog(dir)
    (2L to 3L).map { v =>
      timeTravelAsOf(s, files.filter(_._1 <= v).map(_._2))
        .agg(count(lit(1)).as("n_rows"), sum($"cents").as("sum_cents"))
        .select(lit(v).as("version"), col("n_rows"), col("sum_cents"))
    }.reduce(_ unionByName _)
  }

  /** Append one commit to `_log.json` IFF the log's latest version still
    * equals `expectedParent` — the optimistic-concurrency commit gate
    * (Delta's putIfAbsent-of-`v.json` / Iceberg's swap-metadata CAS,
    * enacted over the plain-parquet log): a writer that raced and lost
    * sees the advanced head and must NOT append. Returns whether the
    * commit landed; a failed attempt leaves log AND files untouched
    * (the rows frame is only written after the check — no orphan commit
    * files from losers). */
  private def tryCommit(s: SparkSession, dir: String, expectedParent: Long,
      rows: DataFrame): Boolean = {
    val files = readLog(dir)
    val latest = files.map(_._1).max
    if (latest != expectedParent) false
    else {
      val v = expectedParent + 1
      rows.write.mode("overwrite").parquet(s"$dir/v$v")
      // preserve parsed names when appending (the vacuum log-rewrite rule)
      val log = (files.map { case (pv, path) =>
        s"""{"version": $pv, "file": "${path.stripPrefix(s"$dir/")}"}""" } :+
        s"""{"version": $v, "file": "v$v"}""").mkString("\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/_log.json"), log)
      true
    }
  }

  /** The two OCC writer transactions — each derives its WRITE SET from
    * the snapshot it read (repricing live keys), which is what makes the
    * stale write set wrong after a conflicting commit: on the overlap,
    * rows computed from v2 carry v2's cents and would silently undo the
    * winner's update if blindly re-stamped (lost update). Shared with
    * MaintenanceSpec's laws. */
  private[operators] def occWriterA(state: DataFrame): DataFrame = {
    val s = state.sparkSession; import s.implicits._
    state.where($"k" % 11 === 5)
      .select($"k", $"status", ($"cents" + 70L).as("cents"))
  }
  private[operators] def occWriterB(state: DataFrame): DataFrame = {
    val s = state.sparkSession; import s.implicits._
    state.where($"k" % 3 === 1)
      .select($"k", $"status", ($"cents" + 30L).as("cents"))
  }
  /** The second staged race (round-15 rung 6): C and D write DISJOINT
    * key sets (k ≡ 2 vs ≡ 7 mod 13), so the loser's adjudication finds
    * no row conflict and takes the rebase fast path. */
  private[operators] def occWriterC(state: DataFrame): DataFrame = {
    val s = state.sparkSession; import s.implicits._
    state.where($"k" % 13 === 2)
      .select($"k", $"status", ($"cents" + 110L).as("cents"))
  }
  private[operators] def occWriterD(state: DataFrame): DataFrame = {
    val s = state.sparkSession; import s.implicits._
    state.where($"k" % 13 === 7)
      .select($"k", $"status", ($"cents" + 50L).as("cents"))
  }

  /** OPTIMISTIC CONCURRENCY — commit-protocol rung 5 (round-13 verdict
    * item 6), completing the single-writer quartet (time travel / CDF /
    * vacuum / restore) with the multi-writer rule every lakehouse log
    * lives by: writers never lock, they COMMIT-OR-RETRY.
    *
    * The enactment (staged once per session, like every commit-log
    * artifact; deterministic interleaving — the PROTOCOL is the subject,
    * not a thread race): writers A and B both snapshot version 2 of the
    * staged log. A commits first — its expected-parent CAS sees head=2
    * and lands v3. B attempts with the same expected parent, sees
    * head=3, and its attempt MUST fail without touching log or files
    * (a lost race leaves no orphans). B then adjudicates: its write set
    * OVERLAPS v3's committed keys (k ≡ 5 mod 11 ∧ k ≡ 1 mod 3 — a real
    * row conflict, not just a version clash), so a blind rebase —
    * re-stamping the stale rows as v4 — would silently undo A's +70 on
    * every overlap key (the lost update OCC exists to prevent; the
    * MaintenanceSpec law measures exactly that 70-cent divergence). B
    * therefore RE-EXECUTES its transaction against the v3 snapshot and
    * commits v4 at expected parent 3.
    *
    * Rung 6 (round 15): the DISJOINT-write FAST PATH — the common case
    * every lakehouse optimizes. Writers C and D both snapshot v4 with
    * key sets disjoint by construction (k ≡ 2 vs ≡ 7 mod 13). C lands
    * v5; D's CAS refuses; adjudication finds ZERO row overlap with the
    * raced commit — so D REBASES: its already-computed rows are
    * re-stamped as v6 and committed at expected parent 5, with no
    * snapshot re-read and no re-execution. Sound because disjoint
    * writes commute — v5 touched none of D's input rows, so
    * re-execution would be byte-identical (the MaintenanceSpec law
    * asserts that equality executably). The row-conflict branch remains
    * the code's other arm: the fast path is chosen by the adjudication
    * count, not hardcoded.
    *
    * Emitted: the (version, n_rows, sum_cents) summary AS OF v2..v6
    * plus the protocol counters (n_attempts=6, n_conflicts=2,
    * n_rebases=1) and the SQL-replayable overlap-key count — the
    * oracle replays every state ANALYTICALLY from the staging + writer
    * rules, so serializability (final state ≡ A,B,C,D applied
    * sequentially) is what the hash gate asserts.
    *
    * At 100 TB: the CAS is one conditional metadata put per commit
    * (never data-sized), conflict adjudication is a key-pruned
    * anti-join of the loser's write set against ONLY the commits it
    * raced with (work ∝ |write set| + |concurrent commits|, never
    * O(table)), and the retry re-reads just the keys its transaction
    * touches. Own artifact copy — this op appends commits and must not
    * mutate the log the time-travel/CDF keys read (the vacuum isolation
    * rule). */
  def concurrentWriters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val srcKey = "spark.graft.occ.src"
    val dirKey = "spark.graft.occ.dir"
    if (!s.conf.getOption(srcKey).contains(d)) {
      val dir = java.nio.file.Files.createTempDirectory("graft_occ").toString
      stageCommitLog(s, d, dir)
      val files = readLog(dir)
      val parent = files.map(_._1).max // 2 — BOTH writers snapshot here
      val snap = timeTravelAsOf(s, files.filter(_._1 <= parent).map(_._2))
        .localCheckpoint() // both writers + the overlap probe read it
      var attempts = 0L
      var conflicts = 0L
      // writer A: prepares from v2, CAS at expected parent 2 → lands v3
      attempts += 1
      val aLanded = tryCommit(s, dir, parent, occWriterA(snap)
        .select($"k", $"status", $"cents",
          lit(parent + 1).as("version"), lit("upsert").as("op")))
      require(aLanded, "writer A raced nobody and must land v3")
      // writer B: STALE attempt from the same snapshot at the same
      // expected parent — the head moved, the CAS must refuse
      attempts += 1
      val staleB = occWriterB(snap)
      if (!tryCommit(s, dir, parent, staleB
          .select($"k", $"status", $"cents",
            lit(parent + 1).as("version"), lit("upsert").as("op")))) {
        conflicts += 1
        // adjudicate + RETRY: re-read the advanced snapshot, re-execute
        val files3 = readLog(dir)
        val snap3 = timeTravelAsOf(s, files3.map(_._2))
        attempts += 1
        require(tryCommit(s, dir, parent + 1, occWriterB(snap3)
          .select($"k", $"status", $"cents",
            lit(parent + 2).as("version"), lit("upsert").as("op"))),
          "writer B retried against the current head and must land v4")
      }
      // the conflict is a ROW conflict, not just a version clash: B's
      // write set intersects A's committed keys (replayable count)
      val overlap = staleB.select($"k")
        .join(occWriterA(snap).select($"k"), Seq("k"), "left_semi")
        .count()
      // ---- rung 6 (round-15 verdict item 4): the DISJOINT fast path —
      // the common case every lakehouse optimizes: a version conflict
      // WITHOUT a row conflict rebases the already-computed write set
      // (re-stamp at the new version) with NO re-read and NO
      // re-execution. Sound because disjoint writes commute: v5 touched
      // none of D's input rows, so re-executing D on v5 would produce
      // byte-identical output (the MaintenanceSpec law asserts exactly
      // that equality).
      val files4 = readLog(dir)
      val parent4 = files4.map(_._1).max // 4 — C and D both snapshot here
      val snap4 = timeTravelAsOf(s, files4.map(_._2))
        .localCheckpoint() // C, D, and the overlap probe read it
      attempts += 1
      require(tryCommit(s, dir, parent4, occWriterC(snap4)
          .select($"k", $"status", $"cents",
            lit(parent4 + 1).as("version"), lit("upsert").as("op"))),
        "writer C raced nobody and must land v5")
      attempts += 1
      val staleD = occWriterD(snap4)
      var rebases = 0L
      if (!tryCommit(s, dir, parent4, staleD
          .select($"k", $"status", $"cents",
            lit(parent4 + 1).as("version"), lit("upsert").as("op")))) {
        conflicts += 1
        // adjudicate against ONLY the raced commit's keys (∝ |write set|)
        val dOverlap = staleD.select($"k")
          .join(occWriterC(snap4).select($"k"), Seq("k"), "left_semi")
          .count()
        attempts += 1
        if (dOverlap == 0L) {
          // fast path: the SAME rows, re-stamped — no snapshot re-read
          rebases += 1
          require(tryCommit(s, dir, parent4 + 1, staleD
              .select($"k", $"status", $"cents",
                lit(parent4 + 2).as("version"), lit("upsert").as("op"))),
            "writer D's rebase raced nobody and must land v6")
        } else {
          // row conflict: the B path — re-execute on the current head
          val headFiles = readLog(dir)
          require(tryCommit(s, dir, parent4 + 1,
            occWriterD(timeTravelAsOf(s, headFiles.map(_._2)))
              .select($"k", $"status", $"cents",
                lit(parent4 + 2).as("version"), lit("upsert").as("op"))))
        }
      }
      Seq((attempts, conflicts, overlap, rebases))
        .toDF("n_attempts", "n_conflicts", "n_overlap_keys", "n_rebases")
        .write.mode("overwrite").parquet(s"$dir/meta")
      graft.core.SessionArtifacts.resetDir(s, dirKey, dir)
      s.conf.set(srcKey, d)
    }
    val dir = s.conf.get(dirKey)
    val files = readLog(dir)
    val meta = s.read.parquet(s"$dir/meta")
    (2L to 6L).map { v =>
      timeTravelAsOf(s, files.filter(_._1 <= v).map(_._2))
        .agg(count(lit(1)).as("n_rows"), sum($"cents").as("sum_cents"))
        .select(lit(v).as("version"), col("n_rows"), col("sum_cents"))
    }.reduce(_ unionByName _).crossJoin(meta) // 1-row scalar attach
  }

  val oracle: Map[String, String] = Map(
    // analytic recompute of every version from the staging rules — the
    // engine's log/merge-on-read machinery must be invisible here
    "maint_time_travel" -> """
      WITH v0 AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      v1 AS (
        SELECT k,
               CASE WHEN k % 10 = 0 THEN 'U' ELSE status END AS status,
               cents + CASE WHEN k % 10 = 0 THEN 100 ELSE 0 END AS cents
        FROM v0
        UNION ALL
        SELECT k + (SELECT max(k) + 1 FROM v0), 'N', cents
        FROM v0 WHERE k % 7 = 0),
      v2 AS (
        SELECT k, status,
               cents + CASE WHEN k % 10 = 3 THEN 250 ELSE 0 END AS cents
        FROM v1 WHERE k % 97 <> 0)
      SELECT CAST(0 AS BIGINT) AS version, count(*) AS n_rows,
             CAST(sum(cents) AS BIGINT) AS sum_cents FROM v0
      UNION ALL
      SELECT 1, count(*), CAST(sum(cents) AS BIGINT) FROM v1
      UNION ALL
      SELECT 2, count(*), CAST(sum(cents) AS BIGINT) FROM v2""",
    // OCC serializability: the final state must equal A-then-B applied
    // SEQUENTIALLY to the analytic v2 (the retry re-executed on A's
    // snapshot, so no lost update), and the protocol counters replay as
    // constants — 3 attempts, 1 conflict, the modular overlap count
    "maint_concurrent" -> """
      WITH v0 AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      v1 AS (
        SELECT k,
               CASE WHEN k % 10 = 0 THEN 'U' ELSE status END AS status,
               cents + CASE WHEN k % 10 = 0 THEN 100 ELSE 0 END AS cents
        FROM v0
        UNION ALL
        SELECT k + (SELECT max(k) + 1 FROM v0), 'N', cents
        FROM v0 WHERE k % 7 = 0),
      v2 AS (
        SELECT k, status,
               cents + CASE WHEN k % 10 = 3 THEN 250 ELSE 0 END AS cents
        FROM v1 WHERE k % 97 <> 0),
      v3 AS (
        SELECT k, status,
               cents + CASE WHEN k % 11 = 5 THEN 70 ELSE 0 END AS cents
        FROM v2),
      v4 AS (
        SELECT k, status,
               cents + CASE WHEN k % 3 = 1 THEN 30 ELSE 0 END AS cents
        FROM v3),
      v5 AS (
        SELECT k, status,
               cents + CASE WHEN k % 13 = 2 THEN 110 ELSE 0 END AS cents
        FROM v4),
      v6 AS (
        SELECT k, status,
               cents + CASE WHEN k % 13 = 7 THEN 50 ELSE 0 END AS cents
        FROM v5),
      meta AS (
        SELECT CAST(6 AS BIGINT) AS n_attempts,
               CAST(2 AS BIGINT) AS n_conflicts,
               (SELECT count(*) FROM v2 WHERE k % 11 = 5 AND k % 3 = 1)
                 AS n_overlap_keys,
               CAST(1 AS BIGINT) AS n_rebases)
      SELECT v.version, v.n_rows, v.sum_cents,
             m.n_attempts, m.n_conflicts, m.n_overlap_keys, m.n_rebases
      FROM (
        SELECT CAST(2 AS BIGINT) AS version, count(*) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS sum_cents FROM v2
        UNION ALL
        SELECT 3, count(*), CAST(sum(cents) AS BIGINT) FROM v3
        UNION ALL
        SELECT 4, count(*), CAST(sum(cents) AS BIGINT) FROM v4
        UNION ALL
        SELECT 5, count(*), CAST(sum(cents) AS BIGINT) FROM v5
        UNION ALL
        SELECT 6, count(*), CAST(sum(cents) AS BIGINT) FROM v6) v
      CROSS JOIN meta m""",
    // post-vacuum reads at/above the horizon must equal the analytic
    // recompute — checkpoint, log rewrite, and file deletion invisible
    "maint_vacuum" -> """
      WITH v0 AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      v1 AS (
        SELECT k,
               CASE WHEN k % 10 = 0 THEN 'U' ELSE status END AS status,
               cents + CASE WHEN k % 10 = 0 THEN 100 ELSE 0 END AS cents
        FROM v0
        UNION ALL
        SELECT k + (SELECT max(k) + 1 FROM v0), 'N', cents
        FROM v0 WHERE k % 7 = 0),
      v2 AS (
        SELECT k, status,
               cents + CASE WHEN k % 10 = 3 THEN 250 ELSE 0 END AS cents
        FROM v1 WHERE k % 97 <> 0)
      SELECT CAST(1 AS BIGINT) AS version, count(*) AS n_rows,
             CAST(sum(cents) AS BIGINT) AS sum_cents FROM v1
      UNION ALL
      SELECT 2, count(*), CAST(sum(cents) AS BIGINT) FROM v2""",
    // restore-to-v1 appends an anti-diff commit: v3's state must equal
    // the ANALYTIC v1 recompute while v2 stays reconstructable
    "maint_restore" -> """
      WITH v0 AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      v1 AS (
        SELECT k,
               CASE WHEN k % 10 = 0 THEN 'U' ELSE status END AS status,
               cents + CASE WHEN k % 10 = 0 THEN 100 ELSE 0 END AS cents
        FROM v0
        UNION ALL
        SELECT k + (SELECT max(k) + 1 FROM v0), 'N', cents
        FROM v0 WHERE k % 7 = 0),
      v2 AS (
        SELECT k, status,
               cents + CASE WHEN k % 10 = 3 THEN 250 ELSE 0 END AS cents
        FROM v1 WHERE k % 97 <> 0)
      SELECT CAST(2 AS BIGINT) AS version, count(*) AS n_rows,
             CAST(sum(cents) AS BIGINT) AS sum_cents FROM v2
      UNION ALL
      SELECT 3, count(*), CAST(sum(cents) AS BIGINT) FROM v1""",
    // the analytic change sets from the staging rules: v1 reprices
    // (update) + clone-inserts, v2 deletes + repricess the survivors
    "maint_cdf_versions" -> """
      WITH v0 AS (
        SELECT o_orderkey AS k, o_orderstatus AS status,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      v1 AS (
        SELECT k,
               CASE WHEN k % 10 = 0 THEN 'U' ELSE status END AS status,
               cents + CASE WHEN k % 10 = 0 THEN 100 ELSE 0 END AS cents
        FROM v0
        UNION ALL
        SELECT k + (SELECT max(k) + 1 FROM v0), 'N', cents
        FROM v0 WHERE k % 7 = 0)
      SELECT CAST(1 AS BIGINT) AS version, k, 'update' AS change,
             cents AS pre_cents, cents + 100 AS post_cents
      FROM v0 WHERE k % 10 = 0
      UNION ALL
      SELECT 1, k + (SELECT max(k) + 1 FROM v0), 'insert',
             CAST(NULL AS BIGINT), cents
      FROM v0 WHERE k % 7 = 0
      UNION ALL
      SELECT 2, k, 'delete', cents, CAST(NULL AS BIGINT)
      FROM v1 WHERE k % 97 = 0
      UNION ALL
      SELECT 2, k, 'update', cents, cents + 250
      FROM v1 WHERE k % 97 <> 0 AND k % 10 = 3""",
    "maint_incremental_agg" -> """
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
             CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mn_cents,
             CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mx_cents,
             count(DISTINCT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')) AS n_days
      FROM events GROUP BY 1""",

    // the observed globals are replayed as scalar subqueries; the
    // conservation invariant (sum of per-flag n == obs_rows) is implied
    // by the shared source and checked by the hash compare
    "maint_observe_metrics" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS flag_cents,
             (SELECT count(*) FROM lineitem) AS obs_rows,
             (SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
              FROM lineitem) AS obs_price_cents,
             (SELECT count(*) FROM lineitem WHERE l_discount > 0.05)
               AS obs_discounted
      FROM lineitem GROUP BY l_returnflag""",

    // RI checks use NOT EXISTS (not NOT IN): a NULL child key must count
    // as an orphan, matching the engine's LEFT ANTI equality semantics —
    // NOT IN would return UNKNOWN and silently uncount it.
    "maint_expectations" -> """
      WITH checks AS (
        SELECT 'orders.o_custkey.not_null' AS check_name,
               count(*) AS n_rows,
               count(*) FILTER (WHERE o_custkey IS NULL) AS n_violations
        FROM orders
        UNION ALL
        SELECT 'orders.o_orderkey.unique', count(*),
               count(*) - count(DISTINCT o_orderkey) FROM orders
        UNION ALL
        SELECT 'orders.o_totalprice.positive', count(*),
               count(*) FILTER (WHERE o_totalprice <= 0) FROM orders
        UNION ALL
        SELECT 'orders.o_orderstatus.in_set', count(*),
               count(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P'))
        FROM orders
        UNION ALL
        SELECT 'lineitem.l_quantity.range_1_50', count(*),
               count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem.l_shipdate.not_null', count(*),
               count(*) FILTER (WHERE l_shipdate IS NULL) FROM lineitem
        UNION ALL
        SELECT 'documents.text.nonempty', count(*),
               count(*) FILTER (WHERE text IS NULL OR length(text) = 0)
        FROM documents
        UNION ALL
        SELECT 'orders.o_custkey.ref_customer', count(*),
               count(*) FILTER (WHERE NOT EXISTS (
                 SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        FROM orders o
        UNION ALL
        SELECT 'lineitem.l_orderkey.ref_orders', count(*),
               count(*) FILTER (WHERE NOT EXISTS (
                 SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        FROM lineitem l)
      SELECT check_name, n_rows, n_violations,
             CAST(n_violations = 0 AS BIGINT) AS passed
      FROM checks""",
    "maint_snapshot_diff" -> """
      WITH b AS (SELECT o_orderkey AS k,
                        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                 FROM orders)
      SELECT 'delete' AS change, count(*) AS n,
             CAST(-sum(cents) AS BIGINT) AS cents_delta
      FROM b WHERE k % 97 = 0 HAVING count(*) > 0
      UNION ALL
      SELECT 'update', count(*), CAST(250 * count(*) AS BIGINT)
      FROM b WHERE k % 97 <> 0 AND k % 10 = 3 HAVING count(*) > 0
      UNION ALL
      SELECT 'insert', count(*), CAST(sum(cents) AS BIGINT)
      FROM b WHERE k % 50 = 0 HAVING count(*) > 0
      UNION ALL
      SELECT 'unchanged', count(*), CAST(0 AS BIGINT)
      FROM b WHERE k % 97 <> 0 AND k % 10 <> 3 HAVING count(*) > 0""",

    "maint_compact" -> "SELECT doc_id, text FROM documents",
    "maint_skew_report" -> """
      WITH cnt AS (SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY 1),
      r AS (SELECT cnt, row_number() OVER (ORDER BY cnt ASC, l_suppkey ASC) AS rk
            FROM cnt),
      s AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total_rows,
                   min(cnt) AS min_cnt, max(cnt) AS max_cnt
            FROM cnt)
      SELECT n_keys, total_rows, min_cnt, max_cnt,
             (SELECT cnt FROM r, s WHERE rk = ((n_keys - 1) * 50) // 100 + 1)
               AS p50_cnt,
             (SELECT cnt FROM r, s WHERE rk = ((n_keys - 1) * 99) // 100 + 1)
               AS p99_cnt,
             CAST(CAST(max_cnt AS HUGEINT) * n_keys * 1000000 // total_rows
               AS BIGINT) AS max_over_mean_ppm
      FROM s""",
    "maint_weighted_sample" -> s"""
      WITH pri AS (
        SELECT doc_id, source, n_chars,
               (CAST(n_chars AS DOUBLE) * 4294967296)
                 / (${md5Hex32Sql("CAST(doc_id AS VARCHAR)")} + 1) AS q
        FROM documents)
      SELECT doc_id, source, n_chars, q,
             row_number() OVER (ORDER BY q DESC, doc_id ASC) AS rk
      FROM pri ORDER BY q DESC, doc_id ASC LIMIT 100""",
    "maint_zorder" -> s"""
      SELECT z >> 12 AS bucket, count(*) AS n,
             min(l_partkey) AS min_part, max(l_partkey) AS max_part,
             min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
      FROM (SELECT l_partkey, l_suppkey,
                   $zMortonSql AS z
            FROM lineitem)
      GROUP BY 1""",
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
             count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM (SELECT n_chars, $hexBucketSql AS b FROM documents)
      GROUP BY 1""",
    "maint_hash_split_docs" -> s"""
      SELECT doc_id, b AS bucket,
             CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id, $hexBucketSql AS b FROM documents)""",
    "maint_analyze" -> """
      SELECT count(*) AS n_rows,
             CAST(count(*) - count(o_custkey) AS BIGINT) AS custkey_nulls,
             min(o_custkey) AS custkey_min, max(o_custkey) AS custkey_max,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS custkey_ndv,
             min(CAST(round(o_totalprice * 100) AS BIGINT)) AS price_min_cents,
             max(CAST(round(o_totalprice * 100) AS BIGINT)) AS price_max_cents,
             CAST(count(DISTINCT CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS price_ndv,
             CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS status_ndv,
             min(o_orderstatus) AS status_min, max(o_orderstatus) AS status_max,
             min(CAST(o_orderdate AS TIMESTAMP)) AS date_min,
             max(CAST(o_orderdate AS TIMESTAMP)) AS date_max,
             CAST(count(DISTINCT o_orderdate) AS BIGINT) AS date_ndv
      FROM orders""",

    "maint_backfill" -> """
      WITH ev AS (
        SELECT strftime(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP),
                        '%Y-%m-%d') AS day,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      days AS (SELECT DISTINCT day FROM ev ORDER BY day LIMIT 11),
      target AS (SELECT max(day) AS t FROM days)
      SELECT day, count(*) AS n,
             CAST(sum(cents * CASE WHEN day = (SELECT t FROM target)
                                   THEN 2 ELSE 1 END) AS BIGINT) AS sum_cents
      FROM ev GROUP BY day""",

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
