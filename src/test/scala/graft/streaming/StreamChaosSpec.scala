package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.BeforeAndAfterAll

/** Streaming checkpoint-recovery law — the streaming twin of the batch
  * ChaosSpec. The reference's entire fault-tolerance story is checkpoint
  * resume + injected kills (`cmd/master/master_replicate.go:10-72` saves
  * per-task completion to etcd and skips completed tasks on re-entry;
  * `kubernetes/worker-failure-deployment.yaml:32-33` runs with `FAIL=n`
  * so workers die mid-job and the job must still produce the failure-free
  * answer). The engine's streaming analog: a query killed BETWEEN
  * microbatches or MID-batch and restarted against the same checkpoint
  * dir must produce exactly the uninterrupted run's output — the
  * exactly-once restart guarantee a streaming user actually relies on.
  *
  * Three production shapes are pinned, each against its own declared
  * query as the uninterrupted reference:
  *  - watermarked windowed agg in APPEND mode to a FILE sink (the
  *    transaction-log sink): kill between batches, restart, read-back
  *    must equal [[Streams.tumblingAppend]] with zero duplicate windows
  *    — watermark state recovery + sink-log exactly-once together;
  *  - `transformWithState` under the RocksDB provider: kill between
  *    batches; run 2's MapState must CONTINUE run 1's totals (not
  *    restart at zero), so last-revision-per-key equals
  *    [[Streams.transformState]];
  *  - the foreachBatch CDC merge ([[Streams.upsertMerge]] — the exact
  *    production body, not a copy): one kill MID-batch before the merge
  *    (re-delivery path) and one AFTER the snapshot commit but before
  *    the checkpoint commit (the at-least-once window — replay must hit
  *    the idempotent skip, not double-apply), final snapshot equals
  *    [[Streams.upsertSink]].
  *
  * The kill-between-batches mechanic is deterministic: the staged slice
  * files are fed to the source dir incrementally, so run 1 exhausts
  * slice 0, stops (offsets committed for exactly the batches it ran),
  * and run 2 finds slices 1–2 — no racing a stop() against an executing
  * trigger. The mid-batch kills throw inside foreachBatch on the first
  * attempt only (armed AtomicBooleans — foreachBatch runs on the
  * driver), which fails the query the way a crashed executor batch does:
  * offsets written, commit missing. */
class StreamChaosSpec extends SparkSpec with BeforeAndAfterAll {
  import StreamChaosSpec._

  private val schema = StructType.fromDDL(
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")

  /** The shared staged fixture's slice files, oldest-first — the same
    * slices every declared streaming query replays. */
  private lazy val slices: Seq[java.nio.file.Path] = {
    val staged = java.nio.file.Paths.get(Streams.stagedEventsDir(spark, sf))
    val listing = java.nio.file.Files.list(staged)
    try listing.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.toString.endsWith(".parquet")).sortBy(_.getFileName.toString)
    finally listing.close()
  }

  private val tempDirs = scala.collection.mutable.Buffer[java.nio.file.Path]()
  private def tmp(prefix: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    tempDirs += d
    d
  }

  /** Copy staged slice i into the live source dir with the same
    * deterministic increasing mtime discipline as the staging itself. */
  private def feed(dir: java.nio.file.Path, i: Int): Unit = {
    val dst = dir.resolve(f"slice_$i%02d.parquet")
    java.nio.file.Files.copy(slices(i), dst)
    java.nio.file.Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
  }

  private def src(dir: java.nio.file.Path): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros(col("ts")))

  /** Sorted canonical row-set compare (all columns stringified) — the
    * same discipline as the driver's hash compare. */
  private def assertSameRows(actual: DataFrame, expected: DataFrame): Unit = {
    val cols = expected.columns.sorted
    def canon(df: DataFrame) = df
      .select(cols.map(c => col(c).cast("string").as(c)): _*)
      .collect().map(_.mkString("")).sorted.toSeq
    assert(actual.columns.sorted.toSeq === cols.toSeq,
      s"schema mismatch: ${actual.columns.sorted.mkString(",")} vs ${cols.mkString(",")}")
    assert(canon(actual) === canon(expected))
  }

  test("append windowed agg + file sink: killed between batches, restart from checkpoint equals uninterrupted run") {
    val in = tmp("chaos_append_in"); val ckpt = tmp("chaos_append_ckpt")
    val out = tmp("chaos_append_out")
    def agg = src(in)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           (sum(round(col("value") * 100).cast("bigint")) / 100.0).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("total"))
    def start() = agg.writeStream.outputMode("append").format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString).start()

    feed(in, 0)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val killedAt = q1.lastProgress.batchId
    assert(killedAt >= 0, "run 1 processed no batch")

    feed(in, 1); feed(in, 2)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // resumed, not restarted from scratch: batch ids continue past run 1's
    assert(q2.lastProgress.batchId > killedAt,
      s"restart did not advance past run 1 (run1=$killedAt run2=${q2.lastProgress.batchId})")

    // the file sink's metadata log yields the exactly-once committed view
    val restarted = spark.read.parquet(out.toString)
    val dups = restarted.groupBy(col("w_start"), col("event_type"))
      .count().where(col("count") > 1).count()
    assert(dups === 0, "a finalized window was emitted twice across the kill")
    assertSameRows(restarted, Streams.tumblingAppend(spark, sf))
  }

  test("transformWithState (RocksDB): MapState recovered across restart — run 2 continues run 1's totals") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val in = tmp("chaos_tws_in"); val ckpt = tmp("chaos_tws_ckpt")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def updated = src(in)
        .select($"user_id", $"event_type", round($"value" * 100).cast("bigint").as("cents"))
        .as[(Long, String, Long)]
        .groupByKey(_._1)
        .transformWithState(new Streams.TypeTotals, TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "event_type", "n", "cents")
      // the memory sink refuses checkpoint recovery; capture update-mode
      // emissions through foreachBatch (which supports it) instead
      def run(): DataFrame = {
        emitted.clear()
        val q = updated.writeStream.outputMode("update")
          .option("checkpointLocation", ckpt.toString)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            emitted.addAll(java.util.Arrays.asList(batch.collect(): _*))
            ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        spark.createDataFrame(new java.util.ArrayList(emitted), updated.schema)
      }
      feed(in, 0)
      val a = run()
      feed(in, 1); feed(in, 2)
      val b = run()
      assert(a.count() > 0 && b.count() > 0, "both runs must emit")
      // a key spanning the kill is what makes this a recovery test at all:
      // its run-2 cumulative count includes run-1 rows ONLY if the MapState
      // was recovered from the checkpoint (a reset store would restart at 0
      // and the merged last-revision would undercount the full corpus)
      val spanning = a.select($"user_id", $"event_type")
        .intersect(b.select($"user_id", $"event_type")).count()
      assert(spanning > 0, "no (user, type) spans the kill — fixture degenerate")
      val merged = a.unionByName(b).groupBy($"user_id", $"event_type")
        .agg(max($"n").as("n"), max_by($"cents", $"n").as("cents"))
      assertSameRows(merged, Streams.transformState(spark, sf))
    } finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("foreachBatch CDC merge: mid-batch kill (pre-merge) and post-commit kill both recover to the uninterrupted snapshot") {
    import spark.implicits._
    val in = tmp("chaos_upsert_in"); val ckpt = tmp("chaos_upsert_ckpt")
    val root = tmp("chaos_upsert_root")
    feed(in, 0); feed(in, 1); feed(in, 2) // all data up front: 3 batches
    def stream = src(in).select($"user_id", $"ts".as("last_ts"),
      $"event_id".as("last_event_id"), $"event_type".as("last_type"),
      $"value".as("last_value"))
    def start() = stream.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // kill 1: first attempt of batch 1 dies BEFORE the merge — the
        // re-delivery path (offsets logged, nothing committed)
        if (batchId == 1 && killBeforeMerge.getAndSet(false))
          throw new RuntimeException("chaos: kill before merge of batch 1")
        Streams.upsertMerge(spark, root)(batch.toDF(), batchId)
        // kill 2: first attempt of batch 2 dies AFTER the snapshot commit
        // but before the checkpoint commit — the at-least-once window;
        // the replay must hit upsertMerge's idempotent skip
        if (batchId == 2 && killAfterCommit.getAndSet(false))
          throw new RuntimeException("chaos: kill after commit of batch 2")
      }
      .start()
    def runExpectingChaos(): Unit = {
      val q = start()
      val e = intercept[Throwable] {
        q.processAllAvailable()
        q.awaitTermination()
      }
      def chain(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))
      assert(chain(e).exists(_.contains("chaos")), s"unexpected failure: $e")
    }

    killBeforeMerge.set(true); killAfterCommit.set(true)
    runExpectingChaos() // dies mid-batch 1; only v0 committed
    assert(Streams.upsertCompleteVersions(root) === Seq(0L),
      "pre-merge kill must leave only batch 0's snapshot")
    runExpectingChaos() // batch 1 re-delivered + merged; batch 2 commits then dies
    assert(Streams.upsertCompleteVersions(root).sorted === Seq(0L, 1L, 2L),
      "post-commit kill must leave batch 2's snapshot on disk")
    val q3 = start() // batch 2 re-delivered: idempotent skip, then drains
    try q3.processAllAvailable() finally q3.stop()
    assert(Streams.upsertCompleteVersions(root).sorted === Seq(0L, 1L, 2L),
      "replay after post-commit kill must not fork the version chain")

    val restarted = spark.read
      .parquet(s"$root/v${Streams.upsertCompleteVersions(root).max}")
      .drop("last_event_id")
    assertSameRows(restarted, Streams.upsertSink(spark, sf))
  }

  override def afterAll(): Unit = {
    tempDirs.foreach { dir =>
      if (java.nio.file.Files.exists(dir))
        java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
    super.afterAll()
  }
}

object StreamChaosSpec {
  // armed once per scenario; foreachBatch executes on the driver, so a
  // static flag reaches it without serialization games
  val killBeforeMerge = new java.util.concurrent.atomic.AtomicBoolean(false)
  val killAfterCommit = new java.util.concurrent.atomic.AtomicBoolean(false)
  // update-mode emission capture for the transformWithState scenario
  // (foreachBatch collects on the driver; concurrent for safety)
  val emitted = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
}
