package graft.operators

import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {

  test("stratified sample respects per-stratum fractions and is deterministic") {
    val totals = graft.core.Tables.orders(spark, sf)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s1 = Maintenance.rawStratifiedSample(spark, sf)
    val s2 = Maintenance.rawStratifiedSample(spark, sf)
    val got = s1.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Map("F" -> 0.5, "O" -> 0.25, "P" -> 1.0)
    want.foreach { case (k, frac) =>
      val rate = got.getOrElse(k, 0L).toDouble / totals(k)
      // Bernoulli sampling: loose 3-sigma-ish bounds at test SF
      assert(math.abs(rate - frac) < 0.15, s"stratum $k rate=$rate want≈$frac")
    }
    assert(s1.collect().map(_.getLong(0)).sorted.toSeq ===
           s2.collect().map(_.getLong(0)).sorted.toSeq, "same seed must resample identically")
  }

  test("expectations: planted violations are counted exactly, clean tables all pass") {
    import spark.implicits._
    import java.sql.Date
    // orders: 1 null custkey, 1 duplicated orderkey, 1 non-positive price,
    // 1 status outside {O,F,P}, and custkey 99 absent from customer
    val orders = Seq(
      (1L, Option(10L), "O", 5.0),
      (2L, None, "F", 6.0),        // null custkey (also an RI orphan)
      (3L, Option(10L), "F", -1.0), // non-positive price
      (3L, Option(11L), "P", 7.0),  // duplicate orderkey
      (4L, Option(99L), "X", 8.0))  // bad status + FK orphan
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val lineitem = Seq(
      (1L, 5.0, Option(Date.valueOf("1995-01-01"))),
      (1L, 99.0, Option(Date.valueOf("1995-01-02"))), // qty out of range
      (7L, 3.0, None))       // null shipdate + orderkey 7 not in orders
      .toDF("l_orderkey", "l_quantity", "l_shipdate")
    val documents = Seq((1L, "hello"), (2L, "")).toDF("doc_id", "text")
    val customer = Seq(10L, 11L).toDF("c_custkey")
    val got = Maintenance.expectationsOf(orders, lineitem, documents, customer)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("orders.o_custkey.not_null") == ((5L, 1L, 0L)))
    assert(got("orders.o_orderkey.unique") == ((5L, 1L, 0L)))
    assert(got("orders.o_totalprice.positive") == ((5L, 1L, 0L)))
    assert(got("orders.o_orderstatus.in_set") == ((5L, 1L, 0L)))
    // null custkey AND unknown key 99 both orphan under anti-join semantics
    assert(got("orders.o_custkey.ref_customer") == ((5L, 2L, 0L)))
    assert(got("lineitem.l_quantity.range_1_50") == ((3L, 1L, 0L)))
    assert(got("lineitem.l_shipdate.not_null") == ((3L, 1L, 0L)))
    assert(got("lineitem.l_orderkey.ref_orders") == ((3L, 1L, 0L)))
    assert(got("documents.text.nonempty") == ((2L, 1L, 0L)))
    // the live fixture is clean: every expectation passes
    val live = Maintenance.expectations(spark, sf).collect()
    assert(live.length == 9)
    assert(live.forall(_.getLong(3) == 1L),
      live.filter(_.getLong(3) == 0L).mkString(", "))
  }

  test("compaction reduces file count to the target without changing content") {
    val out = Maintenance.compact(spark, sf, targetFiles = 3)
    val files = out.inputFiles
    assert(files.length === 3, files.mkString(", "))
    assert(out.count() === graft.core.Tables.documents(spark, sf).count())
  }

  test("weighted sample is stable under repartition and scale-invariant in the weights") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val base = Maintenance.weightedSampleOf(docs, 50).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("rk"))))
    // content-addressed: physical layout must not move the sample
    val reparted = Maintenance.weightedSampleOf(docs.repartition(13), 50).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("rk"))))
    assert(base.sorted.toSeq === reparted.sorted.toSeq)
    // priority q = w/u is homogeneous in w: scaling every weight by a
    // constant scales every priority equally, so the SELECTED SET (and
    // order) is identical — the sample depends on relative weights only
    val scaled = Maintenance.weightedSampleOf(
      docs.withColumn("n_chars", col("n_chars") * 7), 50).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("rk"))))
    assert(base.sorted.toSeq === scaled.sorted.toSeq)
    // weights matter: the weighted sample must differ from the unweighted
    // one (all weights equal → pure hash order) on this corpus
    val unweighted = Maintenance.weightedSampleOf(
      docs.withColumn("n_chars", lit(1L)), 50).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")))
    assert(base.map(_._1).toSet !== unweighted.toSet)
  }

  test("z-order buckets bound BOTH dimension extents; a linear sort leaves one unbounded") {
    import org.apache.spark.sql.functions._
    // sf0.001's 4 occupied buckets make extents degenerate — the layout
    // property needs sf0.01's 64-bucket grid (1999×99 key domain)
    val d01 = "/root/testdata/sf0.01"
    val li = graft.core.Tables.lineitem(spark, d01)
    val z = Maintenance.zorderLayoutOf(li)
      .agg(avg(col("max_supp") - col("min_supp")).as("avg_supp_ext"),
           avg(col("max_part") - col("min_part")).as("avg_part_ext"),
           count(lit(1)).as("n_buckets")).collect().head
    // linear layout twin: same file count, files cut along partkey order
    val nb = z.getLong(2).toInt
    val lin = li.select(col("l_partkey"), col("l_suppkey"),
        ntile(nb).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("l_partkey"), col("l_suppkey"), col("l_orderkey"), col("l_linenumber")))
          .as("bucket"))
      .groupBy("bucket")
      .agg((max("l_suppkey") - min("l_suppkey")).as("supp_ext"))
      .agg(avg(col("supp_ext"))).collect().head.getDouble(0)
    val suppDomain = li.agg(max("l_suppkey") - min("l_suppkey")).collect().head.getLong(0)
    // z buckets: suppkey extent well under the domain; partkey-sorted
    // files span (nearly) the whole suppkey domain in every file
    assert(z.getDouble(0) < 0.75 * suppDomain,
      s"z supp extent ${z.getDouble(0)} vs domain $suppDomain")
    assert(lin > 0.9 * suppDomain, s"linear layout should leave supp unbounded: $lin")
    assert(z.getDouble(0) < 0.8 * lin,
      s"z layout must beat linear on the second dim: z=${z.getDouble(0)} linear=$lin")
  }

  test("backfill rewrites only the target day's partition files") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    def listing(root: String): Map[String, Long] = {
      val s = Files.walk(Paths.get(root))
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
      finally s.close()
    }
    Maintenance.backfill(spark, sf).collect() // stages table + first repair
    val root = spark.conf.get("spark.graft.backfill.dir")
    val before = listing(root)
    Thread.sleep(1100) // parquet mtime granularity
    Maintenance.backfill(spark, sf).collect() // second repair of same day
    val after = listing(root)
    val (target, untouched) = before.keys.partition { p =>
      // the repaired day is the one whose files changed between runs
      !after.contains(p) || after(p) != before(p)
    }
    assert(untouched.nonEmpty, "expected non-target partitions to survive")
    assert(target.nonEmpty, "the repair must actually rewrite the target day")
    // every changed file is inside exactly one day= partition directory
    val targetDays = target.flatMap(_.split('/').find(_.startsWith("day=")).toSeq).toSet
    assert(targetDays.size <= 1, s"more than one partition rewritten: $targetDays")
    // untouched files are bit-identical paths with unchanged mtimes (static
    // overwrite mode would have truncated them all)
    untouched.foreach(p => assert(after(p) == before(p), p))
  }

  test("purge audit is consistent with the actual purged frame") {
    val audit = Maintenance.purgeAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val after = Maintenance.purge(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    audit.foreach { case (et, (before, purged, remain)) =>
      assert(before - purged === remain)
      assert(after.getOrElse(et, 0L) === remain, s"$et: audit=$remain purge=${after.get(et)}")
    }
    // no purged user survives
    val survivors = Maintenance.purge(spark, sf)
      .where(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.lit(10L)) === 7).count()
    assert(survivors === 0L)
  }

  test("time travel: v0 is the base snapshot and an as-of read never opens later commit files") {
    import org.apache.spark.sql.functions._
    val rows = Maintenance.timeTravel(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set(0L, 1L, 2L))
    // AS OF 0 must equal the base table exactly — later commits invisible
    val base = graft.core.Tables.orders(spark, sf)
      .agg(count(lit(1)), sum(round(col("o_totalprice") * 100).cast("bigint"))).head()
    assert(rows(0L) == ((base.getLong(0), base.getLong(1))))
    // v1 adds inserts (rows grow); v2 deletes (rows shrink vs v1)
    assert(rows(1L)._1 > rows(0L)._1 && rows(2L)._1 < rows(1L)._1)
    // log-pruning contract: reconstructing AS OF 1 must not open v2's
    // files — time travel is O(files ≤ v), not O(history)
    val dir = spark.conf.get("spark.graft.timetravel.dir")
    val opened = Maintenance.timeTravelAsOf(spark, Seq(s"$dir/v0", s"$dir/v1")).inputFiles
    assert(opened.nonEmpty && !opened.exists(_.contains("/v2/")))
    // merge-on-read reconciliation: a repriced key reads back with v1's
    // value, and a v2-deleted key is absent from AS OF 2
    val asOf2 = Maintenance.timeTravelAsOf(spark,
      Seq(s"$dir/v0", s"$dir/v1", s"$dir/v2"))
    assert(asOf2.where(col("k") % 97 === 0).count() == 0L)
  }

  test("vacuum: sub-horizon files are gone, post-vacuum reads open only " +
    "the checkpoint (+ later commits) and still reconstruct exactly") {
    import org.apache.spark.sql.functions._
    // vacuumed reads must equal the UN-vacuumed artifact's v1/v2 rows
    val before = Maintenance.timeTravel(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val after = Maintenance.vacuum(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(after.keySet == Set(1L, 2L))
    assert(after(1L) == before(1L) && after(2L) == before(2L),
      s"retained versions drifted under vacuum: $after vs $before")
    val dir = spark.conf.get("spark.graft.vacuum.dir")
    // retention is PHYSICAL: every file the rewritten log no longer
    // references is gone — v0 (below the horizon) AND v1 (superseded by
    // the checkpoint)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/v0")),
      "v0 survived vacuum — retention deleted nothing")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/v1")),
      "v1 survived vacuum — the checkpoint-superseded commit is retained garbage")
    // inverted inputFiles law: an as-of-2 read off the vacuumed log
    // opens ONLY checkpoint + v2 files — never a sub-horizon path
    val opened = Maintenance.timeTravelAsOf(spark,
      Seq(s"$dir/ckpt1", s"$dir/v2")).inputFiles
    assert(opened.nonEmpty && opened.forall(f =>
      f.contains("/ckpt1/") || f.contains("/v2/")), opened.mkString(","))
    // and the checkpoint is COMPACT: tombstones were resolved away
    assert(spark.read.parquet(s"$dir/ckpt1")
      .where(col("op") === "delete").count() == 0L)
  }

  test("cdf: change feed reconciles consecutive version states (counts " +
    "and cents-mass) and classifies inserts/updates/deletes correctly") {
    import org.apache.spark.sql.functions._
    val tt = Maintenance.timeTravel(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cdf = Maintenance.cdfVersions(spark, sf)
      .groupBy(col("version"), col("change"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("post_cents"), lit(0L))
          - coalesce(col("pre_cents"), lit(0L))).as("dcents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    for (v <- 1L to 2L) {
      val ins = cdf.getOrElse((v, "insert"), (0L, 0L))
      val del = cdf.getOrElse((v, "delete"), (0L, 0L))
      val upd = cdf.getOrElse((v, "update"), (0L, 0L))
      // row-count conservation: |state v| = |state v-1| + inserts - deletes
      assert(tt(v)._1 == tt(v - 1)._1 + ins._1 - del._1,
        s"v$v row conservation broke: $tt vs $cdf")
      // cents-mass conservation: Σcents(v) = Σcents(v-1) + Σ(post - pre)
      assert(tt(v)._2 == tt(v - 1)._2 + ins._2 + del._2 + upd._2,
        s"v$v cents conservation broke")
    }
    // v1 has no deletes; v2 has no inserts (the staging rules)
    assert(!cdf.contains((1L, "delete")) && !cdf.contains((2L, "insert")))
  }

  test("restore: the anti-diff commit is minimal (∝ changed keys, never " +
    "a table copy), history survives, and the restored state ≡ as-of-1") {
    import org.apache.spark.sql.functions._
    val rows = Maintenance.restore(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val tt = Maintenance.timeTravel(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // restored summary equals v1's; v2's still reconstructs (history kept)
    assert(rows(3L) == tt(1L) && rows(2L) == tt(2L))
    val dir = spark.conf.get("spark.graft.restore.dir")
    // minimality: |v3 commit| = keys v2 deleted + keys v2 repriced — the
    // exact changed-key count, a strict fraction of the table
    val v3 = spark.read.parquet(s"$dir/v3")
    val expected = Maintenance.timeTravelAsOf(spark, Seq(s"$dir/v0", s"$dir/v1"))
      .where(col("k") % 97 === 0 || (col("k") % 97 =!= 0 && col("k") % 10 === 3))
      .count()
    assert(v3.count() == expected,
      s"anti-diff commit has ${v3.count()} rows, expected $expected changed keys")
    assert(v3.count() * 4 < tt(1L)._1, "restore wrote a near-table-copy")
    // exactness: merge-on-read over all four commits ≡ as-of-1, row-level
    val restored = Maintenance.timeTravelAsOf(spark,
      Seq(s"$dir/v0", s"$dir/v1", s"$dir/v2", s"$dir/v3"))
    val asOf1 = Maintenance.timeTravelAsOf(spark, Seq(s"$dir/v0", s"$dir/v1"))
    assert(restored.exceptAll(asOf1).isEmpty && asOf1.exceptAll(restored).isEmpty)
  }
  test("occ: the losing writer's stale attempt leaves no trace, the " +
    "retry closes the lost-update gap, and the final state is serial") {
    import org.apache.spark.sql.functions._
    val rows = Maintenance.concurrentWriters(spark, sf).collect()
    // protocol counters: 6 attempts (A, B-stale, B-retry, C, D-stale,
    // D-rebase), exactly 2 conflicts (one row conflict, one
    // version-only), 1 fast-path rebase, and a NONEMPTY row overlap on
    // the B race — that conflict was real
    assert(rows.forall(r => r.getLong(3) == 6L && r.getLong(4) == 2L
      && r.getLong(6) == 1L))
    val overlap = rows.head.getLong(5)
    assert(overlap > 0L, "premise broke: writer write-sets no longer overlap")
    val byV = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byV.keySet == Set(2L, 3L, 4L, 5L, 6L))
    val dir = spark.conf.get("spark.graft.occ.dir")
    // no orphans from either loser: the log holds exactly v0..v6 once
    // each, and every commit file it names exists
    val log = Maintenance.readLog(dir)
    assert(log.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L))
    log.foreach { case (_, f) =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(f)), f) }
    // the lost update, quantified: B's STALE rows (computed from the v2
    // snapshot) differ from its COMMITTED v4 rows on exactly the overlap
    // keys, each short by A's +70 — re-stamping them would have undone A
    def files(v: Long) = log.filter(_._1 <= v).map(_._2)
    val snap2 = Maintenance.timeTravelAsOf(spark, files(2L))
    val stale = Maintenance.occWriterB(snap2)
      .select(col("k"), col("cents").as("stale_cents"))
    val committed = spark.read.parquet(s"$dir/v4")
      .select(col("k"), col("cents").as("v4_cents"))
    val diff = stale.join(committed, "k")
      .where(col("v4_cents") =!= col("stale_cents"))
    assert(diff.count() == overlap, "divergence must be exactly the overlap")
    assert(diff.where(col("v4_cents") - col("stale_cents") =!= 70L).count() == 0L)
    // rung-6 fast-path soundness (round 15): D's v6 commit was the
    // REBASE — rows computed from the v4 snapshot, re-stamped without
    // re-execution. Disjoint writes commute, so re-executing D against
    // the v5 head must produce byte-identical rows; assert it.
    val snap5 = Maintenance.timeTravelAsOf(spark, files(5L))
    val reexec = Maintenance.occWriterD(snap5)
      .select(col("k"), col("status"), col("cents"))
    val rebased = spark.read.parquet(s"$dir/v6")
      .select(col("k"), col("status"), col("cents"))
    assert(rebased.exceptAll(reexec).isEmpty && reexec.exceptAll(rebased).isEmpty,
      "fast-path rebase diverged from re-execution on a disjoint race")
    // and the disjointness premise itself: D's write set ∩ C's = ∅
    assert(rebased.join(
      Maintenance.occWriterC(Maintenance.timeTravelAsOf(spark, files(4L)))
        .select(col("k")), Seq("k"), "left_semi").count() == 0L)
    // serializability: merge-on-read over all seven commits equals
    // A, B, C, D applied sequentially to the as-of-2 state, row-level
    val serial = snap2.withColumn("cents",
        col("cents") + when(col("k") % 11 === 5, 70L).otherwise(0L))
      .withColumn("cents",
        col("cents") + when(col("k") % 3 === 1, 30L).otherwise(0L))
      .withColumn("cents",
        col("cents") + when(col("k") % 13 === 2, 110L).otherwise(0L))
      .withColumn("cents",
        col("cents") + when(col("k") % 13 === 7, 50L).otherwise(0L))
    val finalState = Maintenance.timeTravelAsOf(spark, files(6L))
    assert(finalState.exceptAll(serial).isEmpty && serial.exceptAll(finalState).isEmpty)
  }

}
