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

  test("compaction reduces file count to the target without changing content") {
    val out = Maintenance.compact(spark, sf, targetFiles = 3)
    val files = out.inputFiles
    assert(files.length === 3, files.mkString(", "))
    assert(out.count() === graft.core.Tables.documents(spark, sf).count())
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
}
