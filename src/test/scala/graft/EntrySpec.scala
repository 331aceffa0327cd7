package graft

/** Driver-contract invariants. */
class EntrySpec extends SparkSpec {
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle without query: $dangling")
  }

  test("rows-only queries are the known engine-specific set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("agg_approx", "dedup_simhash", "dedup_embedding_lsh",
        "simsearch_lsh_topk", "simsearch_ivf_topk", "sample_stratified"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("approx_count_distinct stays within 5% of exact") {
    import org.apache.spark.sql.functions._
    val exact = graft.core.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(count_distinct(col("l_partkey")).as("exact_parts"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("agg_approx")(spark, sf).collect()
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val e = exact(r.getString(0)).toDouble
      assert(math.abs(approx - e) / e < 0.05, s"approx=$approx exact=$e")
    }
  }

  test("multimodal decode batches deterministically") {
    val f = SparkEntry.queries("mm_decode")(spark, sf)
    val row = f.where(f("doc_id") === 0).head
    assert(row.getLong(1) > 0)
    // feature 0 is the first byte of the payload — 't' of "the fast key..."
    assert(row.getDouble(2) == 't'.toInt.toDouble)
  }
}
