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

  test("every declared query is oracle-checked (no rows-only escapes)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // every approximation algorithm emits an oracle-checked bound instead
    // of raw engine-specific rows
    assert(rowsOnly.isEmpty, s"unexpected rows-only queries: $rowsOnly")
  }

  test("approx_count_distinct bound flags are all green") {
    val rows = SparkEntry.queries("agg_approx")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == 1L, s"approx_ok=0 for group ${r.getString(0)}")
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
