package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Executable form of the fixture-length contract behind every
  * generate_series-bounded text oracle ([[TextAnalysis.MaxDocTokens]] /
  * [[TextAnalysis.MaxDocChars]]): the DuckDB side replays per-position
  * token/char walks through a constant-bounded series join while the
  * engine walks unbounded arrays, so a fixture document crossing the
  * bound would desynchronize the two silently. This spec makes the
  * crossing fail by NAME — and the halved thresholds leave headroom so
  * the failure arrives before the bound is actually breached. */
class FixtureContractSpec extends SparkSpec {
  test("fixture docs stay well under the declared oracle series bounds") {
    import spark.implicits._
    val m = graft.core.Tables.documents(spark, sf)
      .select(max(length($"text")).as("mc"),
              max(size(split(lower($"text"), " "))).as("mt"))
      .head()
    val (mc, mt) = (m.getInt(0), m.getInt(1))
    assert(mt <= TextAnalysis.MaxDocTokens / 2,
      s"fixture max tokens $mt is inside 2x of MaxDocTokens " +
        s"${TextAnalysis.MaxDocTokens} - regenerated corpus is about to " +
        "desynchronize the series-bounded text oracles; raise the " +
        "constant (both engines re-verify for free) before it crosses")
    assert(mc <= TextAnalysis.MaxDocChars / 2,
      s"fixture max chars $mc is inside 2x of MaxDocChars " +
        s"${TextAnalysis.MaxDocChars} - see MaxDocTokens note")
  }
}
