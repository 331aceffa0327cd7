package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused WinnowFingerprints expression must produce the exact
  * (doc_id, fp) row set of the declarative md5 + sliding-min formulation
  * it replaced, in both codegen and interpreted evaluation. */
class WinnowParitySpec extends SparkSpec {

  test("fused winnowing == declarative md5 sliding-min on fixture docs") {
    val fused = graft.operators.TextAnalysis.winnowFingerprint(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val decl = graft.operators.TextAnalysis.winnowFingerprintDeclarative(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fused == decl)
    assert(fused.nonEmpty)
  }

  test("edge cases: short text empty, unicode positions match substr semantics") {
    import spark.implicits._
    WinnowFingerprints.register(spark)
    val rows = Seq(
      (1L, "tiny"),                         // < k+w-1 chars -> empty
      (2L, "exactly11ch"),                  // exactly k+w-1 = 11 -> 1 window
      (3L, "héllo wörld ünicode text with multibyte chars")).toDF("doc_id", "text")
    val fused = rows.select($"doc_id",
        WinnowFingerprints.winnowFingerprints(lower($"text"), 8, 4).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fused(1L).isEmpty)
    assert(fused(2L).size == 1)
    // declarative reference for the unicode row
    val t = lower(lit("héllo wörld ünicode text with multibyte chars"))
    val hashes = transform(sequence(lit(1), length(t) - 7), i => md5(t.substr(i, lit(8)).cast("binary")))
    val decl = rows.sparkSession.range(1)
      .select(array_distinct(transform(sequence(lit(1), size(hashes) - 3),
        j => array_min(slice(hashes, j, lit(4))))).as("fps"))
      .head.getSeq[String](0)
    assert(fused(3L) == decl)
  }
}
