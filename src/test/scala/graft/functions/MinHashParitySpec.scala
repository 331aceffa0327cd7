package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The fused codegen signature path (ShingleHashes → MinHashSig) must be
  * bit-identical to the declarative path
  * (charShingles → transform(pmod(xxhash64)) → MinHashSig): same XXH64
  * seed over the same byte ranges, same Mersenne fold, and MinHash's
  * min is invariant to the duplicate shingles the fused path keeps. */
class MinHashParitySpec extends SparkSpec {

  test("fused ShingleHashes signature == declarative charShingles signature") {
    import spark.implicits._
    MinHashFunctions.register(spark)
    ShingleHashes.register(spark)
    val docs = graft.core.Tables.documents(spark, sf)

    val declarative = docs
      .select($"doc_id", Dedup.charShingles($"text", 12).as("sh"))
      .where(size($"sh") > 0)
      .select($"doc_id", Dedup.minhashSignature($"sh").as("sig"))

    val fused = docs
      .select($"doc_id", ShingleHashes.shingleHashes($"text", 12).as("hs"))
      .where(size($"hs") > 0)
      .select($"doc_id", MinHashFunctions.minhashSig($"hs").as("sig"))

    val d = declarative.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val f = fused.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(d.keySet === f.keySet)
    d.foreach { case (id, sig) => assert(sig === f(id), s"doc $id") }
  }

  test("unicode text: fused hashes equal pmod(xxhash64(substr)) per shingle") {
    import spark.implicits._
    ShingleHashes.register(spark)
    val rows = Seq("animal’s café naïve żółć — twelve+ chars", "short", "exactly12char")
      .toDF("text")
    val both = rows.select(
      ShingleHashes.shingleHashes($"text", 12).as("fused"),
      Dedup.charShingles($"text", 12).as("sh"))
      .select($"fused",
        transform($"sh", sh => pmod(xxhash64(sh), lit(2147483647L))).as("decl"))
      .collect()
    both.foreach { r =>
      // fused keeps duplicates; declarative is distinct — compare as sets
      assert(r.getSeq[Long](0).toSet === r.getSeq[Long](1).toSet)
    }
  }
}
