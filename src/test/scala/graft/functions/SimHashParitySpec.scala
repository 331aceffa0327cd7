package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused SimHash64 expression must be bit-identical to the 64-fold
  * declarative formulation it replaced — same token hashes, same votes,
  * same bits — in both codegen and interpreted evaluation. */
class SimHashParitySpec extends SparkSpec {

  test("fused simhash64 == declarative 64-fold bit votes on fixture docs") {
    import spark.implicits._
    SimHashFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, sf).limit(200)
    val mismatches = docs
      .select(graft.operators.Dedup.simhash($"text").as("fused"),
              graft.operators.Dedup.simhashDeclarative($"text").as("decl"))
      .where($"fused" =!= $"decl")
      .count()
    assert(mismatches == 0L)
  }

  test("interpreted eval matches codegen (unicode + empty + single token)") {
    import spark.implicits._
    SimHashFunctions.register(spark)
    val rows = Seq("héllo wörld ünicode", "", "single",
      "a b c d e f g h i j k l m n o p").toDF("text")
    val fused = rows.select(graft.operators.Dedup.simhash($"text")).collect().map(_.getLong(0))
    val decl = rows.select(graft.operators.Dedup.simhashDeclarative($"text")).collect().map(_.getLong(0))
    assert(fused.toSeq == decl.toSeq)
  }
}
