package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** Scratch stage-by-stage profiler for the MinHash-LSH pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }

    val docsRaw = Tables.documents(spark, d)
    time("docs count")(docsRaw.count())
    time("docs chars")(docsRaw.agg(sum(length($"text"))).head.getLong(0))

    val docs = docsRaw.select($"doc_id", Dedup.charShingles($"text", 12).as("sh"))
      .where(size($"sh") > 0)
    time("shingle (warm1)")(docs.agg(sum(size($"sh"))).head.getLong(0))
    time("shingle (warm2)")(docs.agg(sum(size($"sh"))).head.getLong(0))

    graft.functions.MinHashFunctions.register(spark)
    val withSig = docs.select($"doc_id", Dedup.minhashSignature($"sh").as("sig"))
    time("shingle+sig")(withSig.agg(sum(size($"sig"))).head.getLong(0))

    val bands = Dedup.lshBands(withSig, "doc_id", "sig")
    time("shingle+sig+bands")(bands.count())

    val cands = Dedup.lshCandidates(bands, "doc_id")
    time("..+cands")(cands.count())

    time("full minhashPairs")(Dedup.minhashLsh(spark, d).count())
    spark.stop()
  }
}
