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

    // the MinhashBandCap cold-regime premise: max (band_id, band_key)
    // population vs the production cap, + the capped generator's count
    // BEFORE the uncapped one (on an adversarial corpus the uncapped join
    // is the quadratic blowup being demonstrated — let the cheap numbers
    // land first; SPARK_GRAFT_PROFILE_SKIP_UNCAPPED skips it entirely)
    time("max band pop")(bands.groupBy("band_id", "band_key").count()
      .agg(max("count")).head.getLong(0) + s" (cap ${Dedup.MinhashBandCap})")
    time("..+cands capped")(Dedup.lshCandidatesCapped(bands, "doc_id").count())

    if (!sys.env.contains("SPARK_GRAFT_PROFILE_SKIP_UNCAPPED")) {
      val cands = Dedup.lshCandidates(bands, "doc_id")
      time("..+cands")(cands.count())
    }

    // On an adversarial (planted-clique) corpus the UNCAPPED verify stage
    // is the quadratic blowup being demonstrated — skip it there and
    // time the capped LABEL pipeline end-to-end instead.
    if (sys.env.contains("SPARK_GRAFT_PROFILE_CANDS_ONLY")) {
      time("capped labels e2e") {
        import org.apache.spark.sql.functions.col
        Dedup.connectedComponents(
          Dedup.verifyJaccard(Dedup.lshCandidatesCapped(bands, "doc_id"),
              docsRaw, Dedup.charShingles(col("text"), 12))
            .where(col("jac") >= 0.9)
            .select(col("a"), col("b"))).count()
      }
    } else {
      time("full minhashPairs")(Dedup.minhashLsh(spark, d).count())
    }
    spark.stop()
  }
}
