package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"PROF $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    graft.operators.Dedup.exact(spark, d).count() // warmup
    // minhash pipeline stages
    graft.functions.MinHashFunctions.register(spark)
    graft.functions.ShingleHashes.register(spark)
    val docs = graft.core.Tables.documents(spark, d)
    val withSig = docs
      .select($"doc_id", graft.functions.ShingleHashes.shingleHashes($"text", 12).as("hs"))
      .where(size($"hs") > 0)
      .select($"doc_id", graft.functions.MinHashFunctions.minhashSig($"hs").as("sig"))
    t("signatures")(withSig.count())
    val bands = graft.operators.Dedup.lshBands(withSig, "doc_id", "sig")
    t("bands")(bands.count())
    val cands = graft.operators.Dedup.lshCandidates(bands, "doc_id")
    t("cands")(println("cands: " + cands.count()))
    val ver = graft.operators.Dedup.verifyJaccard(cands, docs, graft.operators.Dedup.charShingles($"text", 12)).where($"jac" >= 0.9)
    t("verify")(println("pairs: " + ver.count()))
    t("minhash full")(graft.operators.Dedup.minhashLsh(spark, d).count())
    t("clusters full")(graft.operators.Dedup.minhashClusters(spark, d).count())
    t("winnow")(graft.SparkEntry.queries("text_winnow")(spark, d).count())
    t("winnow2")(graft.SparkEntry.queries("text_winnow")(spark, d).count())
    spark.stop()
  }
}
