package graft.tools
import org.apache.spark.sql.SparkSession
object FlagProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    println("quantized_recall sf0.1:")
    graft.operators.SimSearch.quantizedRecall(spark, d).show()
    // raw recall numbers for floor calibration
    val exact = graft.operators.SimSearch.bruteTopKShared(spark, d)
    import org.apache.spark.sql.functions._
    graft.operators.Dedup.recallCounts(exact.select(col("q_id"), col("n_id")),
      graft.operators.SimSearch.quantizedTopK(spark, d).select(col("q_id"), col("n_id")),
      Seq("q_id", "n_id")).show()
    println("blocklist_bloom sf0.1:")
    graft.operators.Curation.blocklistBloom(spark, d).show()
    spark.stop()
  }
}
