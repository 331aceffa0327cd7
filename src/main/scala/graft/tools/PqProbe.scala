package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Floor calibration for simsearch_pq_recall ("measure, don't guess"). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    dirs.foreach { d =>
      val exact = graft.operators.SimSearch.bruteTopKShared(spark, d)
      graft.operators.Dedup.recallCounts(exact.select(col("q_id"), col("n_id")),
        graft.operators.SimSearch.pqTopK(spark, d).select(col("q_id"), col("n_id")),
        Seq("q_id", "n_id")).collect().foreach(r => println(s"$d -> $r"))
    }
    spark.stop()
  }
}
