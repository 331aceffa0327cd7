package graft.tools

import org.apache.spark.sql.SparkSession

/** Floor-ratchet measurement for `dedup_semantic_ann` ("measure, don't
  * guess"): prints, per SF, the raw counts behind the key's two bounds —
  * IVF-cell pair recall vs the exact blocked join, and keep-verdict
  * agreement — so pairFloor/agreeFloor are set at ~0.8× measured. Run:
  *
  * {{{ sbt "runMain graft.tools.SemAnnProbe /root/testdata/sf0.01" }}}
  */
object SemAnnProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                        "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { d =>
      val r = graft.operators.Dedup.semanticAnnCounts(spark, d, tau = 0.45).head()
      val (ne, nf) = (r.getLong(0), r.getLong(1))
      val (nv, na) = (r.getLong(2), r.getLong(3))
      println(f"$d: pair_recall $nf/$ne = ${if (ne == 0) 1.0 else nf.toDouble / ne}%.4f" +
        f"  keep_agree $na/$nv = ${na.toDouble / nv}%.4f")
      graft.core.SessionArtifacts.clear(spark)
    }
    spark.stop()
  }
}
