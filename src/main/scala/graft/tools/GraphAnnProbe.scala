package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SimSearch}

/** Floor-ratchet measurement for `simsearch_graph_ann` ("measure, don't
  * guess"): prints, per SF, beam-search recall vs the exact top-k at the
  * key's fixed parametrization plus a beam/round sweep so the chosen
  * operating point is visibly on the curve, not arbitrary. Run:
  *
  * {{{ sbt "runMain graft.tools.GraphAnnProbe /root/testdata/sf0.01" }}}
  */
object GraphAnnProbe {
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
    import spark.implicits._
    dirs.foreach { d =>
      val exact = SimSearch.bruteTopKShared(spark, d).select($"q_id", $"n_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(beam: Int, rounds: Int): Double = {
        val got = SimSearch.graphAnnTopK(spark, d, beam = beam, rounds = rounds)
          .select($"q_id", $"n_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (exact & got).size.toDouble / exact.size
      }
      val fixed = recall(SimSearch.GraphAnnBeam, SimSearch.GraphAnnRounds)
      // the incremental twin's insert-edge recall, raw n_found/n_exact
      val ins = SimSearch.graphAnnInsertCounts(spark, d).head()
      val (nExact, nFound) = (ins.getLong(3), ins.getLong(4))
      // batch key (|Q| = n, distributed beam state): raw recall for its
      // own floor ratchet
      val n = graft.core.Tables.embeddings(spark, d).count()
      val bc = SimSearch.graphAnnBatchCounts(spark, d).head()
      val (bExact, bFound) = (bc.getLong(1), bc.getLong(2))
      println(f"$d: n=$n deg=${SimSearch.graphDegree(n)} " +
        f"fixed(beam=${SimSearch.GraphAnnBeam},T=${SimSearch.GraphAnnRounds}) = $fixed%.3f" +
        f"  insert_edge_recall $nFound/$nExact = ${nFound.toDouble / nExact}%.3f" +
        f"  batch_recall $bFound/$bExact = ${bFound.toDouble / bExact}%.3f" +
        f"  sweep T: ${(1 to 5).map(t => f"T$t=${recall(16, t)}%.2f").mkString(" ")}" +
        f"  sweep beam: ${Seq(8, 32).map(b => f"b$b=${recall(b, 4)}%.2f").mkString(" ")}")
      graft.core.SessionArtifacts.clear(spark)
    }
    spark.stop()
  }
}
