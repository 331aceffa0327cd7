package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SimSearch}

/** Measurement tool for the approximate operators' recall ("measure,
  * don't guess"): prints, per scale factor, the raw numerator/denominator
  * behind every declared recall-bound query, so CORRECTNESS floors can be
  * ratcheted to ~0.8× measured instead of hand-waved. Run:
  *
  * {{{ sbt "runMain graft.tools.RecallProbe /root/testdata/sf0.01" }}}
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    dirs.foreach { d =>
      println(s"== $d")
      // simsearch LSH: global hit fraction of exact top-k
      val exact = SimSearch.bruteTopK(spark, d).select($"q_id", $"n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = SimSearch.lshTopK(spark, d).select($"q_id", $"n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"simsearch_lsh: ${(exact & lsh).size}/${exact.size} = ${(exact & lsh).size.toDouble / exact.size}%.3f")
      // simsearch IVF: per-query hit counts (floor is per-query minHits)
      val ivf = SimSearch.ivfTopK(spark, d).select($"q_id", $"n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val perQ = exact.groupBy(_._1).map { case (q, s) => q -> s.count(ivf.contains) }
      println(s"simsearch_ivf: minHits=${perQ.values.min} " +
        s"histo=${perQ.values.groupBy(identity).view.mapValues(_.size).toMap.toSeq.sortBy(_._1)}")
      // kNN graph: LSH-bucketed edges vs the exact graph
      val exactG = SimSearch.knnGraphShared(spark, d).select($"q_id", $"n_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val (lshEdges, lshIdx) = SimSearch.knnGraphLshEdgesWithIndex(spark, d)
      val lshG = try lshEdges.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      finally lshIdx.unpersist()
      println(f"simsearch_knn_graph_lsh: ${(exactG & lshG).size}/${exactG.size} = ${(exactG & lshG).size.toDouble / exactG.size}%.3f")
      // dedup simhash vs minhash exact pairs
      val sim = Dedup.recallCounts(
        Dedup.minhashLshShared(spark, d).select($"doc_a", $"doc_b"),
        Dedup.simhashDedup(spark, d).select($"doc_a", $"doc_b"),
        Seq("doc_a", "doc_b")).head()
      println(f"dedup_simhash: ${sim.getLong(1)}/${sim.getLong(0)} = ${sim.getLong(1).toDouble / sim.getLong(0)}%.3f")
      // embedding LSH vs exact blocked join
      val emb = Dedup.recallCounts(
        Dedup.embeddingCosineExact(spark, d).select($"vec_a", $"vec_b"),
        Dedup.embeddingCosineLsh(spark, d).select($"vec_a", $"vec_b"),
        Seq("vec_a", "vec_b")).head()
      println(f"dedup_embedding_lsh: ${emb.getLong(1)}/${emb.getLong(0)} = ${emb.getLong(1).toDouble / emb.getLong(0)}%.3f")
    }
    spark.stop()
  }
}
