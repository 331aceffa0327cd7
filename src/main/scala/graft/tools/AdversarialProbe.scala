package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Reproducible measurement of the MinhashBandCap regimes on an
  * adversarial (planted-clique) corpus built by
  * `tools/gen_sf.py --adversarial` — the wall-clock companion to
  * AdversarialBoundSpec's count bounds. Usage:
  *
  *   python3 tools/gen_sf.py /root/testdata/sf0.001 /tmp/adv520 520 --adversarial
  *   SPARK_GRAFT_SF_DIR=/tmp/adv520 sbt "runMain graft.tools.AdversarialProbe"
  *
  * Stages share ONE persisted bands frame (unlike ProfileMinhash, which
  * deliberately re-pays the upstream per stage to profile it), so each
  * line is the marginal cost of that stage alone. Set
  * SPARK_GRAFT_PROBE_UNCAPPED=1 to also run the uncapped candidate
  * count — on a > cap clique corpus that is the quadratic blowup being
  * demonstrated; budget accordingly. */
object AdversarialProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/adv520")
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
      println(f"[adv] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }

    val docs = graft.core.Tables.documents(spark, d)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("docs")(docs.count())
    val bands = Dedup.lshBands(Dedup.sigsOf(docs), "doc_id", "sig")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sig+bands")(bands.count())
    time("max band pop")(bands.groupBy("band_id", "band_key").count()
      .agg(max("count")).head.getLong(0) + s" (cap ${Dedup.MinhashBandCap})")
    val capped = Dedup.lshCandidatesCapped(bands, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("capped candidates")(capped.count())
    time("capped labels e2e") {
      Dedup.connectedComponents(
        Dedup.verifyJaccard(capped, docs, Dedup.charShingles($"text", 12))
          .where($"jac" >= 0.9).select($"a", $"b")).count()
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_UNCAPPED")) {
      time("UNCAPPED candidates")(Dedup.lshCandidates(bands, "doc_id").count())
    }
    spark.stop()
  }
}
