package graft.operators

import graft.SparkSpec
import graft.core.SessionArtifacts

/** The between-corpora cleanup hook: after [[SessionArtifacts.clear]],
  * every graft memo conf key is gone, materialized artifact dirs are
  * deleted, and the next query transparently rebuilds. */
class SessionArtifactsSpec extends SparkSpec {
  test("clear drops memo keys + artifact dirs; queries rebuild after") {
    // build two memoized artifacts (parquet pairs artifact + temp views)
    val before = Dedup.minhashLshShared(spark, sf).count()
    Sql.registerViews(spark, sf)
    val dirOpt = spark.conf.getOption("spark.graft.minhashpairs.dir")
    assert(dirOpt.isDefined)
    assert(spark.conf.getAll.keys.exists(_.startsWith(SessionArtifacts.Prefix)))

    SessionArtifacts.clear(spark)

    assert(!spark.conf.getAll.keys.exists(_.startsWith(SessionArtifacts.Prefix)),
      "graft conf keys must be unset after clear")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dirOpt.get)),
      "materialized pairs artifact must be deleted")
    // rebuild works and is equivalent
    assert(Dedup.minhashLshShared(spark, sf).count() == before)
  }

  test("clear never deletes non-artifact paths referenced from conf") {
    val probe = java.nio.file.Files.createTempDirectory("not_graft_probe")
    spark.conf.set("spark.graft.test.dir", probe.toString)
    SessionArtifacts.clear(spark)
    assert(java.nio.file.Files.exists(probe), "non-graft_ dir must survive")
    java.nio.file.Files.delete(probe)
  }
}
