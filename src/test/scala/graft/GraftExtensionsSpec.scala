package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions distribution path: a session built with
  * `graft.GraftExtensions` resolves the engine's codegen expressions from
  * pure SQL with no programmatic register() call. */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions-configured session resolves vec_dot/minhash_sig/shingle_hashes in SQL") {
    spark.sparkContext // ensure the shared context is up before clearing sessions
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses the JVM's SparkContext. withExtensions is the programmatic
      // twin of spark.sql.extensions=graft.GraftExtensions (the conf is
      // STATIC — on a real cluster it is read at first-session creation,
      // which a shared-context test JVM cannot re-do) and runs the exact
      // same injector instance.
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val dot = s2.sql(
        "SELECT vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "               array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT)))")
        .head.getDouble(0)
      assert(dot == 4.0)
      val sig = s2.sql("SELECT minhash_sig(shingle_hashes('abcdefghijklmnopqr', 12))")
        .head.getSeq[Long](0)
      assert(sig.length == graft.functions.MinHashFunctions.NumPerms)
      // SQL integer literals may arrive as BIGINT — the builder must accept
      val viaLong = s2.sql("SELECT size(shingle_hashes('abcdefghijklmnopqr', CAST(12 AS BIGINT)))")
        .head.getInt(0)
      assert(viaLong > 0)
      // and reject a non-constant n with a clear message, not a CCE/NPE
      val err = intercept[Exception] {
        s2.sql("SELECT shingle_hashes('abc', v) FROM VALUES (3) t(v)").collect()
      }
      assert(err.getMessage.contains("constant integer"), err.getMessage)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
