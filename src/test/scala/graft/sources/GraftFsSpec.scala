package graft.sources

import graft.SparkSpec

/** Path handling must not assume `file:` (reference O16 parity — SURVEY
  * §2.1: the reference reads/writes Azure blob storage; Spark's equivalent
  * is "any Hadoop FileSystem scheme"). The `graftfs://` scheme registered
  * here is local disk behind a foreign scheme name, so a query that
  * secretly shells out to `java.io.File` or string-prefixes `file:` breaks
  * loudly while a clean Hadoop-SPI path works unchanged. */
class GraftFsSpec extends SparkSpec {

  test("partitioned parquet write+read round-trips through a non-file: scheme") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftFs].getName)
    val dir = java.nio.file.Files.createTempDirectory("graft_fs").toString
    val viaGraftFs = Sources.partitionedWriteTo(spark, sf, s"graftfs://$dir")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val viaFile = Sources.partitionedWrite(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaGraftFs.nonEmpty && viaGraftFs == viaFile)
    // the foreign scheme actually wrote the Hive layout (o_orderstatus=…)
    val listed = new java.io.File(dir).list()
    assert(listed != null && listed.exists(_.startsWith("o_orderstatus=")))
  }
}
