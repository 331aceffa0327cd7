package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Source/sink laws that the oracle's content hash cannot see. */
class SourcesSpec extends SparkSpec {

  test("compression codecs: identical content, zstd strictly smaller than snappy on disk") {
    // the oracle checks content invariance; THIS checks the codecs
    // actually engaged — if all three silently wrote uncompressed (a
    // misspelled option does exactly that), the sizes would tie
    import spark.implicits._
    val slice = graft.core.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_returnflag")
    def sizeUnder(codec: String): Long = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_codecspec_$codec").toString
      slice.write.mode("overwrite").option("compression", codec).parquet(dir)
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try l.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.toString.endsWith(".parquet"))
        .map(java.nio.file.Files.size).sum
      finally l.close()
    }
    val (snappy, zstd, none) = (sizeUnder("snappy"), sizeUnder("zstd"), sizeUnder("none"))
    assert(zstd > 0 && snappy > 0)
    assert(zstd < snappy, s"zstd ($zstd B) should out-compress snappy ($snappy B)")
    // vs uncompressed, assert with the STRONG compressor: snappy's
    // per-page framing can tie `none` on pages dominated by high-entropy
    // doubles, which would flake on a regenerated fixture even with the
    // codec correctly engaged
    assert(zstd < none, s"zstd ($zstd B) should beat uncompressed ($none B)")
  }
}
