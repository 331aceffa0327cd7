package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contract gate the round-5 verdict demanded: three rounds in a row
  * ended with queries registered in [[SparkEntry.queries]] but missing
  * from SURVEY.md §2.4 and/or the BASELINE.md bench table, which left the
  * coverage map stale and the 2× regression bar unenforceable exactly
  * where the code was newest. Prose didn't fix the pattern; a failing
  * test is the only thing that has. This spec makes the drift structural:
  *
  *  - every registered query key must be cited (backtick-quoted) in
  *    SURVEY.md §2.4 — deleting a §2.4 row for a live query fails CI;
  *  - every registered query key must have a `| key | median | spread |`
  *    row in BASELINE.md so `tools/BenchDelta` can regression-gate it;
  *  - every registered query key must carry an oracle
  *    ([[SparkEntry.oracleSql]]) — the driver's correctness gate demands
  *    both halves.
  *
  * Grace for genuinely in-flight work: keys listed (comma-separated) in
  * the env var SPARK_GRAFT_NEW_QUERIES are exempt from the BASELINE row
  * requirement ONLY (a new operator can land before its uncontended
  * 3-run baseline is recorded) — never from §2.4 or the oracle. */
class ContractSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)

  private lazy val registered: Set[String] = SparkEntry.queries.keySet

  test("every registered query is declared in SURVEY.md §2.4") {
    val survey = read("SURVEY.md")
    val start = survey.indexOf("### 2.4")
    assert(start >= 0, "SURVEY.md lost its §2.4 heading")
    val section = survey.substring(start,
      survey.indexOf("\n## ", start) match { case -1 => survey.length; case i => i })
    val missing = registered.filterNot(k => section.contains(s"`$k`"))
    assert(missing.isEmpty,
      s"queries registered in SparkEntry but undeclared in SURVEY §2.4: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every registered query has a BASELINE.md bench row") {
    val row = """(?m)^\|\s*([a-z0-9_]+)\s*\|\s*[0-9.]+\s*\|\s*[0-9.]+\s*\|""".r
    val baselined = row.findAllMatchIn(read("BASELINE.md")).map(_.group(1)).toSet
    val grace = sys.env.getOrElse("SPARK_GRAFT_NEW_QUERIES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val missing = registered -- baselined -- grace
    assert(missing.isEmpty,
      s"queries with no BASELINE.md row (unenforceable 2x bar): ${missing.toSeq.sorted.mkString(", ")}" +
        "\nrecord them from an uncontended 3-run bench, or list in-flight keys in SPARK_GRAFT_NEW_QUERIES")
  }

  test("every registered query carries an oracle") {
    val missing = registered -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries with no oracleSql entry: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every oracle belongs to a registered query (no orphaned oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- registered
    assert(orphans.isEmpty,
      s"oracleSql keys with no registered query: ${orphans.toSeq.sorted.mkString(", ")}")
  }

  /** The round-9/10 phantom-citation class, made structural: docstrings
    * kept claiming laws "pinned in XSpec" where no such spec existed
    * (r9: DistRankSpec, a PlanShapeSpec vocab pin; r10: the pca_top2
    * cos law; r11 audit: three stale names for laws that lived in
    * renamed specs). A citation the reader cannot follow is worse than
    * none. Allowlist: identifiers ending in "Spec" that are not test
    * suites — the engine's own MRSpec class, the reference's
    * MapReduceSpec Go struct, and Spark's internal
    * PartialReducerPartitionSpec. */
  test("every *Spec cited from src/main is an existing test suite (no phantom citations)") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val notSuites = Set("MRSpec", "MapReduceSpec", "PartialReducerPartitionSpec")
    def walk(root: String) = Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => p.toString.endsWith(".scala")).toSeq
    val suites = walk("src/test").map(_.getFileName.toString.stripSuffix(".scala")).toSet
    val cite = """[A-Za-z][A-Za-z0-9]*Spec""".r
    val phantom = (for {
      f <- walk("src/main")
      m <- cite.findAllIn(read(f.toString))
      if !suites.contains(m) && !notSuites.contains(m)
    } yield s"$m (${f.getFileName})").distinct
    assert(phantom.isEmpty,
      s"docstrings cite test suites that do not exist: ${phantom.sorted.mkString(", ")}" +
        "\nwrite the law, fix the name, or add a justified allowlist entry")
  }
}
