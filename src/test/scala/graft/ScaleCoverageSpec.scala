package graft

import org.scalatest.funsuite.AnyFunSuite

/** SCALE.md completeness gate (round-10, carried from the round-8
  * verdict): every key in the declared query surface must be NAMED in
  * SCALE.md — either in its family section or in the coverage ledger —
  * so a new or rewritten operator cannot ship without its 100 TB
  * argument on record. Round 9 shipped three rewrites with no SCALE.md
  * entry; this spec is what would have caught that. Pure file check,
  * no SparkSession.
  */
class ScaleCoverageSpec extends AnyFunSuite {

  test("every declared query key has a SCALE.md entry") {
    val scale = {
      val src = scala.io.Source.fromFile("SCALE.md", "UTF-8")
      try src.mkString finally src.close()
    }
    val missing = SparkEntry.queries.keySet.filterNot(scale.contains)
    assert(missing.isEmpty,
      s"query keys with no SCALE.md entry (add to the family section " +
        s"or the coverage ledger): ${missing.toSeq.sorted.mkString(", ")}")
  }
}
