package graft

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical 1:1 cross-check between the registered query inventory
  * (`SparkEntry.queries`) and the COVERAGE.md operator map — the doc
  * drifted from the registry once (round 8 grew 170 → 178 queries while
  * the doc stayed at family granularity), so containment is now pinned
  * in BOTH directions: every registered key must appear in COVERAGE.md,
  * and every query-shaped token in COVERAGE.md's index must be a
  * registered key (no stale doc rows after a rename/removal). */
class CoverageDocSpec extends AnyFunSuite {

  private lazy val doc: String = {
    val src = Source.fromFile("COVERAGE.md", "UTF-8")
    try src.mkString finally src.close()
  }

  // registry keys all match this shape (s01_…, p03_…, g06_…, x144_…)
  private val keyPattern = "[a-z]\\d{2,3}[a-z]?_[a-z0-9_]+".r

  test("every registered query key appears in COVERAGE.md") {
    val keys = SparkEntry.queries.keySet
    val missing = keys.filterNot(doc.contains).toSeq.sorted
    assert(missing.isEmpty,
      s"COVERAGE.md is missing ${missing.size} registered queries: " +
        missing.mkString(", "))
  }

  test("every query-shaped token in COVERAGE.md is a registered query") {
    val keys = SparkEntry.queries.keySet
    val stale = keyPattern.findAllIn(doc).toSet
      .filterNot(keys.contains).toSeq.sorted
    assert(stale.isEmpty,
      s"COVERAGE.md names ${stale.size} unregistered queries " +
        s"(renamed or removed?): ${stale.mkString(", ")}")
  }

  /** README's stated counts drifted once (187 left behind at 188 —
    * round-9 verdict); derive them from the registry instead of
    * trusting the prose. README must say "<N> registered" where N =
    * the registry size, and its check_oracle PASS line must read
    * "<M>/<M>" where M = the oracle count (registry minus the
    * documented no-oracle rows). */
  test("README.md query counts match the registry") {
    val readme = {
      val src = Source.fromFile("README.md", "UTF-8")
      try src.mkString finally src.close()
    }
    val n = SparkEntry.queries.size
    val m = SparkEntry.oracleSql.size
    val stated = "(\\d+) registered".r.findFirstMatchIn(readme).map(_.group(1).toInt)
    assert(stated.contains(n),
      s"README says '${stated.orNull} registered' but the registry has $n queries")
    val pass = "PASS: (\\d+)/(\\d+)".r.findFirstMatchIn(readme)
      .map(mm => (mm.group(1).toInt, mm.group(2).toInt))
    assert(pass.contains((m, m)),
      s"README's check_oracle line says ${pass.orNull} but the oracle set has $m entries")
  }

  test("every oracle key is a registered query with non-empty SQL") {
    val keys = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(keys))
    assert(SparkEntry.oracleSql.values.forall(_.trim.nonEmpty))
  }
}
