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

  test("every oracle key is a registered query with non-empty SQL") {
    val keys = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(keys))
    assert(SparkEntry.oracleSql.values.forall(_.trim.nonEmpty))
  }
}
