package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 is the coverage contract the engine is graded against;
  * this spec pins it to the registered query surface so the two can never
  * drift (round 3 shipped a query with no §2 row and a stale count).
  */
class SurveyContractSpec extends AnyFunSuite {

  private lazy val section2: String = {
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get("SURVEY.md"))
    val start = text.indexOf("## §2")
    val end = text.indexOf("## §3")
    assert(start >= 0 && end > start, "SURVEY.md must contain §2 and §3")
    text.substring(start, end)
  }

  test("§2 numbered rows equal SparkEntry.queries exactly") {
    val row = """(?m)^\|\s*(\d+)\s*\|\s*`([a-z0-9_]+)`""".r
    val surveyKeys = row.findAllMatchIn(section2).map(_.group(2)).toSeq
    assert(surveyKeys.distinct.size == surveyKeys.size,
      s"duplicate §2 rows: ${surveyKeys.diff(surveyKeys.distinct)}")
    val registered = SparkEntry.queries.keySet
    val missingRows = registered -- surveyKeys.toSet
    val staleRows = surveyKeys.toSet -- registered
    assert(missingRows.isEmpty, s"registered queries missing a §2 row: $missingRows")
    assert(staleRows.isEmpty, s"§2 rows with no registered query: $staleRows")
  }

  test("every registered query has oracle SQL") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      "queries and oracleSql must cover the same keys: " +
        s"onlyQueries=${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet} " +
        s"onlyOracle=${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet}")
  }

  test("§2 count statement matches the table") {
    val row = """(?m)^\|\s*\d+\s*\|\s*`[a-z0-9_]+`""".r
    val n = row.findAllMatchIn(section2).size
    assert(section2.contains(s"**Counts: $n oracle-gated query rows**"),
      s"§2 preamble count must say $n")
  }

  test("§2 spec-only (dash) row count matches the preamble") {
    // round 13 added three dash rows without bumping the literal; pin it
    // the same way the numbered count is pinned so spec rows can't drift
    val dashRow = """(?m)^\| — \|""".r
    val n = dashRow.findAllMatchIn(section2).size
    assert(section2.contains(s"**+ $n spec-only rows**"),
      s"§2 preamble must say '+ $n spec-only rows'")
  }
}
