package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** README.md's test count is GENERATED ([[ReadmeCounts]]) and pinned
  * here against the discovered suite inventory — a hand-typed literal
  * drifted twice before this gate existed. */
class ReadmeCountsSpec extends AnyFunSuite {
  test("README's suite/test counts match the discovered inventory") {
    val (suites, tests) = ReadmeCounts.discover()
    val readme = Files.readString(Paths.get("README.md"))
    assert(readme.contains(ReadmeCounts.countLine(tests, suites)),
      s"README spec count drifted — regenerate with " +
        s"""sbt "Test/runMain graft.ReadmeCounts" """ +
        s"(reality: ${ReadmeCounts.countLine(tests, suites)})")
    assert(readme.contains(ReadmeCounts.operatorLine(SparkEntry.queries.size)),
      s"README operator count drifted — regenerate with " +
        s"""sbt "Test/runMain graft.ReadmeCounts" """ +
        s"(reality: ${SparkEntry.queries.size} operators)")
  }
}
