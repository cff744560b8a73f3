package graft

import org.scalatest.funsuite.AnyFunSuite

/** OPERATORS.md is generated from SURVEY §2 + the registry; this pins the
  * committed file to the generator output (and, transitively through the
  * generator's own require + SurveyContractSpec, to `SparkEntry.queries`),
  * so the catalog can never drift from the shipped surface.
  */
class OperatorCatalogSpec extends AnyFunSuite {

  test("OPERATORS.md equals the generator output and covers every query") {
    val survey = java.nio.file.Files.readString(
      java.nio.file.Paths.get("SURVEY.md"))
    val expected = graft.tools.OperatorCatalog.render(
      survey, SparkEntry.queries.keySet)
    val onDisk = java.nio.file.Files.readString(
      java.nio.file.Paths.get("OPERATORS.md"))
    assert(onDisk == expected,
      "OPERATORS.md is stale — regenerate with `runMain graft.tools.OperatorCatalog`")
    SparkEntry.queries.keySet.foreach { k =>
      assert(onDisk.contains(s". `$k`"), s"catalog entry missing for $k")
    }
  }
}
