package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Generates README.md's test-suite count line from the discovered
  * reality, the way `tools/OperatorCatalog` generates OPERATORS.md —
  * the literal drifted twice when typed by hand (round 10: "183 specs"
  * while the suite ran 184). `ReadmeCountsSpec` asserts the line matches
  * at every `sbt test`, so it cannot drift silently again.
  *
  * Regenerate: `sbt "Test/runMain graft.ReadmeCounts"`.
  */
object ReadmeCounts {

  /** (suite count, total test count) discovered from the compiled test
    * classes — the same inventory sbt's own Suite discovery runs, so the
    * numbers match `sbt test` output by construction. */
  def discover(): (Int, Int) = {
    val root = Paths.get("target/scala-2.13/test-classes")
    val walk = Files.walk(root)
    val names =
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".class") && !p.toString.contains("$"))
        .map(p => root.relativize(p).toString
          .stripSuffix(".class").replace(java.io.File.separatorChar, '.'))
        .toSeq.sorted
      finally walk.close()
    val suites = names.flatMap { n =>
      val cls = Class.forName(n)
      if (classOf[org.scalatest.Suite].isAssignableFrom(cls) &&
          !java.lang.reflect.Modifier.isAbstract(cls.getModifiers))
        Some(cls.getDeclaredConstructor().newInstance().asInstanceOf[org.scalatest.Suite])
      else None
    }
    (suites.size, suites.map(_.testNames.size).sum)
  }

  def countLine(tests: Int, suites: Int): String =
    s"$tests tests across $suites suites"

  def operatorLine(n: Int): String = s"all $n checked\noperators"

  private val CountRe = """\d+ tests across \d+ suites""".r
  private val OpRe = """all \d+ checked\noperators""".r

  def main(args: Array[String]): Unit = {
    val (suites, tests) = discover()
    val readme = Paths.get("README.md")
    val cur = Files.readString(readme)
    require(CountRe.findFirstIn(cur).isDefined,
      "README.md has no 'N tests across M suites' line to regenerate")
    require(OpRe.findFirstIn(cur).isDefined,
      "README.md has no 'all N checked operators' phrase to regenerate")
    Files.writeString(readme,
      OpRe.replaceAllIn(
        CountRe.replaceAllIn(cur, countLine(tests, suites)),
        operatorLine(SparkEntry.queries.size)))
    println(s"README.md: ${countLine(tests, suites)}; " +
      s"${SparkEntry.queries.size} operators")
  }
}
