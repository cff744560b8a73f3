package graft

import graft.search.SearchQuery
import graft.tools.Populator
import org.scalatest.funsuite.AnyFunSuite

class GraftConfigSpec extends AnyFunSuite {
  test("loads from properties with defaults") {
    val p = new java.util.Properties()
    p.setProperty("graft.landing.dir", "/l")
    p.setProperty("graft.staging.dir", "/s")
    val c = GraftConfig.fromProperties(p)
    assert(c == GraftConfig("/l", "/s", "/l/_checkpoints", 10000L, 60000L, ""))
    p.setProperty("graft.group.interval", "500")
    p.setProperty("graft.exclude.bucket", "own")
    assert(GraftConfig.fromProperties(p).groupInterval == 500L)
    assert(GraftConfig.fromProperties(p).excludeBucket == "own")
    intercept[IllegalArgumentException](
      GraftConfig.fromProperties(new java.util.Properties()))
  }
}

class GraftEngineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ingest -> search -> cached search -> compact -> search lifecycle") {
    val cfg = GraftConfig(
      landingDir = SparkTestSession.tempDir("e-landing"),
      stagingDir = SparkTestSession.tempDir("e-staging"),
      checkpointDir = SparkTestSession.tempDir("e-ckpt"),
      groupInterval = 40L, cacheTtlMillis = 60000L)
    val engine = new GraftEngine(spark, cfg)

    // journal: 100 synthetic puts across 3 op-groups
    val in = SparkTestSession.tempDir("e-journal")
    val lines = Populator.journalLines(spark, "eb", 100).as[String].collect()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/j.json"),
      lines.mkString("\n").getBytes)
    engine.startIngest(in).awaitTermination()

    val q = SearchQuery("eb", """ userMd.`x-amz-meta-food` = 'pizza' """, None, 1000)
    val direct = engine.search(q).select("key").as[String].collect().toSeq
    assert(direct.nonEmpty && direct == direct.sorted)

    val cached1 = engine.searchCached(q).select("key").as[String].collect().toSeq
    assert(cached1 == direct)
    // cached path returns identical pages for a narrower query too
    val page = engine.searchCached(q.copy(limit = 3)).select("key").as[String].collect().toSeq
    assert(page == direct.take(3))

    engine.compact(numPartitions = 1)
    val afterCompact = engine.search(q).select("key").as[String].collect().toSeq
    assert(afterCompact == direct, "compaction must not change search results")
    // closed groups moved: landing keeps only the newest op-group
    val left = new java.io.File(s"${cfg.landingDir}/bucket=eb").list().toSeq
      .filter(_.startsWith("opGroup="))
    assert(left == Seq("opGroup=120"))
    assert(new java.io.File(s"${cfg.stagingDir}/bucket=eb").exists())
  }
}
