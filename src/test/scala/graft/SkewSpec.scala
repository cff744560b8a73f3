package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 90% of rows share one hot key
  private def skewed = (1 to 1000).map(i =>
    (if (i <= 900) "hot" else s"k$i", i.toLong)).toDF("key", "v")
  private def dim = Seq(("hot", "H"), ("k901", "A"), ("k950", "B")).toDF("key", "tag")

  test("saltedJoin returns exactly the plain-join result") {
    val plain = skewed.join(dim, "key").select("key", "v", "tag")
    val salted = Skew.saltedJoin(skewed, dim, "key", saltFactor = 8)
      .select("key", "v", "tag")
    assert(salted.collect().toSet == plain.collect().toSet)
    assert(salted.count() == 902)
  }

  test("saltedJoin spreads the hot key across salt partitions") {
    val s = skewed.withColumn("__salt",
      pmod(xxhash64(struct(col("key"), col("v"))), lit(8)))
    val spread = s.filter(col("key") === "hot")
      .select("__salt").distinct().count()
    assert(spread == 8, "hot-key rows must occupy every salt bucket")
  }

  test("saltedCountSum equals the direct aggregation") {
    val direct = skewed.groupBy("key")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
    val salted = Skew.saltedCountSum(skewed, "key", "v", saltFactor = 8)
    assert(salted.collect().toSet == direct.collect().toSet)
  }
}
