package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the planted-cluster recall corpus
  * ([[graft.tools.ClusteredCorpus]]) — the generator behind the measured
  * curation-grade recall numbers (CLUSTERED_RECALL.json). If these drift,
  * the recall measurement silently measures a different regime, so each
  * planted property is pinned:
  *
  *  - schema identical to the driver corpus (vec_id long, float[64]
  *    embedding, int label), ids dense 0..n-1;
  *  - same-cluster non-dup pairs sit in the ~0.9-cosine "same topic"
  *    band, cross-cluster pairs near 0;
  *  - every 10th vector is a near-dup of its predecessor at cos ≥ 0.98
  *    (the dedup regime);
  *  - seeded determinism: two generations produce identical bytes.
  */
class ClusteredCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    d / math.sqrt(na * nb)
  }

  private def generate(dir: String): Map[Long, (Int, Array[Float])] = {
    graft.tools.ClusteredCorpus.generate(spark, dir, n = 600, clusters = 30)
    val rows = spark.read.parquet(s"$dir/embeddings.parquet").collect()
    rows.map(r => r.getLong(0) ->
      (r.getInt(2), r.getSeq[Float](1).toArray)).toMap
  }

  test("planted geometry: cluster band, near-dup band, cross-cluster noise") {
    val dir = SparkTestSession.tempDir("clustered-corpus")
    val m = generate(dir)
    assert(m.size == 600 && m.keySet == (0L until 600L).toSet,
      "ids must be dense 0..n-1")
    assert(m.values.forall(_._2.length == 64))
    assert(m.forall { case (id, (cid, _)) =>
      // near-dups inherit their PARTNER's cluster (they are planted as
      // perturbations of the predecessor, so that is their true cluster)
      val src = if (id % 10 == 9) id - 1 else id
      cid == (src % 30).toInt
    }, "label must be the planted cluster id (src vec_id % clusters)")

    // same-cluster non-dup pairs: mean cosine in the 'same topic' band.
    // σ = 1/3 concentrates intra cosine at 1/(1+σ²) ≈ 0.90
    val sameCl = for {
      (i, (ci, vi)) <- m.toSeq; (j, (cj, vj)) <- m.toSeq
      if i < j && ci == cj && i % 10 != 9 && j % 10 != 9 && j != i + 1
    } yield cos(vi, vj)
    val sameMean = sameCl.sum / sameCl.size
    assert(sameMean > 0.82 && sameMean < 0.95,
      s"intra-cluster mean cosine $sameMean outside the ~0.9 band")

    // planted near-dups: every vec_id % 10 == 9 pairs with vec_id - 1
    val dupCos = (9L until 600L by 10L).map(id => cos(m(id)._2, m(id - 1)._2))
    assert(dupCos.forall(_ >= 0.98),
      s"near-dup pair under 0.98: min ${dupCos.min}")

    // cross-cluster pairs carry no signal (sample one pair per id)
    val cross = m.toSeq.sortBy(_._1).sliding(2).collect {
      case Seq((i, (ci, vi)), (j, (cj, vj))) if ci != cj => cos(vi, vj)
    }.toSeq
    val crossMean = cross.sum / cross.size
    assert(math.abs(crossMean) < 0.15,
      s"cross-cluster mean cosine $crossMean should be ~0")
  }

  test("seeded determinism: two generations are identical") {
    val d1 = SparkTestSession.tempDir("clustered-det1")
    val d2 = SparkTestSession.tempDir("clustered-det2")
    val m1 = generate(d1)
    val m2 = generate(d2)
    assert(m1.keySet == m2.keySet)
    assert(m1.forall { case (id, (c, v)) =>
      m2(id)._1 == c && java.util.Arrays.equals(v, m2(id)._2) },
      "same (n, clusters, seed) must reproduce identical vectors")
  }
}
