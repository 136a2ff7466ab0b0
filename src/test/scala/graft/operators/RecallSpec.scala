package graft.operators

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Accuracy contracts for the approximate ANN tiers: the sf-pinned oracle
  * checks exact values at one SF, but nothing there stops a hyperplane or
  * centroid change from silently gutting retrieval quality. This gate
  * measures recall@5 of s33 (hyperplane LSH) and s34 (IVF, 2-probe)
  * against the exact s32 baseline on a generated clustered corpus —
  * the regime ANN is FOR (neighbors that are genuinely close). Thresholds:
  * s34 ≥ 0.9 (true centers as centroids, 2-probe ⇒ measured 1.00), s33 ≥
  * 0.8 (a fixed hyperplane can still cut a cluster — measured 0.92 at
  * seed 7 / noise 0.01; at noise 0.05 recall drops to 0.60, which is the
  * single-probe design's honest envelope, not a regression).
  * Deterministic: seeded generator, fixed hyperplanes/centroids. */
class RecallSpec extends SparkSpec {

  private def top5(df: DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }

  test("s33/s34: recall@5 vs the exact s32 baseline on a clustered corpus") {
    import spark.implicits._
    // 8 well-separated unit centers (vec_id 0-7 — exactly s34's centroid
    // choice), then members = center + gaussian noise, renormalized. Same
    // schema as the driver's embeddings table (vec_id, list<float>, label).
    val rnd = new scala.util.Random(7L)
    val dim = 64
    def normed(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(8)(normed(Array.fill(dim)(rnd.nextGaussian())))
    val rows = (0 until 500).map { i =>
      val c = centers(i % 8)
      val v = if (i < 8) c
        else normed(c.map(_ + rnd.nextGaussian() * 0.01))
      (i.toLong, v.map(_.toFloat), i % 8)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_recall").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val exact = top5(Similarity.s32KnnBruteforce.fn(spark, dir))
    assert(exact.size === 10 && exact.values.forall(_.size === 5))
    def recallOf(q: Q): Double = {
      val approx = top5(q.fn(spark, dir))
      val rs = exact.map { case (qid, ex) =>
        (approx.getOrElse(qid, Set.empty[Long]) & ex).size.toDouble / ex.size
      }
      rs.sum / rs.size
    }
    val r33 = recallOf(Similarity.s33AnnLsh)
    val r34 = recallOf(Similarity.s34AnnIvf)
    info(f"recall@5: s33=$r33%.3f s34=$r34%.3f")
    assert(r33 >= 0.8, f"s33 hyperplane-LSH recall@5 $r33%.3f < 0.8")
    assert(r34 >= 0.9, f"s34 IVF 2-probe recall@5 $r34%.3f < 0.9")
  }
}
