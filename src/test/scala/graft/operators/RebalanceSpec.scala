package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** s45/s46: the IVF rebalance loop. The split's guarantees are
  * structural — old cells can only LOSE members to the promoted
  * centroids (no old cell can gain), and each promoted centroid claims
  * at least itself — so the spec asserts them as theorems, plus the
  * recall audit's bounds. */
class RebalanceSpec extends SparkSpec {

  private lazy val before = Similarity.s41IvfStats.fn(spark, sfDir)
    .select(col("cell"), col("n_vecs")).collect()
    .map(r => r.getLong(0) -> r.getLong(1)).toMap
  private lazy val after = Similarity.s45IvfRebalance.fn(spark, sfDir)
    .select(col("cell"), col("n_vecs"), col("is_new")).collect()
    .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

  test("rebalance: 10 cells, totals conserved, both promoted cells claim members") {
    assert(after.size === before.size + 2)
    assert(after.values.map(_._1).sum === before.values.sum)
    val newCells = after.filter(_._2._2 == 1L)
    assert(newCells.size === 2)
    newCells.foreach { case (c, (n, _)) =>
      assert(n >= 1L, s"promoted cell $c must at least claim its own vector")
    }
  }

  test("no old cell gains members; the hottest old cell strictly shrinks") {
    for ((c, nBefore) <- before) {
      val nAfter = after(c)._1
      assert(nAfter <= nBefore, s"old cell $c gained members: $nBefore -> $nAfter")
    }
    val hottest = before.maxBy { case (c, n) => (n, -c) }._1
    assert(after(hottest)._1 < before(hottest),
      "splitting the hottest cell must remove at least its promoted member")
  }

  test("recall audit: hits bounded by k=5 and defined for every query") {
    val r = Similarity.s46RebalanceRecall.fn(spark, sfDir).collect()
    assert(r.length === 10)
    r.foreach { row =>
      val (hb, ha) = (row.getAs[Long]("hits_before"), row.getAs[Long]("hits_after"))
      assert(hb >= 0 && hb <= 5); assert(ha >= 0 && ha <= 5)
    }
  }
}
