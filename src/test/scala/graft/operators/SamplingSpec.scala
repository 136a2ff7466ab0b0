package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Domain edges of the sampling layer the sf-scale oracle runs can't
  * reach:
  *  - x120's integer priority raises (like DuckDB) instead of silently
  *    wrapping once a weight hits 2^30;
  *  - x125's cell-level quantile mapping resolves r_ppm COLLISIONS —
  *    distinct reference cells flooring to the same ppm, reachable only
  *    past 10^6 rows per source — to the oracle's MIN(c_ref). */
class SamplingSpec extends SparkSpec {

  test("x120 priority raises on weight >= 2^30 instead of wrapping") {
    import spark.implicits._
    // just inside the domain: computes fine, positive priority
    val ok = Seq((1L, (1L << 30) - 1)).toDF("doc_id", "n_chars")
      .selectExpr(s"(${Pipeline.priorityExpr}) as p")
      .collect().head.getLong(0)
    assert(ok > 0L)
    // at the bound: must raise, not wrap to a garbage rank
    val e = intercept[Exception] {
      Seq((1L, 1L << 30)).toDF("doc_id", "n_chars")
        .selectExpr(s"(${Pipeline.priorityExpr}) as p")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("overflows the 64-bit priority")),
      s"expected the x120 domain error, got: $e")
  }

  test("x125 cell mapping breaks r_ppm collisions toward MIN(c_ref)") {
    import spark.implicits._
    // Reference source "a" (lexicographically first) with three cells
    // where c=20 and c=30 COLLIDE at r_ppm=500000 — the regime a >1e6
    // row source produces. Query source "b" has cells probing below,
    // inside, and above the collision.
    val hq = Seq(
      ("a", 10L, 200000L),
      ("a", 20L, 500000L), // collision pair: MIN(c_ref) = 20 must win
      ("a", 30L, 500000L),
      ("a", 40L, 1000000L),
      ("b", 7L, 100000L),  // below: smallest cell with r_ppm >= 1e5 is 10
      ("b", 8L, 500000L),  // exactly at the collided ppm → 20, never 30
      ("b", 9L, 600000L)   // above the collision → 40
    ).toDF("source", "c", "q_ppm")
    val got = Pipeline.quantileMapCells(hq)
      .filter(col("source") === "b")
      .orderBy("c")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((7L, 10L), (8L, 20L), (9L, 40L)),
      s"collision must resolve to MIN(c_ref): $got")
    // the reference source maps onto itself exactly, collisions included
    val self = Pipeline.quantileMapCells(hq)
      .filter(col("source") === "a")
      .orderBy("c")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(self == Seq((10L, 10L), (20L, 20L), (30L, 20L), (40L, 40L)),
      s"equal-ppm reference cells both map to the smaller c_ref: $self")
  }
}
