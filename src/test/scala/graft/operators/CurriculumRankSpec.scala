package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins x106's bucketed per-source rank kernel bit-equal to the naive
  * single-window formulation, with the sub-bucket width shrunk to 8 so
  * BOTH offset levels are live at test scale (sf0.001 has far more than
  * 8 docs per source, so every tie group spans multiple sub-buckets and
  * every source spans multiple lengths). The production width (2^16)
  * degenerates to the same answer by the same algebra — the spec runs
  * the small width precisely because the driver's oracle at sf0.01
  * cannot force multi-bucket execution. */
class CurriculumRankSpec extends SparkSpec {

  test("bucketed rank == whole-source window rank at subWidth=8") {
    val d = T(spark, sfDir, "documents").select("doc_id", "source", "n_chars")
    val got = Pipeline.curriculumRanked(d, subWidth = 8)
      .select("doc_id", "rs")
    val wSrc = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val want = d.withColumn("rs", row_number().over(wSrc).cast("long"))
      .select("doc_id", "rs")
    assert(got.count() === want.count())
    assert(got.join(want, Seq("doc_id", "rs")).count() === want.count(),
      "every (doc_id, rs) pair must agree with the single-window rank")
  }

  test("subWidth=8 actually exercises multiple sub-buckets per tie group") {
    val d = T(spark, sfDir, "documents").select("doc_id", "source", "n_chars")
    val multi = d.withColumn("sub", expr("doc_id div 8"))
      .groupBy("source").agg(countDistinct(col("sub")).as("nsub"))
      .agg(min(col("nsub")).as("m")).head().getLong(0)
    assert(multi > 1, "every source must spread over >1 sub-bucket or the " +
      "equality test is vacuous")
  }
}
