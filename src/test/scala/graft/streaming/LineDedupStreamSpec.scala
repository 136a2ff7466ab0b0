package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{Dedup, T}

/** LineDedupMaintainer (d47's streaming twin): from an EMPTY model, a
  * single batch holding the whole corpus must reproduce batch d47 row
  * for row (shared kernels), and a multi-batch stream must rewrite
  * each batch against the line-df model AS OF its admission — pinned
  * against an independent in-test Scala oracle that recomputes the
  * cumulative distinct-doc line frequencies. */
class LineDedupStreamSpec extends SparkSpec {

  private def emptyState = {
    import spark.implicits._
    Seq.empty[(String, Long)].toDF("h", "df")
  }

  private def rows(out: String) =
    spark.read.parquet(out)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq

  private lazy val docs = T(spark, sfDir, "documents")
    .select("doc_id", "text").orderBy("doc_id").collect()

  private def df(xs: Seq[org.apache.spark.sql.Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(xs, 2), docs.head.schema)

  /** Scala-side line segmentation mirroring d47's 8-word windows. */
  private def linesOf(text: String): Seq[String] =
    text.split(" ", -1).toSeq.grouped(8).map(_.mkString(" ")).toSeq

  test("one batch from an empty model == batch d47, row for row") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_linestream").toString + "/m"
    val m = new StreamOps.LineDedupMaintainer(emptyState, out)
    m.apply(df(docs.toSeq), 0L)
    val expected = Dedup.d47LineDedup.fn(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(rows(out) == expected,
      "a single streamed batch over an empty model must equal batch d47")
    m.apply(df(docs.toSeq), 0L) // replay guard
    assert(rows(out).size == expected.size)
  }

  test("multi-batch: each batch rewritten against the model as of admission") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_linestream2").toString + "/m"
    val m = new StreamOps.LineDedupMaintainer(emptyState, out)
    val parts = docs.grouped((docs.length + 2) / 3).toSeq
    assert(parts.size == 3)

    val seenDf = scala.collection.mutable.Map.empty[String, Long]
    parts.zipWithIndex.foreach { case (p, i) =>
      // merge this batch's distinct-doc line counts into the model
      p.foreach { r =>
        linesOf(r.getString(1)).distinct.foreach { ln =>
          seenDf(ln) = seenDf.getOrElse(ln, 0L) + 1L
        }
      }
      m.apply(df(p.toSeq), i.toLong)
      val got = spark.read.parquet(out)
        .filter(col("doc_id").isin(p.map(_.getLong(0)): _*))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(got.size == p.length, s"batch $i must append one row per doc")
      p.foreach { r =>
        val ls = linesOf(r.getString(1))
        val kept = ls.filter(ln => seenDf(ln) <= Dedup.LineDfMax)
        val (nl, nk, txt) = got(r.getLong(0))
        assert(nl == ls.size && nk == kept.size && txt == kept.mkString(" "),
          s"doc ${r.getLong(0)} batch $i: rewrite must reflect the " +
            s"as-of-admission model (expected ${kept.size}/${ls.size} kept)")
      }
    }
  }
}
