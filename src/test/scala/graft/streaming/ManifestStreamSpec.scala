package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{Dedup, Pipeline, T}

/** ManifestMaintainer (x126's streaming twin): a single batch holding
  * everything batch-x126 calls "the batch" must produce EXACTLY x126's
  * manifest rows (same index, same merged state, same scoring tail —
  * the shared-kernel contract), and a multi-batch stream must score
  * each batch against the quantile state AS OF its admission (pinned
  * against an independent in-test cumulative-histogram oracle) while
  * keeping admission verdicts equal to the one-shot run (contiguous
  * ranges preserve the greedy earlier-arrivals contract). */
class ManifestStreamSpec extends SparkSpec {

  private def rows(out: String) =
    spark.read.parquet(out)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq

  private def freshOut(tag: String) = java.nio.file.Files
    .createTempDirectory(s"graft_manifest_$tag").toString + "/m"

  private def maintainer(out: String) = {
    val (hotPath, setsT, bandsT) = Dedup.d37CorpusIndex(spark, sfDir)
    new StreamOps.ManifestMaintainer(
      spark.table(setsT), spark.table(bandsT).hint("merge"),
      spark.read.parquet(hotPath),
      spark.read.parquet(Pipeline.x126CellState(spark, sfDir)), out)
  }

  private lazy val batchDocs = T(spark, sfDir, "documents")
    .filter(col("doc_id") % 5 === 0)
    .select("doc_id", "text", "source", "n_chars")
    .orderBy("doc_id")
    .collect()

  private def df(xs: Seq[org.apache.spark.sql.Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(xs, 2),
      batchDocs.head.schema)

  test("one batch == the batch x126 manifest, row for row") {
    val out = freshOut("oneshot")
    val m = maintainer(out)
    m.apply(df(batchDocs.toSeq), 0L)
    val expected = Pipeline.x126IncrementalManifest.fn(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(rows(out) == expected,
      "a single streamed batch must reproduce batch x126 exactly")
    // re-delivered epoch: the batchId guard must not double-append
    m.apply(df(batchDocs.toSeq), 0L)
    assert(rows(out).size == expected.size)
  }

  test("multi-batch: as-of-admission quantiles, one-shot admission verdicts") {
    val out = freshOut("multi")
    val m = maintainer(out)
    val parts = batchDocs.grouped((batchDocs.length + 2) / 3).toSeq
    assert(parts.size == 3)

    // independent oracle: cumulative (source, n_chars) histogram in
    // plain Scala — floor(cum * 1e6 / n) per cell, per source
    val history = T(spark, sfDir, "documents")
      .filter(col("doc_id") % 5 =!= 0)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def qppm(corpus: Seq[(String, Long)]): Map[(String, Long), Long] =
      corpus.groupBy(_._1).flatMap { case (src, xs) =>
        val n = xs.size.toLong
        var cum = 0L
        xs.groupBy(_._2).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
          .map { case (c, cnt) => cum += cnt; (src, c) -> (cum * 1000000L / n) }
      }

    // one-shot reference for the order-insensitive columns
    val oneShot = Pipeline.x126IncrementalManifest.fn(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(4), r.getLong(5)))).toMap

    var seen = history.toSeq
    parts.zipWithIndex.foreach { case (p, i) =>
      m.apply(df(p.toSeq), i.toLong)
      seen = seen ++ p.map(r => (r.getString(2), r.getLong(3)))
      val q = qppm(seen)
      val got = spark.read.parquet(out)
        .filter(col("doc_id").isin(p.map(_.getLong(0)): _*))
        .collect()
      assert(got.length == p.length, s"batch $i must append one row per doc")
      got.foreach { r =>
        val id = r.getLong(0)
        val (src, split, admitted, weight) = oneShot(id)
        assert(r.getString(1) == src && r.getString(2) == split,
          s"doc $id: source/split must match the one-shot manifest")
        assert(r.getLong(4) == admitted && r.getLong(5) == weight,
          s"doc $id: contiguous-range batches must keep one-shot verdicts")
        val nChars = p.find(_.getLong(0) == id).get.getLong(3)
        assert(r.getLong(3) == q((src, nChars)),
          s"doc $id: q_ppm must reflect the state AS OF batch $i")
      }
    }
  }
}
