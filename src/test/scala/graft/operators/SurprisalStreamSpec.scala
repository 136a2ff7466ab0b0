package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming twin for t34: the surprisal MODEL (vocab counts + corpus
  * total) is built batch; APPLYING it to arriving documents is a
  * stream-static join + stateful per-doc aggregate — the ingest-time
  * quality gate of a training-data pipeline. Same split as x96's twin:
  * model-building is batch, model-application streams.
  */
class SurprisalStreamSpec extends SparkSpec {

  test("t34 streaming twin: streamed scoring against the frozen vocab == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = T(spark, sfDir, "documents").select("doc_id", "text")
    val tok = docs.select(col("doc_id"), explode(expr("split(text, ' ')")).as("w"))
    val cnt = tok.groupBy("w").agg(count(lit(1)).as("c")).cache()
    val tot = tok.agg(count(lit(1)).as("t")).cache()
    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val batch = toMap(TextOps.surprisalScore(tok, cnt, tot)
      .select("doc_id", "n_tokens", "sum_bits", "mean_bits_ppm").collect())

    val rows = docs.as[(Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, String)]
    val streamTok = stream.toDS().toDF("doc_id", "text")
      .select(col("doc_id"), explode(expr("split(text, ' ')")).as("w"))
    val q = TextOps.surprisalScore(streamTok, cnt, tot)
      .select("doc_id", "n_tokens", "sum_bits", "mean_bits_ppm")
      .writeStream.format("memory").queryName("surprisal_stream")
      .outputMode("complete").start()
    try {
      val (h1, h2) = rows.splitAt(rows.size / 2)
      stream.addData(h1)
      q.processAllAvailable()
      val mid = toMap(spark.table("surprisal_stream").collect())
      assert(mid.keySet === h1.map(_._1).toSet, "first micro-batch fully scored")
      stream.addData(h2)
      q.processAllAvailable()
      val got = toMap(spark.table("surprisal_stream").collect())
      assert(got === batch, "streamed scores must equal the batch t34 scores")
    } finally q.stop()
  }
}
