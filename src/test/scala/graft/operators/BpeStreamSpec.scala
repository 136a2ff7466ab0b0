package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming twin for t44: the BPE model (the trained encode state) is
  * built batch; SCORING arriving documents against it is a
  * stream-static broadcast join + stateful per-doc aggregate — the
  * tokenizer-coverage gate applied at ingest time. Same contract as
  * t34's twin (SurprisalStreamSpec): model-building is batch,
  * model-application streams. */
class BpeStreamSpec extends SparkSpec {

  test("t44 streaming twin: streamed scoring against the trained state == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = T(spark, sfDir, "documents").select("doc_id", "text")
    val enc = TextOps.bpeLoop(docs, 4)._2
      .select(col("w"), size(col("syms")).cast("long").as("n_sub")).cache()
    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val batch = toMap(TextOps.bpeScore(
      docs.select(col("doc_id"), explode(expr("split(text, ' ')")).as("w")), enc)
      .collect())

    val rows = docs.as[(Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, String)]
    val streamTok = stream.toDS().toDF("doc_id", "text")
      .select(col("doc_id"), explode(expr("split(text, ' ')")).as("w"))
    val q = TextOps.bpeScore(streamTok, enc)
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode("complete").start()
    try {
      val (h1, h2) = rows.splitAt(rows.size / 2)
      stream.addData(h1)
      q.processAllAvailable()
      val mid = toMap(spark.table("bpe_stream").collect())
      assert(mid.keySet === h1.map(_._1).toSet, "first micro-batch fully scored")
      stream.addData(h2)
      q.processAllAvailable()
      val got = toMap(spark.table("bpe_stream").collect())
      assert(got === batch, "streamed scores must equal the batch t44 scores")
    } finally q.stop()
  }
}
