package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{Pipeline, T}

/** DSIR scoring applied to a STREAM (the x96/t34 contract: model-build
  * is batch, model-application streams): scoring against the frozen
  * hashed-n-gram models is stateless per document, so the union of
  * per-batch scores must equal batch x129 exactly — whatever the
  * batching. */
class DsirStreamSpec extends SparkSpec {

  test("streamed DSIR scores against frozen models == batch x129") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val model = Pipeline.dsirModel(spark, sfDir)
    val docs = T(spark, sfDir, "documents")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq

    val out = java.nio.file.Files
      .createTempDirectory("graft_dsirstream").toString + "/scores"
    val stream = MemoryStream[(Long, String, String)]
    val q = stream.toDS().toDF("doc_id", "source", "text")
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Pipeline.dsirScoreAgainst(batch, model)
          .write.mode("append").parquet(out)
      }.outputMode("append").start()
    try {
      val parts = docs.grouped((docs.length + 2) / 3).toSeq
      parts.foreach { p => stream.addData(p); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.read.parquet(out)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val expected = Pipeline.x129DsirWeights.fn(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(got == expected,
      "per-batch scoring against the frozen model must union to batch x129")
  }
}
