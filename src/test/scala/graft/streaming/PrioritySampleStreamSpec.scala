package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PrioritySampleMaintainer (x120's streaming twin): the maintained
  * k-row state must equal the BATCH x120 answer over everything
  * streamed so far (priority sampling's mergeability), a re-delivered
  * epoch must converge to the same rows (idempotence by value), and a
  * FRESH maintainer over an existing state must resume it (restart —
  * the ShardMaintainer lesson, pinned here from day one). */
class PrioritySampleStreamSpec extends SparkSpec {

  private val K = 25

  /** The batch x120 formula over an arbitrary docs frame. */
  private def batchTopK(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    spark.createDataset(rows).toDF("doc_id", "source", "n_chars")
      .withColumn("priority", expr(graft.operators.Pipeline.priorityExpr))
      .orderBy(col("priority").desc, col("doc_id")).limit(K)
      .collect().map(_.toSeq).toSeq
  }

  private def stateRows(out: String) =
    new StreamOps.PrioritySampleMaintainer(K, out).current(spark)
      .orderBy(col("priority").desc, col("doc_id"))
      .collect().map(_.toSeq).toSeq

  test("streaming priority sample: equals the batch sample; replay and restart converge") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(docs.length >= 3 * K, "fixture too small for a 3-batch split")
    val (b1, rest) = docs.splitAt(docs.length / 3)
    val (b2, b3) = rest.splitAt(docs.length / 3)

    val out = java.nio.file.Files
      .createTempDirectory("graft_prioritystream").toString + "/state"
    val sink = new StreamOps.PrioritySampleMaintainer(K, out)
    val stream = MemoryStream[(Long, String, Long)]
    val q = stream.toDS().toDF("doc_id", "source", "n_chars")
      .writeStream.foreachBatch(sink).outputMode("append").start()
    try {
      // (1) mergeability: after each batch, state == batch top-k of the
      // union of everything streamed so far
      stream.addData(b1); q.processAllAvailable()
      assert(stateRows(out) == batchTopK(b1))
      stream.addData(b2); q.processAllAvailable()
      assert(stateRows(out) == batchTopK(b1 ++ b2))

      // (2) idempotence: re-delivering an epoch leaves the state as-is
      val before = stateRows(out)
      sink.apply(spark.createDataset(b2).toDF("doc_id", "source", "n_chars"), 99L)
      assert(stateRows(out) == before,
        "a re-delivered epoch must converge to the same k rows")

      // (3) restart: a FRESH maintainer over the existing state resumes
      // it — the final state equals the batch answer over ALL docs
      val sink2 = new StreamOps.PrioritySampleMaintainer(K, out)
      sink2.apply(spark.createDataset(b3).toDF("doc_id", "source", "n_chars"), 0L)
      assert(stateRows(out) == batchTopK(docs),
        "a fresh instance must merge into the persisted state, not truncate it")
    } finally q.stop()
  }

  test("state writes are versioned: a torn write never destroys the committed sample") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft_prioritycrash").toString + "/state"
    val sink = new StreamOps.PrioritySampleMaintainer(K, out)
    val rows = (1L to 60L).map(i => (i, "s", 10 * i))
    sink.apply(spark.createDataset(rows).toDF("doc_id", "source", "n_chars"), 0L)
    val committed = stateRows(out)

    // simulate a crash mid-write of the NEXT version: a partial dir
    // with data but no _SUCCESS marker must be invisible to readers
    val partial = new java.io.File(out, "v=1")
    assert(partial.mkdirs())
    java.nio.file.Files.write(partial.toPath.resolve("part-00000.parquet"),
      Array[Byte](1, 2, 3)) // torn bytes, not even valid parquet
    assert(stateRows(out) == committed,
      "an uncommitted version must not shadow the committed state")

    // the next successful batch recovers: merges against the COMMITTED
    // version and replaces the torn dir
    val more = (61L to 90L).map(i => (i, "s", 10 * i))
    sink.apply(spark.createDataset(more).toDF("doc_id", "source", "n_chars"), 1L)
    assert(stateRows(out) == batchTopK(rows ++ more),
      "recovery after a torn write must continue from the committed state")
    // exactly one version remains after pruning
    val vs = new java.io.File(out).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("v=")).map(_.getName)
    assert(vs.toSeq == Seq("v=1"))
  }
}
