package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** File-source streaming integration: the events table consumed as a
  * parquet stream (the production shape: new files land in a directory,
  * Structured Streaming incrementally aggregates them), windowed counts
  * checked against the batch computation over the same data. */
class FileStreamSpec extends SparkSpec {

  test("parquet file stream: windowed counts equal the batch computation") {
    // stage the sf0.001 events as a one-file stream source
    val src = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val batchDf = graft.operators.T(spark, sfDir, "events") // ts as epoch-nanos long
    batchDf.write.mode("overwrite").parquet(src)

    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
      .selectExpr("ts div 3600000000000 as w", "event_type")
      .groupBy("w", "event_type").agg(count(lit(1)).as("n"))

    val q = stream.writeStream.format("memory").queryName("file_win")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_win").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = batchDf
        .selectExpr("ts div 3600000000000 as w", "event_type")
        .groupBy("w", "event_type").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("incremental arrival: second file updates the aggregation") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_stream2").toString
    // the file source lists flat files: stage each batch's part files into src
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_land").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part,
        java.nio.file.Paths.get(src, s"$name.parquet"))
    }
    land(Seq((1L, "a"), (2L, "a")).toDF("id", "k"), "batch1")

    val schema = spark.read.parquet(src).schema
    val agg = spark.readStream.schema(schema).parquet(src)
      .groupBy("k").agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("inc_agg")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("inc_agg").collect().map(r => r.getString(0) -> r.getLong(1))
        .toMap === Map("a" -> 2L))
      // a new file lands; the stream picks it up incrementally
      land(Seq((3L, "a"), (4L, "b")).toDF("id", "k"), "batch2")
      q.processAllAvailable()
      assert(spark.table("inc_agg").collect().map(r => r.getString(0) -> r.getLong(1))
        .toMap === Map("a" -> 3L, "b" -> 1L))
    } finally q.stop()
  }
}
