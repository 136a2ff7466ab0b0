package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import graft.proto._
import graft.conv.{Codecs, GraftConfig, SchemaConversion}

/** Structured Streaming surface (SURVEY.md §2 Part B, streaming row): the
  * reference's production use case is micro-batch proto ingestion off
  * Kafka (docs/faq.md:20-25); here that becomes: a stream of wire-format
  * proto payloads → typed rows → watermarked windowed aggregation →
  * sinks, all incremental.
  *
  * Scale posture: stateful aggregations are keyed by (window, key) — state
  * is partitioned by the grouping key across executors; watermarks bound
  * state size; `foreachBatch` reuses the batch conversion paths unchanged.
  */
object StreamOps {

  /** Streaming decode: wire-format payload column → typed rows (the
    * streaming twin of [[graft.Protarrow.fromProtoBinary]]; works on
    * streaming Datasets because it avoids RDD APIs). */
  def decodeProtoStream(payloads: Dataset[Array[Byte]], md: PMessageDesc,
      cfg: GraftConfig = GraftConfig(),
      reg: ProtoRegistry = WellKnown.registry): DataFrame = {
    val schema = SchemaConversion.messageTypeToSchema(md, cfg, reg)
    val writer = Codecs.rowWriter(md, cfg, reg)
    payloads.mapPartitions { it =>
      it.map(b => writer(ProtoWire.decode(b, md, reg)))
    }(Encoders.row(schema)).toDF()
  }

  /** Tumbling-window counts with a watermark: event-time aggregation whose
    * state is bounded by the watermark (late events beyond it are dropped). */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Session windows (gap-based), the streaming twin of
    * [[graft.operators.Events.q52Sessionization]]. */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
      gap: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))

  /** Micro-batch conversion sink: each batch re-encoded to proto wire
    * bytes — the foreachBatch shape the reference's Kafka pipelines use. */
  def protoSink(stream: DataFrame, md: PMessageDesc, cfg: GraftConfig,
      reg: ProtoRegistry)(consume: Dataset[Array[Byte]] => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      consume(graft.Protarrow.toProtoBinary(batch, md, cfg, reg))
    }
}
