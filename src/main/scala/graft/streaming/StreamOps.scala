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
    // lenient row encoder: the writer emits java.time values (Instant /
    // LocalDate — proleptic, exact for ancient instants); the strict
    // encoder would reject them for java.sql ones unless the session flips
    // datetime.java8API. Lenient accepts both — same tolerance the batch
    // paths get from createDataFrame's converters.
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema, lenient = true)
    payloads.mapPartitions { it =>
      it.map(b => writer(ProtoWire.decode(b, md, reg)))
    }(enc).toDF()
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

  /** Streaming exact dedup (ingestion-time): emits the first *emitted*
    * occurrence of each key (e.g. a content hash) within the
    * watermark+timeout horizon — the `flatMapGroupsWithState` custom-state
    * tier (SURVEY §2 Part B streaming row): per-key state is one boolean,
    * partitioned by key across executors, and evicted by the event-time
    * timeout once the watermark passes it, so state stays bounded. Bounded
    * state necessarily weakens the guarantee vs global first-by-event-time:
    * within one micro-batch the smallest event time wins, but a
    * smaller-event-time row arriving in a LATER batch is dropped (the key
    * already emitted), and once the 2-hour timeout evicts a key's tombstone
    * a re-occurrence counts as new. This is the dedup a training-data
    * pipeline runs in front of the corpus store (batch twin — exact, global:
    * [[graft.operators.Dedup.d26ExactDedup]]).
    *
    * Rows must carry (key: String, ts: Timestamp, payload: String); the
    * watermark must already be set by the caller via `withWatermark`. */
  def dedupFirstSeen(events: Dataset[(String, java.sql.Timestamp, String)])
      : Dataset[(String, java.sql.Timestamp, String)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val enc = Encoders.tuple(Encoders.STRING,
      Encoders.TIMESTAMP, Encoders.STRING)
    implicit val boolEnc = Encoders.scalaBoolean
    events
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(
        (_: String, rows: Iterator[(String, java.sql.Timestamp, String)],
         state: GroupState[Boolean]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) Iterator.empty // key already emitted
          else {
            val first = rows.min(Ordering.by((r: (String, java.sql.Timestamp, String)) => r._2.getTime))
            state.update(true)
            // keep the key's tombstone until the watermark passes its event
            // time by the gap below; afterwards a re-occurrence counts as new
            state.setTimeoutTimestamp(first._2.getTime, "2 hours")
            Iterator.single(first)
          }
        })
  }

  /** Micro-batch conversion sink: each batch re-encoded to proto wire
    * bytes — the foreachBatch shape the reference's Kafka pipelines use. */
  def protoSink(stream: DataFrame, md: PMessageDesc, cfg: GraftConfig,
      reg: ProtoRegistry)(consume: Dataset[Array[Byte]] => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      consume(graft.Protarrow.toProtoBinary(batch, md, cfg, reg))
    }
}
