package graft.operators

import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2 Part B, LLM-pipeline
  * extensions): media travels as opaque `binary` columns with typed
  * metadata; decode / feature-extraction runs batched per partition.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * deterministic stub ([[graft.multimodal.StubImageCodec]]) — but the
  * Spark-side plumbing is real: binary column + metadata schema, typed
  * `Dataset` pipeline, per-partition batched execution (the JVM analogue of
  * `mapInPandas` batch shape), and the oracle checks every derived value.
  * Swapping in a real codec changes one class, no plan changes.
  *
  * Scale posture: pure map-side work — no shuffle, no driver collection;
  * batches bound memory per task regardless of blob size skew.
  */
object Multimodal {

  /** Binary ingestion + metadata + stub decode features, oracle-checked.
    * The Spark side runs the typed mapPartitions pipeline in
    * [[graft.multimodal.MediaPipeline]]; the oracle recomputes the same
    * deterministic features in SQL. */
  val m41BinaryFeatures = Q(
    "m41_binary_features",
    s"""SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        md5(text) AS content_md5,
        (${H.d("text")} % 640) + 1 AS width,
        (${H.d("reverse(text)")} % 480) + 1 AS height,
        (${H.d("text")} // 7) % 256 AS mean_px,
        CAST(octet_length(encode(text)) AS BIGINT) // 100 + 1 AS n_frames
        FROM documents ORDER BY doc_id""") { (spark, dir) =>
    graft.multimodal.MediaPipeline
      .extractFeatures(spark, T(spark, dir, "documents"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(m41BinaryFeatures)
}
