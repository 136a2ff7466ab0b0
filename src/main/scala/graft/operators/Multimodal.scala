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

  /** Frame sampling: one row per sampled frame (≤ 5) with per-frame stub
    * features — the video-pipeline shape (blob in, N frame rows out,
    * executor-side explode inside the batched decode). */
  val m42FrameSample = Q(
    "m42_frame_sample",
    s"""WITH f AS (SELECT doc_id,
          CAST(octet_length(encode(text)) AS BIGINT) // 100 + 1 AS n_frames,
          ${H.d("text")} AS h FROM documents),
        x AS (SELECT doc_id, n_frames, h, unnest(range(0,
                CASE WHEN n_frames < 5 THEN n_frames ELSE 5 END)) AS frame_idx
              FROM f)
        SELECT doc_id, frame_idx,
               (h * 31 + frame_idx) % 1000000007 AS frame_hash,
               ((h * 31 + frame_idx) % 1000000007) % 256 AS brightness
        FROM x ORDER BY doc_id, frame_idx""") { (spark, dir) =>
    graft.multimodal.MediaPipeline
      .sampleFrames(spark, T(spark, dir, "documents"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Resize planning: fit the longest side to 224 px, integer math only
    * (deterministic across engines — no float scale factor). */
  val m43ResizePlan = Q(
    "m43_resize_plan",
    s"""WITH f AS (SELECT doc_id,
          (${H.d("text")} % 640) + 1 AS width,
          (${H.d("reverse(text)")} % 480) + 1 AS height FROM documents)
        SELECT doc_id, width, height,
          width * 224 // (CASE WHEN width > height THEN width ELSE height END) AS out_w,
          height * 224 // (CASE WHEN width > height THEN width ELSE height END) AS out_h
        FROM f ORDER BY doc_id""") { (spark, dir) =>
    graft.multimodal.MediaPipeline
      .resizePlan(spark, T(spark, dir, "documents"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(m41BinaryFeatures, m42FrameSample, m43ResizePlan)
}
