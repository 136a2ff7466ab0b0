package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the `spark.graft.reliableCheckpoint` knob (operators/core.scala
  * Ckpt): with it set — plus a checkpoint dir — every per-round
  * truncation in the iterative operators writes a RELIABLE checkpoint
  * (executor-loss-tolerant at cluster scale, BASELINE.md), and the
  * results are identical to the default localCheckpoint mode. */
class CheckpointModeSpec extends SparkSpec {
  import spark.implicits._

  private def pairs = Seq(
    (1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 23L))
    .toDF("a_id", "b_id")

  test("d34 components identical under reliable checkpoint(); files written") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val defaultMode = Dedup.connectedComponents(pairs)
      .orderBy("doc_id").collect().toSeq
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Ckpt.Key, "true")
    try {
      val reliable = Dedup.connectedComponents(pairs)
        .orderBy("doc_id").collect().toSeq
      assert(reliable === defaultMode)
      val written = new java.io.File(dir).listFiles()
      assert(written != null && written.nonEmpty,
        "reliable mode must materialize checkpoint files in the dir")
    } finally spark.conf.set(Ckpt.Key, "false")
  }

  test("default mode never touches the checkpoint dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_off").toString
    spark.sparkContext.setCheckpointDir(dir)
    Dedup.connectedComponents(pairs).count()
    val sub = new java.io.File(dir).listFiles()
    // Spark creates one per-app subdir on setCheckpointDir; it must stay empty
    assert(sub == null || sub.forall(d =>
      d.listFiles() == null || d.listFiles().isEmpty),
      "localCheckpoint mode must not write reliable checkpoints")
  }
}
