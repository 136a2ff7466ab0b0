package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** x117: the incremental content-keyed shard export. The property that
  * makes it "incremental" is PHYSICAL: after the delta lands, shard
  * files the delta doesn't touch are the SAME files (names and bytes),
  * and skipping the delta write leaves every changed shard red in the
  * audit — the audit actually notices a stale export. */
class IncrementalExportSpec extends SparkSpec {

  private def freshOut() =
    java.nio.file.Files.createTempDirectory("graft_increxport_spec").toString + "/shards"

  /** shard dir name -> sorted (file name, length) list. */
  private def layout(out: String): Map[String, Seq[(String, Long)]] =
    new java.io.File(out).listFiles().filter(_.getName.startsWith("hshard="))
      .map(d => d.getName ->
        d.listFiles().filter(_.getName.startsWith("part-"))
          .map(f => (f.getName, f.length())).sortBy(_._1).toSeq)
      .toMap

  test("delta rewrite touches ONLY changed shards; audit fully green") {
    val out = freshOut()
    val d = Pipeline.hashShardDocs(spark, sfDir).cache()
    Pipeline.writeHashShards(d.filter(col("b") =!= 7), out, dynamic = false)
    val before = layout(out)
    val changed = d.filter(col("b") === 7).select("hshard").distinct()
    Pipeline.writeHashShards(
      d.join(changed, Seq("hshard"), "left_semi"), out, dynamic = true)
    val after = layout(out)
    val changedSet = changed.collect().map(r => s"hshard=${r.getLong(0)}").toSet
    assert(changedSet.nonEmpty, "the b=7 delta must be non-empty at this SF")
    // untouched shards: identical files (same names, same sizes)
    for ((dir, files) <- before if !changedSet.contains(dir))
      assert(after(dir) === files, s"$dir was rewritten without a delta")
    // changed shards that existed in v1: physically rewritten (new files)
    for ((dir, files) <- before if changedSet.contains(dir))
      assert(after(dir).map(_._1) !== files.map(_._1), s"$dir was not rewritten")
    val audit = Pipeline.auditHashShards(spark, sfDir, out).cache()
    assert(audit.filter(col("checksum_ok") =!= 1 || col("bytes_ok") =!= 1)
      .count() === 0, "merged layout must verify against the full v2 source")
    assert(audit.agg(sum("n_docs")).head().getLong(0) ===
      T(spark, sfDir, "documents").count())
    // the changed flags name exactly the delta's shards
    val flagged = audit.filter(col("changed") === 1).select("shard")
      .collect().map(_.getLong(0)).toSet
    assert(flagged.map(s => s"hshard=$s") === changedSet)
  }

  test("a stale export (delta write skipped) leaves every changed shard red") {
    val out = freshOut()
    val d = Pipeline.hashShardDocs(spark, sfDir)
    Pipeline.writeHashShards(d.filter(col("b") =!= 7), out, dynamic = false)
    val audit = Pipeline.auditHashShards(spark, sfDir, out).cache()
    assert(audit.filter(col("changed") === 1).count() > 0)
    assert(audit.filter(col("changed") === 1 && col("checksum_ok") === 1)
      .count() === 0, "every shard awaiting its delta must fail the checksum")
    assert(audit.filter(col("changed") === 0 && (col("checksum_ok") =!= 1 ||
      col("bytes_ok") =!= 1)).count() === 0, "unchanged shards stay green")
  }
}
