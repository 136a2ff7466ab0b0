package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The executable shard-export round trip (x116): write the x99-ordered
  * corpus as x104's shards, re-read, and verify counts/bytes/ranges/XOR
  * checksums against the source-derived manifest — plus the negative
  * cases that prove the audit actually bites (a lost shard and a
  * tampered payload must flip verdicts). */
class ExportSpec extends SparkSpec {

  private def freshOut() =
    java.nio.file.Files.createTempDirectory("graft_export_spec").toString + "/shards"

  test("export → re-read → audit: every shard fully verified") {
    val out = freshOut()
    Pipeline.exportShards(spark, sfDir, out)
    val audit = Pipeline.auditShards(spark, sfDir, out).cache()
    val m = Pipeline.manifestFrame(spark, sfDir).cache()
    assert(audit.count() === m.count(), "one audit row per manifest shard")
    assert(audit.filter(col("checksum_ok") =!= 1 || col("bytes_ok") =!= 1 ||
      col("range_ok") =!= 1 || col("order_ok") =!= 1).count() === 0,
      "all verdicts must pass")
    // totals conserved through the round trip
    val docs = T(spark, sfDir, "documents")
    assert(audit.agg(sum("n_docs")).head().getLong(0) === docs.count())
    assert(audit.agg(sum("n_bytes")).head().getLong(0) ===
      docs.agg(sum(length(col("text")).cast("long"))).head().getLong(0))
    // the layout is one directory per shard
    val dirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard="))
    assert(dirs.length.toLong === m.count())
  }

  test("a lost shard surfaces as a zero row with every verdict failed") {
    val out = freshOut()
    Pipeline.exportShards(spark, sfDir, out)
    // destroy shard 0's directory
    val dir0 = new java.io.File(out, "shard=0")
    assert(dir0.exists())
    dir0.listFiles().foreach(_.delete()); assert(dir0.delete())
    val bad = Pipeline.auditShards(spark, sfDir, out)
      .filter(col("shard") === 0).head()
    assert(bad.getAs[Long]("n_docs") === 0L)
    assert(bad.getAs[Long]("checksum_ok") === 0L)
    assert(bad.getAs[Long]("bytes_ok") === 0L)
    assert(bad.getAs[Long]("range_ok") === 0L)
    // and the other shards still verify
    assert(Pipeline.auditShards(spark, sfDir, out)
      .filter(col("shard") =!= 0 && (col("checksum_ok") =!= 1 ||
        col("bytes_ok") =!= 1 || col("range_ok") =!= 1)).count() === 0)
  }

  test("a tampered payload flips checksum_ok even when counts survive") {
    val out = freshOut()
    Pipeline.exportShards(spark, sfDir, out)
    // rewrite shard 1 with one payload byte-flipped but same length:
    // counts and byte totals survive, the content checksum must not
    val s1 = spark.read.parquet(s"$out/shard=1")
    val tampered = s1.withColumn("text",
      when(col("global_idx") === s1.agg(min("global_idx")).head().getLong(0),
        concat(lit("X"), expr("substring(text, 2, length(text) - 1)")))
        .otherwise(col("text")))
    val tmp = freshOut()
    tampered.write.mode("overwrite").parquet(tmp)
    val d1 = new java.io.File(out, "shard=1")
    d1.listFiles().foreach(_.delete()); d1.delete()
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
      java.nio.file.Paths.get(out, "shard=1"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val row = Pipeline.auditShards(spark, sfDir, out)
      .filter(col("shard") === 1).head()
    assert(row.getAs[Long]("bytes_ok") === 1L, "same byte length — bytes survive")
    assert(row.getAs[Long]("range_ok") === 1L, "indices untouched")
    assert(row.getAs[Long]("checksum_ok") === 0L,
      "the recomputed-from-payload XOR must catch the substitution")
  }

  test("an unsorted shard file flips order_ok while content verdicts survive") {
    val out = freshOut()
    Pipeline.exportShards(spark, sfDir, out)
    // rewrite shard 1 with identical content in REVERSED global_idx
    // order — counts/bytes/checksum/range all survive, order must not
    val reversed = spark.read.parquet(s"$out/shard=1")
      .repartition(1).sortWithinPartitions(col("global_idx").desc)
    val tmp = freshOut()
    reversed.write.mode("overwrite").parquet(tmp)
    val d1 = new java.io.File(out, "shard=1")
    d1.listFiles().foreach(_.delete()); d1.delete()
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
      java.nio.file.Paths.get(out, "shard=1"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val row = Pipeline.auditShards(spark, sfDir, out)
      .filter(col("shard") === 1).head()
    assert(row.getAs[Long]("checksum_ok") === 1L, "XOR is order-independent")
    assert(row.getAs[Long]("bytes_ok") === 1L)
    assert(row.getAs[Long]("range_ok") === 1L)
    assert(row.getAs[Long]("order_ok") === 0L,
      "intra-file inversions must flip order_ok")
    // untouched shards keep order_ok = 1
    assert(Pipeline.auditShards(spark, sfDir, out)
      .filter(col("shard") =!= 1 && col("order_ok") =!= 1).count() === 0)
  }

  test("an inversion EXACTLY on a read-split boundary is caught by the cross-split compare") {
    import spark.implicits._
    // One 300-row shard file written as ~100-row parquet row groups
    // (tiny block size; parquet-mr's first size check fires at 100
    // records), read back with maxPartitionBytes small enough that each
    // row group is its own read-split. Physical order interleaves two
    // sorted runs at row-group granularity: every split is internally
    // SORTED (the adjacent-pair detector sees nothing), but consecutive
    // splits' index ranges overlap — the disorder lives only on the
    // split boundaries, the exact blind spot the range compare closes.
    val outDir = freshOut()
    val order = ((0L until 50L) ++ (100L until 150L) ++ // group 1: [0,149]
      (50L until 100L) ++ (150L until 200L) ++          // group 2: [50,199]
      (200L until 300L))                                // group 3: [200,299]
    val rows = order.map(i => (i, f"doc_$i%04d_payload_padding_to_make_rows_uniform", 0L))
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 1024)
    try {
      rows.toDF("global_idx", "text", "shard")
        .repartition(1) // one file; input order preserved within it
        .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    } finally {
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
    }
    val oldMax = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    val oldOpen = spark.conf.getOption("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try {
      // precondition 1: the read really is multi-split (≥ 2 pids per file)
      val splits = spark.read.parquet(outDir)
        .select(input_file_name().as("f"), spark_partition_id().as("pid"),
          col("global_idx"))
      assert(splits.select("pid").distinct().count() >= 2,
        "file must split into several read-splits or the case is vacuous")
      // precondition 2: the OLD detector is blind here — every
      // (file, split) window is internally sorted
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("f"), col("pid"))
        .orderBy(monotonically_increasing_id())
      val intra = splits
        .withColumn("prev", lag(col("global_idx"), 1).over(w))
        .filter(col("prev") > col("global_idx")).count()
      assert(intra === 0L,
        s"construction broke: $intra intra-split inversions — the case " +
          "must isolate the boundary blind spot")
      // the closed gap: the cross-split range compare must flag it
      val inv = Pipeline.shardOrderInversions(spark, outDir)
        .filter(col("shard") === 0).head().getAs[Long]("inversions")
      assert(inv > 0L,
        "boundary-straddling disorder must surface in the inversion count")
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      restore("spark.sql.files.maxPartitionBytes", oldMax)
      restore("spark.sql.files.openCostInBytes", oldOpen)
    }
  }
}
