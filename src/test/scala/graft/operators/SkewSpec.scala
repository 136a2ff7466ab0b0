package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Value-level skew gates at spec speed (sf0.001 + SkewBench's generator):
  * the 120 s-bounded `graft.SkewBench` main measures wall time at sf0.1;
  * this spec pins the *behavioral* contracts every CI run. */
class SkewSpec extends SparkSpec {

  test("x127 under mass-duplicated embeddings: mutual degree stays ≤ 3; lcc ≤ 1e6") {
    val dir = java.nio.file.Files.createTempDirectory("graft_skew_x127").toString
    graft.SkewBench.generate(spark, sfDir, dir)
    // the hostile corpus piles 10k identical embeddings into ONE LSH
    // bucket — the unbounded-in-degree worst case for any graph op. The
    // mutual restriction is x127's whole scale claim: out-degree ≤ 3 in
    // s40's graph bounds MUTUAL degree at 3 for every node, dup cluster
    // included, so the wedge join can never go quadratic.
    val out = graft.SparkEntry.queries("x127_graph_triangles")(spark, dir)
      .collect()
    assert(out.nonEmpty, "the hostile corpus must yield mutual edges")
    val maxDeg = out.map(_.getLong(1)).max
    assert(maxDeg <= 3L,
      s"mutual degree must be bounded at 3 by construction, saw $maxDeg")
    assert(out.map(_.getLong(3)).max <= 1000000L,
      "lcc is a ppm fraction — a value above 1e6 means the triangle " +
        "count double-counted a corner")
    // triangle-corner consistency: Σ per-node counts ≡ 0 (mod 3)
    assert(out.map(_.getLong(2)).sum % 3 == 0,
      "every triangle must contribute exactly three corners")
  }

  test("mass-duplicated corpus: d26 counts the cluster, the cap silences it in d27/d28") {
    val dir = java.nio.file.Files.createTempDirectory("graft_skew_spec").toString
    graft.SkewBench.generate(spark, sfDir, dir)

    // the duplicated cluster = the modal text (the 10k appended copies;
    // the original row itself got the stop-shingle prefix, so it is a
    // distinct text)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val hotText = docs.groupBy("text").count()
      .orderBy(desc("count")).limit(1).head.getString(0)
    val dupIds = docs.filter(col("text") === hotText)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dupIds.size >= graft.SkewBench.DupFactor)

    // exact dedup owns mass duplicates: one group carries the whole cluster
    val d26 = Dedup.d26ExactDedup.fn(spark, dir)
    assert(d26.agg(max("n_copies")).head.getLong(0) === dupIds.size.toLong)

    // near-dup pipelines: every shingle of the cluster has df ≥ 10k ≫ cap,
    // so the cluster contributes ZERO pairs (the uncapped answer would be
    // ~50M pair rows — the quadratic cliff the cap exists to close)
    for ((q, name) <- Seq(Dedup.d27NgramJaccard -> "d27", Dedup.d28MinhashLsh -> "d28")) {
      val ids = q.fn(spark, dir).select("a_id", "b_id").collect()
        .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
      assert(ids.intersect(dupIds).isEmpty,
        s"$name must not emit pairs for the capped dup cluster")
    }

    // the composed pipeline still answers: exact dedup collapses the
    // cluster BEFORE the minhash stage, so x90 completes and counts each
    // surviving text once
    assert(Pipeline.x90CorpusPipeline.fn(spark, dir).count() > 0)
    assert(n === docs.count()) // generator is deterministic/stable
  }

  test("AQE skew-join splits the hot partition at runtime and matches the salted join") {
    // README claims "AQE for runtime skew splits" as the alternative to
    // manual salting — prove it fires. Thresholds are scaled down so the
    // sf0.001 hostile table (20 % of lineitem on one key) crosses the
    // skew bar exactly the way a 100 TB hot partition crosses the 256 MB
    // default; the semantics under test are identical.
    val dir = java.nio.file.Files.createTempDirectory("graft_skew_aqe").toString
    // sf0.01 (not the spec's usual sf0.001): the hot key needs ~12k rows
    // to clear even the scaled-down skew bar with margin
    graft.SkewBench.generate(spark, "/root/testdata/sf0.01", dir)
    // AQE splits a skewed partition by MAPPER block ranges — a partition
    // fed by one mapper is unsplittable and never even counted as skewed.
    // A real cluster scan has thousands of mappers; reproduce that shape
    // locally: 16 files + a maxPartitionBytes small enough that file
    // packing keeps 16 scan splits.
    spark.read.parquet(s"$dir/lineitem.parquet").repartition(16)
      .write.mode("overwrite").parquet(s"$dir/lineitem16.parquet")
    val s2 = spark.newSession()
    // the spec session's 4 shuffle partitions would dissolve the hot key
    // into the base load (hot/median < factor); use a cluster-like 32
    s2.conf.set("spark.sql.shuffle.partitions", "32")
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    s2.conf.set("spark.sql.files.maxPartitionBytes", "4MB")
    // the collected join is the RESULT stage: without the force flag the
    // cost evaluator rejects the split there
    s2.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    import graft.operators.{Num => N}
    val li = s2.read.parquet(s"$dir/lineitem16.parquet")
      .select("l_orderkey", "l_quantity")
    val o = s2.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    // the skew split is asserted on the join's own execution (a final
    // stage feeding an Exchange does not adopt the split)
    val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
    // collect() executes joined's OWN QueryExecution (count() would plan
    // a separate aggregate on a fresh one and hide the skew read)
    assert(joined.collect().length === 60000)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
      "AQE must have marked the join skewed and split the hot partition")
    // identical results to the salted strategy on the same hostile dir
    val got = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), N.dsum(col("l_quantity")).as("qty"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val salted = Scale.q26SaltedJoin.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === salted.toSeq,
      "AQE-split and salted joins must agree exactly")
  }

  test("x94 two-phase selection: hot source spreads over many buckets, prunes wholesale, matches the single-window formula") {
    import org.apache.spark.sql.expressions.Window
    val dir = java.nio.file.Files.createTempDirectory("graft_skew_x94").toString
    graft.SkewBench.generate(spark, sfDir, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // the hot source (the 10k-dup cluster's source) must NOT land in one
    // window partition: its rows span many range buckets pre-pruning
    val q = docs.select(col("source"), col("doc_id"),
      expr("cast(size(split(text, ' ')) as bigint)").as("n_tokens"),
      expr(H.s("cast(doc_id as string)")).as("h"),
      when(graft.functions.TokenQuality(col("text"), 20, 120, 0.25), 1L)
        .otherwise(0L).as("is_quality"))
      .withColumn("b", (lit(1L) - col("is_quality")) * 16 + expr(s"h div ${(1L << 32) / 16}"))
    val hotSource = docs.groupBy("source").count().orderBy(desc("count"))
      .head.getString(0)
    val spread = q.filter(col("source") === hotSource)
      .select("b").distinct().count()
    assert(spread > 8, s"hot source occupies only $spread buckets — not spread")

    // wholesale pruning: with budget ≪ corpus, most of the hot source's
    // buckets are discarded by the offset filter BEFORE the wide shuffle
    val wOff = Window.partitionBy(col("source")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = q.groupBy("source", "b").agg(sum("n_tokens").as("bt"))
      .withColumn("off", coalesce(sum(col("bt")).over(wOff), lit(0L)))
    val kept = off.filter(col("source") === hotSource && col("off") <= 800).count()
    assert(kept < spread / 2, s"pruning kept $kept of $spread hot-source buckets")

    // exactness: the two-phase result is row-identical to the naive
    // one-window-per-source formula (the spec that makes the rewrite safe)
    val wNaive = Window.partitionBy(col("source"))
      .orderBy(col("is_quality").desc, col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = q.withColumn("cum_tokens", sum(col("n_tokens")).over(wNaive))
      .filter(col("cum_tokens") <= 800)
      .select("source", "doc_id", "n_tokens", "is_quality", "cum_tokens")
      .collect().map(_.toSeq).sortBy(_.toString)
    val twoPhase = Pipeline.x94TokenBudgetMix.fn(spark, dir)
      .select("source", "doc_id", "n_tokens", "is_quality", "cum_tokens")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(twoPhase.toSeq === naive.toSeq)
  }

  test("streaming near-dup guarded by the batch hot-shingle profile under mass duplication") {
    // the streaming tier cannot compute corpus-wide document frequency, so
    // its skew guard is the batch profile: the hot-shingle set computed
    // offline feeds nearDupPairs(hotShingles = ...). Under the hostile
    // corpus, every shingle of the 10k-dup cluster is hot — the guard
    // must keep the cluster out of the band buckets entirely (the
    // unguarded answer would be ~50M pair rows through one bucket).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_skew_stream").toString
    graft.SkewBench.generate(spark, sfDir, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val hotText = docs.groupBy("text").count()
      .orderBy(org.apache.spark.sql.functions.desc("count")).limit(1).head.getString(0)
    // batch profile: shingles with df > MaxShingleDf over the skewed corpus
    val hot = Dedup.hotShingleSet(Dedup.shingleHashesFrom(docs))

    val sample = docs.filter(col("text") === hotText).limit(20)
      .unionByName(docs.filter(col("text") =!= hotText).limit(50))
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = graft.streaming.StreamOps
      .nearDupPairs(stream.toDS(), hotShingles = hot)
      .toDF("a_id", "b_id", "jaccard")
      .writeStream.format("memory").queryName("neardup_skew")
      .outputMode("append").start()
    try {
      stream.addData(sample.map { case (id, t) => (id, ts, t) })
      q.processAllAvailable()
      val dupSampleIds = sample.filter(_._2 == hotText).map(_._1).toSet
      val pairIds = spark.table("neardup_skew").collect()
        .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
      assert(pairIds.intersect(dupSampleIds).isEmpty,
        "the hot-shingle guard must keep the dup cluster out of the buckets")
    } finally q.stop()
  }
}
