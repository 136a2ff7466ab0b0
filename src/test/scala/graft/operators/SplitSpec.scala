package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** x103 leakage-safe group-aware split: the whole point of assigning
  * splits by duplicate CLUSTER is that the x101 audit over the resulting
  * assignment is empty. These tests run that audit against the exact
  * production assignment ([[Pipeline.clusterSplitAssign]]) — not a spec-side
  * re-derivation — and pin the bookkeeping invariants (the split still
  * partitions the corpus; cluster members agree on their split). */
class SplitSpec extends SparkSpec {

  private lazy val sh = {
    val hs0 = Dedup.shingleHashes(spark, sfDir).cache()
    Dedup.cappedShingleSets(hs0).cache()
  }
  private lazy val pairs =
    Dedup.lshVerifiedPairs(sh).select("a_id", "b_id").cache()
  private lazy val assign = Pipeline.clusterSplitAssign(
    graft.operators.T(spark, sfDir, "documents").select("doc_id", "lang"),
    Dedup.connectedComponents(pairs).select("doc_id", "component")).cache()

  test("x103: no verified near-dup pair straddles the split boundary") {
    assert(pairs.count() > 0, "sf0.001 must produce verified near-dup pairs")
    val sp = assign.select("doc_id", "split")
    val straddling = pairs
      .join(sp.select(col("doc_id").as("a_id"), col("split").as("split_a")), "a_id")
      .join(sp.select(col("doc_id").as("b_id"), col("split").as("split_b")), "b_id")
      .filter(col("split_a") =!= col("split_b"))
    assert(straddling.count() == 0,
      "group-aware split must keep every near-dup pair inside one split")
    // the doc-level split (t27's rule) DOES leak on the same corpus —
    // otherwise this spec is vacuous and x103 changes nothing
    val docLevel = graft.operators.T(spark, sfDir, "documents")
      .withColumn("b", expr(s"${H.s("cast(doc_id as string)")} % 10"))
      .withColumn("split",
        when(col("b") < 8, "train").when(col("b") === 8, "val").otherwise("test"))
      .select("doc_id", "split")
    val docStraddling = pairs
      .join(docLevel.select(col("doc_id").as("a_id"), col("split").as("split_a")), "a_id")
      .join(docLevel.select(col("doc_id").as("b_id"), col("split").as("split_b")), "b_id")
      .filter(col("split_a") =!= col("split_b"))
    assert(docStraddling.count() > 0,
      "fixture must exhibit doc-level leakage for the cluster-level fix to matter")
  }

  test("x103: split partitions the corpus and cluster members agree") {
    val nDocs = graft.operators.T(spark, sfDir, "documents").count()
    assert(assign.count() == nDocs, "every doc gets exactly one split")
    assert(assign.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    // every cluster is wholly inside one split
    val disagree = assign.groupBy("rep")
      .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1)
    assert(disagree.count() == 0, "a cluster must map to exactly one split")
    // aggregate shape matches the oracle-checked query's own output
    val viaQ = Pipeline.x103ClusterSplit.fn(spark, sfDir)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(viaQ == nDocs)
  }
}
