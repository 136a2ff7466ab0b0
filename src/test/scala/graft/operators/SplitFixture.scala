package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared spec-side recomputation of the t27 hash split and the x92
  * held-out shingle profile. Specs rebuild these from raw text through
  * the single shared primitives ([[H.jvm]], [[Dedup.shingleHashesOf]])
  * rather than each carrying its own copy of the bit assembly — the
  * cross-dialect agreement of H itself is pinned by the oracle hash
  * comparison and the FunctionsSpec fuzz, not here. */
object SplitFixture {
  def docs(spark: SparkSession, dir: String): Array[(Long, String)] =
    T(spark, dir, "documents").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  /** t27/x91/x92 split membership: H(doc_id) % 10 < 8 → train. */
  def isTrain(id: Long, md5: java.security.MessageDigest): Boolean =
    H.jvm(id.toString, md5) % 10 < 8

  /** (train docs, distinct shingle-hash set of the held-out split). */
  def trainAndEvalShingles(spark: SparkSession, dir: String)
      : (Array[(Long, String)], Set[Long]) = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val all = docs(spark, dir)
    val (train, eval) = all.partition { case (id, _) => isTrain(id, md5) }
    (train, eval.flatMap { case (_, t) => Dedup.shingleHashesOf(t, md5) }.toSet)
  }
}
