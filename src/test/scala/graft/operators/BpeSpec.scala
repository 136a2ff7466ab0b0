package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins t43's BPE trainer: merge determinism, a hand-computed corpus,
  * the left-to-right non-overlap fold against a plain-Scala reference
  * on the run-parity cases, and the vocab-closure property that links
  * the merge table to the tokenizer story (every learned symbol is
  * built from earlier symbols). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("hand-computed merges on the Sennrich-style toy corpus") {
    // tokens: low x5, lower x1, lowest x1, new x3, newer x1, newest x1
    val docs = corpus("low lower lowest low low", "new newer newest new",
      "low new low")
    val m = TextOps.bpeTrain(docs, 4).orderBy("merge_rank")
      .select("lhs", "rhs", "pair_count").as[(String, String, Long)].collect()
    // (l,o)=7; (lo,w)=7; then (e,w)=5 ties (n,e)=5 and wins on lhs asc;
    // then (n,ew)=5
    assert(m.toSeq === Seq(("l", "o", 7L), ("lo", "w", 7L),
      ("e", "w", 5L), ("n", "ew", 5L)))
  }

  test("training is deterministic: two runs emit identical merge tables") {
    val docs = T(spark, sfDir, "documents")
    val a = TextOps.bpeTrain(docs, 5).collect().toSeq
    val b = TextOps.bpeTrain(docs, 5).collect().toSeq
    assert(a === b)
  }

  test("merge application is left-to-right non-overlapping (run parity)") {
    // plain-Scala reference for one LTR non-overlapping merge pass
    def ref(syms: Seq[String], x: String, y: String): Seq[String] = {
      val out = scala.collection.mutable.Buffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
          out += (x + y); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    val cases = Seq(
      (Seq("a", "a", "a"), "a", "a"),          // odd run: [aa, a]
      (Seq("a", "a", "a", "a"), "a", "a"),     // even run: [aa, aa]
      (Seq("x", "a", "a", "b"), "a", "b"),     // late match after decoy
      (Seq("a", "b", "a", "b"), "a", "b"),     // back-to-back merges
      (Seq("q"), "a", "b"),                    // single symbol untouched
      (Seq("a", "b", "b"), "a", "b"))          // merged ab must not re-match
    val in = cases.zipWithIndex
      .map { case ((s, _, _), i) => (i.toLong, s) }.toDF("id", "syms")
    for (((syms, x, y), i) <- cases.zipWithIndex) {
      val got = TextOps.bpeApplyMerge(in.filter(col("id") === i), x, y)
        .select("syms").as[Seq[String]].head()
      assert(got === ref(syms, x, y), s"case $i: $syms merge ($x,$y)")
    }
  }

  test("t44 encode scores docs against the trained state (hand cases)") {
    // after the 4 toy-corpus merges (l,o)(lo,w)(e,w)(n,ew), applied in
    // training order:
    //   low    [l,o,w]       -> [lo,w] -> [low]              = 1
    //   lower  [l,o,w,e,r]   -> [low,e,r]                    = 3
    //   new    [n,e,w]       -> [n,ew] -> [new]              = 1
    //   newest [n,e,w,e,s,t] -> [n,ew,e,s,t] -> [new,e,s,t]  = 4
    val docs = corpus("low lower lowest low low", "new newer newest new",
      "low new low")
    val enc = TextOps.bpeLoop(docs, 4)._2
      .select(col("w"), size(col("syms")).as("n"))
      .as[(String, Int)].collect().toMap
    assert(enc("low") === 1)
    assert(enc("lower") === 3)
    assert(enc("new") === 1)
    assert(enc("newest") === 4)
  }

  test("vocab closure: every merge operand is a char or an earlier merge result") {
    val m = TextOps.t43BpeMerges.fn(spark, sfDir)
      .orderBy("merge_rank").select("lhs", "rhs")
      .as[(String, String)].collect()
    val known = scala.collection.mutable.Set[String]()
    for ((l, r) <- m) {
      assert(l.length == 1 || known.contains(l), s"unknown lhs $l")
      assert(r.length == 1 || known.contains(r), s"unknown rhs $r")
      known += (l + r)
    }
  }
}
