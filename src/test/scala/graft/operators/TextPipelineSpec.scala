package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Value-level properties for the round-3 pipeline additions (t29
  * repetition stats, t31 PII redaction, x91 source mixing). The DuckDB
  * oracle enforces full-output equality; these pin the semantic
  * invariants a formula refactor could silently break on both engines
  * at once. */
class TextPipelineSpec extends SparkSpec {

  test("t29: gram identities hold for every document") {
    val rows = TextOps.t29Repetition.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nGrams, nDistinct) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // every sf document has >= 2 tokens, so the adjacent-pair identity
      // n_grams = n_tokens - 1 must hold exactly
      assert(nGrams == nTok - 1, s"doc ${r.getLong(0)}: $nGrams vs ${nTok - 1}")
      assert(nDistinct >= 1 && nDistinct <= nGrams)
      val top = r.getDouble(4)
      val dup = r.getDouble(5)
      assert(top > 0.0 && top <= 1.0)
      assert(dup >= 0.0 && dup < 1.0)
      // all-distinct grams <=> zero duplicate fraction
      assert((nDistinct == nGrams) == (dup == 0.0))
    }
  }

  test("t29: stats match a hand computation on one document") {
    val doc = T(spark, sfDir, "documents").orderBy("doc_id").head
    val toks = doc.getAs[String]("text").split(" ", -1)
    val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
    val byCount = grams.groupBy(identity).map(_._2.size)
    val r = TextOps.t29Repetition.fn(spark, sfDir)
      .filter(col("doc_id") === doc.getAs[Long]("doc_id")).head
    assert(r.getLong(1) == toks.length.toLong)
    assert(r.getLong(2) == grams.size.toLong)
    assert(r.getLong(3) == byCount.size.toLong)
    assert(r.getDouble(4) == byCount.max.toDouble / grams.size)
    assert(r.getDouble(5) == 1.0 - byCount.size.toDouble / grams.size)
  }

  test("t29: a single-token document yields an empty 2-gram array (slice, not sequence)") {
    // sequence(1, 0) counts DOWN — the zip_with/slice form is what makes
    // the degenerate doc safe; pin it so a refactor cannot swap it back
    val g = spark.sql(
      "SELECT zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1)," +
        " (a, b) -> concat(a, ' ', b)) AS g FROM VALUES (array('x')) AS v(t)")
      .head.getSeq[String](0)
    assert(g.isEmpty)
  }

  test("t31: exactly one email and one phone planted and redacted per doc") {
    val rows = TextOps.t31PiiRedact.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 1L, s"doc ${r.getLong(0)}: n_emails")
      assert(r.getLong(2) == 1L, s"doc ${r.getLong(0)}: n_phones")
      val clean = r.getString(3)
      assert(clean.contains("<EMAIL>") && clean.contains("<PHONE>"))
      assert(!clean.contains("@example.com") && !clean.contains("555-1"),
        "no un-redacted PII may survive")
    }
  }

  test("t32: chunks equal a plain-Scala windowing of every document") {
    val chunks = TextOps.t32ChunkOverlap.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    val docs = T(spark, sfDir, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty)
    var n = 0
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1) // -1: keep trailing empties like SQL split
      val starts = 0 until math.max(toks.length, 1) by 48
      starts.zipWithIndex.foreach { case (st, idx) =>
        val expect = toks.slice(st, st + 64)
        val (nc, ct) = chunks((id, idx.toLong))
        assert(nc == expect.length.toLong, s"doc $id chunk $idx size")
        assert(ct == expect.mkString(" "), s"doc $id chunk $idx text")
        n += 1
      }
      // overlap: every chunk after the first repeats the previous 16 tokens
      starts.drop(1).zipWithIndex.foreach { case (st, i) =>
        assert(chunks((id, (i + 1).toLong))._2.startsWith(
          toks.slice(st, math.min(st + 16, toks.length)).mkString(" ")))
      }
    }
    assert(n == chunks.size, "no chunks beyond the recomputed windows")
  }

  test("x91: every source capped at exactly K docs, ranks contiguous") {
    val df = Pipeline.x91SourceMix.fn(spark, sfDir)
    val per = df.groupBy("source").agg(count(lit(1)).as("n"),
      min("rnk").as("lo"), max("rnk").as("hi")).collect()
    val nSources = T(spark, sfDir, "documents")
      .select("source").distinct().count()
    assert(per.length.toLong == nSources, "every source must survive the mix")
    per.foreach { r =>
      assert(r.getLong(1) == 15L && r.getLong(2) == 1L && r.getLong(3) == 15L,
        s"${r.getString(0)}: cap/rank contract broken")
    }
  }

  test("x92: contamination matches a full JVM recomputation") {
    // recomputation from raw text outside the Spark/DuckDB plans (the
    // dialect agreement of H itself is pinned by the oracle hash compare)
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val (train, evalSet) = SplitFixture.trainAndEvalShingles(spark, sfDir)
    val expected = train.map { case (id, text) =>
      val sh = Dedup.shingleHashesOf(text, md5).toSet
      id -> ((sh.size.toLong, sh.count(evalSet.contains).toLong))
    }.toMap
    val rows = Pipeline.x92Decontamination.fn(spark, sfDir).collect()
    assert(rows.length == expected.size, "one row per train doc")
    rows.foreach { r =>
      val (nSh, nCont) = expected(r.getLong(0))
      assert(r.getLong(1) == nSh && r.getLong(2) == nCont,
        s"doc ${r.getLong(0)}: ${r.getLong(1)}/${r.getLong(2)} vs $nSh/$nCont")
      if (nSh > 0)
        assert(r.getDouble(3) == nCont.toDouble / nSh)
    }
    // the check is only meaningful if some contamination exists at this SF
    assert(rows.exists(_.getLong(2) > 0), "positive control: no overlap found")
  }

  test("x94: budget binds and is never exceeded; quality admitted first") {
    val rows = Pipeline.x94TokenBudgetMix.fn(spark, sfDir).collect()
    val total = T(spark, sfDir, "documents").count()
    assert(rows.nonEmpty && rows.length < total, "the budget must actually bind")
    val admitted = rows.map(r => r.getLong(1) -> r.getLong(3)).toMap
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      assert(rs.map(_.getLong(4)).max <= 800L, s"$src: budget exceeded")
    }
    // admission is a prefix of the quality-first order, so a low-quality
    // admit implies every quality doc of that source was admitted too
    val all = T(spark, sfDir, "documents")
      .select(col("source"), col("doc_id"),
        when(graft.functions.TokenQuality(col("text"), 20, 120, 0.25), 1L)
          .otherwise(0L).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    all.groupBy(_._1).foreach { case (src, docs) =>
      val admittedSpam = docs.exists(d => d._3 == 0L && admitted.contains(d._2))
      if (admittedSpam)
        docs.filter(_._3 == 1L).foreach { d =>
          assert(admitted.contains(d._2),
            s"$src: quality doc ${d._2} rejected while low-quality admitted")
        }
    }
  }

  test("x91: selection is a pure function of doc_id (stable across partitioning)") {
    def kept(parts: Int): Set[Long] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try Pipeline.x91SourceMix.fn(spark, sfDir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(kept(2) == kept(7), "the mix must not depend on physical partitioning")
  }

  test("x97: per-row JVM recomputation reproduces the stratified-sample audit exactly") {
    // the summary must be the exact aggregate of the per-row admission
    // rule (H.jvm is the one shared bit-assembly) — any drift between the
    // three hash dialects or the salt shows up as a count mismatch
    val out = Pipeline.x97StratifiedSample.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val docs = T(spark, sfDir, "documents").select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val rate = 500L + H.jvm(src, md5) % 9500L
      val kept = rows.count { case (_, id) => H.jvm("samp" + id, md5) % 10000L < rate }
      src -> ((rate, rows.length.toLong, kept.toLong))
    }
    assert(out === expected)
    assert(out.values.exists(_._3 > 0) && out.values.exists(v => v._3 < v._2),
      "positive control: the rate spectrum must both keep and drop")
  }
  test("x109: plan invariants — budget floor, epoch cap, capped flag") {
    val rows = Pipeline.x109EpochPlan.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val b = rows.map(_.getLong(1)).sum // budget = corpus token total
    val rawSum = rows.map(_.getLong(3)).sum
    assert(rawSum <= b, s"floor-division allocations must never exceed the budget ($rawSum > $b)")
    for (r <- rows) {
      val (n, raw, alloc, capped, ppm) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(alloc === math.min(4 * n, raw), s"${r.getString(0)}: alloc rule")
      assert((capped === 1L) === (raw > 4 * n), s"${r.getString(0)}: capped flag")
      assert(ppm <= 4000000L, s"${r.getString(0)}: epoch cap in ppm")
      assert(ppm === alloc * 1000000L / n, s"${r.getString(0)}: ppm derivation")
    }
    // the temperature must actually bend the distribution: the smallest
    // source gets MORE epochs than the largest (sqrt flattening)
    val byN = rows.sortBy(_.getLong(1))
    assert(byN.head.getLong(6) > byN.last.getLong(6),
      "smallest source must repeat more than the largest")
  }

  test("x111: exclusion columns are exact complements of the totals") {
    val rows = Pipeline.x111AblationProfile.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val td = rows.map(_.getLong(1)).sum
    val tt = rows.map(_.getLong(2)).sum
    for (r <- rows) {
      assert(r.getLong(4) === td - r.getLong(1), s"${r.getString(0)}: docs_excl")
      assert(r.getLong(5) === tt - r.getLong(2), s"${r.getString(0)}: tokens_excl")
      assert(r.getLong(3) === r.getLong(2) * 1000000L / tt, s"${r.getString(0)}: share")
    }
    // floor-division shares must sum to <= 1e6 and within S of it
    val shareSum = rows.map(_.getLong(3)).sum
    assert(shareSum <= 1000000L && shareSum >= 1000000L - rows.length)
  }

  test("t41 CMS: forced collisions still over-estimate, never under") {
    import spark.implicits._
    // W=2 buckets guarantees collisions among 6 tokens; the estimate must
    // be >= exact for EVERY probe and strictly over for at least one
    val words = Seq("a","a","a","b","b","c","d","e","f","f","f","f")
    val tok = words.toDF("w")
    val probes = Seq("a","b","c","d","e","f")
    val r = TextOps.cmsEstimates(spark, tok, probes, 2, 2)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.length === 6)
    assert(r.forall(v => v._3 >= v._2), s"CMS must never under-estimate: ${r.mkString(",")}")
    assert(r.exists(v => v._4 > 0), "W=2 over 6 tokens must collide somewhere")
    // the full-width query form is collision-free on this vocab: exact
    val wide = TextOps.cmsEstimates(spark, tok, probes, 4, 1024).collect()
    assert(wide.forall(_.getLong(3) == 0L))
  }

}
