package graft.pipeline

import graft.{Catalog, SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("exact dedup: every text group has exactly one keeper") {
    val r = Dedup.exactDedup(Tables(spark, sf()).documents)
    val total = r.count()
    assert(total == Tables(spark, sf()).documents.count())
    // keepers = number of distinct texts
    val keepers = r.filter(col("is_keeper") === 1).count()
    val distinctTexts = Tables(spark, sf()).documents.select("text").distinct().count()
    assert(keepers == distinctTexts)
  }

  test("minhash estimate tracks exact jaccard on near-dup pairs") {
    val exact = Catalog.byName("dd02_ngram_jaccard").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val est = Dedup.minhashPairs(spark, sf(), threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty, "testdata should contain planted near-dup pairs")
    // Every high-jaccard pair must be recalled by LSH (K=128 → low variance),
    // and the estimate should be close to the exact value.
    exact.foreach { case (pair, j) =>
      assert(est.contains(pair), s"LSH missed planted pair $pair (jaccard=$j)")
      assert(math.abs(est(pair) - j) < 0.25, s"estimate ${est(pair)} too far from exact $j for $pair")
    }
  }

  test("simhash near-dup pairs are genuinely similar (no wild false positives)") {
    val exactAll = Catalog.byName("dd02_ngram_jaccard").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(spark, sf(), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // hamming<=3 of 64 is a strict filter — every pair it emits should be a
    // true near-dup (jaccard >= 0.5 pair set from the exact pass)
    sim.foreach(p => assert(exactAll.contains(p), s"simhash false positive $p"))
  }

  test("bucketed embedding near-dup (dd06) is a subset of the exact baseline (dd05) with honest recall") {
    val exact = Catalog.byName("dd05_embedding_neardup").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Catalog.byName("dd06_embedding_neardup_lsh").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty)
    // no false positives: every bucketed pair is an exact pair, same cosine
    lsh.foreach { case (pair, c) =>
      assert(exact.contains(pair), s"dd06 emitted non-near-dup pair $pair")
      assert(math.abs(exact(pair) - c) < 1e-12)
    }
    // recall floor: the corpus' near-dups sit near the 0.4 threshold where
    // the L=6/H=8 s-curve is shallow (~15% expected) — assert a soft floor
    // that catches a broken bucket join without overclaiming LSH physics
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.05, s"dd06 recall $recall collapsed (${lsh.size}/${exact.size})")
  }

  test("wide-geometry twin (dd15) is exact-subset too and out-recalls dd06 (the measured dial)") {
    val exact = Catalog.byName("dd05_embedding_neardup").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val narrow = Catalog.byName("dd06_embedding_neardup_lsh").build(spark, sf()).count()
    val wide = Catalog.byName("dd15_embedding_neardup_lsh_wide").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    wide.foreach { case (pair, c) =>
      assert(exact.contains(pair), s"dd15 emitted non-near-dup pair $pair")
      assert(math.abs(exact(pair) - c) < 1e-12)
    }
    // 12 tables × occupancy 16 must find at least what 6 × 8 finds — not a
    // set superset (different widths hash differently) but a count dominance
    // any healthy point further up the measured recall-vs-mass line shows
    assert(wide.size >= narrow,
      s"dd15 recall count ${wide.size} below dd06's $narrow — wide geometry regressed")
  }

  test("dd05 exact baseline refuses inputs above the configured ceiling, pointing at dd06") {
    // lower the ceiling below sf0.001's 500 embeddings so the guard fires;
    // the session is shared across suites, so restore it in finally
    spark.conf.set(ExactBaseline.ConfKey, "100")
    try {
      val e = intercept[IllegalArgumentException] {
        Catalog.byName("dd05_embedding_neardup").build(spark, sf())
      }
      assert(e.getMessage.contains("dd06_embedding_neardup_lsh"))
      assert(e.getMessage.contains(ExactBaseline.ConfKey))
    } finally spark.conf.unset(ExactBaseline.ConfKey)
    // and at the default ceiling the same build goes through
    assert(Catalog.byName("dd05_embedding_neardup").build(spark, sf()).count() >= 0)
  }

  test("shingle df cap: inert at the default, provably fires when lowered") {
    val docs = Tables(spark, sf()).documents
    // default cap (4096) sits far above the corpus's max shingle df —
    // results are identical to the uncapped definition
    val capped = Dedup.ngramJaccardPairs(docs, threshold = 0.5, dfCap = Dedup.ShingleDfCap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val uncapped = Dedup.ngramJaccardPairs(docs, threshold = 0.5, dfCap = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(capped == uncapped, "default cap must not change results on the testdata")
    assert(capped.nonEmpty, "testdata should contain planted near-dup pairs")
    // cap 1 keeps only single-document shingles — no pair can share one, so
    // the candidate set (and the result) must collapse to empty: the control
    // demonstrably reaches the pair-generation join
    val strangled = Dedup.ngramJaccardPairs(docs, threshold = 0.5, dfCap = 1).count()
    assert(strangled == 0L, "df cap 1 must strangle the candidate join")
  }

  test("dd07 survivors: one keeper per cluster, keeper has max quality") {
    val r = Catalog.byName("dd07_dedup_survivors").build(spark, sf()).collect()
    assert(r.length == Tables(spark, sf()).documents.count(),
      "dd07 must emit a verdict for every document")
    val byCluster = r.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rows) =>
      val keepers = rows.filter(_.getLong(4) == 1L)
      assert(keepers.length == 1, s"cluster $cid has ${keepers.length} keepers")
      val best = rows.map(_.getDouble(2)).max
      assert(keepers.head.getDouble(2) == best,
        s"cluster $cid keeper quality ${keepers.head.getDouble(2)} < max $best")
      rows.foreach(row => assert(row.getLong(3) == rows.length,
        s"cluster $cid cluster_size mismatch"))
    }
    // the testdata plants near-dups, so at least one real (size>1) cluster
    assert(byCluster.exists(_._2.length > 1), "expected a non-singleton cluster")
  }

  test("dd08: incremental verdicts agree with the symmetric pair set") {
    // the asymmetric batch-vs-corpus probe must find exactly the cross-side
    // subset of dd03's symmetric pair set (same bands, same threshold)
    val pairs = Catalog.byName("dd03_minhash_lsh").build(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val crossSide = pairs.collect {
      case (a, b, j) if (a % 10 == 0) != (b % 10 == 0) =>
        (if (a % 10 == 0) a else b) -> (if (a % 10 == 0) b else a, j)
    }.groupBy(_._1).map { case (batch, xs) =>
      batch -> xs.map(_._2).minBy { case (c, j) => (-j, c) }
    }
    val inc = Catalog.byName("dd08_incremental_dedup").build(spark, sf())
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // full batch roster: every %10 doc appears exactly once
    val batchDocs = Tables(spark, sf()).documents
      .filter(col("doc_id") % 10 === 0).count()
    assert(inc.size.toLong == batchDocs)
    inc.foreach { case (batch, (matched, j, isDup)) =>
      crossSide.get(batch) match {
        case Some((expC, expJ)) =>
          assert(isDup && matched == expC && j == expJ, s"batch $batch")
        case None =>
          assert(!isDup && matched == -1L && j == 0.0, s"batch $batch")
      }
    }
  }

  test("exact-substring dedup removes planted duplicated spans, keeps the first copy") {
    import spark.implicits._
    // doc 1 owns a 12-word span; doc 2 embeds the same span mid-document;
    // doc 3 is unique; doc 4 repeats a 10-word span WITHIN itself.
    val span = (1 to 12).map(i => s"dup$i").mkString(" ")
    val selfSpan = (1 to 10).map(i => s"self$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $span gamma"),
      (2L, s"one two three $span four"),
      (3L, "totally unique words here nothing shared at all in this"),
      (4L, s"$selfSpan middle $selfSpan"),
    ).toDF("doc_id", "text")
    val r = Dedup.exactSubstringDedup(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) == (15L, 0L), "first (canonical) copy must keep everything")
    // doc 2: all 12 span words covered (each inside some duplicated 10-gram)
    assert(r(2L) == (16L, 12L), s"embedded copy loses exactly the span: ${r(2L)}")
    assert(r(3L) == (10L, 0L))
    // doc 4: the second self-repeat (10 words) goes, the first stays
    assert(r(4L) == (21L, 10L), s"intra-doc repeat: ${r(4L)}")
    // scrubbed doc 2 equals its own words minus the span, in order
    val md5Doc2 = Dedup.exactSubstringDedup(docs)
      .filter(col("doc_id") === 2L).select("cleaned_md5").head.getString(0)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("one two three four".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(md5Doc2 == expected)
  }

  test("minhash signature length and determinism") {
    val docs = Tables(spark, sf()).documents.limit(5)
    val hashes = docs.select(col("doc_id"),
      expr("transform(split(text, ' '), w -> abs(hash(w)))").as("hashes"))
    val s1 = Dedup.signatures(hashes).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val s2 = Dedup.signatures(hashes).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(s1 == s2)
    s1.values.foreach(sig => assert(sig.length == 128))
  }

  test("dd11 fused policy: verdicts equal the independent recombination of the three stages") {
    val roster = Catalog.byName("dd11_dedup_policy").build(spark, sf()).collect()
    assert(roster.length == Tables(spark, sf()).documents.count(),
      "dd11 must emit a verdict for every document")
    val exact = Catalog.byName("dd01_exact_dedup").build(spark, sf()).collect()
      .map(r => r.getLong(0) -> (r.getLong(1) == 1L)).toMap
    val near = Catalog.byName("dd07_dedup_survivors").build(spark, sf()).collect()
      .map(r => r.getLong(0) -> (r.getLong(4) == 1L)).toMap
    val sem = Catalog.byName("sd01_semantic_dedup").build(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    roster.foreach { r =>
      val id = r.getLong(0)
      val expected =
        if (!exact(id)) "exact"
        else if (!near(id)) "near_dup"
        else if (!sem.getOrElse(id, true)) "semantic"
        else "kept"
      assert(r.getString(1) == expected,
        s"doc $id: policy says ${r.getString(1)}, stages recombine to $expected")
    }
    // the testdata plants near-dups and semantic twins; both drops must fire
    val verdicts = roster.map(_.getString(1)).toSet
    assert(verdicts.contains("near_dup") && verdicts.contains("semantic"),
      s"expected near_dup and semantic drops in the roster, got $verdicts")
  }

  test("dd14: sampled confirm is deterministic and internally consistent") {
    val run1 = graft.Catalog.byName("dd14_sampled_confirm").build(spark, sf()).collect()
    assert(run1.length == 1)
    val r = run1.head
    val (sampled, confirmed, estCands, estDups) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    // the 10% hash gate can only shrink, never invent
    assert(confirmed <= sampled)
    assert(estCands == sampled * 10 && estDups == confirmed.toDouble * 10)
    // sample confirms are a subset of dd06's full confirm set
    val full = graft.Catalog.byName("dd06_embedding_neardup_lsh").build(spark, sf()).count()
    assert(confirmed <= full, "sample confirmed more dups than the full confirm found")
    // deterministic: the Knuth-hash draw selects the identical sample
    val run2 = graft.Catalog.byName("dd14_sampled_confirm").build(spark, sf()).collect()
    assert(run1.map(_.toString).toSeq == run2.map(_.toString).toSeq)
  }

  test("dd13: eval metrics are internally consistent and match a direct recount") {
    val r = graft.Catalog.byName("dd13_lsh_eval").build(spark, sf()).collect()
      .map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4), x.getDouble(5))).toMap
    assert(r.keySet == Set("banding", "confirm"))
    val (bp, bt, nTruth, _, _) = r("banding")
    val (cp, ct, _, cPrec, cRec) = r("confirm")
    // confirm is a subset of banding on both axes
    assert(cp <= bp && ct <= bt && bt <= nTruth && ct <= cp)
    // ratios really are tp/n_pairs and tp/n_truth
    assert(math.abs(cPrec - ct.toDouble / cp) < 1e-9)
    assert(math.abs(cRec - ct.toDouble / nTruth) < 1e-9)
    // direct recount: truth size matches dd02's own output
    val truth = graft.Catalog.byName("dd02_ngram_jaccard").build(spark, sf()).count()
    assert(nTruth == truth)
    // the planted near-dups make banding recall high; confirm can only
    // drop candidates, not invent them
    assert(bt.toDouble / nTruth >= 0.9, s"banding recall ${bt.toDouble / nTruth}")
  }
}
