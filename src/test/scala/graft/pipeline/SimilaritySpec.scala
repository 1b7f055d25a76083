package graft.pipeline

import graft.{Catalog, SparkSpec}

class SimilaritySpec extends SparkSpec {

  private def rows(name: String) =
    Catalog.byName(name).build(spark, sf()).collect()

  test("brute-force topk: ranks are 1..10 per query, cosine non-increasing") {
    val r = rows("ann01_topk_bruteforce")
    val byQ = r.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length))
      val cos = sorted.map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("ann01 exact baseline refuses inputs above the configured ceiling, pointing at the bucketed paths") {
    spark.conf.set(ExactBaseline.ConfKey, "100")
    try {
      val e = intercept[IllegalArgumentException] {
        Catalog.byName("ann01_topk_bruteforce").build(spark, sf())
      }
      assert(e.getMessage.contains("ann02_topk_lsh"))
      assert(e.getMessage.contains(ExactBaseline.ConfKey))
    } finally spark.conf.unset(ExactBaseline.ConfKey)
    assert(rows("ann01_topk_bruteforce").nonEmpty)
  }

  test("LSH ANN results are a subset of true neighbors by construction quality") {
    val bf = rows("ann01_topk_bruteforce").map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = rows("ann02_topk_lsh")
    assert(lsh.nonEmpty)
    // structural: per-query ranks contiguous, cosine ordering holds
    lsh.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val cos = sorted.map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // recall is data-limited on uniform random vectors; just require overlap > 0
    assert(lsh.map(r => (r.getLong(0), r.getLong(2))).toSet.intersect(bf).nonEmpty)
  }

  test("multi-probe LSH recall >= single-probe recall") {
    val bf = rows("ann01_topk_bruteforce").map(r => (r.getLong(0), r.getLong(2))).toSet
    val single = rows("ann02_topk_lsh").map(r => (r.getLong(0), r.getLong(2))).toSet
    val multi = rows("ann04_topk_lsh_multiprobe").map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(multi.intersect(bf).size >= single.intersect(bf).size)
    assert(multi.nonEmpty)
  }

  test("IVF probe-2 recall >= probe-1 recall, searches at most two partitions") {
    val bf = rows("ann01_topk_bruteforce").map(r => (r.getLong(0), r.getLong(2))).toSet
    val p1 = rows("ann03_ivf_probe1").map(r => (r.getLong(0), r.getLong(2))).toSet
    val p2rows = rows("ann05_ivf_probe2")
    val p2 = p2rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(p2.intersect(bf).size >= p1.intersect(bf).size)
    p2rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).distinct.length <= 2, "more than two labels probed")
    }
  }

  test("ann06: recall matches the set intersection of ann01 and ann02 outputs") {
    val bf = rows("ann01_topk_bruteforce").map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = rows("ann02_topk_lsh").map(r => (r.getLong(0), r.getLong(2))).toSet
    val rec = rows("ann06_lsh_recall")
    assert(rec.nonEmpty)
    rec.foreach { x =>
      val qid = x.getLong(0)
      val expTrue = bf.count(_._1 == qid)
      val expHit = bf.count(p => p._1 == qid && lsh.contains(p))
      assert(x.getLong(1) == expTrue && x.getLong(2) == expHit, s"qid $qid")
      assert(x.getDouble(3) >= 0.0 && x.getDouble(3) <= 1.0)
      assert(math.abs(x.getDouble(3) - expHit.toDouble / expTrue) < 1e-12)
    }
  }

  test("IVF probe-1: every query searches exactly one label partition") {
    val r = rows("ann03_ivf_probe1")
    assert(r.nonEmpty)
    r.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).distinct.length == 1, "multiple labels probed")
      assert(rs.length <= 10)
    }
  }

  test("ann07 PQ: ranks well-formed, scores non-increasing, approximation overlaps truth") {
    val r = rows("ann07_pq_topk")
    val byQ = r.groupBy(_.getLong(0))
    assert(byQ.size == 8)
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length))
      val sc = sorted.map(_.getDouble(3))
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
      // ADC scores are dots of unit-scale embeddings summed over 8 subspaces —
      // wildly out-of-range values mean a broken LUT join
      assert(sc.forall(s => math.abs(s) < 1e3))
    }
    // the 8-byte code approximation must still find some true neighbors
    val bf = rows("ann01_topk_bruteforce").map(x => (x.getLong(0), x.getLong(2))).toSet
    val hits = r.count(x => bf.contains((x.getLong(0), x.getLong(2))))
    assert(hits > 0, "PQ top-10 shares no neighbor with exact top-10")
  }

  test("ann08 rerank: exact cosines, recall >= PQ-only, and ranking == brute order on its shortlist") {
    val rr = rows("ann08_pq_rerank")
    val byQ = rr.groupBy(_.getLong(0))
    assert(byQ.size == 8)
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length))
      val cos = sorted.map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      // rerank scores are true cosines, so range-bounded (unlike ADC dots)
      assert(cos.forall(c => c >= -1.0001 && c <= 1.0001))
    }
    val bf = rows("ann01_topk_bruteforce")
    val bfSet = bf.map(x => (x.getLong(0), x.getLong(2))).toSet
    val pqHits = rows("ann07_pq_topk").count(x => bfSet.contains((x.getLong(0), x.getLong(2))))
    val rrHits = rr.count(x => bfSet.contains((x.getLong(0), x.getLong(2))))
    // the exact rerank only has to keep a true neighbor inside the top-R
    // shortlist, not the ADC top-10 — recall can only go up
    assert(rrHits >= pqHits, s"rerank recall $rrHits fell below PQ-only $pqHits")
    // semantic pin: where ann08 returns a (qid, nid) that brute also ranked,
    // the exact cosines must agree bit-for-bit (same kernel, same fold)
    val bfCos = bf.map(x => (x.getLong(0), x.getLong(2)) -> x.getDouble(3)).toMap
    rr.foreach { x =>
      bfCos.get((x.getLong(0), x.getLong(2))).foreach { c =>
        assert(c == x.getDouble(3), s"cosine mismatch vs brute for ${(x.getLong(0), x.getLong(2))}")
      }
    }
  }

  test("ann09 IVF-PQ: ranks well-formed, distances ascending, cells honest, probes bounded") {
    val r = rows("ann09_ivfpq_topk")
    val byQ = r.groupBy(_.getLong(0))
    assert(byQ.size == 8)
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length))
      val d = sorted.map(_.getDouble(4))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b }, "ADC distance not ascending")
      // each term is ‖x‖²+‖c‖²−2x·c — mathematically ≥ 0, fold rounding can
      // only dip epsilon-negative
      assert(d.forall(_ > -1e-9), "negative squared distance beyond rounding")
      // nprobe=2: results may come from at most two cells
      assert(rs.map(_.getLong(3)).distinct.length <= 2)
    }
    // cell honesty: the claimed probed_label must be the neighbor's own cell
    val labels = graft.Tables(spark, sf()).embeddings
      .select("vec_id", "label").collect()
      .map(x => x.getLong(0) -> x.getInt(1).toLong).toMap
    r.foreach { x =>
      assert(labels(x.getLong(2)) == x.getLong(3),
        s"nid ${x.getLong(2)} reported from cell ${x.getLong(3)}, lives in ${labels(x.getLong(2))}")
    }
    // the residual-coded approximation must overlap the exact ranking of the
    // same probed candidate set (ann05 probes the identical 2 cells)
    val exact = rows("ann05_ivf_probe2").map(x => (x.getLong(0), x.getLong(2))).toSet
    assert(r.count(x => exact.contains((x.getLong(0), x.getLong(2)))) > 0,
      "IVF-PQ top-10 shares nothing with the exact ranking of the same cells")
  }

  test("ann10: filtered top-k returns only predicate-passing neighbors, exactly ranked") {
    import org.apache.spark.sql.functions.col
    val r = rows("ann10_filtered_topk")
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.nonEmpty && r.map(_._1).distinct.forall(_ < 8))
    val german = graft.Tables(spark, sf()).documents
      .filter(col("lang") === "de").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(r.forall(x => german(x._3)), "non-German neighbor leaked through the filter")
    // per query: 10 rows, rank-ordered by cosine desc
    r.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.length == 10, s"query $q")
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._4).zip(sorted.map(_._4).tail).forall { case (a, b) => a >= b })
    }
    // exactness vs the unfiltered ranking: any German doc in ann01's top-10
    // must appear in ann10's top-10 at an equal-or-better rank
    val unfiltered = rows("ann01_topk_bruteforce")
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val filteredRank = r.map(x => (x._1, x._3) -> x._2).toMap
    unfiltered.filter(x => german(x._3)).foreach { case (q, rk, nid) =>
      val fr = filteredRank.get((q, nid))
      assert(fr.exists(_ <= rk), s"query $q: German nid $nid rank $rk unfiltered, $fr filtered")
    }
  }
}
