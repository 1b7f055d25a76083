package graft.pipeline

import graft.{Catalog, SparkSpec}

class ClusteringSpec extends SparkSpec {

  private def rows(name: String) =
    Catalog.byName(name).build(spark, sf()).collect()

  test("km01: every vector assigned exactly once, cosine in range") {
    val r = rows("km01_kmeans_assign")
    assert(r.map(_.getLong(0)).distinct.length == r.length)
    assert(r.forall(x => x.getDouble(2) >= -1.0001 && x.getDouble(2) <= 1.0001))
  }

  test("sd01: one verdict per vector; no-dup vectors always keep; some drops exist") {
    val r = rows("sd01_semantic_dedup")
    assert(r.map(_.getLong(0)).distinct.length == r.length)
    // a vector with no near-dup partner can never be dominated
    assert(r.filter(_.getLong(2) == 0L).forall(_.getBoolean(3)))
    // the sf0.001 corpus has planted near-dups (66 pairs >= 0.4), most of
    // which share a cluster — the operator must actually fire
    assert(r.exists(x => x.getLong(2) > 0L && !x.getBoolean(3)))
  }

  test("sd01: every cluster containing a duplicate pair keeps at least one member") {
    val r = rows("sd01_semantic_dedup")
    r.groupBy(_.getLong(1)).foreach { case (_, members) =>
      if (members.exists(_.getLong(2) > 0L))
        assert(members.exists(_.getBoolean(3)))
    }
  }

  test("sd01: dropped vectors truly have a near-duplicate (subset of the exact pair set)") {
    // dd05's all-pairs >= 0.4 set is ground truth; cluster-blocked dups are a
    // subset, so every dropped vec_id must appear in some exact pair
    val exact = rows("dd05_embedding_neardup")
      .flatMap(p => Seq(p.getLong(0), p.getLong(1))).toSet
    val dropped = rows("sd01_semantic_dedup").filter(x => !x.getBoolean(3)).map(_.getLong(0))
    assert(dropped.nonEmpty)
    assert(dropped.forall(exact.contains))
  }

  test("dc03: every hit is a true leak, and within-cell recall is total") {
    val hits = rows("dc03_semantic_decontamination")
    assert(hits.nonEmpty)
    // soundness: each reported (corpus, bench) pair must be in dd05's exact
    // all-pairs >= 0.4 ground truth (either order)
    val exactPairs = rows("dd05_embedding_neardup")
      .map(p => (p.getLong(0), p.getLong(1))).toSet
    hits.foreach { h =>
      val (c, b) = (h.getLong(0), h.getLong(2))
      assert(exactPairs.contains((c, b)) || exactPairs.contains((b, c)),
        s"dc03 reported ($c, $b) which is not an exact >= 0.4 pair")
    }
    // completeness: every exact corpus x bench pair that SHARES a fine cell
    // must surface its corpus member (dc03's stated recall contract — the
    // only accepted misses are cross-cell)
    val cell = Clustering.fineAssign(spark, sf()).select("vec_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flagged = hits.map(_.getLong(0)).toSet
    exactPairs.foreach { case (a, b) =>
      def check(corpus: Long, bench: Long): Unit =
        if (corpus % 20 != 0 && bench % 20 == 0 && cell(corpus) == cell(bench))
          assert(flagged.contains(corpus),
            s"corpus $corpus shares cell ${cell(corpus)} with bench $bench but was not flagged")
      check(a, b); check(b, a)
    }
  }

  test("sd01: adaptive K derivation matches the oracle's integer arithmetic") {
    assert(Clustering.adaptiveK(1) == 8L)
    assert(Clustering.adaptiveK(4096) == 8L)
    assert(Clustering.adaptiveK(4097) == 9L)
    assert(Clustering.adaptiveK(200000) == 391L)
    // two-level coarse count: ⌈√K⌉, matching the oracle's CEIL(SQRT(k))
    assert(Clustering.coarseK(8) == 3L)
    assert(Clustering.coarseK(40) == 7L)
    assert(Clustering.coarseK(118) == 11L)
    assert(Clustering.coarseK(391) == 20L)
  }
}
