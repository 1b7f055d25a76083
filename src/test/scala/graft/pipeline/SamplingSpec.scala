package graft.pipeline

import graft.{Catalog, SparkSpec}

class SamplingSpec extends SparkSpec {

  private def rows(name: String) =
    Catalog.byName(name).build(spark, sf()).collect()

  test("mx01: one row per source, bounds hold, budget is respected") {
    val r = rows("mx01_domain_mixture")
    assert(r.nonEmpty)
    assert(r.map(_.getString(0)).distinct.length == r.length)
    r.foreach { x =>
      val (docs, tokens, permille) = (x.getLong(1), x.getLong(2), x.getLong(3))
      val (sDocs, sTokens) = (x.getLong(4), x.getLong(5))
      assert(permille >= 1L && permille <= 1000L)
      assert(sDocs <= docs && sTokens <= tokens)
    }
    // the clamped-permille selection can never exceed the α=0.5 allocation
    // by more than hash-bucket granularity; coarse check: sampled total is
    // under the full corpus (budget is half the tokens, pre-clamp)
    val totalTokens = r.map(_.getLong(2)).sum
    val sampledTokens = r.map(_.getLong(5)).sum
    assert(sampledTokens < totalTokens)
  }

  test("ex01: export writes one directory per shard and round-trips every doc") {
    val r = rows("ex01_sharded_export")
    assert(r.map(_.getLong(0)).toSeq == (0L to 7L))
    val total = graft.Tables(spark, sf()).documents.count()
    assert(r.map(_.getLong(1)).sum == total, "every doc exported exactly once")
    assert(r.map(_.getLong(1)).max - r.map(_.getLong(1)).min <= 1, "round-robin balance")
    // the on-disk layout is the trainer contract: shard=N directories
    val out = new java.io.File(s"target/export_ep7_${math.abs(sf().hashCode)}")
    val dirs = out.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == (0 to 7).map(i => s"shard=$i"))
  }

  test("mx01: temperature weighting boosts low-resource domains (rate anti-monotone in size)") {
    val r = rows("mx01_domain_mixture").sortBy(_.getLong(2)) // by tokens asc
    val permilles = r.map(_.getLong(3))
    assert(permilles.zip(permilles.tail).forall { case (small, big) => small >= big })
  }

  test("mx02: grouped by km01's clusters, same bounds and anti-monotone rates as mx01") {
    val r = rows("mx02_cluster_mixture")
    assert(r.nonEmpty)
    // cluster ids come from km01's assignment (seeds are vec_id < K)
    val clusters = graft.pipeline.Clustering.kmeansAssign(spark, sf())
      .select("cluster").distinct().collect().map(_.getLong(0)).toSet
    assert(r.map(_.getLong(0)).toSet == clusters, "mixture rows != km01 cluster set")
    r.foreach { x =>
      val (docs, tokens, permille) = (x.getLong(1), x.getLong(2), x.getLong(3))
      assert(permille >= 1L && permille <= 1000L)
      assert(x.getLong(4) <= docs && x.getLong(5) <= tokens)
    }
    val byTokens = r.sortBy(_.getLong(2)).map(_.getLong(3))
    assert(byTokens.zip(byTokens.tail).forall { case (small, big) => small >= big })
  }

  test("mx03: repeat factors follow the rate and copies reconcile per source") {
    val r = graft.Catalog.byName("mx03_upsample_repeat").build(spark, sf()).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))
    assert(r.nonEmpty)
    // both regimes exercised on this corpus: some sources upsample (>1000‰),
    // some downsample (<1000‰)
    assert(r.exists(_._4 >= 1000), "no source above 1000 permille")
    assert(r.exists(_._4 < 1000), "no source below 1000 permille")
    r.foreach { case (src, docs, _, rate, emittedDocs, _) =>
      // emitted copies bounded by the integer repeat bracket
      val lo = (rate / 1000) * docs
      val hi = (rate / 1000 + 1) * docs
      assert(emittedDocs >= lo && emittedDocs <= hi,
        s"$src: $emittedDocs copies outside [$lo, $hi] for rate $rate")
    }
    // global token mass tracks the full-budget design: emitted ≈ corpus total
    val total = r.map(_._3).sum.toDouble
    val emitted = r.map(_._6).sum.toDouble
    assert(math.abs(emitted - total) / total < 0.15,
      s"emitted token mass $emitted far from budget $total")
  }

  test("spl03: πps sample is deterministic, sized, and biased toward heavy docs") {
    val r = graft.Catalog.byName("spl03_weighted_sample").build(spark, sf()).collect()
    assert(r.length == 100)
    // re-running selects the identical sample (no RNG anywhere)
    val again = graft.Catalog.byName("spl03_weighted_sample").build(spark, sf()).collect()
    assert(r.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
    // rank really is (u+1)/toks: all ranks positive, ordered
    val ranks = r.map(_.getDouble(3))
    assert(ranks.forall(_ > 0d))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a <= b })
    // probability-proportional-to-size: the sampled docs' mean token count
    // exceeds the corpus mean (heavier docs draw smaller ranks)
    val docs = graft.Tables(spark, sf()).documents
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).cast("long"))
      .collect().map(_.getLong(0))
    val corpusMean = docs.sum.toDouble / docs.length
    val sampleMean = r.map(_.getLong(2)).sum.toDouble / r.length
    assert(sampleMean > corpusMean,
      s"πps bias missing: sample mean $sampleMean <= corpus mean $corpusMean")
  }
}
