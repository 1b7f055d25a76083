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

  test("mx01: temperature weighting boosts low-resource domains (rate anti-monotone in size)") {
    val r = rows("mx01_domain_mixture").sortBy(_.getLong(2)) // by tokens asc
    val permilles = r.map(_.getLong(3))
    assert(permilles.zip(permilles.tail).forall { case (small, big) => small >= big })
  }
}
