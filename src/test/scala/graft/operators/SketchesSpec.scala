package graft.operators

import graft.{Catalog, SparkSpec}

class SketchesSpec extends SparkSpec {

  test("merged HLL sketches estimate exact distincts within 5%") {
    val rows = Catalog.byName("uq01_hll_mergeable_distinct").build(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val est = r.getAs[Long]("sketch_users").toDouble
      assert(math.abs(est - exact) / exact < 0.05,
        s"${r.getString(0)}: sketch $est vs exact $exact")
    }
  }

  test("approx_count_distinct within default 5% rsd of exact") {
    val rows = Catalog.byName("uq02_uniq_approx").build(spark, sf()).collect()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val est = r.getAs[Long]("uniq_users").toDouble
      assert(math.abs(est - exact) / exact < 0.15)
    }
  }
}
