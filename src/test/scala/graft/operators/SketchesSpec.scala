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

  test("approx median tracks exact median per group") {
    val rows = Catalog.byName("uq03_quantiles").build(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Double]("median_exact")
      val approx = r.getAs[Double]("median_approx")
      assert(math.abs(approx - exact) / math.max(exact, 1.0) < 0.05)
      val q = r.getSeq[Double](r.fieldIndex("quartiles"))
      assert(q(0) <= exact + 1e-9 && exact <= q(1) + 1e-9 && q(1) <= q(2) + 1e-9)
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
