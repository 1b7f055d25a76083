package graft.operators

import graft.{Catalog, SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("merged HLL sketches estimate exact distincts within 5% (in-plan flag)") {
    val rows = Catalog.byName("uq01_hll_mergeable_distinct").build(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("sketch_ok") == 1L,
        s"${r.getString(0)}: sketch estimate outside 5% of exact")
    }
  }

  test("raw HLL union estimate tracks exact distinct (no flag indirection)") {
    val events = Tables(spark, sf()).events
    val est = events
      .groupBy(to_date(col("ts")).as("d"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0).toDouble
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0).toDouble
    assert(math.abs(est - exact) / exact < 0.05, s"union est $est vs exact $exact")
  }

  test("quantile scalars are ordered and approx median flag holds") {
    val rows = Catalog.byName("uq03_quantiles").build(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Double]("median_exact")
      val (q25, q75, q95) =
        (r.getAs[Double]("q25"), r.getAs[Double]("q75"), r.getAs[Double]("q95"))
      assert(q25 <= m + 1e-9 && m <= q75 + 1e-9 && q75 <= q95 + 1e-9)
      assert(r.getAs[Long]("approx_ok") == 1L)
    }
  }

  test("approx_count_distinct within 15% (3x default rsd) of exact") {
    val rows = Catalog.byName("uq02_uniq_approx").build(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("uniq_ok") == 1L))
  }
}
