package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Mergeable-sketch distincts (SURVEY.md §2.4 A3/A8, §7.3): the persisted
  * counterpart of ClickHouse `uniqState`/`uniqMerge`. Per-day HLL sketches are
  * stored in the MV result (binary column), re-aggregation unions sketches —
  * unlike the reference's lossy sum-of-uniq-estimates (app.py:339, noted in
  * SURVEY §2.4 A13), the union is mathematically correct across any regrouping.
  * Approximate results ⇒ rows-only entries; accuracy is asserted in
  * SketchesSpec against exact distincts.
  */
object Sketches {

  val defs: Seq[QueryDef] = Seq(

    // ----- uq01: store per-day sketches, merge across days per type, compare
    // with the exact distinct — the AggregatingMergeTree MV read path.
    QueryDef.rowsOnly("uq01_hll_mergeable_distinct") { (spark, dir) =>
      val events = Tables(spark, dir).events
      val daily = events
        .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("users_sketch"),
          count(lit(1)).as("events"))
      val merged = daily
        .groupBy("event_type")
        .agg(
          hll_sketch_estimate(hll_union_agg(col("users_sketch"))).as("sketch_users"),
          sum("events").cast("long").as("total_events"))
      val exact = events.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      merged.join(exact, "event_type")
        .select(col("event_type"), col("total_events"), col("exact_users"), col("sketch_users"))
        .orderBy("event_type")
    },

    // ----- uq03: quantiles — exact interpolated percentile + approximate
    // t-digest-class percentile_approx (ClickHouse quantile/quantileTDigest
    // family). Interpolation rounding differs across engines ⇒ rows-only;
    // SketchesSpec bounds approx vs exact.
    QueryDef.rowsOnly("uq03_quantiles") { (spark, dir) =>
      Tables(spark, dir).orders
        .groupBy("o_orderstatus")
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("median_exact"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("median_approx"),
          expr("percentile(o_totalprice, array(0.25, 0.75, 0.95))").as("quartiles"),
          count(lit(1)).as("orders"))
        .orderBy("o_orderstatus")
    },

    // ----- uq02: query-time approximate distinct (`uniq` ≈ approx_count_distinct).
    QueryDef.rowsOnly("uq02_uniq_approx") { (spark, dir) =>
      Tables(spark, dir).events
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(
          count(lit(1)).as("events"),
          approx_count_distinct(col("user_id")).as("uniq_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .orderBy("event_date")
    },
  )
}
