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
    // Oracle strategy for approx aggregates: the estimate itself is engine-
    // specific, so the *error bound* becomes the checked column — `sketch_ok`
    // is computed in-plan (|estimate−exact| ≤ 5%·exact, ≈3σ for lgK=12 HLL)
    // and the oracle asserts it is 1 for every group. A wrong sketch merge
    // breaks the hash; SketchesSpec additionally bounds the raw estimates.
    QueryDef.sql(
      "uq01_hll_mergeable_distinct",
      """SELECT event_type, COUNT(*) AS total_events,
        |  COUNT(DISTINCT user_id) AS exact_users,
        |  CAST(1 AS BIGINT) AS sketch_ok
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    ) { (spark, dir) =>
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
        .select(col("event_type"), col("total_events"), col("exact_users"),
          when(abs(col("sketch_users") - col("exact_users")) <=
            col("exact_users") * 0.05, 1L).otherwise(0L).as("sketch_ok"))
        .orderBy("event_type")
    },

    // ----- uq03: quantiles — exact interpolated percentile (ClickHouse
    // quantileExactInclusive ≡ Spark `percentile` ≡ DuckDB percentile_cont)
    // as scalar columns, plus a bound check on percentile_approx (the
    // t-digest-class estimator): |approx−exact| ≤ 1%·exact.
    QueryDef.sql(
      "uq03_quantiles",
      """SELECT o_orderstatus,
        |  ROUND(CAST(percentile_cont(0.50) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 4) AS median_exact,
        |  ROUND(CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 4) AS q25,
        |  ROUND(CAST(percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 4) AS q75,
        |  ROUND(CAST(percentile_cont(0.95) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 4) AS q95,
        |  COUNT(*) AS orders, CAST(1 AS BIGINT) AS approx_ok
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    ) { (spark, dir) =>
      Tables(spark, dir).orders
        .groupBy("o_orderstatus")
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("m"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("ma"),
          expr("percentile(o_totalprice, 0.25)").as("p25"),
          expr("percentile(o_totalprice, 0.75)").as("p75"),
          expr("percentile(o_totalprice, 0.95)").as("p95"),
          count(lit(1)).as("orders"))
        .select(col("o_orderstatus"),
          round(col("m"), 4).as("median_exact"),
          round(col("p25"), 4).as("q25"),
          round(col("p75"), 4).as("q75"),
          round(col("p95"), 4).as("q95"),
          col("orders"),
          when(abs(col("ma") - col("m")) <= col("m") * 0.01, 1L).otherwise(0L).as("approx_ok"))
        .orderBy("o_orderstatus")
    },

    // ----- uq02: query-time approximate distinct (`uniq` ≈
    // approx_count_distinct, default rsd 5%) — bound-checked at 15% (3σ).
    QueryDef.sql(
      "uq02_uniq_approx",
      """SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS events,
        |  COUNT(DISTINCT user_id) AS exact_users,
        |  CAST(1 AS BIGINT) AS uniq_ok
        |FROM events GROUP BY 1 ORDER BY event_date""".stripMargin,
    ) { (spark, dir) =>
      Tables(spark, dir).events
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(
          count(lit(1)).as("events"),
          approx_count_distinct(col("user_id")).as("uniq_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_date"), col("events"), col("exact_users"),
          when(abs(col("uniq_users") - col("exact_users")) <=
            col("exact_users") * 0.15, 1L).otherwise(0L).as("uniq_ok"))
        .orderBy("event_date")
    },
  )
}
