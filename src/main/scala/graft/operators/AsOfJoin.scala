package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the temporal operator Spark lacks as a
  * primitive and engines like ClickHouse expose as `ASOF JOIN`: for each
  * probe row, the single build row with the greatest time key ≤ the probe's.
  *
  * Spark-first formulation (no per-row lookup, no range explosion): tag and
  * union both inputs, sort within each key partition by (time, tag), and
  * carry the build side's columns forward with `last_value(ignoreNulls)` —
  * one shuffle on the join key, whole pipeline stays in window codegen.
  * That is the 100 TB shape: cost = a union + one sort-merge window pass,
  * identical to what a native as-of merge join would do.
  *
  * aj01: each event joined to the user's most recent order on or before the
  * event date (ties on order date broken by max orderkey, made explicit on
  * both sides so DuckDB's native ASOF JOIN oracle is deterministic).
  */
object AsOfJoin {

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "aj01_asof_join",
      """WITH o1 AS (
        |  SELECT o_custkey AS user_id, o_orderdate,
        |    max_by(o_orderkey, o_orderkey) AS last_orderkey,
        |    max_by(o_totalprice, o_orderkey) AS last_totalprice
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |  o1.last_orderkey,
        |  CAST(CAST(o1.last_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS last_totalprice
        |FROM events e
        |ASOF LEFT JOIN o1
        |  ON e.user_id = o1.user_id AND CAST(e.ts AS DATE) >= o1.o_orderdate
        |ORDER BY e.event_id""".stripMargin,
    ) { (spark, dir) =>
      val t = Tables(spark, dir)
      // one build row per (user, date): max orderkey wins — the explicit tie
      // rule both engines follow
      val o1 = t.orders
        .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
        .agg(max_by(col("o_orderkey"), col("o_orderkey")).as("last_orderkey"),
          max_by(col("o_totalprice"), col("o_orderkey")).as("last_totalprice"))
      val build = o1.select(col("user_id"), col("o_orderdate").as("d"),
        lit(0).as("tag"), lit(null).cast("long").as("event_id"),
        lit(null).cast("timestamp").as("ts"),
        col("last_orderkey"), col("last_totalprice"))
      val probe = t.events.select(col("user_id"), to_date(col("ts")).as("d"),
        lit(1).as("tag"), col("event_id"), col("ts"),
        lit(null).cast("long").as("last_orderkey"),
        lit(null).cast("double").as("last_totalprice"))
      // orders sort before events on the same date (tag 0 < 1), so an
      // event sees same-day orders; later build rows overwrite earlier ones
      val w = Window.partitionBy("user_id")
        .orderBy(col("d"), col("tag"), col("last_orderkey").asc_nulls_first, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      build.unionByName(probe)
        .withColumn("lk", last("last_orderkey", ignoreNulls = true).over(w))
        .withColumn("lp", last("last_totalprice", ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("lk").as("last_orderkey"),
          col("lp").cast("decimal(18,2)").cast("double").as("last_totalprice"))
        .orderBy("event_id")
    },

    // ----- aj02: bucketed range join — the batch attribution shape (each
    // purchase joined to the same user's views in the PRECEDING HOUR,
    // st10's stream-stream interval join as a batch operator). Spark has no
    // range-join optimization: the naive `v.ts BETWEEN p.ts - 1h AND p.ts`
    // plan is a BroadcastNestedLoopJoin (per-user cross product). The scale
    // formulation BUCKETS time into hour cells: views carry their own
    // bucket, purchases probe exactly the 2 buckets the 1-hour window can
    // touch, and the join becomes EQUI-keyed on (user_id, bucket) with the
    // range condition left as a residual filter — one hash shuffle, no
    // nested loop, each true (purchase, view) pair produced exactly once
    // (a view lives in one bucket). That is the standard range-join
    // rewrite a 100 TB engine applies; partition skew tracks per-(user,
    // hour) activity, never per-user history.
    QueryDef.sql(
      "aj02_bucketed_range_join",
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts AS vts FROM events WHERE event_type = 'view'),
        |j AS (SELECT p.event_id, p.user_id, p.ts, v.vts
        |  FROM p LEFT JOIN v ON v.user_id = p.user_id
        |    AND v.vts >= p.ts - INTERVAL 1 HOUR AND v.vts < p.ts)
        |SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  CAST(COUNT(vts) AS BIGINT) AS views_1h,
        |  CAST(MAX(vts) AS TIMESTAMP) AS last_view_ts
        |FROM j GROUP BY 1, 2, 3 ORDER BY event_id""".stripMargin,
    ) { (spark, dir) =>
      val e = Tables(spark, dir).events
      val hourBucket = expr("unix_micros(ts) div 3600000000") // integral µs/hour
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"), hourBucket.as("bucket"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          explode(array(hourBucket - 1L, hourBucket)).as("bucket"))
      val hits = p.join(v, Seq("user_id", "bucket"))
        .filter(col("vts") >= col("ts") - expr("INTERVAL 1 HOUR") && col("vts") < col("ts"))
        .groupBy("event_id")
        .agg(count(lit(1)).cast("long").as("views_1h"), max("vts").as("last_view_ts"))
      e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
        .join(hits, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"), col("ts"),
          coalesce(col("views_1h"), lit(0L)).as("views_1h"), col("last_view_ts"))
        .orderBy("event_id")
    },
  )
}
