package graft.operators

import graft.{Catalog, SparkSpec}

class WindowFunnelSpec extends SparkSpec {

  private val H = 3600000000L // 1 hour in µs

  /** (user, eventId, tsUs, step) → per-user level under a 1-hour window. */
  private def levels(rows: Seq[(Long, Long, Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = rows.toDF("user_id", "event_id", "ts_us", "step")
    Analytics.windowFunnelLevels(df, H).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  test("planted sequences hit the exact windowFunnel semantics") {
    val r = levels(Seq(
      // A: clean view→click→purchase inside the window
      (1L, 1L, 0L, 1L), (1L, 2L, 30L * 60 * 1000000, 2L), (1L, 3L, 50L * 60 * 1000000, 3L),
      // B: click lands outside the 1h window from its only view start
      (2L, 1L, 0L, 1L), (2L, 2L, 2L * H, 2L),
      // C: click BEFORE any view never counts; the later view gives level 1
      (3L, 1L, 0L, 2L), (3L, 2L, 10L, 1L),
      // D: view then purchase with no click stays level 1 (strict order)
      (4L, 1L, 0L, 1L), (4L, 2L, 10L * 60 * 1000000, 3L),
      // E: the LATER view must be chosen as chain start (dominance) — from
      // the first view the purchase at 70min is out of window, from the
      // second (at 20min) it's within
      (5L, 1L, 0L, 1L), (5L, 2L, 10L * 60 * 1000000, 2L),
      (5L, 3L, 20L * 60 * 1000000, 1L), (5L, 4L, 25L * 60 * 1000000, 2L),
      (5L, 5L, 70L * 60 * 1000000, 3L),
      // F: purchase only — no chain start, level 0
      (6L, 1L, 0L, 3L)))
    assert(r == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 3L, 6L -> 0L), r.toString)
  }

  test("window boundary is inclusive and ties sort by event_id") {
    val r = levels(Seq(
      // exactly at the window boundary → still counts
      (1L, 1L, 0L, 1L), (1L, 2L, H, 2L),
      // same timestamp: event_id order decides view-before-click
      (2L, 1L, 100L, 1L), (2L, 2L, 100L, 2L),
      (3L, 2L, 100L, 1L), (3L, 1L, 100L, 2L)))
    assert(r(1L) == 2L)
    assert(r(2L) == 2L, "tie: view (lower event_id) precedes click")
    assert(r(3L) == 1L, "tie: click (lower event_id) precedes view — no chain")
  }

  /** (user, eventId, tsUs, step∈{1=view,2=purchase}) → per-user match count. */
  private def seqCounts(rows: Seq[(Long, Long, Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = rows.toDF("user_id", "event_id", "ts_us", "step")
    Analytics.sequenceCounts(df).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  test("q51 fold counts non-overlapping view->purchase matches greedily") {
    val r = seqCounts(Seq(
      // A: view view purchase purchase -> 1 (second purchase finds no arm)
      (1L, 1L, 0L, 1L), (1L, 2L, 10L, 1L), (1L, 3L, 20L, 2L), (1L, 4L, 30L, 2L),
      // B: view purchase view purchase -> 2
      (2L, 1L, 0L, 1L), (2L, 2L, 10L, 2L), (2L, 3L, 20L, 1L), (2L, 4L, 30L, 2L),
      // C: purchase before any view -> 0
      (3L, 1L, 0L, 2L),
      // D: purchase view -> 0 (nothing after the arm)
      (4L, 1L, 0L, 2L), (4L, 2L, 10L, 1L),
      // E: ts tie decided by event_id: view(id1) purchase(id2) same ts -> 1
      (5L, 1L, 100L, 1L), (5L, 2L, 100L, 2L),
      // F: ts tie the other way: purchase(id1) view(id2) same ts -> 0
      (6L, 2L, 100L, 1L), (6L, 1L, 100L, 2L)))
    assert(r == Map(1L -> 1L, 2L -> 2L, 3L -> 0L, 4L -> 0L, 5L -> 1L, 6L -> 0L), r.toString)
  }

  /** (user, eventId, tsUs, step∈{1=view,2=purchase}) → timed match count (1h). */
  private def timedCounts(rows: Seq[(Long, Long, Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = rows.toDF("user_id", "event_id", "ts_us", "step")
    Analytics.sequenceMatchTimed(df, H).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
  }

  test("q53 timed matches require the purchase within the window of its arming view") {
    val r = timedCounts(Seq(
      // A: in-window -> 1
      (1L, 1L, 0L, 1L), (1L, 2L, 30L * 60 * 1000000, 2L),
      // B: out-of-window -> 0 (q51's untimed fold would count this)
      (2L, 1L, 0L, 1L), (2L, 2L, 2L * H, 2L),
      // C: dominance — the LATER view arms: purchase at 70min is out of
      // window from view@0 but within from view@20min -> 1
      (3L, 1L, 0L, 1L), (3L, 2L, 20L * 60 * 1000000, 1L),
      (3L, 3L, 70L * 60 * 1000000, 2L),
      // D: non-overlap — one view, two in-window purchases -> 1 (arm consumed)
      (4L, 1L, 0L, 1L), (4L, 2L, 10L, 2L), (4L, 3L, 20L, 2L),
      // E: boundary inclusive -> 1
      (5L, 1L, 0L, 1L), (5L, 2L, H, 2L)))
    assert(r == Map(1L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L), r.toString)
  }

  test("q52 EMA equals a hand fold over the per-user purchase history") {
    val r = graft.Catalog.byName("q52_ema").build(spark, sf()).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r.nonEmpty)
    // independent recompute: collect the purchases, fold in (ts, event_id) order
    val hist = graft.Tables(spark, sf()).events
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS ts_us", "value").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
      .groupBy(_._1)
    hist.foreach { case (u, rows) =>
      val vs = rows.sortBy(x => (x._3, x._2)).map(_._4)
      val want = vs.tail.foldLeft(vs.head)((acc, v) => 0.25 * v + 0.75 * acc)
      val (n, got) = r(u)
      assert(n == vs.length.toLong)
      assert(got == want, s"user $u: $got vs $want")
    }
  }

  test("q50 retention rows are gated on the anchor-day condition") {
    val r = graft.Catalog.byName("q50_retention").build(spark, sf()).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (r0, r1, r3, r7) =
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))
      for (v <- Seq(r0, r1, r3, r7)) assert(v == 0L || v == 1L)
      // ClickHouse gating: rK can only be 1 when cond1 (anchor-day) held
      if (r0 == 0L) assert(r1 == 0L && r3 == 0L && r7 == 0L, x.toString)
    }
    // the anchor day itself must retain SOMEONE (events exist on min date)
    assert(r.exists(_.getLong(1) == 1L))
  }

  test("q54 WITH FILL: complete spine, carry-forward values, actuals untouched") {
    import org.apache.spark.sql.functions._
    val r = graft.Catalog.byName("q54_with_fill").build(spark, sf()).collect()
      .map(x => (x.getString(0), x.getDate(1).toString, x.getDouble(2), x.getBoolean(3)))
    assert(r.length == 5 * 31, s"spine incomplete: ${r.length}")
    assert(r.exists(_._4), "no gaps were filled — threshold lost its point")
    // carry-forward: a filled day equals the previous day's revenue (0 at the start)
    r.groupBy(_._1).foreach { case (region, days) =>
      val sorted = days.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, _, rev, filled), i) =>
        if (filled) {
          val prev = if (i == 0) 0d else sorted(i - 1)._3
          assert(rev == prev, s"$region day $i filled $rev != carried $prev")
        }
      }
    }
    // actuals match a direct recompute
    val t = graft.Tables(spark, sf())
    val actual = t.orders
      .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-02-01")
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .join(t.region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("rev"))
      .collect().map(x => (x.getString(0), x.getDate(1).toString) -> x.getDouble(2)).toMap
    r.filterNot(_._4).foreach { case (reg, d, rev, _) =>
      assert(actual((reg, d)) == rev, s"$reg $d actual mismatch")
    }
    assert(r.count(!_._4) == actual.size)
  }

  test("catalog entry: levels monotone-exhaustive against per-user step presence") {
    import org.apache.spark.sql.functions._
    val r = Catalog.byName("q49_window_funnel").build(spark, sf()).collect()
    assert(r.nonEmpty)
    // every user with at least one funnel event appears exactly once
    val users = graft.Tables(spark, sf()).events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select("user_id").distinct().count()
    assert(r.length.toLong == users)
    // a user with no view at all can never exceed level 0; a user with a
    // view is at least level 1
    val hasView = graft.Tables(spark, sf()).events
      .filter(col("event_type") === "view")
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    r.foreach { x =>
      val (u, lvl) = (x.getLong(0), x.getLong(2))
      if (hasView(u)) assert(lvl >= 1L, s"user $u has views but level $lvl")
      else assert(lvl == 0L, s"user $u has no view but level $lvl")
    }
  }
}
