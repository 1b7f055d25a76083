package graft.operators

import graft.{Catalog, SparkSpec}
import org.apache.spark.sql.functions._

/** Pins the round-6 skew hardening of the pair self-joins (q15/q17):
  * per-key basket caps enforced by the bounded-heap TopKPerGroup operator.
  *
  * Three properties, each load-bearing:
  *   1. the capped Spark build still equals the (capped) oracle SQL — run
  *      through Spark SQL on the same views, a semantics pin independent of
  *      the driver's DuckDB pass;
  *   2. the cap actually truncates when a key exceeds it (the guard is real,
  *      not dead code above the observed maxima);
  *   3. the plan keeps the scale posture: map-side partial heap bounds the
  *      exchange, the self-join shares one exchange (ReusedExchange), and
  *      nothing degenerates to a cartesian product.
  */
class BasketCapSpec extends SparkSpec {

  private def registerViews(): Unit =
    for (t <- Seq("lineitem", "orders", "part"))
      spark.read.parquet(s"${sf()}/$t.parquet").createOrReplaceTempView(t)

  test("q15/q17 match their capped oracle SQL run through Spark SQL") {
    registerViews()
    for (name <- Seq("q15_market_basket", "q17_product_affinity")) {
      val d = Catalog.byName(name)
      val got = d.build(spark, sf()).collect().toSeq
      val exp = spark.sql(d.oracle.get).collect().toSeq
      assert(got == exp, s"$name diverges from its oracle SQL")
    }
  }

  test("cap truncates a key that exceeds it") {
    import spark.implicits._
    // one hot key with 10 items, one normal key with 2
    val df = ((1 to 10).map(i => (1L, i.toLong)) ++ Seq((2L, 5L), (2L, 9L)))
      .toDF("k", "item")
    val capped = Analytics.capBasket(df, "k", "item", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // keeps the cap-SMALLEST item ids (deterministic, matches the oracle's
    // row_number ORDER BY item) and leaves under-cap keys whole
    assert(capped == Set((1L, 1L), (1L, 2L), (1L, 3L), (2L, 5L), (2L, 9L)))
  }

  test("capped pair-join plan: map-side heap, shared exchange, no cartesian") {
    for (name <- Seq("q15_market_basket", "q17_product_affinity")) {
      val p = Catalog.byName(name).build(spark, sf())
        .queryExecution.executedPlan.toString
      assert(p.contains("TopKPerGroupPartial"),
        s"$name lost the map-side heap (hot keys would ship whole):\n$p")
      // the self-join must not rebuild its input twice via plain exchanges:
      // either the capped frame's exchange is shared (ReusedExchange, the
      // bench-scale plan shape) or the optimizer chose to broadcast one side
      // (tiny-scale cost-based plan, as at sf0.001)
      assert(p.contains("ReusedExchange") || p.contains("BroadcastExchange"),
        s"$name self-join shares nothing and broadcasts nothing:\n$p")
      assert(!p.contains("CartesianProduct"), s"$name degenerated:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name degenerated:\n$p")
    }
  }

  test("q17 pair-mass estimate upper-bounds the exact capped pair mass") {
    registerViews()
    val ub = Analytics.q17PairMassUpperBound(spark, sf())
    // exact mass from the capped DISTINCT baskets (what the pair join emits)
    val exact = spark.sql(
      s"""SELECT SUM(c * (c - 1)) DIV 2 FROM (
         |  SELECT user_id, LEAST(COUNT(DISTINCT part_id), ${Analytics.BasketCapPerUser}) AS c
         |  FROM (SELECT o_custkey AS user_id, l_partkey AS part_id
         |        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
         |  GROUP BY user_id)""".stripMargin).head.getLong(0)
    assert(exact > 0, "test data produced no pairs")
    assert(ub >= exact, s"upper bound $ub below exact mass $exact")
    // raw-count bound stays in the same decade at this (replicated-TPCH)
    // duplication level — a 100× overshoot would defeat the sizing's point
    assert(ub <= exact * 20, s"bound $ub uselessly loose vs $exact")
  }

  test("q15 pair-mass estimate upper-bounds the exact capped order-basket mass") {
    registerViews()
    val ub = Analytics.q15PairMassUpperBound(spark, sf())
    val exact = spark.sql(
      s"""SELECT SUM(c * (c - 1)) DIV 2 FROM (
         |  SELECT l_orderkey, LEAST(COUNT(DISTINCT l_partkey), ${Analytics.PairCapPerOrder}) AS c
         |  FROM lineitem GROUP BY l_orderkey)""".stripMargin).head.getLong(0)
    assert(exact > 0, "test data produced no pairs")
    assert(ub >= exact, s"upper bound $ub below exact mass $exact")
    assert(ub <= exact * 20, s"bound $ub uselessly loose vs $exact")
  }

  test("q15 raises the AQE initial partition count per its pair mass (r9 verdict #1)") {
    registerViews()
    val initKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val mass = Analytics.q15PairMassUpperBound(spark, sf())
    try {
      spark.conf.set(Analytics.PairGroupsPerReducerKey, "1")
      spark.conf.set(initKey, "4")
      Catalog.byName("q15_market_basket").build(spark, sf())
      assert(spark.conf.get(initKey).toInt == math.min(1024L, mass).toInt)
      spark.conf.unset(Analytics.PairGroupsPerReducerKey)
      spark.conf.set(initKey, "4")
      Catalog.byName("q15_market_basket").build(spark, sf())
      assert(spark.conf.get(initKey).toInt == 4)
    } finally {
      spark.conf.unset(Analytics.PairGroupsPerReducerKey)
      spark.conf.unset(initKey)
    }
  }

  test("pair-mass estimate returns 0 (not NPE) on an empty keyed relation") {
    // ADVICE r9: SUM over zero rows is one NULL row — the memoized scalar
    // must come back 0, not throw on getLong
    import org.apache.spark.sql.functions._
    val mass = Analytics.pairMassUpperBound(spark, sf(), "emptyMassTest", 64) { t =>
      t.lineitem.filter(lit(false)).groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    }
    assert(mass == 0L)
  }

  test("q17 raises the AQE initial partition count per its pair mass, never lowers") {
    registerViews()
    val initKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val mass = Analytics.q17PairMassUpperBound(spark, sf())
    try {
      // groups-per-reducer = 1 makes the tiny sf0.001 mass demand >4
      // partitions, proving the raise fires
      spark.conf.set(Analytics.PairGroupsPerReducerKey, "1")
      spark.conf.set(initKey, "4")
      Catalog.byName("q17_product_affinity").build(spark, sf())
      assert(spark.conf.get(initKey).toInt == math.min(1024L, mass).toInt)
      // and with the default 1M groups/reducer the tiny mass demands 0 —
      // the session default must be left alone (never lowered)
      spark.conf.unset(Analytics.PairGroupsPerReducerKey)
      spark.conf.set(initKey, "4")
      Catalog.byName("q17_product_affinity").build(spark, sf())
      assert(spark.conf.get(initKey).toInt == 4)
    } finally {
      spark.conf.unset(Analytics.PairGroupsPerReducerKey)
      spark.conf.unset(initKey)
    }
  }
}
