package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MvCascadeSpec extends SparkSpec {

  private def assertSameRows(streamed: DataFrame, batch: DataFrame, mvName: String): Unit = {
    val s = streamed.collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(s.nonEmpty, s"$mvName produced no rows")
    assert(s == b,
      s"$mvName diverges from batch: only-streamed=${(s -- b).take(3)} only-batch=${(b -- s).take(3)}")
  }

  test("every concurrently-running MV equals its batch recomputation") {
    val dir = sf()
    val events = Tables(spark, dir).events
    val valDec = col("value").cast("decimal(18,2)")

    assertSameRows(
      MvCascade.mv(spark, dir, "mv_daily_activity")
        .select(col("event_date"), col("user_id"), col("total_events"),
          col("val_dec").cast("double")),
      events.groupBy(to_date(col("ts")).as("event_date"), col("user_id"))
        .agg(count(lit(1)).as("total_events"), sum(valDec).cast("double").as("v")),
      "mv_daily_activity")

    assertSameRows(
      MvCascade.mv(spark, dir, "mv_user_funnel")
        .select(col("user_id"), col("event_date"), col("total_events"),
          col("views"), col("clicks"), col("purchases")),
      events.groupBy(col("user_id"), to_date(col("ts")).as("event_date"))
        .agg(count(lit(1)).as("total_events"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases")),
      "mv_user_funnel")

    assertSameRows(
      MvCascade.mv(spark, dir, "mv_country_stats")
        .select(col("country"), col("event_date"), col("event_type"), col("event_count")),
      events.join(
          Tables(spark, dir).customer
            .join(Tables(spark, dir).nation, col("c_nationkey") === col("n_nationkey"))
            .select(col("c_custkey").as("user_id"), col("n_name").as("country")),
          "user_id")
        .groupBy(col("country"), to_date(col("ts")).as("event_date"), col("event_type"))
        .agg(count(lit(1)).as("event_count")),
      "mv_country_stats")

    assertSameRows(
      MvCascade.mv(spark, dir, "mv_product_revenue")
        .select(col("product_id"), col("status"), col("order_count")),
      Tables(spark, dir).lineitem
        .groupBy(col("l_partkey").as("product_id"), col("l_returnflag").as("status"))
        .agg(count(lit(1)).as("order_count")),
      "mv_product_revenue")
  }

  test("re-running the cascade against its checkpoints changes nothing (exactly-once)") {
    val root = java.nio.file.Files.createTempDirectory("graft_cascade_replay_").toString
    MvCascade.executeAt(spark, sf(), root)
    def snapshot(): Map[String, Long] =
      Seq("mv_daily_activity", "mv_user_funnel", "mv_product_revenue", "mv_hll_daily_users")
        .map(n => n -> spark.read.parquet(s"$root/$n").count()).toMap
    val first = snapshot()
    assert(first.values.forall(_ > 0))
    // same root → same checkpoints → AvailableNow finds all offsets
    // committed; a correct exactly-once sink must not duplicate or grow
    MvCascade.executeAt(spark, sf(), root)
    assert(snapshot() == first, "cascade replay mutated the sinks")
  }

  test("HLL-state parts merge to the exact distinct within sketch error") {
    val rows = graft.Catalog.byName("st09_streaming_hll_state").build(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("sketch_ok") == 1L,
      s"${r.getString(0)}: merged sketch estimate outside 5% of exact"))
  }
}
