package graft.operators

import graft.{Catalog, SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q55 maxIntersections semantics: half-open spans (an end at instant t
  * applies BEFORE a start at t), peak value + first peak instant, and
  * equivalence of the DistributedRank prefix sum with the naive
  * single-partition window on real data.
  */
class PeakConcurrencySpec extends SparkSpec {

  private def runEntry(dir: String) =
    Catalog.byName("q55_peak_concurrency").build(spark, dir).collect()

  test("half-open spans: ends apply before starts at the same instant") {
    import spark.implicits._
    // users 1-3 span [09:00, 10:00); users 4-6 span [10:00, 11:00).
    // Correct half-open sweep peaks at 3 (first at 09:00); an implementation
    // applying starts before ends would read 6 at 10:00.
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 09:00:00")
    def t(h: Int) = new java.sql.Timestamp(ts0.getTime + h * 3600L * 1000)
    val rows = (1L to 3L).flatMap(u => Seq((u, t(0)), (u, t(1)))) ++
      (4L to 6L).flatMap(u => Seq((u, t(1)), (u, t(2))))
    val dir = java.nio.file.Files.createTempDirectory("q55_planted").toString
    rows.toDF("user_id", "ts")
      .select(col("user_id"),
        col("ts"), lit(0L).as("event_id"), lit("view").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = runEntry(dir)
    assert(r.length == 1)
    assert(r(0).getLong(0) == 3L, s"peak should be 3 (half-open), got ${r(0)}")
    assert(r(0).getTimestamp(1) == t(0), s"first peak instant should be 09:00, got ${r(0)}")
  }

  test("q56 merged spans: overlap fuses, touching fuses, disjoint splits") {
    import spark.implicits._
    // one user, one day, 5-min spans:
    //   09:00 and 09:02 -> overlap, merged [09:00, 09:07) = 420 s
    //   10:00           -> disjoint, 300 s
    //   11:00 and 11:05 -> touching (end == start), fuse to 600 s, ONE run
    // expected: covered = 1320 s, n_merged = 3
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s:00")
    val rows = Seq("09:00", "09:02", "10:00", "11:00", "11:05").map(h => (7L, t(h)))
    val dir = java.nio.file.Files.createTempDirectory("q56_planted").toString
    rows.toDF("user_id", "ts")
      .select(col("user_id"), col("ts"), lit(0L).as("event_id"),
        lit("view").as("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Catalog.byName("q56_interval_length_sum").build(spark, dir).collect()
    assert(r.length == 1, s"one (user, day) group expected, got ${r.toSeq}")
    assert(r(0).getLong(2) == 1320L * 1000000L, s"covered_us: ${r(0)}")
    assert(r(0).getLong(3) == 3L, s"n_merged: ${r(0)}")
  }

  test("entry matches the naive single-partition window on sf0.001") {
    val ev = Tables(spark, sf()).events
    val iv = ev.groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
      .filter(col("s") < col("e"))
    val pts = iv.select(col("s").as("ts"), lit(1L).as("delta"))
      .unionAll(iv.select(col("e").as("ts"), lit(-1L).as("delta")))
    val net = pts.groupBy("ts").agg(sum(col("delta")).as("net"))
    val naive = net.withColumn("conc",
      sum(col("net")).over(Window.orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val mx = naive.agg(max(col("conc"))).head().getLong(0)
    val atTs = naive.filter(col("conc") === mx).agg(min(col("ts"))).head().getTimestamp(0)
    val r = runEntry(sf())
    assert(r.length == 1)
    assert(r(0).getLong(0) == mx, s"entry peak ${r(0).getLong(0)} != naive $mx")
    assert(r(0).getTimestamp(1) == atTs, s"entry instant ${r(0).getTimestamp(1)} != naive $atTs")
  }
}
