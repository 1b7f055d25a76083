package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 measurement (VERDICT r12 item 2): port the q17 pair-pack to q15,
  * the one remaining entry above the measured contention class (3.81× on
  * sf3→sf10's 3.33× rows, SCALE.md §0f.1 panel). q15's pair exchange is
  * (part_a, part_b, count) with both ids < 2^32 — the same byte model the
  * q17 A/B proved wins ~20 % at the fourth decade by shrinking the
  * partial-agg exchange row from (long, long, long) to (long, long).
  *
  * Same discipline as DiagQ17Pack: isolated process, min-of-N, result
  * equality between variants, and the A/B MUST be run in both orders
  * (SPARK_GRAFT_PACK_FIRST) — r12 measured same-JVM warmth at ~2×, bigger
  * than most plan effects, so only position-matched ratios are citable.
  *
  * Usage: DiagQ15Pack <sfDir>   (SPARK_GRAFT_DIAG_REPS, default 3)
  */
object DiagQ15Pack {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf10"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-diag-q15-pack")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.sources.Layout.initialPartitionsFor(sfDir, cpus.toInt).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t = Tables(spark, sfDir)
    val cap = graft.operators.Analytics.PairCapPerOrder

    // the entry's exact capped-distinct basket build (Analytics q15)
    def items(): DataFrame = graft.operators.Analytics.capBasket(
      t.lineitem.select("l_orderkey", "l_partkey"),
      "l_orderkey", "l_partkey", cap)
    val pa = t.part.select(col("p_partkey").as("pa_key"), col("p_name").as("part_a_name"))
    val pb = t.part.select(col("p_partkey").as("pb_key"), col("p_name").as("part_b_name"))

    def finish(pairs: DataFrame): DataFrame = pairs
      .join(broadcast(pa), col("part_a") === col("pa_key"))
      .join(broadcast(pb), col("part_b") === col("pb_key"))
      .select("part_a", "part_b", "part_a_name", "part_b_name", "co_count")
      .orderBy(desc("co_count"), asc("part_a"), asc("part_b"))
      .limit(50)

    // shipping shape: groupBy two long keys
    def baseline(): DataFrame = {
      val it = items()
      val a = it.toDF("o", "part_a")
      val b = it.toDF("o", "part_b")
      finish(a.join(b, Seq("o")).filter(col("part_a") < col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(count(lit(1)).as("co_count"))
        .filter(col("co_count") >= 2))
    }

    // packed shape: one bigint key through the aggregation, unpack at output
    def packed(): DataFrame = {
      val it = items()
      val a = it.toDF("o", "part_a")
      val b = it.toDF("o", "part_b")
      finish(a.join(b, Seq("o")).filter(col("part_a") < col("part_b"))
        .select(shiftleft(col("part_a"), 32).bitwiseOR(col("part_b")).as("pk"))
        .groupBy("pk")
        .agg(count(lit(1)).as("co_count"))
        .filter(col("co_count") >= 2)
        .select(shiftrightunsigned(col("pk"), 32).as("part_a"),
          col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("part_b"),
          col("co_count")))
    }

    // key safety: both ids must fit 32 unsigned bits for the pack to be lossless
    val bounds = t.part.agg(min(col("p_partkey")), max(col("p_partkey"))).head()
    require(bounds.getLong(0) >= 0 && bounds.getLong(1) <= 0xFFFFFFFFL,
      s"partkey outside [0, 2^32): [${bounds.getLong(0)}, ${bounds.getLong(1)}]")
    println(s"[q15pack] partkey in [${bounds.getLong(0)}, ${bounds.getLong(1)}] (fits 32 bits)")

    val reps = sys.env.getOrElse("SPARK_GRAFT_DIAG_REPS", "3").toInt
    def time(label: String)(mk: () => DataFrame): (Double, Seq[String]) = {
      var best = Double.MaxValue
      var rows: Seq[String] = Seq.empty
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        rows = mk().collect().map(_.toString).toSeq
        val w = (System.nanoTime() - t0) / 1e9
        graft.Residency.release(spark)
        println(f"[q15pack] $label rep$i wall=$w%.1f s")
        best = math.min(best, w)
      }
      (best, rows)
    }
    // SPARK_GRAFT_PACK_FIRST reverses run order — the first variant in a JVM
    // pays cold page-cache + JIT, so a claimed win must survive BOTH orders.
    // SPARK_GRAFT_PACK_INTERLEAVE instead runs an ABBA ladder (BP PB BP PB …,
    // `reps` pairs): both variants sample the SAME warmth/box-drift
    // distribution inside one JVM, so a min-vs-min comparison is position-
    // free — the instrument for a day when the two fixed orders disagree in
    // DIRECTION (r13: 1.16× cold vs 0.69× warm under heavy box noise).
    val interleave = sys.env.contains("SPARK_GRAFT_PACK_INTERLEAVE")
    val packFirst = sys.env.contains("SPARK_GRAFT_PACK_FIRST")
    def timeOnce(label: String, i: Int)(mk: () => DataFrame): (Double, Seq[String]) = {
      val t0 = System.nanoTime()
      val rows = mk().collect().map(_.toString).toSeq
      val w = (System.nanoTime() - t0) / 1e9
      graft.Residency.release(spark)
      println(f"[q15pack] $label rep$i wall=$w%.1f s")
      (w, rows)
    }
    val (wBase, rBase, wPack, rPack) =
      if (interleave) {
        var (wb, wp) = (Double.MaxValue, Double.MaxValue)
        var (rb, rp): (Seq[String], Seq[String]) = (Seq.empty, Seq.empty)
        for (i <- 1 to reps) {
          val baseFirstThisPair = i % 2 == 1
          if (baseFirstThisPair) {
            val (w1, r1) = timeOnce("baseline", i)(baseline _); wb = math.min(wb, w1); rb = r1
            val (w2, r2) = timeOnce("packed", i)(packed _); wp = math.min(wp, w2); rp = r2
          } else {
            val (w2, r2) = timeOnce("packed", i)(packed _); wp = math.min(wp, w2); rp = r2
            val (w1, r1) = timeOnce("baseline", i)(baseline _); wb = math.min(wb, w1); rb = r1
          }
        }
        (wb, rb, wp, rp)
      } else if (packFirst) {
        val (wp, rp) = time("packed")(packed _)
        val (wb, rb) = time("baseline")(baseline _)
        (wb, rb, wp, rp)
      } else {
        val (wb, rb) = time("baseline")(baseline _)
        val (wp, rp) = time("packed")(packed _)
        (wb, rb, wp, rp)
      }
    println(s"[q15pack] results_equal=${rBase == rPack} rows=${rBase.length}")
    println(f"""[q15pack-json] {"wall_base":$wBase%.2f,"wall_packed":$wPack%.2f,"equal":${rBase == rPack},"reps":$reps,"mode":"${if (interleave) "abba" else if (packFirst) "packed_first" else "baseline_first"}"}""")
    spark.stop()
  }
}
