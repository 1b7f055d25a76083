package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for q15's market-basket self-join (the r10 fourth-
  * decade triage: 7.2 s sf3 → 64.5 s sf10 min-of-3 = 8.9× on 3.33×).
  * Times each prefix — capped-basket build, pair join, pair aggregation,
  * full entry — and reports the governing masses, so the superlinear term
  * attributes to a stage instead of a guess. DIAG_INIT_PARTS overrides the
  * AQE initial partition count (the q17-style reducer A/B).
  * Usage: runMain graft.tools.DiagQ15 <sfDir> [cpus]
  */
object DiagQ15 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("DIAG_INIT_PARTS",
          graft.sources.Layout.initialPartitionsFor(dir, cpus).toString))
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[diag] initialPartitionNum = " +
      spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum"))

    def time[A](label: String)(f: => A): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[diag] $label%-34s min=${runs.min}%.2f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }

    val t = graft.Tables(spark, dir)
    val cap = graft.operators.Analytics.PairCapPerOrder

    // mass first (cheap, names the governing quantity; inline since r11
    // removed the sizing machinery this used to share)
    val capped = least(col("n"), lit(cap.toLong))
    val mass = t.lineitem.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .select(coalesce(sum(capped * (capped - 1)), lit(0L)).as("m"))
      .head.getLong(0) / 2
    println(s"[diag] capped pair-mass upper bound = $mass")

    def items = graft.operators.Analytics.capBasket(
      t.lineitem.select("l_orderkey", "l_partkey"),
      "l_orderkey", "l_partkey", cap)

    time("capBasket only (noop)") {
      items.write.format("noop").mode("overwrite").save()
    }
    def a = items.toDF("o", "part_a")
    def b = items.toDF("o", "part_b")
    def rawPairs = a.join(b, Seq("o")).filter(col("part_a") < col("part_b"))
    time("pairs join, no agg (noop)") {
      rawPairs.write.format("noop").mode("overwrite").save()
    }
    val nPairs = rawPairs.count()
    val nGroups = rawPairs.select("part_a", "part_b").distinct().count()
    println(s"[diag] raw pairs = $nPairs, distinct pair groups = $nGroups")
    def agg = rawPairs.groupBy("part_a", "part_b").agg(count(lit(1)).as("co_count"))
    time("pairs + aggregation (noop)") {
      agg.write.format("noop").mode("overwrite").save()
    }
    time("full q15 entry (noop)") {
      graft.Catalog.byName("q15_market_basket").build(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
