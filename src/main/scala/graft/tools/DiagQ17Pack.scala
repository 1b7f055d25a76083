package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 measurement (VERDICT r11 item 2): does cutting q17's shuffle-row
  * width move its fourth-decade wall? The r11 slice A/B proved the sf10
  * residual is memory-system pressure proportional to bytes moved (12.3 GB
  * pair exchange); both pair ids fit 32 bits, so packing `(part_a << 32) |
  * part_b` into ONE bigint through the pair aggregation shrinks the partial
  * aggregate's exchange row from (long, long, long) to (long, long).
  *
  * Context: an earlier pack attempt was measured and REJECTED at sf3 under
  * r8 conditions (fixed 32 reducers, where the binding term was final-agg
  * hash-map size, not bytes). This re-measures under the current plan
  * (input-derived AQE initialPartitionNum, no reducer raise) at the scale
  * where bytes were proven to be the binding term. Isolated process,
  * min-of-N, result-equality check between variants.
  *
  * Usage: DiagQ17Pack <sfDir>   (SPARK_GRAFT_DIAG_REPS, default 3)
  */
object DiagQ17Pack {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf10"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-diag-q17-pack")
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
    val cap = graft.operators.Analytics.BasketCapPerUser

    // the entry's exact capped-distinct basket build (Analytics q17)
    def up(): DataFrame = graft.operators.Analytics.capBasket(
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("user_id"), col("l_partkey").as("part_id")),
      "user_id", "part_id", cap)

    // shipping shape: groupBy two long keys
    def baseline(): DataFrame = {
      val u = up()
      val buyers = u.groupBy("part_id").agg(count(lit(1)).as("buyer_count"))
      val a = u.toDF("u", "part_a")
      val b = u.toDF("u", "part_b")
      val pairs = a.join(b, Seq("u")).filter(col("part_a") < col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(count(lit(1)).as("both_count"))
        .filter(col("both_count") >= 3)
      pairs
        .join(buyers.withColumnRenamed("part_id", "part_a").withColumnRenamed("buyer_count", "part_a_buyers"), Seq("part_a"))
        .select(col("part_a"), col("part_b"), col("both_count"), col("part_a_buyers"),
          (col("both_count").cast("double") / col("part_a_buyers")).as("affinity"))
        .orderBy(desc("affinity"), asc("part_a"), asc("part_b"))
        .limit(50)
    }

    // packed shape: one bigint key through the aggregation, unpack at output
    def packed(): DataFrame = {
      val u = up()
      val buyers = u.groupBy("part_id").agg(count(lit(1)).as("buyer_count"))
      val a = u.toDF("u", "part_a")
      val b = u.toDF("u", "part_b")
      val pairs = a.join(b, Seq("u")).filter(col("part_a") < col("part_b"))
        .select((shiftleft(col("part_a"), 32).bitwiseOR(col("part_b"))).as("pk"))
        .groupBy("pk")
        .agg(count(lit(1)).as("both_count"))
        .filter(col("both_count") >= 3)
        .select(shiftrightunsigned(col("pk"), 32).as("part_a"),
          col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("part_b"),
          col("both_count"))
      pairs
        .join(buyers.withColumnRenamed("part_id", "part_a").withColumnRenamed("buyer_count", "part_a_buyers"), Seq("part_a"))
        .select(col("part_a"), col("part_b"), col("both_count"), col("part_a_buyers"),
          (col("both_count").cast("double") / col("part_a_buyers")).as("affinity"))
        .orderBy(desc("affinity"), asc("part_a"), asc("part_b"))
        .limit(50)
    }

    // key safety: both ids must fit 32 unsigned bits for the pack to be lossless
    val maxPart = t.part.agg(max(col("p_partkey"))).head().getLong(0)
    require(maxPart > 0 && maxPart <= 0xFFFFFFFFL, s"partkey overflows 32 bits: $maxPart")
    println(s"[q17pack] max partkey=$maxPart (fits 32 bits)")

    val reps = sys.env.getOrElse("SPARK_GRAFT_DIAG_REPS", "3").toInt
    def time(label: String)(mk: () => DataFrame): (Double, Seq[String]) = {
      var best = Double.MaxValue
      var rows: Seq[String] = Seq.empty
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        rows = mk().collect().map(_.toString).toSeq
        val w = (System.nanoTime() - t0) / 1e9
        graft.Residency.release(spark)
        println(f"[q17pack] $label rep$i wall=$w%.1f s")
        best = math.min(best, w)
      }
      (best, rows)
    }
    // SPARK_GRAFT_PACK_FIRST reverses run order — the first variant in a JVM
    // pays cold page-cache + JIT, so a claimed win must survive BOTH orders
    val packFirst = sys.env.contains("SPARK_GRAFT_PACK_FIRST")
    val (wBase, rBase, wPack, rPack) =
      if (packFirst) {
        val (wp, rp) = time("packed")(packed _)
        val (wb, rb) = time("baseline")(baseline _)
        (wb, rb, wp, rp)
      } else {
        val (wb, rb) = time("baseline")(baseline _)
        val (wp, rp) = time("packed")(packed _)
        (wb, rb, wp, rp)
      }
    println(s"[q17pack] results_equal=${rBase == rPack} rows=${rBase.length}")
    println(f"""[q17pack-json] {"wall_base":$wBase%.2f,"wall_packed":$wPack%.2f,"equal":${rBase == rPack},"reps":$reps}""")
    spark.stop()
  }
}
