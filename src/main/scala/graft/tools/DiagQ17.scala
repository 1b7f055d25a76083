package graft.tools

import graft.Tables
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 diagnostic (VERDICT r8 item 1): localize q17's superlinear
  * sf1→sf3 curve (17.8 s → 85.1 s, 4.8× on 3×) by timing each sub-plan of
  * the product-affinity query separately and reporting its governing row
  * masses plus stage-level shuffle/spill totals. Not a catalog entry —
  * a measurement harness in the SCALE.md §5 style.
  */
object DiagQ17 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf1"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-diag-q17")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("DIAG_INIT_PARTS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // stage-level totals per labeled phase
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    val spillDisk = new java.util.concurrent.atomic.AtomicLong(0)
    val spillMem = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spillDisk.addAndGet(m.diskBytesSpilled)
        spillMem.addAndGet(m.memoryBytesSpilled)
      }
    })

    def phase[T](name: String)(body: => T): T = {
      val sw0 = shuffleWrite.get; val sd0 = spillDisk.get; val sm0 = spillMem.get
      val t0 = System.nanoTime()
      val r = body
      val secs = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a beat
      Thread.sleep(300)
      println(f"[diag] $name%-28s ${secs}%8.2f s  shufW=${(shuffleWrite.get - sw0) / 1e6}%10.1f MB  spillDisk=${(spillDisk.get - sd0) / 1e6}%9.1f MB  spillMem=${(spillMem.get - sm0) / 1e6}%9.1f MB  -> $r")
      r
    }

    val t = Tables(spark, sfDir)
    val cap = graft.operators.Analytics.BasketCapPerUser

    def freshUp() = {
      val joined = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("user_id"), col("l_partkey").as("part_id"))
      graft.plans.TopKPerGroup.topKDistinct(
        joined.withColumn("__neg_item", -col("part_id")),
        Seq("user_id"), "__neg_item", "part_id", cap)
        .drop("__neg_item", "rnk")
    }

    val fullOnly = sys.env.contains("DIAG_FULL_ONLY")
    if (!fullOnly) {
    // 1. the capped distinct user→part set alone
    phase("up (capBasket) count")(freshUp().count())
    // 2. raw pair mass (pre-aggregation): the governing quantity
    phase("raw pair mass") {
      val up = freshUp()
      val a = up.toDF("u", "part_a"); val b = up.toDF("u", "part_b")
      a.join(b, Seq("u")).filter(col("part_a") < col("part_b")).count()
    }
    // 3. pair aggregation (groupBy part_a,part_b) cardinality pre-filter
    phase("distinct pair groups") {
      val up = freshUp()
      val a = up.toDF("u", "part_a"); val b = up.toDF("u", "part_b")
      a.join(b, Seq("u")).filter(col("part_a") < col("part_b"))
        .groupBy("part_a", "part_b").agg(count(lit(1)).as("c")).count()
    }
    // 4. pairs surviving both_count >= 3
    phase("pairs both_count>=3") {
      val up = freshUp()
      val a = up.toDF("u", "part_a"); val b = up.toDF("u", "part_b")
      a.join(b, Seq("u")).filter(col("part_a") < col("part_b"))
        .groupBy("part_a", "part_b").agg(count(lit(1)).as("both_count"))
        .filter(col("both_count") >= 3).count()
    }
    }
    // 5/6. the full catalog entry, as benched (noop materialize, bench
    // takes min-of-3; release residency between runs exactly like Bench)
    for (i <- 1 to 3) {
      phase(s"full q17 run$i") {
        graft.SparkEntry.queries("q17_product_affinity")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        "done"
      }
      graft.Residency.release(spark)
    }
    spark.stop()
  }
}
