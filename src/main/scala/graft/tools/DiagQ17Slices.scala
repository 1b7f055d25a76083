package graft.tools

import graft.Tables
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 measurement (VERDICT r10 item 1): falsify or confirm the
  * "a cluster pays q17's fourth-decade residual once per machine" claim on
  * this box. The residual (SCALE.md §0c.1/§0d.0a) is the pair aggregation's
  * partition-count-independent shuffle-vs-memory-hierarchy term: 99.7 %
  * distinct (part_a, part_b) groups mean the partial agg reduces ~nothing
  * and the whole pair mass crosses one box's RAM/disk line.
  *
  * Experiment: run q17's pair stage as one of N sequential slices — the
  * user space key-range-partitioned by pmod(hash(user_id), N), the JVM
  * core-capped to 32/N (local[32/N]) and heap-capped to 1/N by the
  * launcher's -Xmx — i.e. each slice is one machine of an N-node cluster
  * processing its shard of the basket space with its share of the
  * resources. If per-slice cost ≈ one-process cost / N (Σ slices ≈ the
  * one-process cost), the work divides cleanly and an N-machine cluster
  * runs the stage in wall/N — the claim is a measurement. If per-slice
  * ≫ total/N, the residual does NOT distribute and the skip-partial
  * mitigation is the next move.
  *
  * Phases per slice (cumulative-prefix attribution, DiagQ15 style):
  *   up    — capBasket over the slice's users (scan + heap-dedup cost;
  *           NOT the stage under test, reported so it can be subtracted)
  *   pairs — the full pair chain: self-join, near-no-reduction groupBy,
  *           both_count >= 3 filter, count (the residual's home)
  *
  * Usage: DiagQ17Slices <sfDir> <N> <k> [reps]   (k in 0 until N)
  * Launcher caps cores via SPARK_GRAFT_CPUS and heap via -Xmx.
  */
object DiagQ17Slices {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val k = args(2).toInt
    val reps = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", (32 / n).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-diag-q17-slice-$k-of-$n")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      // each slice plans like one cluster node: the input-derived reducer
      // count for ITS share of the data (never below its core count)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        math.max(cpus.toInt,
          graft.sources.Layout.initialPartitionsFor(sfDir, cpus.toInt) / n).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    val spillDisk = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spillDisk.addAndGet(m.diskBytesSpilled)
      }
    })
    def phase[T](name: String)(body: => T): (Double, T) = {
      val sw0 = shuffleWrite.get; val sd0 = spillDisk.get
      val t0 = System.nanoTime()
      val r = body
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[slice $k/$n] $name%-10s ${secs}%8.2f s  shufW=${(shuffleWrite.get - sw0) / 1e6}%10.1f MB  spillDisk=${(spillDisk.get - sd0) / 1e6}%9.1f MB  -> $r")
      (secs, r)
    }

    val t = Tables(spark, sfDir)
    val cap = graft.operators.Analytics.BasketCapPerUser
    // the slice's users: pmod(hash) — uniform, never parquet-prunable, so
    // every slice pays the same scan (exactly like a cluster map phase
    // reading its shard of splits)
    def slicedUp() = {
      val orders = t.orders.filter(pmod(hash(col("o_custkey")), lit(n)) === k)
      val joined = t.lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("user_id"), col("l_partkey").as("part_id"))
      graft.plans.TopKPerGroup.topKDistinct(
        joined.withColumn("__neg_item", -col("part_id")),
        Seq("user_id"), "__neg_item", "part_id", cap)
        .drop("__neg_item", "rnk")
    }

    val results = (1 to reps).map { rep =>
      val (upSecs, upCount) = phase(s"up#$rep")(slicedUp().count())
      graft.Residency.release(spark)
      val (pairSecs, survivors) = phase(s"pairs#$rep") {
        val up = slicedUp()
        val a = up.toDF("u", "part_a"); val b = up.toDF("u", "part_b")
        a.join(b, Seq("u")).filter(col("part_a") < col("part_b"))
          .groupBy("part_a", "part_b").agg(count(lit(1)).as("both_count"))
          .filter(col("both_count") >= 3).count()
      }
      graft.Residency.release(spark)
      (upSecs, upCount, pairSecs, survivors)
    }
    val bestUp = results.map(_._1).min
    val bestPair = results.map(_._3).min
    // pairs phase CONTAINS an up build — the pair-stage-alone attribution
    val pairOnly = math.max(0.0, bestPair - bestUp)
    println(s"""[slice-json] {"n":$n,"k":$k,"reps":$reps,"up_rows":${results.head._2},""" +
      s""""survivors":${results.head._4},"up_sec":$bestUp,"chain_sec":$bestPair,""" +
      s""""pair_stage_sec":$pairOnly}""")
    spark.stop()
  }
}
