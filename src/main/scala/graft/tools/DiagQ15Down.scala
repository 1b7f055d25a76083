package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q15's DOWNSTREAM pair join/aggregation decomposed (VERDICT r14 item 3):
  * after the r14 capBasket fix the entry's warm floor is stable at ~18 s at
  * sf10 but fresh-JVM mins still range 18–32 s, and the builder located the
  * spread in the stage AFTER the cap — self-join on l_orderkey → pair
  * filter → near-no-reduction groupBy(part_a, part_b) count. This is the
  * DiagQ15Cap method applied one stage downstream: cumulative probes whose
  * pairwise deltas attribute the stage's wall to join CPU, exchange bytes,
  * or aggregation state.
  *
  * Probes (cumulative; each min-of-3 with per-probe stage-metric deltas):
  *   items    — the capped distinct (upstream, r14-fixed)        = U
  *   pairgen  — items ⋈ items on o, part_a < part_b, 2-col out   = U + J
  *   pairx    — pairgen → bare repartition(part_a, part_b)       = U + J + X
  *   pairagg  — pairgen → groupBy(part_a,part_b).count ≥ 2       = U + J + X' + A
  *   q15full  — the shipped entry (adds broadcast name joins +
  *              TakeOrdered 50)                                  = everything
  *
  * pairx's X is the BARE exchange of raw pair rows; pairagg's X' is the
  * partial-agg exchange (same rows ± the ~no-reduction partial combine), so
  * pairagg − pairx ≈ the aggregation hash maps' price and pairx − pairgen
  * ≈ bytes-on-wire. If (pairagg − pairx) dominates AND gc tracks it, the
  * binding term is allocation churn in the agg maps (the capBasket story
  * again — candidate fix: primitive/packed-key state); if pairx − pairgen
  * dominates, it is exchange-buffer shape (the mem-canary class — candidate
  * fix: AQE sizing / packed single-BIGINT pair key to halve row width).
  *
  * Usage: runMain graft.tools.DiagQ15Down <sfDir> [cpus]
  */
object DiagQ15Down {
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

    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    val spillDisk = new java.util.concurrent.atomic.AtomicLong(0)
    val gcMs = new java.util.concurrent.atomic.AtomicLong(0)
    val runMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spillDisk.addAndGet(m.diskBytesSpilled)
        gcMs.addAndGet(m.jvmGCTime)
        runMs.addAndGet(m.executorRunTime)
      }
    })

    def probe(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val runs = (1 to 3).map { _ =>
        val sw0 = shuffleWrite.get; val sd0 = spillDisk.get
        val gc0 = gcMs.get; val rt0 = runMs.get
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        (s, shuffleWrite.get - sw0, spillDisk.get - sd0,
          gcMs.get - gc0, runMs.get - rt0)
      }
      val best = runs.minBy(_._1)
      println(f"[diag] $name%-8s min=${best._1}%7.2f s  " +
        f"shufW=${best._2 / 1e6}%9.1f MB  spillDisk=${best._3 / 1e6}%9.1f MB  " +
        f"gc=${best._4 / 1e3}%6.1f s  cpu=${best._5 / 1e3}%7.1f s  " +
        f"runs=${runs.map(r => f"${r._1}%.2f").mkString(",")}")
    }

    val t = graft.Tables(spark, dir)
    def items = graft.operators.Analytics.capBasket(
      t.lineitem.select("l_orderkey", "l_partkey"),
      "l_orderkey", "l_partkey", graft.operators.Analytics.PairCapPerOrder)
    def pairgen = {
      val a = items.toDF("o", "part_a")
      val b = items.toDF("o", "part_b")
      a.join(b, Seq("o")).filter(col("part_a") < col("part_b"))
        .select("part_a", "part_b")
    }

    probe("items")(items)
    probe("pairgen")(pairgen)
    probe("pairx")(pairgen.repartition(col("part_a"), col("part_b")))
    probe("pairagg")(pairgen.groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("co_count")).filter(col("co_count") >= 2))
    probe("q15full")(graft.Catalog.byName("q15_market_basket").build(spark, dir))
    spark.stop()
  }
}
