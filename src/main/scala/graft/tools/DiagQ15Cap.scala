package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** capBasket's OWN decomposition (VERDICT r13 item 1a): q15's dominant
  * stage (61 % of the entry at sf10 per the r9 prefix decomposition) has
  * never been broken into its terms at the fourth decade. The stage is
  * scan → TopKPerGroupPartial (per-key TreeSet dedup heaps, map side) →
  * exchange on l_orderkey → TopKPerGroup final (same heap build again).
  * On THIS data the cap never binds (baskets ≤ 17 < 64), so eviction
  * cost is structurally zero and the candidate binding terms are:
  *
  *   (a) the generic heap MACHINERY: one UnsafeRow copy per surviving row,
  *       a TreeSet node per item, a HashMap<UnsafeRow, TreeSet> entry per
  *       key — at sf10 that is ~150 M TreeSets / ~600 M copied rows per
  *       pass, twice (partial + final): allocation + GC + pointer chasing;
  *   (b) the exchange itself (~600 M × 16 B rows, the mem-canary class);
  *   (c) the scan.
  *
  * Probes (each min-of-3, per-probe stage-metric deltas):
  *   scan        — select(o, p) → noop                          = (c)
  *   exchange    — repartition(o) → noop                        = (c)+(b)
  *   distinct    — groupBy(o, p) hash-agg → noop: the SAME dedup work in
  *                 codegen'd UnsafeFixedWidthAggregationMap form = (c)+(b)+codegen-dedup
  *   capBasket   — the shipped operator → noop                  = (c)+(b)+(a)
  *
  * capBasket − exchange = the heap machinery's price; distinct − exchange
  * = what the SAME set costs in codegen form. If the first far exceeds the
  * second, (a) is the binding term and the win is a primitive-state
  * specialization (or routing the dedup through hash-agg); if capBasket ≈
  * exchange, the stage is bytes-bound and the win is the 8-byte packed key.
  *
  * Usage: runMain graft.tools.DiagQ15Cap <sfDir> [cpus]
  */
object DiagQ15Cap {
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
      println(f"[diag] $name%-12s min=${best._1}%7.2f s  " +
        f"shufW=${best._2 / 1e6}%9.1f MB  spillDisk=${best._3 / 1e6}%9.1f MB  " +
        f"gc=${best._4 / 1e3}%6.1f s  cpu=${best._5 / 1e3}%7.1f s  " +
        f"runs=${runs.map(r => f"${r._1}%.2f").mkString(",")}")
    }

    val t = graft.Tables(spark, dir)
    def base = t.lineitem.select("l_orderkey", "l_partkey")

    probe("scan")(base)
    probe("exchange")(base.repartition(col("l_orderkey")))
    probe("distinct")(base.groupBy("l_orderkey", "l_partkey").agg(count(lit(1))))
    probe("capBasket")(graft.operators.Analytics.capBasket(
      base, "l_orderkey", "l_partkey", graft.operators.Analytics.PairCapPerOrder))
    spark.stop()
  }
}
