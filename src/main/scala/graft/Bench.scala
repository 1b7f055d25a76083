package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every catalog query, fully materialized (noop sink —
  * forces the complete physical plan, unlike count() which can prune
  * projections), on SPARK_GRAFT_SF_DIR. Prints exactly one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      } finally spark.catalog.clearCache() // drop per-query cached frames
      (System.nanoTime() - t0) / 1e9
    }

    // JVM/codegen/parquet-footer warm-up (not reported)
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir).write
      .format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map(n => n -> materialize(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val eps = ingestEventsPerSec(spark)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ingest_events_per_sec":$eps,"sf":"$sfDir"}"""
    println(line)
    // Also persist: the driver captures a bounded stdout tail, and r1's
    // per-query numbers fell outside the window — the file copy is the
    // durable record.
    try {
      val out = java.nio.file.Paths.get("target/bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, line + "\n")
    } catch { case e: Throwable => System.err.println(s"[bench] bench.json write failed: $e") }
    spark.stop()
  }

  /** Streaming ingest→MV throughput: drive the synthetic generator through
    * the watermarked minute-MV aggregation (graft.streaming.Ingest) for a few
    * seconds and report events/s — comparable to the reference's headline
    * ~100 events/s + 20 orders/s ingest claim (BASELINE.md).
    */
  private def ingestEventsPerSec(spark: SparkSession): Double = {
    import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
    // Accumulate numInputRows in a listener: recentProgress is a bounded
    // rolling buffer (~100 entries), and with ProcessingTime(0) more batches
    // than that can elapse between two reads — differencing it undercounts
    // (even negatively) once early batches roll out of the window.
    val totalRows = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        totalRows.addAndGet(e.progress.numInputRows)
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val q = graft.streaming.Ingest.generatedMinuteMv(spark, rowsPerBatch = 50000)
        .writeStream.outputMode("update").format("noop")
        .trigger(Trigger.ProcessingTime(0)).start()
      // warm-up: wait (bounded) for the first processed batch before timing,
      // so slow stream startup under load doesn't read as zero throughput
      val warmDeadline = System.currentTimeMillis() + 30000
      while (totalRows.get() == 0 &&
        System.currentTimeMillis() < warmDeadline) Thread.sleep(200)
      val rows0 = totalRows.get()
      val t0 = System.nanoTime()
      Thread.sleep(8000)
      q.stop()
      val rows = totalRows.get() - rows0
      val secs = (System.nanoTime() - t0) / 1e9
      math.round(rows / secs * 10) / 10.0
    } catch { case e: Throwable =>
      System.err.println(s"[bench] ingest throughput failed: ${e.getMessage}")
      -1.0
    } finally spark.streams.removeListener(listener)
  }
}
