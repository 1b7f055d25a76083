package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** r16: attribute st01's streaming-vs-batch CPU gap (batch agg over events
  * ≈ 2 core-s, the same agg through the micro-batch path ≈ 23 core-s).
  * Times the batch twin, the streaming run, and prints the streaming
  * micro-batch's executed plan (q.explain) so scan vectorization and
  * partial-aggregation presence are checkable.
  * Usage: runMain graft.tools.DiagSt01 <sfDir> [cpus]
  */
object DiagSt01 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.streaming.StateStores.ConfKey,
        graft.streaming.StateStores.providerClass)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def cpuOf[A](label: String)(f: => A): Unit = {
      val beans = java.lang.management.ManagementFactory.getThreadMXBean
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        val w = (System.nanoTime() - t0) / 1e9
        println(f"[diag] $label run $i wall=$w%.3f s")
        graft.Residency.release(spark)
      }
    }

    // batch twin
    val batch = graft.Tables(spark, dir).events
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("events"),
        sum(col("value").cast("decimal(18,2)")).as("val_dec"))
    cpuOf("batch agg")(batch.write.format("noop").mode("overwrite").save())

    // streaming twin (st01's exact plan)
    def streamOnce(tag: String): Unit = {
      val agg = graft.streaming.StreamingMVs.eventsStream(spark, dir)
        .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
        .agg(count(lit(1)).as("events"),
          sum(col("value").cast("decimal(18,2)")).as("val_dec"))
      val q = agg.writeStream.outputMode("complete").format("memory")
        .queryName(s"diag_st01_$tag")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      if (tag == "3") q.explain(false)
    }
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      streamOnce(i.toString)
      println(f"[diag] stream agg run $i wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
      graft.Residency.release(spark)
    }
    // A/B: state partition count (spark.sql.shuffle.partitions at stream
    // start fixes the stateful operator's partitioning — no AQE there)
    for (n <- Seq(1, 4, 8, 16)) {
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        streamOnce(s"p${n}_$i")
        println(f"[diag] stream agg parts=$n run $i wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
        graft.Residency.release(spark)
      }
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus.toString)
    spark.stop()
  }
}
