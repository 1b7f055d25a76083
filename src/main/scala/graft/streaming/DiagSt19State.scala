package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-12 measurement (VERDICT r11 item 8): st19's state-size curve.
  * The concurrency MV keeps one fixed-width min/max span row per
  * (user, day) — the largest maintained state in the engine (grows with
  * data, unlike st14's 10-cell or st15's 128-bin state). This harness runs
  * EXACTLY st19's maintenance aggregation (StreamingMVs.concurrencyMv body)
  * to exhaustion under a chosen state-store provider and reports state rows,
  * state bytes, and maintain wall — the inputs for the SCALE.md row naming
  * the executor-heap ceiling and the RocksDB lever.
  *
  * Usage: DiagSt19State <sfDir> [heap|rocksdb]
  */
object DiagSt19State {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val provider = if (args.length > 1) args(1) else "heap"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-diag-st19-state")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
    // explicit per-run provider (this harness IS the A/B instrument);
    // the engine's shipped default lives in StateStores
    b.config(StateStores.ConfKey,
      if (provider == "rocksdb") StateStores.RocksDB else StateStores.Heap)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = System.nanoTime()
    val q = StreamingMVs.eventsStream(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("ts"))
      .groupBy("user_id", "d")
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("diag_st19")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    val rows = spark.table("diag_st19").count()

    // last progress event with state metrics
    val stOpt = q.recentProgress.reverseIterator
      .flatMap(p => Option(p.stateOperators).toSeq.flatten)
      .toSeq.headOption
    stOpt match {
      case Some(st) =>
        val custom = Option(st.customMetrics)
          .map(m => m.entrySet().iterator())
          .map { it =>
            val sb = new StringBuilder
            while (it.hasNext) {
              val e = it.next()
              if (e.getKey.toLowerCase.contains("size") || e.getKey.toLowerCase.contains("memory"))
                sb.append(s""","${e.getKey}":${e.getValue}""")
            }
            sb.toString
          }.getOrElse("")
        println(s"""[st19-state-json] {"sf_dir":"$sfDir","provider":"$provider",""" +
          s""""wall_s":${f"$wall%.1f"},"result_rows":$rows,""" +
          s""""state_rows":${st.numRowsTotal},"state_bytes":${st.memoryUsedBytes}$custom}""")
      case None =>
        println(s"""[st19-state-json] {"sf_dir":"$sfDir","provider":"$provider","wall_s":${f"$wall%.1f"},"result_rows":$rows,"state_rows":-1}""")
    }
    spark.stop()
  }
}
