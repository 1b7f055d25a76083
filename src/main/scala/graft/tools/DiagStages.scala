package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** r15: per-stage wall timeline for one catalog entry — stage submission →
  * completion with task counts and gaps, to attribute the sf0.1 latency
  * floor (CPU ≈ 2 core-s but wall ≈ 1.3 s on q15: where do the other
  * 1 300 ms go — stage latency, AQE barriers, or driver planning?).
  * Usage: runMain graft.tools.DiagStages <entry> <sfDir> [cpus]
  */
object DiagStages {
  def main(args: Array[String]): Unit = {
    val entry = args(0)
    val dir = args(1)
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.sources.Layout.initialPartitionsFor(dir, cpus).toString)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("DIAG_CODEGEN_CACHE", "5000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(id: Int, name: String, sub: Long, done: Long, tasks: Int, cpuMs: Long)
    val stages = ArrayBuffer[St]()
    val jobs = ArrayBuffer[(Int, Long, Long)]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.synchronized {
          stages += St(si.stageId, si.name.take(40),
            si.submissionTime.getOrElse(-1L), si.completionTime.getOrElse(-1L),
            si.numTasks, si.taskMetrics.executorRunTime)
        }
      }
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs += ((j.jobId, jobStart.getOrDefault(j.jobId, -1L), j.time)) }
    })

    // warm run
    graft.SparkEntry.queries(entry)(spark, dir).write.format("noop").mode("overwrite").save()
    graft.Residency.release(spark)
    stages.clear(); jobs.clear()

    val t0 = System.nanoTime()
    val w0 = System.currentTimeMillis()
    graft.SparkEntry.queries(entry)(spark, dir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let listener drain
    println(f"[diag] $entry wall=$wall%.3f s (timed run, after warm)")
    val ss = stages.sortBy(_.sub)
    var covered = 0L
    var last = w0
    for (s <- ss) {
      val gap = s.sub - last
      println(f"[diag] stage ${s.id}%4d ${s.name}%-40s start=+${s.sub - w0}%6d ms dur=${s.done - s.sub}%6d ms tasks=${s.tasks}%4d cpu=${s.cpuMs}%6d ms gapBefore=$gap%5d ms")
      last = math.max(last, s.done)
      covered += math.max(0, s.done - s.sub)
    }
    println(f"[diag] stages=${ss.size} jobs=${jobs.size} stageWallSum=${covered} ms")
    val js = jobs.sortBy(_._2)
    for ((id, st, en) <- js)
      println(f"[diag] job $id%4d start=+${st - w0}%6d ms dur=${en - st}%6d ms")
    spark.stop()
  }
}
