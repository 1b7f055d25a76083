package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15: ts02's label-propagation cost split — edge build (= dd02 core) vs
  * the iterative min-label rounds, with the round count printed (each round
  * is ≥2 driver-synchronous jobs on a graph that at sf0.1 is 256 edges, so
  * fixed job latency, not data, is the candidate binding term).
  * Usage: runMain graft.pipeline.DiagTs02 <sfDir> [cpus]
  */
object DiagTs02 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; graft.Residency.release(spark)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[diag] $label%-34s min=${runs.min}%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }

    def edges = graft.Catalog.byName("dd02_ngram_jaccard").build(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    def undirected = edges
      .unionByName(edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("src", "dst")

    time("edges (dd02 core)") { edges.write.format("noop").mode("overwrite").save() }
    time("undirected ckpt") { undirected.localCheckpoint(true); () }

    // count rounds: replicate propagateMinLabels with a counter
    val und = undirected.localCheckpoint(true)
    println(s"[diag] undirected rows = ${und.count()}")
    var labels = und.select(col("src").as("doc")).distinct()
      .withColumn("label", col("doc")).localCheckpoint(true)
    var converged = false
    var iter = 0
    val t0 = System.nanoTime()
    while (!converged && iter < 20) {
      val r0 = System.nanoTime()
      val neighborMin = und
        .join(labels.withColumnRenamed("doc", "src").withColumnRenamed("label", "src_label"), "src")
        .groupBy(col("dst").as("doc"))
        .agg(min("src_label").as("nbr_label"))
      val next = labels.join(neighborMin, Seq("doc"), "left")
        .select(col("doc"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          (coalesce(col("nbr_label"), col("label")) < col("label")).as("chg"))
        .localCheckpoint(true)
      converged = !next.agg(coalesce(max("chg"), lit(false))).head().getBoolean(0)
      labels = next.drop("chg")
      iter += 1
      println(f"[diag] round $iter took ${(System.nanoTime() - r0) / 1e9}%.3f s converged=$converged")
    }
    println(f"[diag] label prop total ${(System.nanoTime() - t0) / 1e9}%.3f s rounds=$iter")
    graft.Residency.release(spark)

    time("full ts02") {
      graft.Catalog.byName("ts02_dedup_clusters").build(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
