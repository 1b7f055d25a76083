package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 measurement (VERDICT r10 item 4): bend dd06's candidate-mass
  * growth with its own geometry knobs. At this corpus's near-threshold
  * similarity structure the candidate mass grows ~8× on 3× data at the
  * default geometry (L=6 tables, occupancy target 8); the knobs that raise
  * the effective similarity threshold of the bucketing are
  *   - occ: smaller occupancy target → more leading signature bits → finer
  *     buckets (near-identical vectors still collide; near-threshold pairs
  *     split) — the hyperplane-LSH analog of "fewer, wider bands";
  *   - L: fewer tables → fewer union-of-table candidates, recall falls
  *     roughly linearly.
  *
  * For each grid point this harness measures, on real scaled data:
  *   mass      — |distinct candidate pairs| (the quantity that grew 8×/3×)
  *   confirmed — exact-cosine ≥ 0.4 survivors (every one a TRUE dup — the
  *               confirm is exact, so precision is 1.0 by construction)
  *   recall    — confirmed ∩ baseline-confirmed / baseline-confirmed
  *               (baseline = the shipping L=6/occ=8 geometry)
  *   wall      — the dd06 chain end-to-end at that geometry
  *
  * Usage: DiagDd06Sweep <sfDir> [reps]
  */
object DiagDd06Sweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-diag-dd06-sweep")
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

    val e = Tables(spark, sfDir).embeddings
    val n = CorpusMeta.embeddingCount(spark, sfDir)
    val mu = CorpusMeta.embeddingMeans(spark, sfDir)
    println(s"[sweep] n=$n baseline h=${Similarity.adaptiveBitsFor(n, Similarity.TargetOcc)}")

    def cands(lp: Int, occ: Int): DataFrame = {
      val h = Similarity.adaptiveBitsFor(n, occ)
      val bk = Similarity.buckets(e, h, mu).filter(col("table_id") < lp)
      val a = bk.toDF("vec_a", "table_id", "bucket")
      val b = bk.toDF("vec_b", "table_id", "bucket")
      a.join(b, Seq("table_id", "bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct()
    }
    def confirmed(lp: Int, occ: Int): DataFrame = {
      val ea = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val eb = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      cands(lp, occ).join(ea, "vec_a").join(eb, "vec_b")
        .select(col("vec_a"), col("vec_b"),
          VectorOps.cosine(col("ea"), col("eb")).as("cosine"))
        .filter(col("cosine") >= 0.4)
        .select("vec_a", "vec_b")
    }

    // baseline found set, pinned once to parquet (the recall denominator;
    // localCheckpoint blocks would not survive the per-point Residency
    // release below)
    val basePath = s"target/dd06_sweep_base_$n"
    confirmed(Similarity.L, Similarity.TargetOcc)
      .write.mode("overwrite").parquet(basePath)
    val base = spark.read.parquet(basePath)
    val nBase = base.count()
    println(s"[sweep] baseline confirmed dups = $nBase")

    val grid = Seq(
      (Similarity.L, Similarity.TargetOcc), // shipping geometry, for wall ref
      (6, 4), (6, 2), (6, 1),
      (4, 8), (4, 4), (4, 2),
      (3, 8), (2, 8),
    )
    for ((lp, occ) <- grid) {
      val h = Similarity.adaptiveBitsFor(n, occ)
      val t0 = System.nanoTime()
      val nConf = confirmed(lp, occ).count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.Residency.release(spark)
      val mass = cands(lp, occ).count()
      graft.Residency.release(spark)
      val hit = confirmed(lp, occ).join(base, Seq("vec_a", "vec_b"), "left_semi").count()
      graft.Residency.release(spark)
      val rec = if (nBase == 0) 1.0 else hit.toDouble / nBase
      println(f"[sweep-json] {" +
        f""""L":$lp,"occ":$occ,"h":$h,"mass":$mass,"confirmed":$nConf,""" +
        f""""recall_vs_base":$rec%.4f,"chain_sec":$wall%.2f}""")
    }
    spark.stop()
  }
}
