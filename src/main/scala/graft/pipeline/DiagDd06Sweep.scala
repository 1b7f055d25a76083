package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** dd06 geometry sweep, round-12 edition. The r11 sweep measured the
  * (L, occ) grid under the DEGENERATE plane family (61 distinct directions
  * across 600 "planes" — Similarity.planeSign scaladoc) and its conclusions
  * do not survive the generator fix: the shipping geometry's candidate mass
  * at sf3 fell 75.45 M → 2.05 M the moment the planes became independent,
  * and recall-vs-shipping was measured against an accidentally-brute-force
  * baseline. This edition measures the real trade:
  *
  *   mass      — |distinct candidate pairs|
  *   confirmed — exact-cosine ≥ 0.4 survivors (precision 1.0 by construction)
  *   recall    — confirmed / |TRUE all-pairs dups| (exact baseline computed
  *               once per corpus by this harness — diag-only; the guarded
  *               dd05 entry still refuses at this scale)
  *   wall      — the dd06 chain end-to-end at that geometry
  *
  * Grid direction reversed vs r11: independent planes make buckets FINER
  * than the degenerate family's, so the interesting knob motion is now UP
  * (occ 16/32/64, L 9/12) — buying recall back at measured mass cost.
  *
  * Usage: DiagDd06Sweep <sfDir> (SPARK_GRAFT_SWEEP_SKIP_EXACT=1 reuses a
  * prior run's baseline parquet)
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

    val ea = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val eb = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))

    def cands(lp: Int, occ: Int): DataFrame = {
      val h = Similarity.adaptiveBitsFor(n, occ)
      val bk = Similarity.bucketsFor(e, lp, h, mu)
      val a = bk.toDF("vec_a", "table_id", "bucket")
      val b = bk.toDF("vec_b", "table_id", "bucket")
      a.join(b, Seq("table_id", "bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct()
    }
    def confirmed(lp: Int, occ: Int): DataFrame =
      cands(lp, occ).join(ea, "vec_a").join(eb, "vec_b")
        .select(col("vec_a"), col("vec_b"),
          VectorOps.cosine(col("ea"), col("eb")).as("cosine"))
        .filter(col("cosine") >= 0.4)
        .select("vec_a", "vec_b")

    // TRUE ground truth: all-pairs exact confirm, pinned to parquet once per
    // corpus (n=60 k → 1.8 B cosines ≈ minutes on 32 threads — a diag-only
    // cost; the production answer to "I need exact" is dd05 below the guard).
    val exactPath = s"target/dd06_sweep_exact_$n"
    if (sys.env.get("SPARK_GRAFT_SWEEP_SKIP_EXACT").isEmpty) {
      val t0 = System.nanoTime()
      ea.join(eb, col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          VectorOps.cosine(col("ea"), col("eb")).as("cosine"))
        .filter(col("cosine") >= 0.4)
        .select("vec_a", "vec_b")
        .write.mode("overwrite").parquet(exactPath)
      println(f"[sweep] exact baseline built in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      graft.Residency.release(spark)
    }
    val exact = spark.read.parquet(exactPath)
    val nExact = exact.count()
    println(s"[sweep] TRUE all-pairs dups = $nExact")

    val grid = Seq(
      (Similarity.L, Similarity.TargetOcc), // shipping geometry
      (6, 16), (6, 32), (6, 64),            // fatter buckets
      (9, 8), (12, 8),                      // more tables
      (12, 16), (12, 32),                   // both
      (6, 4), (3, 8),                       // r11's direction, for the record
    )
    for ((lp, occ) <- grid) {
      val h = Similarity.adaptiveBitsFor(n, occ)
      val t0 = System.nanoTime()
      val nConf = confirmed(lp, occ).count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.Residency.release(spark)
      val mass = cands(lp, occ).count()
      graft.Residency.release(spark)
      val hit = confirmed(lp, occ).join(exact, Seq("vec_a", "vec_b"), "left_semi").count()
      graft.Residency.release(spark)
      require(hit == nConf, s"confirmed pair not in exact baseline at (L=$lp,occ=$occ) — impossible unless the confirm threshold drifted")
      val rec = if (nExact == 0) 1.0 else nConf.toDouble / nExact
      println(f"[sweep-json] {" +
        f""""L":$lp,"occ":$occ,"h":$h,"mass":$mass,"confirmed":$nConf,""" +
        f""""recall_vs_exact":$rec%.4f,"chain_sec":$wall%.2f}""")
    }
    spark.stop()
  }
}
