package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 measurement (VERDICT r11 item 1): the last recall-lossless lever
  * on dd06's fourth decade — a Hamming-signature prefilter on the exact-
  * cosine confirm. Sign-random-projection theory: for hyperplane bits,
  * P[bit differs] = θ(a,b)/π, so the Hamming distance over T fresh gate bits
  * estimates the angle and `ham ≤ T·(acos(τ)/π + δ)` keeps a true-dup pair
  * (cos ≥ τ) with miss probability ≤ exp(−2Tδ²) (Hoeffding — the bits are
  * i.i.d. Bernoulli w.r.t. the plane draw, and the gate tables are FRESH,
  * disjoint from the bucketing tables, so bucket-match conditioning doesn't
  * contaminate the bound).
  *
  * Phase 1 (always): joint (hamming, is-dup) histogram over ALL dd06
  * candidates at gate widths 120/240/480 bits — from one pass, the
  * mass-kept/recall curve of EVERY (width, D) gate is computable offline.
  * Phase 2 (with gateTables+D args): isolated wall A/B — the gated chain
  * (gate applied MAP-SIDE before the candidate-dedup exchange, dd14's
  * architecture with a deterministic gate instead of a sample) vs the
  * shipping ungated chain, plus result-set equality check.
  *
  * Usage: DiagDd06Prefilter <sfDir> [uncentered] [gateTables D]
  */
object DiagDd06Prefilter {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    // phase-1b (r12): "uncentered" re-runs the histogram with ZERO-threshold
    // gate planes. The centered-gate histogram falsified the centered family:
    // the buckets condition candidates on small MEAN-CENTERED angle (the
    // bucketing planes' own metric), so centered gate bits measure the very
    // quantity the buckets already selected for and separate nothing; the
    // confirm threshold lives in the UNCENTERED cosine's metric, which only
    // zero-threshold planes estimate.
    // "uncentered" is a consumed flag (r12 ADVICE: the old positional read
    // made `<sfDir> uncentered <n>` throw and barred gate-mode composition).
    val rest0 = args.drop(1)
    val uncentered = rest0.headOption.contains("uncentered")
    val rest = if (uncentered) rest0.drop(1) else rest0
    val gate = rest.length match {
      case 0 => None
      case 2 => Some((rest(0).toInt, rest(1).toInt))
      case _ => sys.error(
        s"usage: DiagDd06Prefilter <sfDir> [uncentered] [gateTables D] — got: ${args.mkString(" ")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-diag-dd06-prefilter")
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
    val h = Similarity.adaptiveBits(n)
    println(s"[prefilter] n=$n h=$h")

    def cands(): DataFrame = {
      val bk = Similarity.buckets(e, h, mu)
      val a = bk.toDF("vec_a", "table_id", "bucket")
      val b = bk.toDF("vec_b", "table_id", "bucket")
      a.join(b, Seq("table_id", "bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct()
    }
    val ea = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val eb = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))

    gate match {
      case None =>
        // ---- Phase 1: joint (ham, dup) histogram at 6/12/24 gate tables
        val gateMu = if (uncentered) Array.fill(64)(0.0) else mu
        val gs = Similarity.gateSigs(e, 24, gateMu).localCheckpoint(true)
        val ga = gs.toDF("vec_a", "ga")
        val gb = gs.toDF("vec_b", "gb")
        import graft.functions.LshExpressions.xorPopcount
        val scored = cands()
          .join(ga, "vec_a").join(gb, "vec_b")
          .join(ea, "vec_a").join(eb, "vec_b")
          .select(
            xorPopcount(slice(col("ga"), 1, 6), slice(col("gb"), 1, 6)).as("ham120"),
            xorPopcount(slice(col("ga"), 1, 12), slice(col("gb"), 1, 12)).as("ham240"),
            xorPopcount(col("ga"), col("gb")).as("ham480"),
            (VectorOps.cosine(col("ea"), col("eb")) >= 0.4).as("dup"),
            floor(VectorOps.cosine(col("ea"), col("eb")) * 20).as("cosbin"))
          .localCheckpoint(true)
        // candidate uncentered-cosine distribution (the confirm metric's view
        // of the bucket-conditioned population — what any gate must separate)
        scored.groupBy("cosbin").agg(count(lit(1)).as("pairs"))
          .orderBy("cosbin").collect()
          .foreach(r => println(s"""[prefilter-cos-json] {"cosbin":${r.get(0)},"pairs":${r.getLong(1)}}"""))
        for (w <- Seq(120, 240, 480)) {
          val rows = scored.groupBy(col(s"ham$w").as("ham"))
            .agg(count(lit(1)).as("pairs"),
              sum(when(col("dup"), 1L).otherwise(0L)).as("dups"))
            .orderBy("ham").collect()
          rows.foreach { r =>
            println(s"""[prefilter-json] {"width":$w,"ham":${r.get(0)},"pairs":${r.getLong(1)},"dups":${r.getLong(2)}}""")
          }
        }

      case Some((gt, d)) =>
        // ---- Phase 2: wall A/B, gate applied BEFORE the candidate-dedup
        // exchange (map-side on the bucket join's output)
        import graft.functions.LshExpressions.xorPopcount
        def confirmedOf(c: DataFrame): DataFrame =
          c.join(ea, "vec_a").join(eb, "vec_b")
            .select(col("vec_a"), col("vec_b"),
              VectorOps.cosine(col("ea"), col("eb")).as("cosine"))
            .filter(col("cosine") >= 0.4)
            .select("vec_a", "vec_b")
        def gatedCands(): DataFrame = {
          val gs = Similarity.gateSigs(e, gt, mu)
          val bk2 = Similarity.buckets(e, h, mu).join(gs, "vec_id")
          val a = bk2.toDF("vec_a", "table_id", "bucket", "ga")
          val b = bk2.toDF("vec_b", "table_id", "bucket", "gb")
          a.join(b, Seq("table_id", "bucket"))
            .filter(col("vec_a") < col("vec_b"))
            .filter(xorPopcount(col("ga"), col("gb")) <= d)
            .select("vec_a", "vec_b").distinct()
        }
        val reps = sys.env.getOrElse("SPARK_GRAFT_DIAG_REPS", "3").toInt
        def time(label: String)(mk: () => DataFrame): (Double, Long) = {
          var best = Double.MaxValue
          var rows = 0L
          for (_ <- 1 to reps) {
            val t0 = System.nanoTime()
            rows = mk().count()
            val w = (System.nanoTime() - t0) / 1e9
            graft.Residency.release(spark)
            best = math.min(best, w)
          }
          println(f"[prefilter] $label rows=$rows wall_min=$best%.2f s (of $reps)")
          (best, rows)
        }
        val (wBase, nBase) = time("ungated")(() => confirmedOf(cands()))
        val (wGate, nGate) = time(s"gated(T=${gt * 20},D=$d)")(() => confirmedOf(gatedCands()))
        val (mBase, _) = time("ungated-mass")(() => cands())
        val (mGate, _) = time("gated-mass")(() => gatedCands())
        val missed = confirmedOf(cands())
          .join(confirmedOf(gatedCands()), Seq("vec_a", "vec_b"), "left_anti").count()
        println(s"""[prefilter-ab-json] {"gate_tables":$gt,"bits":${gt * 20},"D":$d,""" +
          s""""confirmed_base":$nBase,"confirmed_gated":$nGate,"missed_dups":$missed,""" +
          s""""wall_base":$wBase,"wall_gated":$wGate,"mass_wall_base":$mBase,"mass_wall_gated":$mGate}""")
    }
    spark.stop()
  }
}
