package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 measurement (VERDICT r12 item 3): extend the dd06 TRUE-recall
  * line to the fourth decade. The full exact baseline (n²/2 cosines) was
  * diag-affordable only to sf3 (1.8 B cosines); at sf10 (n≈200 k, 20 B pairs)
  * the truth side must be SAMPLED — dd14's doctrine applied to ground truth:
  *
  *   - sample S = vectors with avalanche(vec_id) ≡ 0 (mod stride). The hash
  *     sample is deliberate: GenScale replicates planted dup groups with
  *     vec_id strides, so a modular or prefix sample would hit replica
  *     structure and bias the dup rate; the avalanche decorrelates.
  *   - truth(S) = all pairs with ≥1 endpoint in S and uncentered cosine ≥ τ
  *     (|S|·n exact cosines — linear, not quadratic).
  *   - recall estimate = |dd06-candidates ∩ truth(S)| / |truth(S)|, the
  *     per-pair recall over an unbiased pair sample; stderr reported as
  *     sqrt(R(1−R)/|truth(S)|).
  *
  * Prints one [dd06recall-json] line. Also reports the dd15 wide geometry on
  * the same truth sample, so the recall DIAL has a measured fourth-decade
  * point too.
  *
  * Usage: DiagDd06Recall <sfDir> [sampleStride=97]
  */
object DiagDd06Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/testdata/sf10")
    val stride = args.lift(1).map(_.toInt).getOrElse(97)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-diag-dd06-recall")
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

    val e = Tables(spark, sfDir).embeddings.select("vec_id", "embedding")
    val n = CorpusMeta.embeddingCount(spark, sfDir)
    val mu = CorpusMeta.embeddingMeans(spark, sfDir)
    val tau = 0.4

    // two-round multiply/xorshift avalanche over vec_id (the r12 plane-
    // generator fix's recipe — full-width structure, SQL-replayable)
    val av = {
      val v0 = col("vec_id") * lit(2654435761L)
      val v1 = v0.bitwiseXOR(shiftrightunsigned(v0, 13))
      val v2 = (v1 % 16777216L) * lit(2246822519L)
      v2.bitwiseXOR(shiftrightunsigned(v2, 17))
    }
    val sample = e.filter(pmod(av, lit(stride.toLong)) === 0)
      .select(col("vec_id").as("sid"), col("embedding").as("se"))
      .localCheckpoint(true)
    val nS = sample.count()
    println(s"[dd06recall] n=$n sample=$nS (stride $stride)")

    // truth over the sampled endpoints: |S|·n exact cosines, normalized to
    // (vec_a < vec_b) pair identity. COLLECTED to the driver (tens of
    // thousands of id pairs — metadata-scale) and re-created as a local
    // relation: a localCheckpoint here would be freed by the per-arm
    // Residency.release and break the second arm's lineage.
    val truthRows = broadcast(sample).join(e, col("sid") =!= col("vec_id"))
      .select(
        least(col("sid"), col("vec_id")).as("vec_a"),
        greatest(col("sid"), col("vec_id")).as("vec_b"),
        VectorOps.cosine(col("se"), col("embedding")).as("cosine"))
      .filter(col("cosine") >= tau)
      .select("vec_a", "vec_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    graft.Residency.release(spark)
    import spark.implicits._
    val truth = truthRows.toSeq.toDF("vec_a", "vec_b")
    val nTruth = truthRows.length.toLong
    println(s"[dd06recall] truth pairs touching sample: $nTruth")

    def recallOf(label: String, tables: Int, occ: Int): (Long, Double, Double) = {
      val h = Similarity.adaptiveBitsFor(n, occ)
      val bk = Similarity.bucketsFor(e, tables, h, mu)
      val a = bk.toDF("vec_a", "table_id", "bucket")
      val b = bk.toDF("vec_b", "table_id", "bucket")
      val cands = a.join(b, Seq("table_id", "bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct()
      val hit = broadcast(truth).join(cands, Seq("vec_a", "vec_b")).count()
      graft.Residency.release(spark)
      val r = if (nTruth == 0) 0.0 else hit.toDouble / nTruth
      val se = if (nTruth == 0) 0.0 else math.sqrt(r * (1 - r) / nTruth)
      println(f"[dd06recall] $label recall=$r%.4f ± $se%.4f ($hit/$nTruth)")
      (hit, r, se)
    }
    val (h6, r6, se6) = recallOf("dd06 (L=6, occ=8)", 6, 8)
    val (h12, r12, se12) = recallOf("dd15 (L=12, occ=16)", 12, 16)
    println(s"""[dd06recall-json] {"n":$n,"sample":$nS,"stride":$stride,"truth_pairs":$nTruth,""" +
      s""""dd06_recall":$r6,"dd06_se":$se6,"dd06_hits":$h6,""" +
      s""""dd15_recall":$r12,"dd15_se":$se12,"dd15_hits":$h12}""")
    spark.stop()
  }
}
