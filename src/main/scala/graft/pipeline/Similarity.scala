package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * ann01 is the exact brute-force baseline (oracle-checked); ann02 is the
  * scale path: random-hyperplane LSH bucketing so each query only scores
  * vectors sharing a bucket — candidate count tracks bucket occupancy
  * (n / 2^H per table), not n. At 100 TB the bucket build is one map pass +
  * a bucket-keyed shuffle; brute force would be a full cross join.
  */
object Similarity {

  private val NumQueries = 8 // query set: vec_id < 8

  // L hash tables × H hyperplanes, components from a fixed seed.
  private val L = 6
  private val H = 8
  private val planes: Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(L, H, 64)(rnd.nextGaussian())
  }

  /** (vec_id, table_id, bucket) — one row per vector per hash table.
    * Signature computation is the codegen'd [[graft.functions.HyperplaneBuckets]]
    * kernel; the r1 nested-HOF formulation evaluated ~L×H×dim interpreted
    * lambdas per row and dominated every LSH entry's runtime.
    */
  private[pipeline] def buckets(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      posexplode(graft.functions.LshExpressions.hyperplaneBuckets(col("embedding"), planes)))
      .toDF("vec_id", "table_id", "bucket")

  private def lshTopK(spark: SparkSession, dir: String, multiProbe: Boolean): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val bk = buckets(e).localCheckpoint(true) // 2 consumers; self-freeing
    val qbBase = bk.filter(col("vec_id") < NumQueries).toDF("qid", "table_id", "bucket")
    val qb =
      if (!multiProbe) qbBase
      else qbBase.select(col("qid"), col("table_id"),
        explode(expr(
          s"transform(sequence(-1, ${H - 1}), i -> if(i < 0, bucket, bucket ^ shiftleft(1L, i)))"))
          .as("bucket"))
    val cands = qb.join(bk.toDF("nid", "table_id", "bucket"), Seq("table_id", "bucket"))
      .filter(col("nid") =!= col("qid"))
      .select("qid", "nid").distinct()
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val n = e.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val w = Window.partitionBy("qid").orderBy(desc("cosine"), asc("nid"))
    cands.join(broadcast(q), "qid").join(n, "nid")
      .select(col("qid"), col("nid"), VectorOps.cosine(col("qe"), col("ne")).as("cosine"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 10)
      .select("qid", "rnk", "nid", "cosine")
      .orderBy("qid", "rnk")
  }

  val defs: Seq[QueryDef] = Seq(

    // ----- ann01: exact top-K cosine neighbors, brute force (the correctness
    // baseline). Cosine arithmetic mirrored fold-for-fold in the oracle.
    QueryDef.sql(
      "ann01_topk_bruteforce",
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < $NumQueries),
         |s AS (
         |  SELECT qid, b.vec_id AS nid,
         |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(list_zip(qe, b.embedding),
         |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))), (s1, v) -> s1 + v)
         |    / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(qe,
         |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (s1, v) -> s1 + v))
         |     * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(b.embedding,
         |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (s1, v) -> s1 + v))) AS cosine
         |  FROM q JOIN embeddings b ON b.vec_id <> qid),
         |r AS (SELECT qid, nid, cosine,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS BIGINT) AS rnk FROM s)
         |SELECT qid, rnk, nid, cosine FROM r WHERE rnk <= 10
         |ORDER BY qid, rnk""".stripMargin,
    ) { (spark, dir) =>
      val e = Tables(spark, dir).embeddings
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val b = e.select(col("vec_id").as("nid"), col("embedding").as("ne"))
      val w = Window.partitionBy("qid").orderBy(desc("cosine"), asc("nid"))
      broadcast(q).join(b, col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"), VectorOps.cosine(col("qe"), col("ne")).as("cosine"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 10)
        .select("qid", "rnk", "nid", "cosine")
        .orderBy("qid", "rnk")
    },

    // ----- ann02: LSH-bucketed ANN — candidates share a (table, bucket) key
    // with the query; exact cosine re-rank within candidates only.
    QueryDef.rowsOnly("ann02_topk_lsh") { (spark, dir) =>
      lshTopK(spark, dir, multiProbe = false)
    },

    // ----- ann04: multi-probe LSH — queries additionally probe every
    // Hamming-1 neighbor bucket (one hyperplane sign flipped), recovering
    // most of the recall single-probe loses for ~(H+1)× the candidate reads —
    // still a tiny fraction of a full scan.
    QueryDef.rowsOnly("ann04_topk_lsh_multiprobe") { (spark, dir) =>
      lshTopK(spark, dir, multiProbe = true)
    },

    // ----- ann03: IVF-style coarse quantization, probe=1 — the `label` column
    // plays the role of a trained coarse partition; centroids are per-label
    // mean vectors, each query probes only its nearest centroid's partition.
    // At scale: centroid build is one shuffle on (label, dim); the search scan
    // touches 1/nlist of the data (partition pruning on the inverted list).
    QueryDef.rowsOnly("ann03_ivf_probe1") { (spark, dir) =>
      ivfTopK(spark, dir, probes = 1)
    },

    // ----- ann05: IVF probe-2 — each query searches its two nearest
    // centroids' partitions: ~2× the scan of probe-1, recovers the recall
    // lost when a true neighbor sits just across a partition boundary
    // (the standard nprobe knob; SimilaritySpec asserts recall ≥ probe-1).
    QueryDef.rowsOnly("ann05_ivf_probe2") { (spark, dir) =>
      ivfTopK(spark, dir, probes = 2)
    },
  )

  private def ivfTopK(spark: SparkSession, dir: String, probes: Int): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val centroids = e
      .select(col("label"), posexplode(col("embedding"))).toDF("label", "dim", "v")
      .groupBy("label", "dim").agg(avg("v").as("c"))
      .groupBy("label")
      // cast the double-avg centroid to array<float> for the float-vector
      // kernel — r1 passed the double array straight in and getFloat read
      // garbage off 8-byte slots (caught by the kernel's new type check)
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x.getField("c")).cast("array<float>").as("centroid"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val wAssign = Window.partitionBy("qid").orderBy(desc("ccos"), asc("label"))
    val assigned = q.crossJoin(broadcast(centroids))
      .select(col("qid"), col("qe"), col("label"),
        VectorOps.cosine(col("qe"), col("centroid")).as("ccos"))
      .withColumn("r", row_number().over(wAssign))
      .filter(col("r") <= probes)
      .select("qid", "qe", "label")
    val n = e.select(col("vec_id").as("nid"), col("embedding").as("ne"), col("label"))
    val wRank = Window.partitionBy("qid").orderBy(desc("cosine"), asc("nid"))
    assigned.join(n, Seq("label"))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("label").cast("long").as("probed_label"), col("nid"),
        VectorOps.cosine(col("qe"), col("ne")).as("cosine"))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .filter(col("rnk") <= 10)
      .select("qid", "rnk", "nid", "probed_label", "cosine")
      .orderBy("qid", "rnk")
  }
}
