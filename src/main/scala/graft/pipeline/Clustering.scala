package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-means topic clustering over the embedding column (Lloyd iterations with
  * cosine affinity) — the unsupervised sibling of the IVF coarse quantizer
  * ([[Similarity]]): instead of trusting the `label` column, learn the
  * partitions.
  *
  * Iteration shape at 100 TB: centroids are k×dim floats — always broadcast;
  * one Lloyd step is a map-side assignment (broadcast nested-loop over k,
  * then the codegen'd cosine kernel) plus ONE shuffle keyed (cluster, dim)
  * for the centroid recompute. Iterations are a driver-side loop over that
  * plan — k-means on a 1000-executor cluster is exactly this per round.
  *
  * Oracle parity: seeds are the first k vectors (deterministic); recomputed
  * centroid dims are double averages cast to FLOAT — the float rounding
  * absorbs the sub-ulp double-summation-order differences between engines
  * (the ann03/ann05 tactic), after which every cosine is bit-identical.
  */
object Clustering {

  private val K = 8

  private def assign(e: DataFrame, cent: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(desc("ccos"), asc("cluster"))
    e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("embedding"), col("cluster"),
        VectorOps.cosine(col("embedding"), col("centroid")).as("ccos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "embedding", "cluster", "ccos")
  }

  private def recompute(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster"), posexplode(col("embedding"))).toDF("cluster", "dim", "v")
      .groupBy("cluster", "dim").agg(avg("v").as("c"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x.getField("c")).cast("array<float>").as("centroid"))

  /** One Lloyd iteration from deterministic seeds, then the final assignment:
    * (vec_id, cluster, cosine). More iterations = more calls to
    * assign/recompute in the driver loop; one is enough to oracle-check the
    * full machinery (both phases, both shuffles).
    */
  def kmeansAssign(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
    val seed = e.filter(col("vec_id") < K)
      .select(col("vec_id").as("cluster"), col("embedding").as("centroid"))
    val cent1 = recompute(assign(e, seed))
    assign(e, cent1)
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
        col("ccos").as("cosine"))
      .orderBy("vec_id")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "km01_kmeans_assign",
      s"""WITH cent0 AS (SELECT vec_id AS cluster, embedding AS centroid
         |  FROM embeddings WHERE vec_id < $K),
         |s1 AS (SELECT e.vec_id, e.embedding, c.cluster,
         |    ${Similarity.cosSql("e.embedding", "c.centroid")} AS ccos
         |  FROM embeddings e, cent0 c),
         |a1 AS (SELECT vec_id, embedding, cluster FROM (
         |    SELECT vec_id, embedding, cluster,
         |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cluster) AS rn
         |    FROM s1) WHERE rn = 1),
         |dim1 AS (SELECT cluster, t.d, AVG(CAST(embedding[t.d] AS DOUBLE)) AS c
         |  FROM a1, generate_series(1, 64) t(d) GROUP BY 1, 2),
         |cent1 AS (SELECT cluster, list(CAST(c AS FLOAT4) ORDER BY d) AS centroid
         |  FROM dim1 GROUP BY 1),
         |s2 AS (SELECT e.vec_id, c.cluster,
         |    ${Similarity.cosSql("e.embedding", "c.centroid")} AS ccos
         |  FROM embeddings e, cent1 c)
         |SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, ccos AS cosine FROM (
         |  SELECT vec_id, cluster, ccos,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cluster) AS rn
         |  FROM s2) WHERE rn = 1
         |ORDER BY vec_id""".stripMargin,
    ) { (spark, dir) => kmeansAssign(spark, dir) },
  )
}
