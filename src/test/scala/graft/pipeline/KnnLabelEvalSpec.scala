package graft.pipeline

import graft.{Catalog, SparkSpec}
import org.apache.spark.sql.functions._

/** knn01 label-noise screen: a planted corpus of two well-separated clusters
  * where one query vector carries the WRONG label — its 10 nearest neighbors
  * majority-vote the other label, so it must land in `n_flagged`; the
  * correctly-labeled queries must land in `n_correct`.
  */
class KnnLabelEvalSpec extends SparkSpec {

  private def vec(axis: Int, jitter: Float): Array[Float] = {
    val a = Array.fill(64)(0.0f)
    a(axis) = 1.0f
    a(63) = jitter // tiny distinct tail component — breaks exact cosine ties
    a
  }

  test("mislabeled vector is flagged by the kNN majority, clean queries pass") {
    import spark.implicits._
    // Cluster A on axis 0 (label 0): fillers 1..11 + query vec_id 0.
    // Cluster B on axis 1 (label 1): fillers 41..52 + query vec_id 40.
    // vec_id 20: cluster-A GEOMETRY but label 1 — the planted mislabel.
    val rows =
      Seq((0L, vec(0, 0.001f), 0)) ++
        (1L to 11L).map(i => (i, vec(0, 0.001f * (i + 1)), 0)) ++
        Seq((20L, vec(0, 0.013f), 1)) ++
        Seq((40L, vec(1, 0.001f), 1)) ++
        (41L to 52L).map(i => (i, vec(1, 0.001f * (i - 39)), 1))
    val dir = java.nio.file.Files.createTempDirectory("knn01_planted").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Catalog.byName("knn01_knn_label_eval").build(spark, dir)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // label 0: one query (vec 0), neighbors all label 0 -> correct
    assert(r(0L) == ((1L, 1L, 0L)), s"label 0 row: ${r(0L)}")
    // label 1: two queries - vec 40 correct, vec 20 flagged as noise
    assert(r(1L) == ((2L, 1L, 1L)), s"label 1 row: ${r(1L)}")
  }

  test("per-label counts reconcile and cover the query slice on sf0.001") {
    val out = Catalog.byName("knn01_knn_label_eval").build(spark, sf())
    val rows = out.collect()
    rows.foreach { x =>
      assert(x.getLong(1) == x.getLong(2) + x.getLong(3),
        s"n_queries != n_correct + n_flagged in $x")
    }
    val nQueries = rows.map(_.getLong(1)).sum
    val expected = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .filter(col("vec_id") % 20 === 0).count()
    assert(nQueries == expected, s"query slice $nQueries != $expected")
  }
}
