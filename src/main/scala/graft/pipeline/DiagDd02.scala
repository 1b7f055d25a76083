package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 decomposition of the dd02 ngram-Jaccard core — the most-shared
  * expensive sub-plan in the catalog (dd02 itself, plus ts02 → dd07 → dd11 /
  * sp01 / sp02 / pp03 take it as their edge set, and dd13 recounts it as
  * truth): cumulative probes over [[Dedup.ngramJaccardPairs]]'s stages so
  * the 2.7 s sf0.1 wall attributes to scan/shingle codegen, the df-cap
  * aggregate, the checkpoint, the pair join, or the tail sort. Pairwise
  * deltas, min-of-3, DiagMap pattern.
  *
  * Usage: runMain graft.pipeline.DiagDd02 <sfDir> [cpus]
  */
object DiagDd02 {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; graft.Residency.release(spark)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[diag] $label%-34s min=${runs.min}%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }

    val docs = graft.Tables(spark, dir).documents
    println(s"[diag] docs=${docs.count()}")

    def shingles = array_distinct(graft.functions.TextExpressions.wordShingles(col("text")))
    def shAll = docs.select(col("doc_id"), explode(shingles).as("s"))

    time("scan only") { docs.write.format("noop").mode("overwrite").save() }
    time("scan+shingle explode (shAll)") { shAll.write.format("noop").mode("overwrite").save() }
    time("df agg (kept)") {
      shAll.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= Dedup.ShingleDfCap).select("s")
        .write.format("noop").mode("overwrite").save()
    }
    time("sh join (no ckpt)") {
      val kept = shAll.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= Dedup.ShingleDfCap).select("s")
      shAll.join(kept, "s").select("doc_id", "s")
        .write.format("noop").mode("overwrite").save()
    }
    time("sh localCheckpoint only") {
      val kept = shAll.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= Dedup.ShingleDfCap).select("s")
      shAll.join(kept, "s").select("doc_id", "s").localCheckpoint(true)
      ()
    }
    time("ckpt + pair join + jaccard") {
      val kept = shAll.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= Dedup.ShingleDfCap).select("s")
      val sh = shAll.join(kept, "s").select("doc_id", "s").localCheckpoint(true)
      val n = sh.groupBy("doc_id").agg(count(lit(1)).as("ns"))
      val a = sh.toDF("doc_a", "s")
      val b = sh.toDF("doc_b", "s")
      val common = a.join(b, Seq("s")).filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
      common.join(n.toDF("doc_a", "na"), "doc_a").join(n.toDF("doc_b", "nb"), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    time("full dd02 (with sort)") {
      graft.Catalog.byName("dd02_ngram_jaccard").build(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("full ts02 (dd02 + labelprop)") {
      graft.Catalog.byName("ts02_dedup_clusters").build(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
