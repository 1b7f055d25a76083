package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DiagDd02Fine {
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
    def shingles = array_distinct(graft.functions.TextExpressions.wordShingles(col("text")))
    def shAll = docs.select(col("doc_id"), explode(shingles).as("s"))
    val cap = Dedup.ShingleDfCap
    def groupedLists() = shAll.groupBy("s")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) <= cap)

    time("grouped noop (no ckpt)") { groupedLists().write.format("noop").mode("overwrite").save() }
    time("grouped ckpt only") { groupedLists().localCheckpoint(true); () }
    time("ckpt + pairs explode noop") {
      val grouped = groupedLists().localCheckpoint(true)
      grouped.filter(size(col("ds")) >= 2)
        .select(explode(expr(
          "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds) - i - 1), y -> x * 4294967296 + y)))"))
          .as("pk"))
        .write.format("noop").mode("overwrite").save()
    }
    time("ckpt + pairs + agg pk") {
      val grouped = groupedLists().localCheckpoint(true)
      grouped.filter(size(col("ds")) >= 2)
        .select(explode(expr(
          "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds) - i - 1), y -> x * 4294967296 + y)))"))
          .as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    time("full D w/ broadcast n") {
      val grouped = groupedLists().localCheckpoint(true)
      val n = grouped.select(explode(col("ds")).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("ns"))
      val pairs = grouped.filter(size(col("ds")) >= 2)
        .select(explode(expr(
          "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds) - i - 1), y -> x * 4294967296 + y)))"))
          .as("pk"))
      val common = pairs.groupBy("pk").agg(count(lit(1)).as("c"))
        .select(shiftrightunsigned(col("pk"), 32).as("doc_a"),
          col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("doc_b"), col("c"))
      common.join(broadcast(n.toDF("doc_a", "na")), "doc_a")
        .join(broadcast(n.toDF("doc_b", "nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(desc("jaccard"), asc("doc_a"), asc("doc_b"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
