package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for scan+map entries (tx05-class): times each prefix
  * of the normalize pipeline separately so serial-scan, kernel, and
  * sort-sampling costs attribute. Usage:
  * runMain graft.tools.DiagMap <sfDir> [cpus]
  */
object DiagMap {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](label: String)(f: => A): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[diag] $label%-28s min=${runs.min}%.2f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }

    val docs = graft.Tables(spark, dir).documents
    println(s"[diag] scan partitions = ${docs.rdd.getNumPartitions}")

    time("scan only (noop)") {
      docs.write.format("noop").mode("overwrite").save()
    }
    val clean = docs.select(col("doc_id"), col("lang"),
      trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")).as("clean"))
    time("scan+regex (noop)") {
      clean.write.format("noop").mode("overwrite").save()
    }
    val kept = clean.withColumn("kept",
      graft.functions.TextExpressions.filterNotInSet(split(col("clean"), " "),
        Seq("the", "a", "of", "and", "to", "in", "is"))) // tx05's stopEn
    time("scan+regex+kernel (noop)") {
      kept.write.format("noop").mode("overwrite").save()
    }
    val full = kept.select(col("doc_id"), col("lang"),
      length(col("clean")).cast("long").as("clean_chars"),
      size(col("kept")).cast("long").as("kept_words"),
      concat_ws(" ", slice(col("kept"), 1, 8)).as("preview"))
    time("full minus sort (noop)") {
      full.write.format("noop").mode("overwrite").save()
    }
    time("full with orderBy (noop)") {
      full.orderBy("doc_id").write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
