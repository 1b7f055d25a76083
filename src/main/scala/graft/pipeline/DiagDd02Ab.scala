package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 A/B harness for dd02's pair stage (see DiagDd02's decomposition: the
  * checkpoint + pair join + pair aggregate own ~1.9 of the 2.1 s sf0.1
  * wall). Variants preserve the exact jaccard result (spot-checked in-run
  * against the shipped build):
  *
  *   A — shipped shape (df agg → join → ckpt → self-join → groupBy pair).
  *   B — shipped shape with the pair key PACKED to one BIGINT (q17 r12 win).
  *   C — single-exchange: ONE groupBy(s) collects the per-shingle doc list
  *       (df cap = size filter on it), pairs explode in-row from the sorted
  *       list, per-doc sizes derive from the same grouped frame; no
  *       checkpoint, no join.
  *   D — C but with the pair aggregate keyed on the packed BIGINT.
  *
  * Usage: runMain graft.pipeline.DiagDd02Ab <sfDir> [cpus]
  */
object DiagDd02Ab {
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

    def variantA(): DataFrame = {
      val kept = shAll.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= cap).select("s")
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
        .orderBy(desc("jaccard"), asc("doc_a"), asc("doc_b"))
    }

    def variantB(): DataFrame = {
      val kept = shAll.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= cap).select("s")
      val sh = shAll.join(kept, "s").select("doc_id", "s").localCheckpoint(true)
      val n = sh.groupBy("doc_id").agg(count(lit(1)).as("ns"))
      val a = sh.toDF("doc_a", "s")
      val b = sh.toDF("doc_b", "s")
      val common = a.join(b, Seq("s")).filter(col("doc_a") < col("doc_b"))
        .select(shiftleft(col("doc_a"), 32).bitwiseOR(col("doc_b")).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("c"))
        .select(shiftrightunsigned(col("pk"), 32).as("doc_a"),
          col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("doc_b"), col("c"))
      common.join(n.toDF("doc_a", "na"), "doc_a").join(n.toDF("doc_b", "nb"), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(desc("jaccard"), asc("doc_a"), asc("doc_b"))
    }

    def groupedLists() = shAll.groupBy("s")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) <= cap)

    def variantC(): DataFrame = {
      val grouped = groupedLists().localCheckpoint(true)
      val n = grouped.select(explode(col("ds")).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("ns"))
      val pairs = grouped.filter(size(col("ds")) >= 2)
        .select(explode(expr(
          "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds) - i - 1), y -> struct(x as a, y as b))))"))
          .as("p"))
        .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      val common = pairs.groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
      common.join(n.toDF("doc_a", "na"), "doc_a").join(n.toDF("doc_b", "nb"), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(desc("jaccard"), asc("doc_a"), asc("doc_b"))
    }

    def variantD(): DataFrame = {
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
      common.join(n.toDF("doc_a", "na"), "doc_a").join(n.toDF("doc_b", "nb"), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(desc("jaccard"), asc("doc_a"), asc("doc_b"))
    }

    // correctness spot check: all variants byte-identical to A
    val ref = variantA().collect().toSeq
    for ((n2, v) <- Seq("B" -> variantB _, "C" -> variantC _, "D" -> variantD _)) {
      val got = v().collect().toSeq
      println(s"[diag] variant $n2 matches A: ${got == ref} (rows ${got.size} vs ${ref.size})")
    }
    graft.Residency.release(spark)

    time("A shipped") { variantA().write.format("noop").mode("overwrite").save() }
    time("B packed pair key") { variantB().write.format("noop").mode("overwrite").save() }
    time("C single-exchange lists") { variantC().write.format("noop").mode("overwrite").save() }
    time("D lists + packed key") { variantD().write.format("noop").mode("overwrite").save() }
    time("A shipped (2nd)") { variantA().write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
