package graft.pipeline

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition the individual operators
  * exist for: a training-data pipeline that takes the raw document table
  * through quality filtering, exact and near-dup removal, language selection,
  * and shard assignment, reporting per-stage survival counts and the final
  * token budget.
  *
  * Every stage is one of the already-tested operators (tx02 quality signals,
  * dd01 exact dedup, dd03 MinHash-LSH near-dup, tx01-style language gate);
  * the pipeline itself is pure DataFrame composition — at 100 TB each stage
  * is a pruned scan or a blocking-bounded join, and the stage stats come from
  * metadata-scale aggregates.
  */
object CorpusPipeline {

  final case class StageResult(name: String, kept: DataFrame)

  def stages(spark: SparkSession, dir: String): Seq[StageResult] = {
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))

    // 1. quality gate: length + type-token-ratio floor (tx02 signals)
    val words = split(col("text"), " ")
    val quality = docs
      .withColumn("n_words", size(words))
      .withColumn("ttr", size(array_distinct(words)).cast("double") / size(words))
      .filter(col("n_words") >= 10 && col("ttr") >= 0.2)
      .drop("n_words", "ttr")

    // 2. exact dedup: keep min doc_id per identical text (dd01)
    val keep = quality.groupBy("text").agg(min("doc_id").as("keeper"))
    val exact = quality.join(keep, "text").filter(col("doc_id") === col("keeper")).drop("keeper")

    // 3. near-dup removal: drop the higher doc_id of every MinHash-LSH pair (dd03)
    val nearPairs = Dedup.minhashPairs(spark, dir, threshold = 0.5)
      .select(col("doc_b").as("doc_id")).distinct()
    val nearDeduped = exact.join(nearPairs, Seq("doc_id"), "left_anti")

    // 4. language gate: keep the languages with enough surviving mass
    val langKeep = nearDeduped.filter(col("lang").isin("en", "de", "es", "fr", "zh"))

    Seq(
      StageResult("0_raw", docs),
      StageResult("1_quality", quality),
      StageResult("2_exact_dedup", exact),
      StageResult("3_near_dedup", nearDeduped),
      StageResult("4_language", langKeep),
    )
  }

  val defs: Seq[QueryDef] = Seq(
    // ----- pp01: per-stage survival + final shard/token budget (rows-only:
    // the near-dup stage embeds MinHash). CorpusPipelineSpec asserts the
    // monotone-survival invariant.
    QueryDef.rowsOnly("pp01_corpus_pipeline") { (spark, dir) =>
      val st = stages(spark, dir)
      val stageStats = st.map { s =>
        s.kept.agg(
          count(lit(1)).as("docs"),
          coalesce(sum(size(split(col("text"), " "))), lit(0)).cast("long").as("tokens"))
          .select(lit(s.name).as("stage"), col("docs"), col("tokens"))
      }.reduce(_ unionByName _)
      val shards = st.last.kept
        .withColumn("shard", pmod(col("doc_id"), lit(8)).cast("long"))
        .groupBy("shard").agg(count(lit(1)).as("docs"))
        .select(concat(lit("5_shard_"), col("shard")).as("stage"),
          col("docs"), lit(null).cast("long").as("tokens"))
      stageStats.unionByName(shards).orderBy("stage")
    },
  )
}
