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
  *
  * Verification split: the MinHash near-dup stage is the only non-SQL-
  * expressible link, so pp01 (full pipeline incl. near-dup) is rows-only
  * while pp02 runs the same pipeline minus near-dup and is hash-checked
  * against a DuckDB CTE chain stage by stage.
  */
object CorpusPipeline {

  final case class StageResult(name: String, kept: DataFrame)

  private val keptLangs = Seq("en", "de", "es", "fr", "zh")

  /** Deterministic stages 0–2: raw → quality gate → exact dedup. */
  def baseStages(spark: SparkSession, dir: String): Seq[StageResult] = {
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

    Seq(
      StageResult("0_raw", docs),
      StageResult("1_quality", quality),
      StageResult("2_exact_dedup", exact),
    )
  }

  /** Language gate: keep the languages with enough surviving mass. */
  def langGate(df: DataFrame): DataFrame =
    df.filter(col("lang").isin(keptLangs: _*))

  /** Full pipeline incl. the MinHash-LSH near-dup stage (pp01). */
  def stages(spark: SparkSession, dir: String): Seq[StageResult] = {
    val base = baseStages(spark, dir)
    val exact = base.last.kept

    // 3. near-dup removal: drop the higher doc_id of every MinHash-LSH pair (dd03)
    val nearPairs = Dedup.minhashPairs(spark, dir, threshold = 0.5)
      .select(col("doc_b").as("doc_id")).distinct()
    val nearDeduped = exact.join(nearPairs, Seq("doc_id"), "left_anti")

    base ++ Seq(
      StageResult("3_near_dedup", nearDeduped),
      StageResult("4_language", langGate(nearDeduped)),
    )
  }

  /** Per-stage survival counts + token budget, then shard fan-out of the
    * final stage. Stage stats are metadata-scale aggregates (one row each).
    */
  private def report(st: Seq[StageResult], shardPrefix: String): DataFrame = {
    val stageStats = st.map { s =>
      s.kept.agg(
        count(lit(1)).as("docs"),
        coalesce(sum(size(split(col("text"), " "))), lit(0)).cast("long").as("tokens"))
        .select(lit(s.name).as("stage"), col("docs"), col("tokens"))
    }.reduce(_ unionByName _)
    val shards = st.last.kept
      .withColumn("shard", pmod(col("doc_id"), lit(8)).cast("long"))
      .groupBy("shard").agg(count(lit(1)).as("docs"))
      .select(concat(lit(shardPrefix), col("shard")).as("stage"),
        col("docs"), lit(null).cast("long").as("tokens"))
    stageStats.unionByName(shards).orderBy("stage")
  }

  val defs: Seq[QueryDef] = Seq(
    // ----- pp01: full pipeline. The near-dup stage is dd03's MinHash-LSH
    // chain, which is now portable integer arithmetic — the oracle replays
    // it (Dedup.minhashCtes) and composes the same stage CTEs as pp02.
    // CorpusPipelineSpec asserts the monotone-survival invariant.
    QueryDef.sql(
      "pp01_corpus_pipeline",
      s"""WITH ${Dedup.minhashCtes},
         |dup AS (SELECT DISTINCT doc_b AS doc_id FROM mest WHERE est_jaccard >= 0.5),
         |raw AS (
         |  SELECT doc_id, text, lang, len(string_split(text, ' ')) AS n_words,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS ttr
         |  FROM documents),
         |quality AS (SELECT * FROM raw WHERE n_words >= 10 AND ttr >= 0.2),
         |exact AS (
         |  SELECT q.* FROM quality q
         |  JOIN (SELECT text, MIN(doc_id) AS keeper FROM quality GROUP BY text) k
         |    ON q.text = k.text AND q.doc_id = k.keeper),
         |near AS (SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM dup)),
         |langk AS (SELECT * FROM near WHERE lang IN ('en','de','es','fr','zh')),
         |stats AS (
         |  SELECT '0_raw' AS stage, COUNT(*) AS docs, COALESCE(SUM(n_words), 0) AS tokens FROM raw
         |  UNION ALL SELECT '1_quality', COUNT(*), COALESCE(SUM(n_words), 0) FROM quality
         |  UNION ALL SELECT '2_exact_dedup', COUNT(*), COALESCE(SUM(n_words), 0) FROM exact
         |  UNION ALL SELECT '3_near_dedup', COUNT(*), COALESCE(SUM(n_words), 0) FROM near
         |  UNION ALL SELECT '4_language', COUNT(*), COALESCE(SUM(n_words), 0) FROM langk
         |  UNION ALL SELECT '5_shard_' || CAST(doc_id % 8 AS VARCHAR), COUNT(*), NULL
         |  FROM langk GROUP BY 1)
         |SELECT stage, CAST(docs AS BIGINT) AS docs, CAST(tokens AS BIGINT) AS tokens
         |FROM stats ORDER BY stage""".stripMargin,
    ) { (spark, dir) =>
      report(stages(spark, dir), shardPrefix = "5_shard_")
    },

    // ----- pp02: the deterministic sub-pipeline (quality → exact-dedup →
    // language → shards), hash-checked stage by stage against a DuckDB CTE
    // chain — closes the oracle gap VERDICT r1 flagged for pp01.
    QueryDef.sql(
      "pp02_corpus_stages_checked",
      """WITH raw AS (
        |  SELECT doc_id, text, lang, len(string_split(text, ' ')) AS n_words,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS ttr
        |  FROM documents),
        |quality AS (SELECT * FROM raw WHERE n_words >= 10 AND ttr >= 0.2),
        |exact AS (
        |  SELECT q.* FROM quality q
        |  JOIN (SELECT text, MIN(doc_id) AS keeper FROM quality GROUP BY text) k
        |    ON q.text = k.text AND q.doc_id = k.keeper),
        |langk AS (SELECT * FROM exact WHERE lang IN ('en','de','es','fr','zh')),
        |stats AS (
        |  SELECT '0_raw' AS stage, COUNT(*) AS docs, COALESCE(SUM(n_words), 0) AS tokens FROM raw
        |  UNION ALL SELECT '1_quality', COUNT(*), COALESCE(SUM(n_words), 0) FROM quality
        |  UNION ALL SELECT '2_exact_dedup', COUNT(*), COALESCE(SUM(n_words), 0) FROM exact
        |  UNION ALL SELECT '3_language', COUNT(*), COALESCE(SUM(n_words), 0) FROM langk
        |  UNION ALL SELECT '4_shard_' || CAST(doc_id % 8 AS VARCHAR), COUNT(*), NULL
        |  FROM langk GROUP BY 1)
        |SELECT stage, CAST(docs AS BIGINT) AS docs, CAST(tokens AS BIGINT) AS tokens
        |FROM stats ORDER BY stage""".stripMargin,
    ) { (spark, dir) =>
      val base = baseStages(spark, dir)
      val st = base :+ StageResult("3_language", langGate(base.last.kept))
      report(st, shardPrefix = "4_shard_")
    },
  )
}
