package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata (TESTDATA.md / FIXTURES.md §B).
  *
  * Design notes (100 TB posture):
  *   - Pure `spark.read.parquet` scans — Catalyst handles column pruning and
  *     predicate pushdown into the parquet reader, so every query in the
  *     catalog only pays for the columns/rows it touches.
  *   - Dimension tables (`region`, `nation`, `supplier`, `part`) are small by
  *     construction (TPC-H star schema); join helpers in the catalog wrap them
  *     in `broadcast()` so fact-side shuffles never include dimension data.
  */
final case class Tables(spark: SparkSession, dir: String) {
  /** r15 (guide §1.2 "per-task work" / §7.3 driver latency): every bare
    * `spark.read.parquet(path)` runs a 1-task footer-read JOB at DataFrame
    * BUILD time to infer the schema — DiagStages measured 3 such jobs plus
    * their driver gaps ≈ 150 ms at the head of q15's 1.9 s wall, paid again
    * on every rebuild of every entry (the bench rebuilds each entry 3×).
    * The testdata files are immutable for a process lifetime, so the schema
    * is cached per path JVM-wide and handed to the reader explicitly —
    * plans unchanged (schema identical), the inference job simply never
    * runs again. NOT result caching: only the parquet footer's StructType
    * is held (~KB per table).
    */
  private def t(name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val meta = Tables.metaCache.computeIfAbsent(path, { p =>
      val st = spark.read.parquet(p).schema
      val rowGroups = Tables.rowGroupCount(spark, p)
      val bytes = try new java.io.File(p).length() catch { case _: Throwable => 0L }
      Tables.TableMeta(st, rowGroups, bytes)
    })
    spark.read.schema(meta.schema).parquet(path)
  }

  /** r15 (guide §2.5 "one huge unsplittable file"): parquet scans split at
    * ROW-GROUP granularity, and every sf0.1 testdata file is a single row
    * group — so every map-side stage over these tables runs on ONE task
    * regardless of core count (DiagStages: pp03's redact+gate stage,
    * 2.83 s wall / 2.82 s cpu, 1 task on a 32-core session; localCheckpoint
    * then pins the 1-partition layout for the rest of the chain). For a
    * KERNEL-HEAVY MAP consumer (regex scrubbing, shingle/signature builds,
    * per-pair vector kernels) a hash repartition to the session parallelism
    * restores the lost cores for one small exchange.
    *
    * Deliberately OPT-IN per call site, never blanket: a measured blanket
    * version (applied inside [[t]]) ran the catalog 2× SLOWER — for
    * agg-first consumers the inserted exchange ships raw rows that map-side
    * partial aggregation previously never shuffled (guide §2.3 "aggregate
    * before you shuffle"), e.g. prof01's per-column distincts went
    * 0.33 → 1.9 s. Hash partitioning on the id column, not keyless
    * round-robin — keyless repartition local-sorts its whole input for
    * retry determinism (sortBeforeRepartition), serial on the single scan
    * task; hash placement is deterministic without the sort.
    *
    * Scale-adaptive: GenScale/production files carry 8 MB row groups, so
    * rowGroups ≥ cores/2 there and this is the identity — plans unchanged,
    * scan-level pushdown preserved exactly where it matters. The target
    * tracks defaultParallelism, so the driver's low-core runs get
    * proportionally fewer partitions.
    */
  private def widen(df: DataFrame, name: String, key: String): DataFrame = {
    if (sys.env.getOrElse("SPARK_GRAFT_WIDEN", "on") == "off") return df // A/B control
    val parallel = spark.sparkContext.defaultParallelism
    val meta = Tables.metaCache.get(s"$dir/$name.parquet")
    if (meta != null && meta.rowGroups > 0 && meta.rowGroups < (parallel + 1) / 2)
      df.repartition(parallel, df.col(key))
    else df
  }

  /** [[documents]] with scan parallelism restored for kernel-heavy map
    * chains — see [[widen]].
    */
  def documentsWide: DataFrame = widen(documents, "documents", "doc_id")

  /** [[embeddings]] with scan parallelism restored — see [[widen]]. */
  def embeddingsWide: DataFrame = widen(embeddings, "embeddings", "vec_id")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. The values are µs-grain (verified: ns%1000==0
    * at every sf), so read nanos as long and rebuild a microsecond timestamp —
    * lossless, and identical to what DuckDB's TIMESTAMP_NS sees.
    *
    * GenScale-produced directories store `ts` as TIMESTAMP(MICROS) instead
    * (Spark cannot write the NANOS physical type), which the reader surfaces
    * as TimestampType directly — detect by schema and skip the rebuild.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t("events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // GenScale layout: naive micros; session tz is UTC so this cast is
        // an exact instant-preserving retype to the TimestampType the
        // catalog expects
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** 1-row anchor frame holding `max(ts)` over events — the deterministic
    * stand-in for `now()` (SURVEY.md §7.4: never wall-clock in oracle-checked
    * queries). Joined in via broadcast cross-join so it stays in-plan.
    */
  def eventAnchor: DataFrame = events.agg(max(col("ts")).as("anchor_ts"))

  /** Same for orders ( `max(o_orderdate)` ). */
  def orderAnchor: DataFrame = orders.agg(max(col("o_orderdate")).as("anchor_dt"))
}

object Tables {
  final case class TableMeta(schema: org.apache.spark.sql.types.StructType,
      rowGroups: Int, bytes: Long)

  /** Parquet footer metadata (schema + row-group count) by absolute path —
    * see [[Tables.t]]. Metadata only, never data.
    */
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, TableMeta]()

  /** Row groups in the parquet file — a driver-side footer read (~ms), done
    * once per path per JVM. −1 when unreadable (no repartition then).
    */
  private def rowGroupCount(spark: SparkSession, path: String): Int =
    try {
      val conf = spark.sessionState.newHadoopConf()
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(path), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try reader.getFooter.getBlocks.size finally reader.close()
    } catch { case _: Throwable => -1 }
}
