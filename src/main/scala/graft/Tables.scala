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
    val st = Tables.schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(st).parquet(path)
  }

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
  /** Parquet footer schemas by absolute path — see [[Tables.t]]. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()
}
