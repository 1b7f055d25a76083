package graft.functions

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dictionary enrichment (SURVEY.md §2.1 S7, §2.3 J9): the reference declares
  * in-memory key→attribute dictionaries from inline literal relations
  * (06-add-dictionaries.sql.disabled) and reads them with `dictGet`.
  *
  * Two equivalent Spark forms, both O(1) per probe:
  *   - [[dictGet]]: a map-literal expression — true function-call ergonomics,
  *     no join in the plan at all (the map constant ships inside the codegen'd
  *     task binary);
  *   - a broadcast hash join against [[countryMetadata]] as a constant
  *     DataFrame — better when many attributes are needed at once.
  */
object Dictionaries {

  /** Inline constant relation: nation → (zone, currency, tz_offset).
    * Deterministic synthetic metadata over the testdata's NATION_0..24 domain
    * (stand-in for the reference's 10-country metadata dict, 06:84–95).
    */
  val countryMetadata: Seq[(String, String, String, Int)] =
    (0 until 25).map(i => (s"NATION_$i", s"ZONE_${i % 5}", s"CUR_${i % 7}", i % 24 - 11))

  /** Constant relation as a DataFrame (UNION-ALL-of-literals equivalent). */
  def countryDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    countryMetadata.toDF("country", "zone", "currency", "tz_offset")
  }

  private val zoneMap: Map[String, String] =
    countryMetadata.map(r => r._1 -> r._2).toMap
  private val currencyMap: Map[String, String] =
    countryMetadata.map(r => r._1 -> r._3).toMap

  /** `dictGet('dict_country', attr, key)` — map-literal lookup expression. */
  def dictGet(attr: String)(key: Column): Column = attr match {
    case "zone" => element_at(typedLit(zoneMap), key)
    case "currency" => element_at(typedLit(currencyMap), key)
    case other => throw new IllegalArgumentException(s"unknown dict attribute '$other'")
  }

  val defs: Seq[QueryDef] = Seq(
    // ----- qd01: revenue by dictionary-derived zone — Spark side probes the
    // map literal (no join node); the oracle joins an inline VALUES relation.
    QueryDef.sql(
      "qd01_dict_zone_revenue", {
        val valuesRows = countryMetadata
          .map { case (c, z, _, _) => s"('$c', '$z')" }.mkString(", ")
        s"""SELECT d.zone,
           |  COUNT(*) AS n_orders,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |FROM orders
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN (VALUES $valuesRows) AS d(country, zone) ON n_name = d.country
           |GROUP BY d.zone
           |ORDER BY d.zone""".stripMargin
      },
    ) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_nationkey")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(dictGet("zone")(col("n_name")).as("zone"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("zone")
    },
  )
}
