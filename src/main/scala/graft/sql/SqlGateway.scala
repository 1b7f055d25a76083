package graft.sql

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.Dialect

/** Ad-hoc SQL entry point (SURVEY.md §2.10/§3.3): the reference exposes raw
  * SELECT execution to its UI and NL-chat service behind an allowlist
  * validator (app_interactive.py:268–276, chat_service.py:126–143 — which it
  * implements with unsafe substring checks; we use word-boundary token
  * matching instead). Spark SQL supplies the parser; the ClickHouse dialect
  * names come from [[Dialect]].
  */
object SqlGateway {

  private val allowedStarts = Seq("select", "with", "show", "describe", "explain")
  private val deniedTokens = Set(
    "insert", "update", "delete", "drop", "alter", "create",
    "truncate", "merge", "grant", "revoke", "refresh", "vacuum")

  /** Validate: must start with an allowed verb; no mutating token anywhere. */
  def validate(sql: String): Either[String, String] = {
    val trimmed = sql.trim
    val lowered = trimmed.toLowerCase
    if (!allowedStarts.exists(lowered.startsWith))
      Left(s"only ${allowedStarts.mkString("/")} statements are allowed")
    else {
      val tokens = lowered.split("[^a-z_]+").toSet
      val bad = tokens.intersect(deniedTokens)
      if (bad.nonEmpty) Left(s"forbidden keyword(s): ${bad.toSeq.sorted.mkString(", ")}")
      else Right(trimmed)
    }
  }

  /** Register the testdata tables as temp views + dialect functions, then run. */
  def execute(spark: SparkSession, dir: String, sql: String): DataFrame =
    validate(sql) match {
      case Left(err) => throw new IllegalArgumentException(s"rejected query: $err")
      case Right(q) =>
        val t = Tables(spark, dir)
        Seq(
          "region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
          "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
          "lineitem" -> t.lineitem, "events" -> t.events,
          "documents" -> t.documents, "embeddings" -> t.embeddings,
        ).foreach { case (n, df) => df.createOrReplaceTempView(n) }
        Dialect.register(spark)
        spark.sql(Dialect.translate(q))
    }

  val defs: Seq[QueryDef] = Seq(

    // ----- sq01: a ClickHouse-dialect query through the gateway — toYYYYMM /
    // countIf / sumIf / toDate resolve via the injected aliases; the oracle is
    // the ANSI equivalent.
    QueryDef.sql(
      "sq01_adhoc_dialect_sql",
      """SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS order_month,
        |  COUNT(*) AS orders,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS fulfilled,
        |  CAST(COALESCE(SUM(CASE WHEN o_totalprice > 100000
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS big_order_revenue
        |FROM orders
        |GROUP BY 1
        |ORDER BY order_month""".stripMargin,
    ) { (spark, dir) =>
      execute(spark, dir,
        """SELECT CAST(toYYYYMM(o_orderdate) AS BIGINT) AS order_month,
          |  count(*) AS orders,
          |  countIf(o_orderstatus = 'F') AS fulfilled,
          |  CAST(sumIf(CAST(o_totalprice AS DECIMAL(18,2)), o_totalprice > 100000) AS DOUBLE) AS big_order_revenue
          |FROM orders
          |GROUP BY 1
          |ORDER BY order_month""".stripMargin)
    },
  )
}
