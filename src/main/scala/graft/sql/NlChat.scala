package graft.sql

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Engine-side contract of the reference's NL→SQL chat service
  * (chat_service.py — SURVEY.md §2.10/§3.3): everything except the model
  * call. The reference builds a schema prompt (:145–177), extracts SQL from
  * the model's fenced response (:379–387), validates SELECT-only (:126–143)
  * and executes. Those three steps are engine responsibilities and live here;
  * any LLM (the reference uses a local Llama via Ollama) plugs in between
  * [[schemaPrompt]] and [[answer]].
  */
object NlChat {

  /** Schema prompt for the model: table + column/type listing derived from
    * the live schemas, so the prompt never drifts from the data.
    */
  def schemaPrompt(spark: SparkSession, dir: String): String = {
    val t = Tables(spark, dir)
    val tables = Seq(
      "region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
      "lineitem" -> t.lineitem, "events" -> t.events, "documents" -> t.documents)
    val ddl = tables.map { case (name, df) =>
      val cols = df.schema.fields
        .map(f => s"  ${f.name} ${f.dataType.simpleString}").mkString(",\n")
      s"TABLE $name (\n$cols\n)"
    }.mkString("\n\n")
    s"""You translate analytics questions into a single SQL SELECT statement.
       |Use only these tables and columns:
       |
       |$ddl
       |
       |Rules: output one SELECT statement inside a ```sql fence; no DDL/DML;
       |ClickHouse-style helpers toDate/toHour/toYYYYMM/countIf/sumIf/uniq are available.
       |""".stripMargin
  }

  /** Extract the SQL statement from a model response: prefer a ```sql fenced
    * block, fall back to the first SELECT-prefixed line run (chat_service.py:379–387).
    */
  def extractSql(response: String): Option[String] = {
    val fence = "(?s)```(?:sql)?\\s*(.*?)```".r
    fence.findFirstMatchIn(response).map(_.group(1).trim)
      .orElse {
        val idx = response.toLowerCase.indexOf("select")
        if (idx >= 0) Some(response.substring(idx).takeWhile(_ != ';').trim) else None
      }
      .filter(_.nonEmpty)
  }

  /** Full answer path: extract → validate → translate dialect → execute. */
  def answer(spark: SparkSession, dir: String, modelResponse: String): DataFrame =
    extractSql(modelResponse) match {
      case None => throw new IllegalArgumentException("no SQL found in model response")
      case Some(sql) => SqlGateway.execute(spark, dir, sql)
    }
}
