package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's demo schema (users/products/events/orders —
  * init-scripts/01-create-tables.sql:20–80) materialized as views over the
  * driver testdata, per the FIXTURES.md §C mapping. With these registered, a
  * user of the reference can run their existing ClickHouse SQL (dialect
  * aliases included) through [[graft.sql.SqlGateway]] unchanged.
  */
object DemoSchema {

  def users(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("c_custkey").as("user_id"),
        col("c_name").as("username"),
        col("n_name").as("country"),
        col("c_mktsegment").as("segment"),
        when(col("c_acctbal") >= 5000, 1).otherwise(0).as("is_premium"),
        col("c_acctbal").as("total_spent"))
  }

  def products(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).part.select(
      col("p_partkey").as("product_id"),
      col("p_name").as("product_name"),
      col("p_brand").as("category"),
      col("p_type").as("product_type"),
      col("p_size").as("size"),
      col("p_retailprice").as("price"))

  def events(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events.select(
      col("event_id"),
      col("user_id"),
      col("event_type"),
      col("ts").as("event_timestamp"),
      to_date(col("ts")).as("event_date"),
      col("props").as("page_url"),
      col("value").as("revenue"))

  def orders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders.select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("user_id"),
      col("o_totalprice").as("total_amount"),
      col("o_orderdate").as("order_timestamp"),
      to_date(col("o_orderdate")).as("order_date"),
      // 01-create-tables.sql:75 status enum, mapped from TPC-H order status
      when(col("o_orderstatus") === "F", "completed")
        .when(col("o_orderstatus") === "O", "pending")
        .otherwise("processing").as("status"),
      col("o_orderpriority").as("payment_method"))

  /** Register all four demo views on the session. */
  def register(spark: SparkSession, dir: String): Unit = {
    users(spark, dir).createOrReplaceTempView("users")
    products(spark, dir).createOrReplaceTempView("products")
    events(spark, dir).createOrReplaceTempView("events_demo")
    orders(spark, dir).createOrReplaceTempView("orders_demo")
  }
}
