package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins (100 TB posture, SURVEY §7.4).
  *
  * First line of defense is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default with AQE — Bench
  * enables AQE). This helper is the explicit fallback for the cases AQE can't
  * fix: a shuffle hash/sort-merge join where one build-side key holds a
  * disproportionate share of rows and the other side is too large to
  * broadcast. Standard salting: the skewed (large) side gets a uniform random
  * salt in [0, n); the other side is replicated n× with every salt value, so
  * the join key becomes (key, salt) and the hot key spreads across n tasks.
  */
object SkewJoin {

  /** Inner equi-join `left.key == right.key` with the LEFT side salted and the
    * RIGHT side replicated `salts`×. Semantically identical to the plain join;
    * the salt column never escapes.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    // deterministic salt: spread rows by a hash of the full row id-ish columns
    // (monotonically_increasing_id is partition-stable, not content-stable;
    // prefer hashing the row's own columns)
    val saltCol: Column = pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(salts)).cast("int")
    val saltedLeft = left.withColumn("__salt", saltCol)
    val saltsDf = left.sparkSession.range(salts).select(col("id").cast("int").as("__salt"))
    val replicatedRight = right.crossJoin(broadcast(saltsDf))
    saltedLeft
      .join(replicatedRight, Seq(key, "__salt"))
      .drop("__salt")
  }
}
