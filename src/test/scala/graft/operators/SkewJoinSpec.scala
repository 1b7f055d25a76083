package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join result equals plain join (skewed synthetic data)") {
    import spark.implicits._
    // 90% of left rows share one hot key — the classic skew shape
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 50 else 7L, s"l$i"))
      .toDF("k", "lv")
    val right = (0L to 49L).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", salts = 8)
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("salted join on real tables equals plain join") {
    val t = Tables(spark, sf())
    val plain = t.lineitem.join(t.part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = t.lineitem.withColumnRenamed("l_partkey", "k")
    val pt = t.part.withColumnRenamed("p_partkey", "k")
    val salted = SkewJoin.saltedInnerJoin(li, pt, "k", salts = 4)
      .groupBy("p_brand").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
