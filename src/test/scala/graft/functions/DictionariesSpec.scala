package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DictionariesSpec extends SparkSpec {

  test("dictGet map-literal lookup equals broadcast-join lookup") {
    val t = Tables(spark, sf())
    val viaDict = t.nation
      .select(col("n_name"), Dictionaries.dictGet("zone")(col("n_name")).as("zone"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val viaJoin = t.nation
      .join(broadcast(Dictionaries.countryDim(spark)), col("n_name") === col("country"))
      .select(col("n_name"), col("zone"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaDict == viaJoin && viaDict.nonEmpty)
  }

  test("unknown dict attribute is rejected") {
    intercept[IllegalArgumentException] {
      Dictionaries.dictGet("nope")(col("x"))
    }
  }
}
