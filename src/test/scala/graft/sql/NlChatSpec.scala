package graft.sql

import graft.SparkSpec

class NlChatSpec extends SparkSpec {

  test("schema prompt lists every table with live column names") {
    val p = NlChat.schemaPrompt(spark, sf())
    Seq("TABLE lineitem", "l_extendedprice double", "TABLE events", "event_type string")
      .foreach(s => assert(p.contains(s), s"missing '$s'"))
  }

  test("extracts SQL from fenced and unfenced model responses") {
    assert(NlChat.extractSql("Here you go:\n```sql\nSELECT 1\n```\nhope it helps")
      .contains("SELECT 1"))
    assert(NlChat.extractSql("```\nselect count(*) from orders\n```")
      .contains("select count(*) from orders"))
    assert(NlChat.extractSql("Sure! SELECT c_name FROM customer; anything else?")
      .contains("SELECT c_name FROM customer"))
    assert(NlChat.extractSql("I cannot answer that").isEmpty)
  }

  test("answers a canned model response end-to-end (dialect included)") {
    val df = NlChat.answer(spark, sf(),
      "```sql\nSELECT countIf(o_orderstatus = 'F') AS f, count() AS n FROM orders\n```")
    val r = df.collect()(0)
    assert(r.getLong(1) > 0 && r.getLong(0) <= r.getLong(1))
  }

  test("a malicious model response is rejected by the gateway") {
    intercept[IllegalArgumentException] {
      NlChat.answer(spark, sf(), "```sql\nDROP TABLE orders\n```")
    }
  }
}
