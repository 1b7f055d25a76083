package graft.sql

import graft.SparkSpec

class GatewaySpec extends SparkSpec {

  test("accepts SELECT / WITH / EXPLAIN") {
    assert(SqlGateway.validate("SELECT 1").isRight)
    assert(SqlGateway.validate("  with x as (select 1) select * from x").isRight)
    assert(SqlGateway.validate("EXPLAIN SELECT 1").isRight)
  }

  test("rejects mutations — as statements and smuggled mid-query") {
    assert(SqlGateway.validate("DROP TABLE users").isLeft)
    assert(SqlGateway.validate("INSERT INTO t VALUES (1)").isLeft)
    assert(SqlGateway.validate("SELECT 1; DROP TABLE users").isLeft)
    assert(SqlGateway.validate("select * from t where x = (delete from u)").isLeft)
  }

  test("does not false-positive on column names containing denied substrings") {
    // 'created_date' contains 'create'; word-boundary tokenization must allow it
    assert(SqlGateway.validate("SELECT created_date, updated_at FROM t").isRight)
  }

  test("executes dialect SQL over the testdata views") {
    val df = SqlGateway.execute(spark, sf(),
      "SELECT countIf(o_orderstatus = 'F') AS f, count(*) AS n FROM orders")
    val r = df.collect()(0)
    assert(r.getLong(1) > 0 && r.getLong(0) <= r.getLong(1))
  }

  test("execute refuses a rejected query") {
    intercept[IllegalArgumentException] {
      SqlGateway.execute(spark, sf(), "DROP TABLE orders")
    }
  }
}
