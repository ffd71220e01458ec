package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.GraftExtensions

/** cosine_similarity as a SQL-addressable function (SparkSessionExtensions
  * injection for new sessions; late FunctionRegistry registration for a
  * running one). */
class ExtensionsSpec extends SparkSpec {

  test("registered SQL function matches the Column API expression") {
    GraftExtensions.register(spark)
    val sql = spark.sql(
      """SELECT cosine_similarity(
        |  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)),
        |  array(CAST(3.0 AS FLOAT), CAST(2.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c
        |""".stripMargin).collect().head.getDouble(0)
    val expected = (3.0 + 4.0 + 3.0) / 14.0 // dot / (|a||b|), |a|=|b|=sqrt(14)
    assert(math.abs(sql - expected) < 1e-12)
  }

  test("zero-norm input yields 0.0 via SQL") {
    GraftExtensions.register(spark)
    val v = spark.sql(
      """SELECT cosine_similarity(
        |  array(CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS c
        |""".stripMargin).collect().head.getDouble(0)
    assert(v == 0.0)
  }

  test("extensions class injects the function builder without error") {
    // The conf-driven path (spark.sql.extensions) applies at session
    // construction; here we exercise the injection hook directly.
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
