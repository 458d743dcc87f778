package graft

/** Native cosine_sim expression: codegen path correctness + SQL-text
  * registration through SparkSessionExtensions (bound on the shared
  * session — extensions only apply at session build time). */
class FunctionsSpec extends SparkSpec {

  test("cosine_sim is callable from SQL via SparkSessionExtensions and is exact") {
    val r = spark.sql(
      """SELECT cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |                  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c1,
        |       cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |                  CAST(array(0.0, 2.0) AS ARRAY<FLOAT>)) AS c0
        |""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
  }

  test("Column API matches the interpreted higher-order-function formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(-1.0f, 0.5f, 2.0f)))
      .toDF("a", "b")
    val native = df.select(graft.functions.functions.cosine_sim(col("a"), col("b")))
      .head().getDouble(0)
    val hof = df.selectExpr(
      """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)
        |/ (sqrt(aggregate(a, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
        |   * sqrt(aggregate(b, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |""".stripMargin).head().getDouble(0)
    assert(native == hof) // bit-identical, not approximately equal
  }

  test("type checking rejects non-float arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(graft.functions.functions.cosine_sim(col("a"), col("b"))).head()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>"))
  }
}
