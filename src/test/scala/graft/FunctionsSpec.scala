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

  test("plane_dot matches the interpreted HOF formulation bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val w = Seq(312L, -771L, 1000L, -1000L)
    val df = Seq(Tuple1(Array(0.25f, -3.5f, 1.1f, 0.0f))).toDF("a")
    val native = df.select(graft.functions.PlaneDot.plane_dot(col("a"), w))
      .head().getDouble(0)
    val hof = df.selectExpr(
      s"""aggregate(sequence(0, 3), CAST(0 AS DOUBLE), (acc, i) ->
         |  acc + (CAST(element_at(a, i + 1) AS DOUBLE) *
         |         element_at(array(${w.mkString(",")}), i + 1)) / 1000.0)""".stripMargin)
      .head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(native) ==
      java.lang.Double.doubleToLongBits(hof))
  }

  test("plane_dot SQL registration, null array, and null-element totality") {
    val r = spark.sql(
      """SELECT plane_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), array(1000, 500)) AS d,
        |       plane_dot(CAST(NULL AS ARRAY<FLOAT>), array(1000)) AS n1,
        |       plane_dot(CAST(array(1.0, NULL) AS ARRAY<FLOAT>), array(1000, 500)) AS n2
        |""".stripMargin).head()
    assert(r.getDouble(0) == 2.0) // 1*1000/1000 + 2*500/1000
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("plane_dot rejects non-literal weights in SQL") {
    val e = intercept[Exception] {
      spark.sql("SELECT plane_dot(CAST(array(1.0) AS ARRAY<FLOAT>), array(CAST(rand()*2 AS INT)))").head()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("graft_tokens equals the regex formulation on ASCII (property) and from SQL") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import spark.implicits._
    // random ASCII including separators, empties, runs, case mix
    val asciiGen = Gen.listOf(Gen.frequency(
      (6, Gen.alphaNumChar), (2, Gen.oneOf(' ', '.', ',', '-', '_', '!', '\t')),
      (1, Gen.choose(33.toChar, 126.toChar)))).map(_.mkString)
    val prop = Prop.forAll(Gen.listOfN(8, asciiGen)) { texts =>
      val df = (texts :+ "").toDF("text")
      val native = df.selectExpr("graft_tokens(text) AS t").as[Seq[String]].collect().toSeq
      val regex = df.selectExpr(
        "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '') AS t")
        .as[Seq[String]].collect().toSeq
      native == regex
    }
    val res = check(Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("declared queries self-register their functions on a session without the extensions config") {
    import org.apache.spark.sql.graftshims.GraftShims
    // a fresh session state with graft_tokens explicitly dropped stands
    // in for a caller that built its SparkSession without
    // spark.sql.extensions=GraftExtensions; Tables() must re-register
    // (text queries would otherwise fail UNRESOLVED_ROUTINE)
    val ns = spark.newSession()
    GraftShims.dropFunction(ns, "graft_tokens")
    val out = SparkEntry.queries("q30_token_stats")(ns, sfDir)
    assert(out.count() > 0)
  }

  test("graft_tokens contract: null in, null out; non-ASCII codepoints are separators") {
    import spark.implicits._
    val r = spark.sql(
      """SELECT graft_tokens(CAST(NULL AS STRING)) AS n,
        |       graft_tokens('') AS e,
        |       graft_tokens('Ka\u212Afee 42') AS k
        |""".stripMargin).head()
    assert(r.isNullAt(0))
    assert(r.getSeq[String](1).isEmpty)
    // U+212A KELVIN SIGN would case-fold to ASCII 'k' under the regex
    // formulation; the documented native contract treats it as a
    // separator, splitting the word
    assert(r.getSeq[String](2) == Seq("ka", "fee", "42"))
  }

  test("sq_dist matches the HOF formulation bit-for-bit; totality on nulls/empties") {
    val r = spark.sql(
      """SELECT sq_dist(CAST(array(1.5, -2.0) AS ARRAY<FLOAT>),
        |               CAST(array(0.5,  1.0) AS ARRAY<FLOAT>)) AS d,
        |       aggregate(zip_with(CAST(array(1.5, -2.0) AS ARRAY<FLOAT>),
        |                          CAST(array(0.5,  1.0) AS ARRAY<FLOAT>),
        |           (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) *
        |                     (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
        |         CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS hof,
        |       sq_dist(CAST(NULL AS ARRAY<FLOAT>),
        |               CAST(array(1.0) AS ARRAY<FLOAT>)) AS nl,
        |       sq_dist(CAST(array(CAST(NULL AS FLOAT)) AS ARRAY<FLOAT>),
        |               CAST(array(1.0) AS ARRAY<FLOAT>)) AS ne,
        |       sq_dist(CAST(array() AS ARRAY<FLOAT>),
        |               CAST(array() AS ARRAY<FLOAT>)) AS emp,
        |       sq_dist(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |               CAST(array(1.0) AS ARRAY<FLOAT>)) AS mism
        |""".stripMargin).head()
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r.getDouble(1)),
      s"native ${r.getDouble(0)} != HOF ${r.getDouble(1)}")
    assert(r.isNullAt(2) && r.isNullAt(3))
    assert(r.getDouble(4) == 0.0)
    // Mismatched lengths null out, matching zip_with's null-padding.
    assert(r.isNullAt(5))
  }

  test("sq_dist nulls on ragged lengths through the CODEGEN path too") {
    // The literal case above constant-folds on the driver (interpreted
    // nullSafeEval); ragged arrays coming from a scanned column run the
    // doGenCode loop instead — both paths must null out, never fold the
    // shorter prefix (uniform fixture dims would mask a divergence).
    import org.apache.spark.sql.functions._
    import graft.functions.SqDist.sq_dist
    val df = spark.range(4)
      .withColumn("a", expr(
        "transform(sequence(1, 3 + CAST(id % 2 AS INT)), x -> CAST(x AS FLOAT))"))
      .withColumn("b", expr("transform(sequence(1, 4), x -> CAST(x AS FLOAT))"))
      .withColumn("d", sq_dist(col("a"), col("b")))
    val rows = df.select("id", "d").collect().sortBy(_.getLong(0))
    // even ids: length 3 vs 4 -> null; odd ids: length 4 vs 4 -> 0.0
    rows.foreach { r =>
      if (r.getLong(0) % 2 == 0) assert(r.isNullAt(1), s"id ${r.getLong(0)}")
      else assert(r.getDouble(1) == 0.0, s"id ${r.getLong(0)}")
    }
  }
}
