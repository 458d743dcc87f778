package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The schema-inference seam (reference `prepare_data.py:33-34` infers
  * dtypes from pandas; SURVEY.md calls CSV inferSchema "a real
  * type-coercion seam"). Product queries always pass explicit schemas —
  * inference costs a second full pass at 100 TB and narrows types by
  * what it happened to see — but the seam itself must be understood and
  * covered: these specs pin exactly what inference does to this fixture's
  * types and that an explicit cast recovers the declared schema.
  */
class SchemaInferenceSpec extends SparkSpec {

  private def csvDir(): String = {
    val dir = Files.createTempDirectory("graft_infer_").toString
    Tables(spark, sfDir, "orders")
      .filter(col("o_orderkey") < 2000)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").option("header", "true").csv(dir)
    dir
  }

  test("CSV inferSchema coerces by observed content, not by declared type") {
    val inferred = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(csvDir())
    val types = inferred.schema.fields.map(f => f.name -> f.dataType).toMap
    // the seam: int64 parquet columns come back as the NARROWEST integral
    // type the sample fits (IntegerType here — silently different from the
    // parquet LongType), doubles and timestamps round-trip by content.
    assert(types("o_orderkey") == IntegerType, s"seam moved: ${types("o_orderkey")}")
    assert(types("o_totalprice") == DoubleType)
    assert(types("o_orderdate") == TimestampType)
    assert(types("o_orderstatus") == StringType)
  }

  test("explicit cast after inference recovers the declared schema and values") {
    val dir = csvDir()
    val inferred = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(dir)
      .withColumn("o_orderkey", col("o_orderkey").cast(LongType))
    val declared = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType)))
    val explicit = spark.read.option("header", "true").schema(declared).csv(dir)
    assert(inferred.schema("o_orderkey").dataType == LongType)
    // identical content under both reads: anti-join both ways is empty
    assert(inferred.exceptAll(explicit).count() == 0)
    assert(explicit.exceptAll(inferred).count() == 0)
  }
}
