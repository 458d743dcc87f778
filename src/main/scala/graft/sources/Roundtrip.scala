package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, Tables}
import graft.util.Det._

/** Source/sink format coverage (SURVEY.md §2.1 S1/K1-K2 analogs): CSV and
  * JSON-lines codecs proven by a write -> read-back -> aggregate round
  * trip. The oracle computes the same aggregate straight from parquet, so
  * a hash match proves the text codecs are lossless for the exercised
  * types (int64, double, string, timestamp).
  *
  * Reads use explicit schemas (never inferSchema — a second full scan at
  * 100 TB) and the writes keep Spark's default per-partition file layout
  * (no coalesce(1): a single-file write serializes the whole sink through
  * one task at scale).
  */
object Roundtrip {

  private def io(d: String, kind: String): String =
    s"/tmp/graft_io/${kind}_${Integer.toHexString(d.hashCode)}"

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- q52:
    // CSV round-trip (S1 csv-scan analog): orders subset -> csv ->
    // explicit-schema read -> aggregate.
    QueryDef(
      "q52_csv_roundtrip",
      (s, d) => {
        val path = io(d, "csv")
        Tables(s, d, "orders")
          .filter(col("o_orderkey") < 5000)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .write.mode("overwrite").option("header", "true").csv(path)
        val sch = StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("o_totalprice", DoubleType)))
        s.read.option("header", "true").schema(sch).csv(path)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_price
        FROM orders
        WHERE o_orderkey < 5000
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),

    // --------------------------------------------------------------- q53:
    // JSON-lines round-trip (P6/P7 from_json/to_json file analog),
    // including a timestamp column through ISO-8601 text.
    QueryDef(
      "q53_jsonl_roundtrip",
      (s, d) => {
        val path = io(d, "jsonl")
        Tables(s, d, "orders")
          .filter(col("o_orderkey") < 5000)
          .select("o_orderkey", "o_orderdate", "o_totalprice")
          .write.mode("overwrite").json(path)
        val sch = StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_orderdate", TimestampType),
          StructField("o_totalprice", DoubleType)))
        s.read.schema(sch).json(path)
          .groupBy(year(col("o_orderdate")).cast("int").as("yr"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy("yr")
      },
      Some("""
        SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS yr, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_price
        FROM orders
        WHERE o_orderkey < 5000
        GROUP BY 1
        ORDER BY yr""")),

    // --------------------------------------------------------------- q54:
    // ORC round-trip: the second columnar format (predicate pushdown +
    // column pruning apply to ORC scans the same as parquet). Write ->
    // read-back -> aggregate; oracle reads the original parquet.
    QueryDef(
      "q54_orc_roundtrip",
      (s, d) => {
        val path = io(d, "orc")
        Tables(s, d, "lineitem")
          .filter(col("l_orderkey") < 5000)
          .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
          .write.mode("overwrite").orc(path)
        s.read.orc(path)
          .filter(col("l_quantity") > 10)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_orderkey < 5000 AND l_quantity > 10
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // --------------------------------------------------------------- q87:
    // XML round-trip (Spark 4 merged spark-xml into core): write rows as
    // XML documents, read back with an explicit schema + rowTag, aggregate
    // — proves the third text codec (after CSV/JSONL) lossless for the
    // exercised types. Same explicit-schema discipline: XML inference is
    // another full pass AND coerces by observed content.
    QueryDef(
      "q87_xml_roundtrip",
      (s, d) => {
        val path = io(d, "xml")
        Tables(s, d, "customer")
          .filter(col("c_custkey") < 1000)
          .select("c_custkey", "c_name", "c_acctbal")
          .write.mode("overwrite")
          .option("rootTag", "customers").option("rowTag", "customer")
          .format("xml").save(path)
        val sch = StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("c_name", StringType),
          StructField("c_acctbal", DoubleType)))
        s.read.schema(sch).option("rowTag", "customer").format("xml").load(path)
          .groupBy(substring(col("c_name"), 1, 1).as("initial"))
          .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
          .orderBy("initial")
      },
      Some("""
        SELECT substr(c_name, 1, 1) AS initial, COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS sum_bal
        FROM customer
        WHERE c_custkey < 1000
        GROUP BY 1
        ORDER BY initial""")),

    // --------------------------------------------------------------- q91:
    // Avro round-trip — the row-oriented wire format next to the columnar
    // (parquet/ORC) and text (CSV/JSONL/XML) families. This distribution
    // ships the Avro implementation inside spark-sql 4.x but WITHOUT the
    // spark-avro module's service registration, so the `avro` short name
    // doesn't resolve (probed: AnalysisException) — binding the FileFormat
    // class directly is the supported fallback and exercises the exact
    // same reader/writer. Avro is schema-on-write (schema travels in the
    // file header), so unlike the text codecs no explicit read schema is
    // needed for losslessness.
    QueryDef(
      "q91_avro_roundtrip",
      (s, d) => {
        val path = io(d, "avro")
        val avroFmt = "org.apache.spark.sql.avro.AvroFileFormat"
        Tables(s, d, "supplier")
          .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
          .write.mode("overwrite").format(avroFmt).save(path)
        s.read.format(avroFmt).load(path)
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n"), dsum(col("s_acctbal")).as("sum_bal"))
          .orderBy("s_nationkey")
      },
      Some("""
        SELECT s_nationkey, COUNT(*) AS n,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS sum_bal
        FROM supplier
        GROUP BY s_nationkey
        ORDER BY s_nationkey"""))
  )
}
