package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.KafkaIO

/** Plan-shape parity for the Kafka seam (no broker / no connector jar in
  * the sandbox, so runtime coverage is the file/memory substitutes in
  * q73-q76; these specs pin everything that can be pinned without one):
  * the connector option contract, the wire codec round-trip, and that the
  * builders really reach Spark's data-source resolution.
  */
class KafkaIOSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("score", DoubleType),
    StructField("label", IntegerType)))

  test("source options carry the reference consumer contract (predict.py:22-27)") {
    val o = KafkaIO.sourceOptions("broker:9092", "credit_topic")
    assert(o("kafka.bootstrap.servers") == "broker:9092")
    assert(o("subscribe") == "credit_topic")
    assert(o("startingOffsets") == "earliest")
    assert(o("failOnDataLoss") == "false")
  }

  test("sink options carry the reference producer contract (producer.py:34-38)") {
    val o = KafkaIO.sinkOptions("broker:9092", "credit_topic")
    assert(o("kafka.bootstrap.servers") == "broker:9092")
    assert(o("topic") == "credit_topic")
  }

  test("wire codec round-trips: encodeJson -> (binary value) -> decodeJson") {
    import spark.implicits._
    val rows = Seq((1L, 0.25, 0), (2L, 0.75, 1))
      .toDF("vec_id", "score", "label")
    val wire = KafkaIO.encodeJson(rows, "vec_id")
    // the kafka sink contract: exactly (key, value), both string/binary
    assert(wire.columns.toSeq == Seq("key", "value"))
    // a kafka SOURCE presents value as binary — cast down to prove the
    // decode path handles the wire type, not just strings
    val asWire = wire.select(col("key"), col("value").cast("binary").as("value"))
    val back = KafkaIO.decodeJson(asWire, schema)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("vec_id").collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq ==
      Seq((1L, 0.25, 0), (2L, 0.75, 1)))
  }

  test("readStream builder reaches the kafka data-source lookup") {
    // Without the connector jar the lookup must fail ON THE KAFKA SOURCE —
    // proving the builder wires format/options into Spark's resolution
    // rather than silently substituting something else.
    val e = intercept[Exception] {
      KafkaIO.readStream(spark, "broker:9092", "credit_topic")
    }
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }

  test("writeBatch builder reaches the kafka data-source lookup") {
    import spark.implicits._
    val wire = KafkaIO.encodeJson(Seq((1L, 1.0, 0)).toDF("vec_id", "score", "label"), "vec_id")
    val e = intercept[Exception] {
      KafkaIO.writeBatch(wire, "broker:9092", "credit_topic")
    }
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }
}
