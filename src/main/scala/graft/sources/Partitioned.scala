package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.util.Det._

/** Partitioned table layout: `partitionBy` date writes + partition-pruned
  * reads (the physical-layout family next to q29's bucketing; reference
  * writes plain parquet — prepare_data.py:39-40 — so this is the
  * beyond-parity tool a 100 TB user reaches for first).
  *
  * A date/key-partitioned warehouse turns a time-range query from a full
  * scan into a directory listing + a scan of only the matching partitions:
  * the filter is applied to partition VALUES during planning (visible as
  * `PartitionFilters` on the scan, asserted by PartitionedSpec), so at
  * 100 TB a one-week query over a year of data touches ~2% of the files.
  * Dynamic partition overwrite (the idempotent daily-backfill write
  * pattern) is spec-covered in PartitionedSpec.
  */
object Partitioned {

  /** Cache key for the partitioned copy: the fixture's canonical path plus
    * every underlying file's (name, mtime, size). A regenerated fixture at
    * the same path — or a different sfDir whose path hashCode collides —
    * changes the key, so the warehouse is rebuilt instead of silently
    * serving stale data (the failure mode of keying by `d.hashCode` alone).
    */
  private def fixtureKey(d: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    val fixture = new java.io.File(d, "events.parquet")
    val sig = (fixture.getCanonicalPath +: walk(fixture)
        .map(f => s"${f.getName}:${f.lastModified}:${f.length}"))
      .mkString("|")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    new java.math.BigInteger(1, md5).toString(16)
  }

  /** Day-partitioned copy of `events`, written once per fixture VERSION
    * (content fingerprint, see [[fixtureKey]]) behind a _SUCCESS guard:
    * the layout is computed at WRITE time — re-partitioning per query
    * would defeat the point (same contract as q29's bucket setup).
    */
  def eventsByDay(s: SparkSession, d: String): String = {
    val wh = s"/tmp/graft_part/events_${fixtureKey(d)}"
    if (!new java.io.File(s"$wh/_SUCCESS").exists) {
      Tables(s, d, "events")
        .withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(wh)
    }
    wh
  }

  /** The pruned read-back q90 times: one week out of 30 days of data. */
  def prunedWeek(s: SparkSession, d: String): DataFrame =
    s.read.parquet(eventsByDay(s, d))
      .filter(col("event_date").between(lit("2024-01-10"), lit("2024-01-16")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("event_type")

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- q90:
    // partition-pruned week-slice aggregate over the day-partitioned
    // events copy. The oracle runs the same slice over the unpartitioned
    // fixture, so a hash match proves the partitioned layout is lossless
    // AND the pruned scan reads exactly the week's rows.
    QueryDef(
      "q90_partition_pruning",
      (s, d) => prunedWeek(s, d),
      Some("""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
        FROM events
        WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-16'
        GROUP BY event_type
        ORDER BY event_type"""))
  )
}
