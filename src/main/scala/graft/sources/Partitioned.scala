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
  private[graft] def fixtureKey(d: String): String = {
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

  /** The q138 z-value frame: orders plus 8-bit dim buckets x (custkey)
    * and y (order-date decade index) and their 16-bit Morton interleave
    * z. floor() (not double-div truncation) so pre-epoch dates bucket
    * the same way the oracle's `//` does; pmod keeps y in the 8-bit
    * domain so the interleave never sees a negative or >255 index. */
  private[graft] def zOrderFrame(orders: DataFrame): DataFrame = {
    val x = col("o_custkey") % 256L
    val y = pmod(
      floor(datediff(col("o_orderdate"), lit("1995-01-01")) / 10),
      lit(256L)).cast("long")
    val z = (0 until 8).map { i =>
      shiftleft(shiftright(col("x"), i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(col("y"), i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
    orders.withColumn("x", x).withColumn("y", y).withColumn("z", z)
  }

  /** The materialized OPTIMIZE ZORDER BY write path: range-partition on
    * the z-value, sort within partitions, cap records per file. Files
    * (and row groups within them) then cover compact z-ranges = compact
    * rectangles in BOTH dims, so parquet footer min/max stats prune a
    * single-dim predicate on EITHER column — the data-skipping property
    * ZOrderSpec measures against an unclustered control write. At
    * 100 TB this is the layout job you run once per table/partition, and
    * every engine reading the files benefits. */
  private[graft] def zOrderWrite(df: DataFrame, out: String,
      numRanges: Int = 16, maxRecordsPerFile: Long = 1024): Unit =
    df.repartitionByRange(numRanges, col("z"))
      .sortWithinPartitions(col("z"))
      .write.option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite").parquet(out)

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
        ORDER BY event_type""")),

    // -------------------------------------------------------------- q138:
    // Z-order (Morton-curve) layout cells over orders — the multi-column
    // clustering a lakehouse OPTIMIZE ZORDER BY (o_custkey, o_orderdate)
    // performs so that BOTH a customer predicate and a date predicate
    // prune files. Each row's two dims bucketize to 8 bits (custkey mod
    // 256; orderdate day-index / 10), the bits interleave into a 16-bit
    // z-value, and the query reports per-cell (top-6-bits → 64 cells)
    // extents + counts. The locality contract — each cell spans ≤ 32
    // consecutive buckets in EACH dim, because the top 6 z-bits fix 3
    // high bits of both dims — is what makes file-level min/max stats
    // selective for either predicate; ZOrderSpec asserts it, and
    // zOrderWrite below is the materialized write path — ZOrderSpec
    // proves the clustered layout's footer stats prune files on EITHER
    // single-dim predicate where an unclustered write cannot.
    // Per-row bit math only — one aggregate shuffle of 64 cells.
    QueryDef(
      "q138_zorder_layout",
      (s, d) => zOrderFrame(Tables(s, d, "orders"))
          .withColumn("z_cell", shiftright(col("z"), 10).cast("long"))
          .groupBy("z_cell")
          .agg(count(lit(1)).as("n"),
            min("x").as("min_ck"), max("x").as("max_ck"),
            min("y").as("min_day"), max("y").as("max_day"))
          .orderBy("z_cell"),
      Some {
        val zBits = (0 until 8).map(i =>
          s"(((x >> $i) & 1) << ${2 * i + 1}) + (((y >> $i) & 1) << ${2 * i})")
          .mkString(" + ")
        s"""
        WITH b AS (SELECT o_custkey % 256 AS x,
                          CAST((((date_diff('day', DATE '1995-01-01',
                            CAST(o_orderdate AS DATE)) // 10) % 256) + 256)
                            % 256 AS BIGINT) AS y
                   FROM orders),
        zc AS (SELECT x, y, CAST(($zBits) >> 10 AS BIGINT) AS z_cell FROM b)
        SELECT z_cell, count(*) AS n,
               min(x) AS min_ck, max(x) AS max_ck,
               min(y) AS min_day, max(y) AS max_day
        FROM zc GROUP BY 1
        ORDER BY z_cell"""
      }),

    // -------------------------------------------------------------- q169:
    // Small-file COMPACTION — the OPTIMIZE/maintenance job every
    // streaming or micro-batch ingest needs: a table accumulated as many
    // small files (here: events deliberately fragmented into 64) is
    // rewritten into size-targeted files (~4 MiB here), and the query
    // returns a content-equality proof over the COMPACTED copy — the
    // batch aggregate of the original is the oracle, so a hash match
    // proves the rewrite lost and duplicated nothing. At 100 TB small
    // files are a planning-and-NameNode tax (one task + one footer per
    // file); the compactor sizes output as ceil(bytes / target) and
    // coalesce()s — a NARROW repack, no shuffle: each output file
    // concatenates whole input files, the cheapest lossless layout fix.
    // PartitionedSpec asserts the file-count arithmetic.
    QueryDef(
      "q169_compact_files",
      (s, d) => {
        val root = java.nio.file.Paths.get(
          s"/tmp/graft_compact/ev_${fixtureKey(d)}")
        val small = root.resolve("small")
        val compacted = root.resolve("compacted")
        if (!java.nio.file.Files.exists(root.resolve("_DONE"))) {
          // fragment: the ingest-accumulated state (build once per
          // fixture version, like eventsByDay)
          Tables(s, d, "events").repartition(64)
            .write.mode("overwrite").parquet(small.toString)
          val bytes = graft.util.Fs.children(small)
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(java.nio.file.Files.size).sum
          val target = 4L * 1024 * 1024
          val n = math.max(1, math.ceil(bytes.toDouble / target).toInt)
          s.read.parquet(small.toString).coalesce(n)
            .write.mode("overwrite").parquet(compacted.toString)
          java.nio.file.Files.createFile(root.resolve("_DONE"))
        }
        import graft.util.Det._
        s.read.parquet(compacted.toString)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
            countDistinct(col("event_id")).as("n_ids"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value,
               COUNT(DISTINCT event_id) AS n_ids
        FROM events
        GROUP BY event_type
        ORDER BY event_type"""))
  )

  /** Spec probe: (smallFileCount, compactedFileCount, expectedMax) for
    * the q169 staging dirs of `d` — built by running the query first. */
  private[graft] def compactionCounts(d: String): (Int, Int, Int) = {
    val root = java.nio.file.Paths.get(s"/tmp/graft_compact/ev_${fixtureKey(d)}")
    def count(p: java.nio.file.Path): Int =
      graft.util.Fs.children(p)
        .count(_.getFileName.toString.endsWith(".parquet"))
    val small = count(root.resolve("small"))
    val bytes = graft.util.Fs.children(root.resolve("small"))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(java.nio.file.Files.size).sum
    val expected = math.max(1,
      math.ceil(bytes.toDouble / (4L * 1024 * 1024)).toInt)
    (small, count(root.resolve("compacted")), expected)
  }
}
