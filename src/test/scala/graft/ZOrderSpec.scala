package graft

/** q138 z-order layout: the locality contract that makes the clustering
  * useful for file skipping. */
class ZOrderSpec extends SparkSpec {

  test("q138 every z-cell spans <= 32 consecutive buckets in BOTH dimensions") {
    val rows = SparkEntry.queries("q138_zorder_layout")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val orders = Tables(spark, sfDir, "orders").count()
    assert(total == orders, s"cells don't partition the table: $total != $orders")
    rows.foreach { r =>
      val (cell, minCk, maxCk, minDay, maxDay) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // top 6 z-bits fix the 3 high bits of each 8-bit dim -> each cell's
      // extent is one 32-wide aligned stripe per dimension
      assert(maxCk - minCk < 32 && (minCk >> 5) == (maxCk >> 5),
        s"cell $cell custkey extent not one aligned 32-stripe: [$minCk,$maxCk]")
      assert(maxDay - minDay < 32 && (minDay >> 5) == (maxDay >> 5),
        s"cell $cell day extent not one aligned 32-stripe: [$minDay,$maxDay]")
    }
  }

  test("pre-1995 dates bucket by FLOOR division, matching the oracle's //") {
    // The fixture's date range sits entirely after the 1995-01-01 epoch,
    // which is exactly why a truncate-toward-zero bug would pass every
    // oracle run: truncation and floor only disagree on negative day
    // indices. Feed synthetic pre-epoch dates and assert the floor + pmod
    // semantics DuckDB's // and % would produce.
    import org.apache.spark.sql.functions._
    import graft.sources.Partitioned
    val df = spark.createDataFrame(java.util.List.of(
        org.apache.spark.sql.Row(1L, java.sql.Date.valueOf("1994-12-31")), // day -1  -> floor -1  -> 255
        org.apache.spark.sql.Row(2L, java.sql.Date.valueOf("1994-12-22")), // day -10 -> floor -1  -> 255
        org.apache.spark.sql.Row(3L, java.sql.Date.valueOf("1994-12-21")), // day -11 -> floor -2  -> 254
        org.apache.spark.sql.Row(4L, java.sql.Date.valueOf("1995-01-01")), // day 0   -> 0
        org.apache.spark.sql.Row(5L, java.sql.Date.valueOf("1987-12-28"))), // day -2561 -> floor -257 -> pmod 255
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_custkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_orderdate",
          org.apache.spark.sql.types.DateType))))
    val y = Partitioned.zOrderFrame(df)
      .select("o_custkey", "y").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(y == Map(1L -> 255L, 2L -> 255L, 3L -> 254L, 4L -> 0L, 5L -> 255L),
      s"pre-epoch day buckets diverge from floor-division oracle: $y")
  }

  test("zOrderWrite: footer stats prune single-dim predicates on BOTH dims; unclustered write cannot") {
    import org.apache.spark.sql.functions._
    import graft.sources.Partitioned
    val zf = Partitioned.zOrderFrame(Tables(spark, sfDir, "orders"))
      .select("o_orderkey", "x", "y", "z")
    val base = java.nio.file.Files.createTempDirectory("graft_zorder_")
    val clustered = base.resolve("clustered").toString
    val control = base.resolve("control").toString
    // the write path under test vs an unclustered control with the SAME
    // file count/size budget (orderkey layout = random w.r.t. x and y)
    Partitioned.zOrderWrite(zf, clustered)
    zf.repartitionByRange(16, col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
      .write.option("maxRecordsPerFile", 1024)
      .mode("overwrite").parquet(control)

    // a file can be skipped for predicate [lo, hi] iff its footer
    // min/max range misses the interval — count prunable files exactly
    // as a stats-reading engine would
    def overlapping(dir: String, dim: String, lo: Long, hi: Long): (Int, Int) = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
      val hit = files.count { f =>
        val r = spark.read.parquet(f).agg(min(col(dim)), max(col(dim))).head()
        r.getLong(0) <= hi && r.getLong(1) >= lo
      }
      (hit, files.length)
    }
    // one 32-wide aligned stripe per dimension (an eighth of each domain)
    val (ckHitZ, nZ) = overlapping(clustered, "x", 64, 95)
    val (ckHitC, nC) = overlapping(control, "x", 64, 95)
    val (dayHitZ, _) = overlapping(clustered, "y", 64, 95)
    val (dayHitC, _) = overlapping(control, "y", 64, 95)
    assert(nZ > 4 && nC > 4, s"need a multi-file layout to prove skipping ($nZ/$nC)")
    // unclustered control: every file spans the whole x/y domain -> zero
    // skipping; z-order: only the files covering the stripe's z-cells hit
    assert(ckHitC == nC, "control layout unexpectedly clustered on x")
    assert(dayHitC == nC, "control layout unexpectedly clustered on y")
    assert(ckHitZ * 2 <= nZ,
      s"custkey stripe should prune >= half the z-ordered files: $ckHitZ/$nZ")
    assert(dayHitZ * 2 <= nZ,
      s"day stripe should prune >= half the z-ordered files: $dayHitZ/$nZ")
    // layout changes bytes, never rows: both copies answer the predicate
    // identically
    val zRows = spark.read.parquet(clustered)
      .filter(col("x").between(64, 95)).count()
    val cRows = spark.read.parquet(control)
      .filter(col("x").between(64, 95)).count()
    assert(zRows == cRows && zRows > 0)
  }
}
