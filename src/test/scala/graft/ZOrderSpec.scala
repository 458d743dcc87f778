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
