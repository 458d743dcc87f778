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
}
