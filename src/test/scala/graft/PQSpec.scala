package graft

import org.apache.spark.sql.functions._

/** q136 product quantization: encode optimality + ADC sanity. */
class PQSpec extends SparkSpec {

  test("q136 ADC distances are sums of per-subspace codeword distances (non-negative, bounded)") {
    val rows = SparkEntry.queries("q136_pq_adc_search")(spark, sfDir).collect()
    assert(rows.length == 50, s"expected 5 queries x top-10, got ${rows.length}")
    assert(rows.forall(_.getDouble(3) >= 0.0), "negative squared distance")
    // ranks are 1..10 per query and distances non-decreasing within a query
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 10),
        "ranks not dense 1..10")
      assert(sorted.map(_.getDouble(3)).sliding(2)
        .forall(p => p(0) <= p(1)), "ADC distance not monotone in rank")
    }
  }

  test("q136 ADC top-10 overlaps the exact cosine top-10 (quantization sanity)") {
    // PQ with 16 sampled codewords is coarse; still, for each query the
    // ADC top-10 should share members with the exact top-10 far above
    // chance (10/500 would be ~0.2 in expectation at random).
    val adc = SparkEntry.queries("q136_pq_adc_search")(spark, sfDir)
      .select("query_id", "cand_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = SparkEntry.queries("q45_knn_bruteforce")(spark, sfDir)
      .select("query_id", "cand_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val overlaps = adc.keys.map(q => (adc(q) intersect exact(q)).size)
    assert(overlaps.sum >= 5,
      s"ADC top-10 vs exact top-10 overlap too low: ${overlaps.mkString(",")}")
  }
}
