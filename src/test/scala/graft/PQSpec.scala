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

  test("q139 plan: every index artifact broadcasts; the corpus never sort-merge joins") {
    val plan = SparkEntry.queries("q139_ivfpq_search")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // coarse codebook (x2: assignment + query probe), PQ codebook (x2:
    // encode + ADC build), and the ADC table itself must all broadcast
    assert("BroadcastExchange".r.findAllIn(plan).size >= 4,
      s"expected >=4 broadcast exchanges in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-sized sort-merge join leaked into the IVF-PQ plan:\n$plan")
  }

  test("q247 plan: codebook and queries broadcast, corpus shuffles " +
      "once, never sort-merge joins") {
    val plan = SparkEntry.queries("q247_ivf_sq_ann")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the 16-entry codebook (x2: assignment + query probe) and the
    // probed-cell query set must broadcast; the corpus side is the
    // only big side and reaches the cell join hash-partitioned by its
    // ONE assignment shuffle
    assert("BroadcastExchange".r.findAllIn(plan).size >= 3,
      s"expected >=3 broadcast exchanges in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-sized sort-merge join leaked into the IVF-SQ plan:\n$plan")
  }

  test("q247 invariants: dense ranks per query, scores in [-1,1] and " +
      "nonincreasing, candidates come only from probed cells") {
    val rows = SparkEntry.queries("q247_ivf_sq_ann")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val scores = sorted.map(_.getDouble(4))
      assert(scores.forall(c => c >= -1.0001 && c <= 1.0001))
      assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
      // nprobe = 2: at most two distinct cells per query's results
      assert(rs.map(_.getLong(3)).distinct.length <= 2)
    }
  }

  test("q139/q140 invariants: dense ranks, monotone ADC distance, recall in [0,1]") {
    val rows = SparkEntry.queries("q139_ivfpq_search")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      assert(sorted.map(_.getDouble(4)).sliding(2)
        .forall(p => p.length < 2 || p(0) <= p(1)))
    }
    val rec = SparkEntry.queries("q140_ivfpq_recall")(spark, sfDir).collect()
    assert(rec.length == 5)
    rec.foreach { r =>
      assert(r.getLong(1) == 5L) // n_exact
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getLong(2) > 0L, "no candidates scored — probing broken")
    }
  }
}
