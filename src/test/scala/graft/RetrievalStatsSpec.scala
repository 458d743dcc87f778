package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-8 additions beyond their oracle pairing:
  * q159 BM25 retrieval, q160 HLL mergeability, q161 TWAP. */
class RetrievalStatsSpec extends SparkSpec {

  test("q159 BM25: scores strictly ordered, positive, and bounded by term count") {
    val rows = SparkEntry.queries("q159_bm25_topk")(spark, sfDir).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0), "BM25 of matched terms must be positive")
    assert(scores.sameElements(scores.sortBy(-_: Double)), "top-k not sorted")
    // a doc can match at most the 3 query terms
    assert(rows.map(_.getLong(2)).forall(n => n >= 1 && n <= 3))
  }

  test("q160: merged and direct HLL registers are identical for every group") {
    val rows = SparkEntry.queries("q160_hll_merge")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"register merge diverged for ${r.getString(0)}")
      assert(r.getLong(1) == r.getLong(2))
    }
  }

  test("q162 timers: every tracked user emits exactly once, and a restart emits nothing new") {
    val r1 = SparkEntry.queries("q162_timer_timeout_stats")(spark, sfDir).collect()
    val users = r1.map(_.getLong(0))
    assert(users.distinct.length == users.length,
      "a user's inactivity timer fired more than once at drain")
    val expected = Tables(spark, sfDir, "events")
      .filter(col("user_id") < 50).select("user_id").distinct().count()
    assert(users.length == expected,
      s"${users.length} emissions for $expected tracked users")
    // restart over the same checkpoint: no new batches, no new timers,
    // identical read-back
    val r2 = SparkEntry.queries("q162_timer_timeout_stats")(spark, sfDir).collect()
    assert(r2.map(_.toString).toSeq == r1.map(_.toString).toSeq)
  }

  test("q163 attribution: credited click precedes the purchase within 7 days, same user") {
    val attr = SparkEntry.queries("q163_lasttouch_attribution")(spark, sfDir)
    val ev = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"), col("event_type"))
    val joined = attr.filter(col("click_id").isNotNull)
      .join(ev, attr("click_id") === ev("event_id"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[String]("event_type") == "click")
      assert(r.getAs[Long]("user_id") == r.getAs[Long]("c_user"),
        "credited click belongs to a different user")
      val gap = r.getAs[Long]("gap_min")
      assert(gap >= 0 && gap <= 7L * 24 * 60, s"gap $gap outside window")
    }
    // unattributed purchases carry no gap
    assert(attr.filter(col("click_id").isNull && col("gap_min").isNotNull)
      .count() == 0)
  }

  test("q161 TWAP: weighted mean lies within each user's value range") {
    val twap = SparkEntry.queries("q161_time_weighted_avg")(spark, sfDir)
      .select(col("user_id"), col("twap"))
    val bounds = Tables(spark, sfDir, "events")
      .filter(col("user_id") < 100)
      .groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val joined = twap.join(bounds, "user_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (t, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      // 1e-4 slack: values are scaled to integer 1e4-units before the fold
      assert(t >= lo - 1e-4 && t <= hi + 1e-4,
        s"user ${r.getLong(0)}: twap $t outside [$lo, $hi]")
    }
  }
}
