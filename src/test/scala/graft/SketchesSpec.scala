package graft

import org.apache.spark.sql.functions._

/** q147/q148 sketch battery: the structural guarantees the sketches are
  * sold on must hold on real data — CMS never underestimates, HLL's
  * 64-register estimate lands within its theoretical error regime, and
  * the register spaces stay fixed-size (the whole point at 100 TB). */
class SketchesSpec extends SparkSpec {

  private lazy val hll =
    SparkEntry.queries("q147_hll_cardinality")(spark, sfDir).cache()
  private lazy val cms =
    SparkEntry.queries("q148_cms_frequency")(spark, sfDir).cache()

  test("HLL: estimate is positive and within 50% of exact (m=64 regime)") {
    val rows = hll.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("hll_est")
      val err = r.getAs[Double]("rel_err")
      assert(est > 0.0)
      // 1.04/sqrt(64) ≈ 13% standard error; 50% is the sanity band that
      // catches a broken rho/register extraction without being flaky.
      assert(err < 0.5,
        s"${r.getAs[String]("event_type")}: rel_err $err — register math broken")
    }
  }

  test("HLL: zero-register count stays within the fixed 64-register space") {
    assert(hll.filter(col("v_zero") < 0 || col("v_zero") > 64).count() == 0)
  }

  test("CMS: never underestimates (over_est >= 0 for every probe)") {
    assert(cms.count() == 20)
    assert(cms.filter(col("over_est") < 0).count() == 0,
      "CMS underestimated a probe term — hash/cell fold broken")
  }

  test("CMS: probe join broadcasts the 1024-cell sketch") {
    val plan = cms.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "cell probe did not broadcast the fixed-size sketch")
  }
}
