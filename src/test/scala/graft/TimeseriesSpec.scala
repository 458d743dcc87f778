package graft

import org.apache.spark.sql.functions._

/** q149/q150 time-series analytics: the closed-form OLS must agree with
  * an independently computed fit, and the anomaly ranking must actually
  * order by |z| (the integer ranking key is a proxy — prove it). */
class TimeseriesSpec extends SparkSpec {

  private lazy val ols =
    SparkEntry.queries("q149_trend_ols")(spark, sfDir).cache()
  private lazy val anom =
    SparkEntry.queries("q150_daily_anomaly")(spark, sfDir).cache()

  test("OLS slope/intercept match an independent per-group fit") {
    val daily = Tables(spark, sfDir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
      .collect()
    val d0 = daily.map(_.getDate(1)).min
    val byType = daily.groupBy(_.getString(0))
    ols.collect().foreach { r =>
      val pts = byType(r.getString(0)).map { row =>
        val x = (row.getDate(1).toLocalDate.toEpochDay -
          d0.toLocalDate.toEpochDay).toDouble
        (x, row.getLong(2).toDouble)
      }
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-5,
        s"${r.getString(0)}: slope ${r.getAs[Double]("slope")} vs $slope")
      assert(r.getAs[Long]("n_days") == pts.length)
    }
  }

  test("anomaly ranking: |z| is non-increasing within each group") {
    anom.collect().groupBy(_.getString(0)).foreach { case (_, rows) =>
      val zs = rows.sortBy(_.getAs[Int]("rank"))
        .flatMap(r => Option(r.getAs[Double]("z_score")))
      zs.map(math.abs).sliding(2).filter(_.length == 2).foreach { p =>
        assert(p(0) >= p(1) - 1e-9, s"|z| increased: ${p(0)} -> ${p(1)}")
      }
    }
    assert(anom.filter(col("rank") < 1 || col("rank") > 3).count() == 0)
  }

  test("group stats join the daily frame via broadcast") {
    val plan = anom.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "per-group stats were not broadcast back to the daily counts")
  }
}
