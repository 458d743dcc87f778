package graft

import org.apache.spark.sql.functions._

/** q153/q154 order-statistics selection: the skyline must actually be
  * the Pareto frontier (verified against a brute-force dominance check
  * at spec scale), and equi-depth bins must be balanced with ordered,
  * non-overlapping extents. */
class FrontierSpec extends SparkSpec {

  private lazy val sky =
    SparkEntry.queries("q153_skyline")(spark, sfDir).cache()
  private lazy val bins =
    SparkEntry.queries("q154_quantile_binning")(spark, sfDir).cache()

  test("no part strictly dominates a skyline member (brute force)") {
    val parts = Tables(spark, sfDir, "part")
      .select("p_size", "p_retailprice").collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    val members = sky.collect().map(r => (r.getInt(1), r.getDouble(2)))
    assert(members.nonEmpty)
    members.foreach { case (sz, pr) =>
      val dom = parts.exists { case (s2, p2) =>
        s2 >= sz && p2 <= pr && (s2 > sz || p2 < pr)
      }
      assert(!dom, s"skyline member (size=$sz, price=$pr) is dominated")
    }
  }

  test("skyline is an antichain: members never dominate each other") {
    val m = sky.collect().map(r => (r.getInt(1), r.getDouble(2)))
    for ((a, i) <- m.zipWithIndex; (b, j) <- m.zipWithIndex if i != j)
      assert(!(a._1 >= b._1 && a._2 <= b._2 && (a._1 > b._1 || a._2 < b._2)),
        s"$a dominates $b inside the frontier")
  }

  test("equi-depth bins are balanced to within one row") {
    val counts = bins.select("n_rows").collect().map(_.getLong(0))
    assert(counts.length == 10)
    assert(counts.max - counts.min <= 1,
      s"bin sizes ${counts.mkString(",")} — not equi-depth")
  }

  test("bin extents ascend without overlap") {
    val rows = bins.orderBy("bin").collect()
    rows.sliding(2).filter(_.length == 2).foreach { p =>
      assert(p(0).getAs[Double]("hi") <= p(1).getAs[Double]("lo"),
        s"bin ${p(0).getAs[Int]("bin")} extent overlaps the next")
    }
  }
}
