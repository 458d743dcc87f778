package graft

import org.apache.spark.sql.functions._

/** q151/q152 experimentation analytics: transition probabilities must be
  * a proper conditional distribution, transition mass must equal the
  * sequence length bound, and the z statistic must agree with an
  * independent recomputation from the four integers. */
class AbTestSpec extends SparkSpec {

  private lazy val markov =
    SparkEntry.queries("q151_markov_transitions")(spark, sfDir).cache()
  private lazy val ab =
    SparkEntry.queries("q152_ab_test")(spark, sfDir).head()

  test("transition rows: p(dst|src) sums to 1 within rounding per src") {
    markov.groupBy("src").agg(sum("p_cond").as("s")).collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-4,
        s"${r.getString(0)}: conditional mass ${r.getAs[Double]("s")}")
    }
  }

  test("total transition count = n_events - n_users (each chain loses one)") {
    val ev = Tables(spark, sfDir, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    val got = markov.agg(sum("n_trans")).head().getLong(0)
    assert(got == expected, s"transition mass $got, expected $expected")
  }

  test("A/B: z statistic matches an independent recomputation") {
    val (nc, kc, nt, kt) = (ab.getAs[Long]("n_c"), ab.getAs[Long]("k_c"),
      ab.getAs[Long]("n_t"), ab.getAs[Long]("k_t"))
    assert(kc <= nc && kt <= nt)
    val (rc, rt) = (kc.toDouble / nc, kt.toDouble / nt)
    val p = (kc + kt).toDouble / (nc + nt)
    val z = (rt - rc) / math.sqrt(p * (1 - p) * (1.0 / nc + 1.0 / nt))
    assert(math.abs(ab.getAs[Double]("z_stat") - z) < 1e-3,
      s"z ${ab.getAs[Double]("z_stat")} vs recomputed $z")
  }
}
