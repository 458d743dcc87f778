package graft

import org.apache.spark.sql.functions._

/** Property check for q172's semantics: Spark's EXPRESSION-gap
  * `session_window` must merge exactly like the independent running-
  * max-end reference on RANDOM event streams — the fixture-based oracle
  * only proves the shipped data; this pins the merge rule itself
  * (including the case a plain lag(end) formulation gets wrong: an
  * early long-gap event whose window outlives its successor's).
  */
class DynamicSessionPropertySpec extends SparkSpec {

  /** Reference: merge [ts, ts+gap) windows per user via running max end;
    * returns (user, start, end, n) per session. */
  private def reference(events: Seq[(Long, Long, Long)]) // (user, tsUs, gapUs)
      : Set[(Long, Long, Long, Long)] =
    events.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.map { case (_, t, g) => (t, t + g) }.sortBy(identity)
      val sessions = scala.collection.mutable.ListBuffer
        .empty[(Long, Long, Long)] // start, maxEnd, n
      sorted.foreach { case (t, e) =>
        sessions.lastOption match {
          // INCLUSIVE boundary: an event at exactly the session's end
          // merges (verified against Spark for fixed AND dynamic gaps)
          case Some((st, end, n)) if t <= end =>
            sessions(sessions.length - 1) = (st, math.max(end, e), n + 1)
          case _ => sessions += ((t, e, 1L))
        }
      }
      sessions.map { case (st, end, n) => (u, st, end, n) }
    }.toSet

  test("session_window(dynamic gap) == running-max-end reference on random streams") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // events across 4 users, timestamps within an hour at second
    // granularity, gap 5s or 20s chosen per event (two "types")
    val eventGen = for {
      u <- Gen.choose(0L, 3L)
      ts <- Gen.choose(0L, 3600L)
      short <- Gen.oneOf(true, false)
    } yield (u, ts * 1000000L, if (short) 5000000L else 20000000L)
    val prop = Prop.forAll(Gen.listOfN(60, eventGen)) { events =>
      val rows = events.zipWithIndex.map { case ((u, t, g), i) =>
        (i.toLong, u, new java.sql.Timestamp(t / 1000L), g == 5000000L)
      }
      import spark.implicits._
      val df = rows.toDF("event_id", "user_id", "ts", "short_gap")
      val got = df.groupBy(
          session_window(col("ts"),
            when(col("short_gap"), "5 seconds").otherwise("20 seconds")),
          col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("st"),
          unix_micros(col("session_window.end")).as("en"), col("n"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val want = reference(events)
      if (got != want) {
        System.err.println(s"events=$events\n got=$got\nwant=$want")
      }
      got == want
    }
    val res = check(Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("tumbling/sliding window() assignment == integer floor arithmetic, incl. exact-boundary events") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import spark.implicits._
    // second-granularity events BIASED onto exact window edges (0/60/300)
    // — the boundary cases a µs-random fixture never produces
    val tsGen = Gen.frequency(
      (3, Gen.choose(0L, 1800L).map(_ * 60)), // exact minute marks
      (2, Gen.choose(0L, 108000L)))
    val prop = Prop.forAll(Gen.listOfN(50, tsGen)) { tss =>
      val df = tss.map(t => Tuple1(new java.sql.Timestamp(t * 1000L)))
        .toDF("ts")
      // tumbling 5 minutes: window start == floor(ts / 300) * 300
      val tGot = df.groupBy(window(col("ts"), "5 minutes"))
        .count()
        .select(unix_micros(col("window.start")).as("st"), col("count"))
        .collect().map(r => (r.getLong(0) / 1000000L, r.getLong(1))).toMap
      val tWant = tss.groupBy(t => t / 300 * 300)
        .map { case (k, v) => k -> v.size.toLong }
      // sliding 10m/5m: each event lands in exactly the two slides
      // covering it: floor(ts/300)*300 and that minus 300
      val sGot = df.groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .count()
        .select(unix_micros(col("window.start")).as("st"), col("count"))
        .collect().map(r => (r.getLong(0) / 1000000L, r.getLong(1))).toMap
      val sWant = tss.flatMap(t => Seq(t / 300 * 300, t / 300 * 300 - 300))
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      tGot == tWant && sGot == sWant
    }
    val res = check(Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
