package graft.text

import org.apache.spark.sql.functions.col

/** Pins the greedy left-to-right merge semantics the oracle's
  * non-overlapping string replace must agree with — the overlap cases
  * ("aaa" with pair (a,a)) are where naive rewrites diverge. */
class BpeSpec extends graft.SparkSpec {

  private def merge(l: String, r: String, syms: Seq[String]): Seq[String] = {
    import spark.implicits._
    Seq(Tuple1(syms)).toDF("syms")
      .select(Bpe.mergeFold(l, r).as("m"))
      .as[Seq[String]].head()
  }

  test("greedy fold merges left-to-right, never re-matching a merged symbol") {
    assert(merge("a", "a", Seq("a", "a", "a")) == Seq("aa", "a"))
    assert(merge("a", "b", Seq("a", "b", "a", "b")) == Seq("ab", "ab"))
    assert(merge("a", "b", Seq("a", "a", "b")) == Seq("a", "ab"))
    assert(merge("a", "b", Seq("x", "a", "b", "y")) == Seq("x", "ab", "y"))
    assert(merge("a", "b", Seq("b", "a")) == Seq("b", "a")) // no match
    assert(merge("a", "b", Seq("a")) == Seq("a"))           // too short
  }

  test("learned merges are frequency-ranked with deterministic tiebreak") {
    val out = Bpe.learn(spark, sfDir, 3).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    // counts can only weakly decrease in the argmax sequence IF no merge
    // creates a more frequent pair — that CAN happen (merged symbols form
    // new pairs), so only pin positivity + shape here; exact values are
    // the oracle's job
    assert(out.forall(_.getLong(3) > 0))
    assert(out.forall(r => r.getString(1).nonEmpty && r.getString(2).nonEmpty))
  }

  test("local trainer merge equals the SQL fold on the overlap cases") {
    for ((l, r, in) <- Seq(
      ("a", "a", Seq("a", "a", "a")),
      ("a", "b", Seq("a", "b", "a", "b")),
      ("a", "b", Seq("a", "a", "b")),
      ("a", "b", Seq("x", "a", "b", "y")),
      ("a", "b", Seq("b", "a")),
      ("a", "b", Seq("a"))))
      assert(Bpe.mergeLocal(in.toIndexedSeq, l, r) == merge(l, r, in),
        s"mergeLocal diverges from SQL fold on ($l,$r) over $in")
  }

  /** The fixture corpus collapsed to (word, freq) — the same shape
    * trainUncached feeds trainAtFloor. */
  private def typeTable(d: String) = {
    import org.apache.spark.sql.functions._
    graft.Tables(spark, d, "documents")
      .select(explode(expr(TextAnalysis.tokensExpr)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
  }

  test("floor-pruned training merges equal unpruned (exactness certified or fallback)") {
    val full = typeTable(sfDir).localCheckpoint()
    val exact = Bpe.trainAtFloor(full, 10, 1L)
    assert(Bpe.lastFloor == 1L && Bpe.lastSlack == 0L)
    val exactRows = Bpe.lastCollectedTypes
    // A forced floor must ALWAYS return the exact merges: either every
    // round's argmax margin clears the pruned tail's slack (certified
    // fast path), or certification fails and training falls back to
    // floor=1 — the design is exact by construction, the floor is only
    // a driver-residency fast path.
    for (floor <- Seq(2L, 3L, 5L)) {
      val pruned = Bpe.trainAtFloor(full, 10, floor)
      assert(pruned == exact, s"floor=$floor diverged from exact merges")
      if (Bpe.lastFloor == floor) {
        // certified path: the driver table obeyed the Markov bound
        // totalTokens/floor — the structural, fixture-independent cap
        val total = full.agg(org.apache.spark.sql.functions.sum("freq"))
          .head.getLong(0)
        assert(Bpe.lastCollectedTypes <= total / floor,
          s"collected ${Bpe.lastCollectedTypes} types > total/floor")
        assert(Bpe.lastCollectedTypes <= exactRows)
      } else assert(Bpe.lastFloor == 1L, "fallback must land on floor=1")
    }
  }

  test("certification refuses an argmax the pruned tail could flip") {
    import spark.implicits._
    // pairs (a,b) and (c,d) tie at 10 within the kept set; the pruned
    // type 'xab' (freq 1 < floor 2) holds the tie-breaking (a,b)
    // occurrence — slack = 1·(3−1) = 2 ≥ margin 0, so the certified
    // path must refuse and fall back, and the final merges must reflect
    // the TRUE argmax (a,b) with count 11
    val full = Seq(("ab", 10L), ("cd", 10L), ("xab", 1L)).toDF("word", "freq")
    val merges = Bpe.trainAtFloor(full, 1, 2L)
    assert(Bpe.lastFloor == 1L, "uncertifiable argmax must fall back to exact")
    assert(merges.head == ((1, "a", "b", 11L)),
      s"true argmax lost under pruning: ${merges.head}")
  }

  test("auto floor arithmetic caps the collect at MaxDriverTypes") {
    // pure Markov arithmetic on the derivation trainUncached uses:
    // floor = ceil(total / cap) ⇒ kept types ≤ total / floor ≤ cap,
    // at ANY corpus size — the fixture-independent driver bound
    for (total <- Seq(1L, Bpe.MaxDriverTypes, Bpe.MaxDriverTypes * 1000L,
        100L * 1000L * 1000L * 1000L * 1000L)) {
      val floor = math.max(1L,
        (total + Bpe.MaxDriverTypes - 1L) / Bpe.MaxDriverTypes)
      assert(total / floor <= Bpe.MaxDriverTypes,
        s"total=$total floor=$floor breaks the cap")
    }
  }

  test("rounds=100 trains in seconds at sf0.1 and maintained counts equal a recount") {
    val t0 = System.nanoTime()
    val (merges, words) =
      Bpe.trainedForSpec(spark, "/root/testdata/sf0.1", 100)
    val secs = (System.nanoTime() - t0) / 1e9
    // production-vocab viability: no per-round Spark jobs, so even 10x
    // this round count stays interactive
    assert(secs < 30.0, f"rounds=100 took $secs%.1f s")
    assert(merges.size <= 100 && merges.nonEmpty)
    // exactness of the incremental maintenance: the final driver-held
    // pair table must equal an independent Spark recount of the final
    // word table
    assert(Bpe.lastPairCounts == Bpe.pairRecount(words),
      "incrementally maintained pair counts diverge from recount")
    // greedy BPE is prefix-stable: the first 10 merges of the 100-round
    // run are exactly the rounds=10 run (the q111 oracle-gated result)
    val ten = Bpe.trainedForSpec(spark, "/root/testdata/sf0.1", 10)._1
    assert(merges.take(10) == ten)
  }
}
