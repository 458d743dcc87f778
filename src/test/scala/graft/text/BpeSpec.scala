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
