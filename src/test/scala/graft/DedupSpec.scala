package graft

import org.apache.spark.sql.functions._

/** Dedup/similarity invariants beyond the oracle hash-match: LSH output
  * soundness (every reported pair really meets the threshold) and ANN
  * recall of the bucketed search against the brute-force baseline.
  */
class DedupSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("minhash LSH pairs all meet the exact-jaccard threshold (soundness)") {
    val pairs = run("q41_minhash_lsh_dedup")
    assert(pairs.filter(col("jaccard") < 0.8).count() == 0)
  }

  test("simhash banding finds ALL pairs with hamming <= 4 (pigeonhole completeness)") {
    import spark.implicits._
    // brute-force hamming over all signature pairs must equal the query
    val lsh = run("q42_simhash_dedup")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // recompute signatures via the same declared pipeline, cross-check all pairs
    val docs = graft.dedup.Dedup.simhashSig(spark, sfDir)
    val brute = docs.as("x").join(docs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .filter(expr("bit_count(x.sim ^ y.sim) <= 4"))
      .select(col("x.doc_id"), col("y.doc_id")).as[(Long, Long)].collect().toSet
    assert(lsh == brute)
  }

  test("LSH-bucketed ANN has nonzero recall vs brute force and is sound") {
    import spark.implicits._
    val bf = run("q45_knn_bruteforce")
      .filter(col("query_id") < 5 && col("rank") <= 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val lsh = run("q46_knn_lsh_bucketed")
      .filter(col("query_id") < 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty)
    // bucketed candidates are a subset of the corpus; any overlap with the
    // true top-5 demonstrates recall — exact recall varies by bucket density
    assert((bf & lsh).nonEmpty)
  }

  test("q84 clusters are consistent: canonical is min, pairs co-clustered, sizes add up") {
    import spark.implicits._
    val clusters = run("q84_dup_clusters")
      .select("doc_id", "canonical_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
    val canon = clusters.map(c => c._1 -> c._2).toMap
    // canonical is a cluster member and the minimum of its cluster
    clusters.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.map(_._1).min == lbl, s"canonical $lbl is not the min member")
      assert(members.forall(_._3 == members.size), s"cluster_size mismatch for $lbl")
    }
    // every verified dup pair ends up in the same cluster
    val pairs = run("q41_minhash_lsh_dedup")
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(canon(a) == canon(b), s"pair ($a,$b) split across clusters")
    }
  }

  test("incremental dedup pairs are sound and a subset of the self-dedup pairs") {
    import spark.implicits._
    val inc = run("q99_incremental_dedup")
      .select("new_doc", "corpus_doc", "jaccard")
      .as[(Long, Long, Double)].collect()
    // side discipline: new batch is the %10==0 slice, corpus the rest
    inc.foreach { case (n, c, j) =>
      assert(n % 10 == 0, s"new_doc $n not in the new batch")
      assert(c % 10 != 0, s"corpus_doc $c not in the corpus")
      assert(j >= 0.8, s"pair ($n,$c) below threshold: $j")
    }
    // same signatures + bands + threshold as q41, so every cross-side
    // incremental pair must also be a self-dedup pair (sorted)
    val selfPairs = run("q41_minhash_lsh_dedup")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    inc.foreach { case (n, c, _) =>
      val p = (math.min(n, c), math.max(n, c))
      assert(selfPairs.contains(p), s"incremental pair $p missing from q41")
    }
  }

  test("connected components of an empty edge set is the empty labeling") {
    import spark.implicits._
    // a clean corpus produces ZERO dup pairs — the resolver must return
    // empty, not NPE on the null sum of an empty convergence probe
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(graft.dedup.Dedup.connectedComponents(empty).count() == 0)
  }

  test("connected components converge on a diameter-60 chain within the round cap") {
    import spark.implicits._
    // Adversarial shape for plain min-label propagation: a path graph
    // needs O(diameter) rounds, which would bust the cap of 20. The
    // path-doubling shortcut makes it O(log d) — diameter 60 must
    // converge, and every vertex must land on the chain head. A disjoint
    // triangle (offset ids) guards against cross-component label bleed.
    val chain = (0L until 60L).map(i => (i, i + 1))
    val triangle = Seq((1000L, 1001L), (1001L, 1002L), (1002L, 1000L))
    val edges = (chain ++ triangle).toDF("x", "y")
    val got = graft.dedup.Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 64)
    (0L to 60L).foreach(v => assert(got(v) == 0L, s"vertex $v labeled ${got(v)}"))
    Seq(1000L, 1001L, 1002L).foreach(v => assert(got(v) == 1000L))
  }

  test("connected components equal union-find on random graphs (property)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    import spark.implicits._
    // random sparse graphs mix the shapes that stress different code
    // paths: singleton edges, short cliques, and long-ish chains that
    // trigger the path-doubling escalation
    val edgesGen = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong), Gen.choose(0L, n.toLong)))
    } yield edges.filter { case (a, b) => a != b }
    val prop = Prop.forAll(edgesGen) { edges =>
      edges.isEmpty || {
        val got = graft.dedup.Dedup.connectedComponents(edges.toDF("x", "y"))
          .as[(Long, Long)].collect().toMap
        // driver-side union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(v: Long): Long = {
          val p = parent.getOrElseUpdate(v, v)
          if (p == v) v else { val r = find(p); parent(v) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val verts = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        // min-label contract: every vertex labeled with the min id
        // reachable from it
        val byRoot = verts.groupBy(find)
        val expect = byRoot.values.flatMap { vs =>
          val lbl = vs.min; vs.map(_ -> lbl)
        }.toMap
        got == expect
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("exact-pair scale guard: refusal boundary is n*(n-1)/2 > cap, loudly") {
    import spark.implicits._
    import graft.dedup.Dedup
    // 5 rows in one block -> exactly 10 pairs; 2 rows in another -> 1
    val df = (Seq.fill(5)("hot") ++ Seq.fill(2)("cold")).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "blk")
    def withCap[T](cap: Long)(body: => T): T = {
      spark.conf.set(Dedup.MaxPairsPerBlockConf, cap.toString)
      try body finally spark.conf.unset(Dedup.MaxPairsPerBlockConf)
    }
    // at the boundary (cap == worst pairs) the guard admits…
    withCap(10)(Dedup.requireBoundedPairs(df, "blk", "the LSH path"))
    // …one below, it refuses, naming key, count, conf, and the cure
    val e = intercept[IllegalStateException] {
      withCap(9)(Dedup.requireBoundedPairs(df, "blk", "the LSH path"))
    }
    assert(e.getMessage.contains("blk=hot"))
    assert(e.getMessage.contains("10 candidate pairs"))
    assert(e.getMessage.contains(Dedup.MaxPairsPerBlockConf))
    assert(e.getMessage.contains("the LSH path"))
    // the declared queries run under the DEFAULT cap on the fixture —
    // the guard changes refusal behavior at scale, never fixture results
    assert(SparkEntry.queries("q43_ngram_jaccard_pairs")(spark, sfDir).count() > 0)
    assert(SparkEntry.queries("q86_edit_distance_pairs")(spark, sfDir).count() > 0)
  }
}
