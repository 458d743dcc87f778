package graft

import org.apache.spark.sql.functions._

/** k-means / SemDeDup invariants beyond the oracle hash-match: partition
  * totality, Voronoi optimality of the final assignment, and the greedy
  * keep-rule's soundness.
  */
class ClusteringSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("kmeans assigns every point to exactly one cluster") {
    val a = run("q127_kmeans")
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(a.count() == n)
    assert(a.select("vec_id").distinct().count() == n)
    val k = a.select("cluster").distinct().count()
    assert(k > 1 && k <= graft.similarity.Clustering.kFor(n))
  }

  test("k derives from corpus size — the scale law, not a constant") {
    import graft.similarity.Clustering
    // The law itself: k = max(2, ceil(n / TargetClusterSize)).
    assert(Clustering.kFor(150) == 2)
    assert(Clustering.kFor(500) == 4)
    assert(Clustering.kFor(2000) == 16)
    assert(Clustering.kFor(1000000) == 7813)
    // Proof the engine varies k with the data, not the SF label: a
    // subsampled corpus (150 of sf0.001's 500 vectors) clusters with
    // k=2 where the full corpus uses k=4.
    val subDir = "/tmp/graft-spec-subcorpus"
    val sub = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .orderBy("vec_id").limit(150)
    sub.write.mode("overwrite").parquet(s"$subDir/embeddings.parquet")
    val aSub = SparkEntry.queries("q127_kmeans")(spark, subDir)
    val aFull = SparkEntry.queries("q127_kmeans")(spark, sfDir)
    val kSub = aSub.select("cluster").distinct().count()
    val kFull = aFull.select("cluster").distinct().count()
    assert(kSub <= 2 && kSub < kFull,
      s"subsampled corpus used k=$kSub, full used k=$kFull")
  }

  test("within-cluster pair work is linear in n: sum |c|^2 <= 2 * n * TargetClusterSize") {
    import graft.similarity.Clustering
    val sizes = run("q127_kmeans").groupBy("cluster")
      .agg(count(lit(1)).as("c")).select(sum(col("c") * col("c")))
      .head().getLong(0)
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val bound = 2L * n * Clustering.TargetClusterSize
    assert(sizes <= bound,
      s"sum|c|^2 = $sizes exceeds linear bound $bound — clusters too skewed")
  }

  test("final assignment is Voronoi-optimal: sq_dist is the minimum over all centroids") {
    // Against the centroids the final pass actually scored (NOT centroids
    // recomputed from the final assignment — those are the next round's):
    // no point may be strictly closer to a foreign centroid than its
    // recorded sq_dist (strict: ties break by id, so equality is legal).
    val a = run("q127_kmeans")
    val pe = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("pe"))
    val cents = graft.similarity.Clustering.finalCentroids(spark, sfDir)
    val better = a.join(pe, "vec_id")
      .crossJoin(broadcast(cents.withColumnRenamed("cluster", "other")))
      .withColumn("d2", expr(
        "aggregate(zip_with(pe, ce, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v)"))
      .filter(col("d2") < col("sq_dist"))
    assert(better.count() == 0)
  }

  test("semdedup keep rule is sound and greedy-consistent") {
    val r = run("q128_semdedup")
    // dropped => an earlier same-cluster member exceeds tau
    assert(r.filter(!col("is_kept") &&
      (col("max_prior_cos").isNull ||
        col("max_prior_cos") <= graft.similarity.Clustering.Tau)).count() == 0)
    // kept with a prior => that prior similarity is within tau
    assert(r.filter(col("is_kept") &&
      col("max_prior_cos") > graft.similarity.Clustering.Tau).count() == 0)
    // the lowest vec_id of every cluster has no prior and is always kept
    val firsts = r.groupBy("cluster").agg(min("vec_id").as("vec_id"))
    assert(r.join(firsts, Seq("cluster", "vec_id"))
      .filter(!col("is_kept") || col("max_prior_cos").isNotNull).count() == 0)
  }
}
