package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table registry (see TESTDATA.md / FIXTURES.md §B).
  *
  * Every declared query receives `(spark, sfDir)` and reads only through
  * here, so the physical layout (one parquet per table) is a single seam:
  * pointing this at a partitioned/bucketed warehouse dir is the only change
  * needed to run the full suite against cluster-scale data.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Declared queries must run on ANY session: register the native
    // functions + planner strategy session-locally (idempotent) so a
    // caller without spark.sql.extensions=GraftExtensions still resolves
    // graft_tokens / cosine_sim / plane_dot and plans TopKPerGroup.
    graft.functions.GraftExtensions.ensureRegistered(spark)
    // The events fixture stores ts as parquet TIMESTAMP(NANOS), which the
    // vectorized reader rejects. Read nanos as raw long and truncate to a
    // microsecond timestamp — the same truncation DuckDB applies, so
    // oracle comparisons see identical values.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    // documents/embeddings feed signature computation + pairwise
    // self-joins (minhash, simhash, jaccard, cosine) whose per-row cost
    // dwarfs the scan. The fixtures are single small parquet files = 1-2
    // scan splits, which would serialize that work on one core; fan out
    // to the cluster's parallelism up front. At warehouse scale the scan
    // has many splits and this repartition is a no-op cost-wise relative
    // to the downstream pair work.
    else if (name == "documents" || name == "embeddings")
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
  }

  /** `binaryFile` source — the ingest path for multimodal payloads (one
    * row per file: path, modificationTime, length, content). Files can't
    * be split, so `spark.sql.files.maxPartitionBytes` governs how many
    * files group per task; a real media pipeline keeps individual objects
    * well under that bound (q83 consumes this). */
  def binaryFiles(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
}

/** One declared engine query: a Spark plan plus (when SQL-expressible) the
  * ANSI-SQL oracle the driver replays in DuckDB. `oracle = None` → the
  * driver records a weaker rows-only check (ML / RNG-dependent ops).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
