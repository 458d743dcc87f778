package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [only1,only2,...] — the optional third arg
    // restricts the dump to named queries (local iteration; the driver
    // always calls the 2-arg form).
    val Array(sfDir, outDir) = args.take(2)
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Guide §2.2: let AQE coalesce small shuffle partitions BY SIZE.
      // The Spark default parallelismFirst=true keeps tiny post-shuffle
      // partitions at the session partition count to "maximize
      // parallelism" — at sf0.1 that is 32 near-empty tasks per stage of
      // every catalog DML cycle (measured: q259 3.46 s -> 3.02 s, q284
      // 3.03 s -> 2.72 s with size-based coalescing). Scale-adaptive by
      // construction: partitions are sized by advisoryPartitionSizeInBytes
      // (64 MB default), not by any local core-count constant.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      // Advisory post-shuffle partition size for the size-based
      // coalescing above, parameterised (SPARK_GRAFT_ADVISORY; guide
      // §2.2/§9 suggests 64-256m at scale). Default = Spark's own 64m:
      // a full-suite A/B vs 8m read 183.7 s vs 191.2 s — the CPU-heavy
      // CoW rewrites prefer smaller partitions (q278 4.10 -> 3.37) but
      // the MOR/DV feed cycles prefer the FEWER output files of larger
      // ones (q210 2.17 -> 2.77, q268 1.70 -> 2.15), and 64m wins on
      // totals and geomean.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64m"))
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Fail LOUDLY before dumping anything if the fixture's physical
    // schema drifted to an encoding the engine doesn't recognize —
    // rc != 0 beats 156 silently-garbage results (the round-7 lesson).
    Tables.preflight(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
