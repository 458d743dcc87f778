package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the declared query suite from the module registries. Every
  * oracle-paired query is deterministic (explicit ORDER BY with a unique
  * tiebreaker; float aggregates via exact decimal arithmetic — see
  * [[graft.util.Det]]).
  */
object SparkEntry {
  /** All declared queries, in module order. */
  def allDefs: Seq[QueryDef] =
    graft.relational.Relational.defs ++
      graft.relational.Advanced.defs ++
      graft.relational.Temporal.defs ++
      graft.relational.RuntimeFilters.defs ++
      graft.relational.Timeseries.defs ++
      graft.relational.Frontier.defs ++
      graft.relational.Observability.defs ++
      graft.catalog.CatalogQueries.defs ++
      graft.relational.SqlSurface.defs ++
      graft.relational.Graph.defs ++
      graft.text.TextAnalysis.defs ++
      graft.text.Indexing.defs ++
      graft.text.Selection.defs ++
      graft.sketch.Sketches.defs ++
      graft.text.ExactSubstr.defs ++
      graft.text.Packing.defs ++
      graft.text.Bpe.defs ++
      graft.dedup.Dedup.defs ++
      graft.similarity.Similarity.defs ++
      graft.similarity.Clustering.defs ++
      graft.similarity.ProductQuant.defs ++
      graft.similarity.IvfPq.defs ++
      graft.similarity.RecallProbe.defs ++
      graft.pipeline.Sampling.defs ++
      graft.sources.Roundtrip.defs ++
      graft.sources.Partitioned.defs ++
      graft.streaming.Windows.defs ++
      graft.ml.MLQueries.defs ++
      graft.multimodal.Multimodal.defs ++
      graft.plans.PlanQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_shipping_priority")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap
}
