package org.apache.spark.sql.graftshims

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` seams (Spark 4.x classic
  * module). Custom native Catalyst expressions (graft.functions.*) need
  * the Column <-> Expression converters to surface as user-facing
  * Columns; the custom whole-operator plan (graft.plans.TopKPerGroup)
  * needs the Dataset factory to hand its LogicalPlan to the session.
  * Living in an `org.apache.spark.sql` subpackage grants the access. No
  * other Spark internals are touched.
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Eager Column -> catalyst Expression conversion. `expression` returns
    * a LAZY ColumnNodeExpression wrapper that the analyzer normally
    * unwraps; expressions embedded in a custom LogicalPlan node skip that
    * rule and the wrapper (holding non-serializable internal ColumnNode
    * state) would reach task serialization. */
  def resolvedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Floating-point key normalization (0.0 == -0.0, canonical NaN) — the
    * rewrite the analyzer applies to groupBy/window/join keys. Custom
    * LogicalPlan nodes bypass that rule, so whole-operator extensions
    * must normalize their own grouping keys or float keys silently split
    * groups the built-ins would merge. */
  def normalizeFloat(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** Idempotent session-local registration of an expression builder —
    * lets a declared query register the engine's native functions on
    * ANY session (no `spark.sql.extensions` config required).
    *
    * The skip path is only silent when the existing registration is
    * OURS (recognized by the `graft.` class-name prefix both this path
    * and the `spark.sql.extensions` path stamp into the ExpressionInfo).
    * A session that registered its own function under the same name
    * keeps its registration — never clobbered — but gets a loud WARN,
    * because the declared queries would then run with foreign semantics. */
  def registerFunction(
      spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val registry = cs.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(id,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          builder.getClass.getName, name),
        builder(_))
    } else {
      val ours = registry.lookupFunction(id)
        .exists(_.getClassName.startsWith("graft."))
      if (!ours) org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"function '$name' is already registered by this session with " +
          s"non-graft semantics (${registry.lookupFunction(id).map(_.getClassName).getOrElse("?")}); " +
          "graft queries referencing it will use the session's version")
    }
  }

  /** Test seam: drop a session-local function so specs can prove the
    * lazy re-registration path (a vanilla session without the
    * GraftExtensions config). */
  def dropFunction(spark: SparkSession, name: String): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .dropFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name)): Unit
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Spark's own v2 Column[] -> StructType conversion (defaults,
    * comments, metadata) — the piece a catalog overriding the Column[]
    * createTable overload must not re-implement by hand. NOTE: this
    * conversion deliberately DROPS generation expressions (Spark
    * expects the connector to capture them from the Column objects
    * before converting) — callers re-attach them via
    * [[generationExpressionKey]]. */
  def v2ColumnsToStructType(
      cols: Array[org.apache.spark.sql.connector.catalog.Column])
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util
      .v2ColumnsToStructType(cols)

  /** The StructField metadata key Spark's own structTypeToV2Columns
    * decodes back into `Column.generationExpression()` — storing under
    * it makes DESCRIBE / Table.columns() round-trip the definition. */
  def generationExpressionKey: String =
    org.apache.spark.sql.catalyst.util.GeneratedColumn
      .GENERATION_EXPRESSION_METADATA_KEY

  /** Parse + analyze an expression SQL against `schema` (as if it were
    * a table of exactly those columns) and return the RESOLVED,
    * ordinal-BOUND expression — evaluable per-row on executors against
    * rows in `schema` layout. Loud on unresolvable references,
    * non-deterministic functions, and subqueries. The generated-column
    * compiler ([[graft.catalog.GraftWriterFactory]]). */
  def compileRowExpression(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      sqlText: String): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, BindReferences}
    import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
    val cs = spark.asInstanceOf[classic.SparkSession]
    val parsed = cs.sessionState.sqlParser.parseExpression(sqlText)
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils
      .toAttributes(schema)
    val plan = Project(Seq(Alias(parsed, "__g")()), LocalRelation(attrs))
    val analyzed = cs.sessionState.analyzer.execute(plan)
    val expr = analyzed match {
      case Project(Seq(a: Alias), _) => a.child
      case other => throw new IllegalArgumentException(
        s"expression '$sqlText' did not analyze to a scalar projection: " +
          other.getClass.getSimpleName)
    }
    require(expr.resolved,
      s"expression '$sqlText' does not resolve against " +
        s"${schema.catalogString}")
    require(expr.deterministic,
      s"expression '$sqlText' is non-deterministic — a generated " +
        "column must be recomputable")
    BindReferences.bindReference(expr, attrs)
  }

  /** Column names a row expression references (schema spellings) —
    * lets the generated-column CREATE path refuse chains (a generated
    * column referencing another generated column would evaluate
    * against the not-yet-computed incoming value). */
  def rowExpressionReferences(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      sqlText: String): Set[String] = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
    val cs = spark.asInstanceOf[classic.SparkSession]
    val parsed = cs.sessionState.sqlParser.parseExpression(sqlText)
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils
      .toAttributes(schema)
    val analyzed = cs.sessionState.analyzer.execute(
      Project(Seq(Alias(parsed, "__g")()), LocalRelation(attrs)))
    analyzed match {
      case Project(Seq(a: Alias), _) => a.child.references.map(_.name).toSet
      case _ => Set.empty
    }
  }

  /** V2 Predicate -> V1 Filter rendering for a
    * SupportsPushDownV2Filters builder that reuses one downstream
    * filter machine for row eval, stats pruning, and in-parquet
    * pushdown.
    *
    * STRICT on connectives, unlike Spark's own `PredicateUtils.toV1`:
    * that bridge falls back to the TRANSLATABLE SIDE of an OR whose
    * other side fails V1 rendering — `priority = 'X' OR f(key) = 7`
    * becomes just `priority = 'X'`, which as a row/prune filter
    * silently drops every row matching only the right side (found
    * live: q224's dim filter lost its modulo arm). Here a connective
    * renders only if EVERY child renders; leaves delegate to Spark's
    * bridge, which is all-or-nothing for them. */
  def predicateToV1(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.connector.expressions.filter.{And => V2And, Not => V2Not, Or => V2Or}
    p match {
      case and: V2And =>
        for { l <- predicateToV1(and.left())
              r <- predicateToV1(and.right()) }
          yield org.apache.spark.sql.sources.And(l, r)
      case or: V2Or =>
        for { l <- predicateToV1(or.left())
              r <- predicateToV1(or.right()) }
          yield org.apache.spark.sql.sources.Or(l, r)
      case not: V2Not =>
        predicateToV1(not.child())
          .map(org.apache.spark.sql.sources.Not)
      case _ =>
        org.apache.spark.sql.internal.connector.PredicateUtils.toV1(p)
    }
  }
}
