package graft.plans

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftshims.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, AttributeSet, BaseOrdering, Expression, PredicateHelper, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: per-group top-k with MAP-SIDE
  * PARTIAL REDUCTION — the (c)-tier custom-operator path (LogicalPlan +
  * SparkStrategy + SparkPlan, registered through SparkSessionExtensions).
  *
  * Why built-ins can't express it: Spark's per-group top-k idiom
  * (`row_number().over(partitionBy(g).orderBy(o)) <= k`) shuffles EVERY
  * input row to its group's reducer and sorts it there — at 100 TB the
  * shuffle is the full table even though only k rows per group survive.
  * `max_by` partial-aggregates but only covers k = 1; `collect_list` +
  * slice holds whole groups in a single aggregation buffer. This operator
  * keeps a bounded buffer (≤ 2k rows) per group PER INPUT PARTITION and
  * shuffles only those survivors: shuffle volume is
  * min(input, k × groups × partitions), and no reducer ever sorts more
  * than k × partitions rows per group. The same partial/final split
  * Spark's own HashAggregate uses, applied to an operator it lacks.
  *
  * Determinism contract: `order` must be a TOTAL order of the input
  * (include a unique tiebreaker) or the cut at rank k is arbitrary —
  * same contract as LIMIT after ORDER BY.
  */
case class TopKPerGroup(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"top-k needs k >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Partial phase: bounded per-group buffers within each input partition —
  * no distribution requirement, runs where the data already is. */
case class PartialTopKPerGroupExec(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution)
  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, out) = (group, order, k, child.output)
    // the partial stage is an OPTIMIZATION, not a correctness stage: when
    // per-partition group cardinality would blow the buffer budget, it
    // caps the map and passes overflow rows through unreduced — the
    // final stage re-reduces, so results are identical either way
    val cap = math.max(16,
      TopKPerGroupExec.PartialBufferRowBudget / (2 * kk))
    child.execute().mapPartitions(
      TopKPerGroupExec.topKPerPartition(_, g, o, kk, out, cap),
      preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Final phase: same bounded reduction after clustering by the group
  * keys, emitting each group's k rows in `order`. */
case class FinalTopKPerGroupExec(
    group: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (group.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(group) :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, out) = (group, order, k, child.output)
    // the final stage MUST fully reduce (its output is the answer) — no
    // pass-through cap. Its memory is still bounded: each group holds
    // ≤ 2k rows, and the ClusteredDistribution exchange spreads distinct
    // groups across all reducers, so a reducer holds
    // O(groups / shuffle-partitions × k) rows — the same class of bound
    // as Spark's own HashAggregate final stage.
    child.execute().mapPartitions(
      TopKPerGroupExec.topKPerPartition(_, g, o, kk, out, Int.MaxValue),
      preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerGroupExec {
  /** Partial-stage memory budget in buffered rows per task. Each group
    * buffers ≤ 2k defensively-copied rows, so the per-task cap is
    * budget/(2k) DISTINCT groups (≥ 16); past the cap, new groups'
    * rows pass through unreduced instead of growing the hash map —
    * trading shuffle volume for bounded memory, never correctness
    * (the final stage re-reduces everything it receives). */
  val PartialBufferRowBudget: Int = 1 << 19
  /** Bounded per-group top-k over one partition: rows accumulate per
    * group key and compact back to k whenever a buffer reaches 2k, so
    * memory is O(groups-in-partition × k) and cost O(n log k) — never a
    * full partition sort, never an unbounded group buffer. */
  /** Per-group state: candidate buffer + the current k-th-best row
    * (valid once a compaction has run), used to reject rows without
    * copying them. */
  private final class GroupBuf(k: Int) {
    val buf = new ArrayBuffer[InternalRow](k + 1)
    var bound: InternalRow = null
  }

  private[plans] def topKPerPartition(
      iter: Iterator[InternalRow],
      group: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      output: Seq[Attribute],
      maxGroups: Int): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(group, output)
    val ord: BaseOrdering = RowOrdering.create(order, output)
    val lt = (a: InternalRow, b: InternalRow) => ord.compare(a, b) < 0
    val groups = new java.util.HashMap[UnsafeRow, GroupBuf]()
    // pass-through overflow rows stream out lazily DURING the scan (no
    // buffering); buffered groups flush after the input is exhausted —
    // `++`'s right operand is by-name, so the flush sees the final map
    val passedThrough = iter.flatMap { row =>
      val key = keyProj(row)
      var g = groups.get(key)
      if (g == null && groups.size() >= maxGroups) {
        // group-cardinality cap reached (partial stage only): emit the
        // row unreduced rather than growing the map — the transient row
        // is safe to yield, flatMap hands it downstream before next()
        Iterator.single(row)
      } else {
        if (g == null) {
          g = new GroupBuf(k)
          groups.put(key.copy(), g)
        }
        // bound = the group's k-th-best after the last compaction: a row
        // not strictly better can never enter the top-k, so it is rejected
        // BEFORE the defensive copy — on mostly-ordered or heavy-tailed
        // input almost every row skips the allocation (the comparison uses
        // the transient row, which is safe: nothing is retained)
        if (g.bound == null || ord.compare(row, g.bound) < 0) {
          // rows are retained across iterator steps -> must defensive-copy
          g.buf += row.copy()
          if (g.buf.length >= 2 * k) {
            val kept = g.buf.sortWith(lt).take(k)
            g.buf.clear()
            g.buf ++= kept
            g.bound = kept.last
          }
        }
        Iterator.empty
      }
    }
    passedThrough ++
      groups.values.asScala.iterator.flatMap(_.buf.sortWith(lt).take(k))
  }
}

/** Planner strategy: one partial stage on the existing layout, one final
  * stage behind the group-key exchange EnsureRequirements inserts. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      FinalTopKPerGroupExec(g, o, k,
        PartialTopKPerGroupExec(g, o, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule: pushes projection and group-key filters through the
  * custom [[TopKPerGroup]] node — the pruning Catalyst does for free on
  * built-in operators but cannot do for a node it doesn't know.
  *
  * - Project above the node: prune the CHILD to projected ∪ group ∪
  *   order columns, so a caller who selects late still gets a parquet
  *   scan that reads only the needed columns (and the partial stage
  *   buffers narrow rows, not the full child schema).
  * - Filter above the node: conjuncts that are deterministic and
  *   reference only BARE-ATTRIBUTE group keys filter whole groups, so
  *   they commute with per-group top-k and move below it (enabling
  *   parquet pushdown). Conjuncts on float-normalized keys are NOT
  *   moved: a predicate could distinguish 0.0 from -0.0 or NaN bit
  *   patterns the normalized grouping merges.
  *
  * Runs inside the operator-optimization fixed point (extensions path)
  * or the user-provided batch (runtime path), converging in one step:
  * a pruned child / pushed filter makes the rewrite a no-op next pass. */
object PushThroughTopKPerGroup extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, t @ TopKPerGroup(g, _, _, child)) =>
      val bareGroupAttrs = AttributeSet(g.collect { case a: Attribute => a })
      val (push, keep) = splitConjunctivePredicates(cond).partition(c =>
        c.deterministic && c.references.nonEmpty &&
          c.references.subsetOf(bareGroupAttrs))
      if (push.isEmpty) f
      else {
        val below = t.copy(child = Filter(push.reduce(And), child))
        keep.reduceOption(And).map(Filter(_, below)).getOrElse(below)
      }
    case p @ Project(fields, t @ TopKPerGroup(g, o, _, child)) =>
      val needed = AttributeSet(fields.flatMap(_.references)) ++
        AttributeSet(g.flatMap(_.references)) ++
        AttributeSet(o.flatMap(_.references))
      val pruned = child.output.filter(needed.contains)
      if (pruned.length == child.output.length) p
      else p.copy(child = t.copy(child = Project(pruned, child)))
  }
}

/** Public entry: `TopK.perGroup(df, Seq(df("g")), Seq(df("x").desc), k)`.
  * Group/order columns must come from `df` itself (already resolved);
  * bare columns default to ascending. Selecting only the needed columns
  * after the call is fine — [[PushThroughTopKPerGroup]] prunes the scan
  * and pushes group-key filters below the node. */
object TopK {
  def perGroup(df: DataFrame, group: Seq[Column], order: Seq[Column],
               k: Int): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(df.sparkSession)
    val sortOrder = order.map(GraftShims.resolvedExpression).map {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    }
    // Float/double group keys must normalize (0.0 == -0.0, canonical
    // NaN) exactly as the analyzer rewrites groupBy/window keys — a
    // custom node bypasses that rule, and un-normalized keys would both
    // split the UnsafeRow hash groups and mis-route rows across the
    // ClusteredDistribution exchange.
    val g = group.map(GraftShims.resolvedExpression)
      .map(GraftShims.normalizeFloat)
    GraftShims.ofRows(df.sparkSession,
      TopKPerGroup(g, sortOrder, k, df.queryExecution.analyzed))
  }
}

object PlanQueries {
  import org.apache.spark.sql.functions._
  import graft.{QueryDef, Tables}

  val defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------- q106:
    // the custom operator end-to-end: 5 most expensive lineitems per
    // (returnflag, linestatus) — a 6-group, millions-of-rows shape where
    // the window-rank idiom shuffles and sorts EVERYTHING through 6
    // reducers, while this plan's partial stage cuts each input partition
    // to ≤ 5 rows per group before the exchange (plan-shape spec asserts
    // the partial/final pair). Ordering carries (orderkey, linenumber) as
    // the unique tiebreaker per the operator's total-order contract.
    QueryDef(
      "q106_native_topk",
      (s, d) => {
        // deliberately hands the FULL 16-column lineitem to the operator
        // and selects late: PushThroughTopKPerGroup prunes the scan to
        // the 5 needed columns (PlanShapeSpec pins the plan shape)
        val li = Tables(s, d, "lineitem")
        TopK.perGroup(li,
          Seq(li("l_returnflag"), li("l_linestatus")),
          Seq(li("l_extendedprice").desc, li("l_orderkey"), li("l_linenumber")),
          5)
          .select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"),
            col("l_linenumber"), col("l_extendedprice"))
          .orderBy(col("l_returnflag"), col("l_linestatus"),
            col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      },
      Some("""
        WITH r AS (
          SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
                 l_extendedprice,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                     ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
                   AS rn
          FROM lineitem)
        SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
               l_extendedprice
        FROM r WHERE rn <= 5
        ORDER BY l_returnflag, l_linestatus, l_extendedprice DESC,
                 l_orderkey, l_linenumber"""))
  )
}
