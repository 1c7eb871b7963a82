package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, Descending, EqualTo, ExprId, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Per-key top-k as a FIRST-CLASS physical operator — the builder
  * brief's escalation rung (c): a whole-operator semantic Spark's
  * built-ins only express as a sort-based window
  * (`row_number().over(partitionBy(key).orderBy(...)) <= k`), which
  * SORTS every key's entire group. This operator keeps a bounded
  * k-heap per key instead: O(n log k) per partition, no sort buffer,
  * no spill pressure from cold groups.
  *
  * Plumbing:
  *  - [[GroupedTopKNode]] — resolved logical node (output = child's);
  *  - [[GroupedTopKStrategy]] — planner strategy (injected via
  *    `spark.experimental.extraStrategies`, or session-wide through
  *    GraftExtensions-style injection);
  *  - [[GroupedTopKExec]] — declares
  *    `requiredChildDistribution = ClusteredDistribution(keys)`, so
  *    Catalyst inserts exactly ONE hash Exchange (or none if the
  *    child is already co-partitioned, e.g. a bucketed scan), then a
  *    single narrow heap pass emits ≤ k rows per key.
  *
  * At 100 TB the win over the window form is the absent per-group
  * sort: a skewed key with 10^8 rows costs one streaming heap scan,
  * not a 10^8-row sort-and-rank. Results are row-order-agnostic
  * (consumers sort); ties beyond position k resolve by the total
  * order, so output is deterministic for a total `orderBy`.
  */
object GroupedTopK {

  case class GroupedTopKNode(keys: Seq[Expression], order: Seq[SortOrder],
                             k: Int, child: LogicalPlan) extends UnaryNode {
    override def output: Seq[Attribute] = child.output
    override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKNode =
      copy(child = newChild)
  }

  object GroupedTopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case GroupedTopKNode(keys, order, k, child) =>
        GroupedTopKExec(keys, order, k, planLater(child)) :: Nil
      case _ => Nil
    }
  }

  case class GroupedTopKExec(keys: Seq[Expression], order: Seq[SortOrder],
                             k: Int, child: SparkPlan) extends UnaryExecNode {
    override def output: Seq[Attribute] = child.output
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(keys) :: Nil
    override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
      copy(child = newChild)

    override protected def doExecute(): RDD[InternalRow] = {
      val kLocal = k
      val keysLocal = keys
      val orderLocal = order
      val childOutput = child.output
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(keysLocal, childOutput)
        val ordering = new LazilyGeneratedOrdering(orderLocal, childOutput)
        // largest-at-head heap: evict the worst row once a key holds k
        val revCmp = new java.util.Comparator[InternalRow] {
          override def compare(a: InternalRow, b: InternalRow): Int =
            ordering.compare(b, a)
        }
        val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        while (iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, revCmp)
            heaps.put(key.copy(), heap)
          }
          if (heap.size() < kLocal) heap.add(row.copy())
          else if (ordering.compare(row, heap.peek()) < 0) {
            heap.poll(); heap.add(row.copy())
          }
        }
        import scala.jdk.CollectionConverters._
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      }
    }
  }

  /** Catalyst rewrite: the SQL/DataFrame window-top-k idiom
    *
    *   Project(cols, Filter(rn <= k, Window([row_number() AS rn], part, ord)))
    *
    * (with `rn` dropped by the projection) is replaced by
    * [[GroupedTopKNode]], so SQL users get the heap operator without
    * API opt-in — injected session-wide via [[graft.GraftExtensions]].
    * Fires only when:
    *   - the Window computes EXACTLY one expression: the filtered
    *     row_number (other window functions need the sort anyway);
    *   - the projection does not reference the rank (rank values
    *     unused ⇒ only membership in the top k matters);
    *   - partition AND order specs are non-empty and deterministic
    *     (empty partition = global top-k, which TakeOrderedAndProject
    *     already handles better);
    *   - 0 < k ≤ [[MaxRewriteK]] — per-key heap memory is k rows, and
    *     beyond that the window form's spillable sort is the safer
    *     physical choice.
    * Tie behavior matches the window form's contract: for a non-total
    * orderBy, WHICH tied row ranks k-th is arbitrary in both forms
    * (sort instability vs heap arrival order). */
  object GroupedTopKRewrite extends Rule[LogicalPlan] {
    val MaxRewriteK = 10000

    private def limitFromCond(cond: Expression, rn: ExprId): Option[Int] = cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rn => Some(k)
      case LessThan(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rn => Some(k - 1)
      case EqualTo(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rn && k == 1 => Some(1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference) if a.exprId == rn => Some(k)
      case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference) if a.exprId == rn => Some(k - 1)
      case _ => None
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case p @ Project(projList,
          Filter(cond,
            Window(Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)), part, ord, child, _)))
          if part.nonEmpty && ord.nonEmpty &&
            (part ++ ord).forall(_.deterministic) &&
            !projList.exists(_.references.contains(al.toAttribute)) =>
        limitFromCond(cond, al.exprId) match {
          case Some(k) if k > 0 && k <= MaxRewriteK =>
            Project(projList, GroupedTopKNode(part, ord, k, child))
          case _ => p
        }
    }
  }

  /** Top `k` rows per key group under `orderBy` ((column, descending)
    * pairs — the per-key analogue of `ORDER BY ... LIMIT k`). */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
                 orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark: SparkSession = df.sparkSession
    // registration is check-then-act: guard against concurrent first
    // calls double-registering (sessions built with GraftExtensions
    // get the strategy injected and never hit this fallback)
    spark.synchronized {
      if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GroupedTopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val keyExprs: Seq[Expression] = keyCols.map(attr)
    val sortOrders = orderBy.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    GraftSqlShim.ofRows(spark, GroupedTopKNode(keyExprs, sortOrders, k, analyzed))
  }
}
