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
        // the retained set (#keys × k rows per partition) is accounted
        // against the task's execution-memory pool, so a high-cardinality
        // key can't silently OOM the executor: acquisition pressure first
        // forces other consumers to spill, and exhaustion fails THIS task
        // with a clean memory error instead of killing the JVM
        val book = HeapBook.forCurrentTask()
        val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        while (iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, revCmp)
            val kc = key.copy()
            book.retain(kc.getSizeInBytes + HeapBook.PerEntryOverhead)
            heaps.put(kc, heap)
          }
          if (heap.size() < kLocal) {
            val rc = row.copy()
            book.retain(HeapBook.rowBytes(rc))
            heap.add(rc)
          } else if (ordering.compare(row, heap.peek()) < 0) {
            val out = heap.poll()
            book.release(HeapBook.rowBytes(out))
            val rc = row.copy()
            book.retain(HeapBook.rowBytes(rc))
            heap.add(rc)
          }
        }
        import scala.jdk.CollectionConverters._
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      }
    }
  }

  /** Execution-memory bookkeeping for the per-partition heap state: a
    * non-spillable [[org.apache.spark.memory.MemoryConsumer]] that
    * acquires from the task memory pool as rows are retained and frees
    * on eviction / task end. It cannot spill (heaps must stay resident
    * for the final emit), but registering makes the usage VISIBLE to
    * Spark's memory manager — the two failure modes become (a) other
    * spillable consumers shrink, or (b) this task fails with an
    * attributed memory error — instead of an unattributed executor OOM. */
  private[plans] class HeapBook(tmm: org.apache.spark.memory.TaskMemoryManager)
    extends org.apache.spark.memory.MemoryConsumer(
      tmm, tmm.pageSizeBytes(), org.apache.spark.memory.MemoryMode.ON_HEAP) {
    override def spill(size: Long, trigger: org.apache.spark.memory.MemoryConsumer): Long = 0L
    private var pending = 0L // acquire in chunks to amortize pool locking
    def retain(bytes: Long): Unit = {
      pending += bytes
      if (pending >= HeapBook.ChunkBytes) { acquireChunk(pending); pending = 0L }
    }
    def release(bytes: Long): Unit = pending -= bytes // netted against future retains
    private def acquireChunk(bytes: Long): Unit = {
      val got = acquireMemory(bytes)
      if (got < bytes) {
        freeMemory(got)
        throw new org.apache.spark.SparkException(
          s"GroupedTopKExec: cannot reserve $bytes bytes of execution memory for per-key " +
            s"top-k heaps (used=${getUsed}); key cardinality × k exceeds the task budget — " +
            "disable the rewrite (spark.graft.groupedTopK.rewrite=false) to fall back to " +
            "the spillable window sort")
      }
    }
  }
  private[plans] object HeapBook {
    val PerEntryOverhead = 64L // HashMap node + PriorityQueue slot + object headers
    val ChunkBytes = 1L << 20
    def rowBytes(r: InternalRow): Long = r match {
      case u: UnsafeRow => u.getSizeInBytes + PerEntryOverhead
      case _ => 256L
    }
    def forCurrentTask(): HeapBook = {
      val tc = org.apache.spark.TaskContext.get()
      val book = new HeapBook(org.apache.spark.GraftTaskShim.taskMemoryManager(tc))
      tc.addTaskCompletionListener[Unit](_ => book.freeMemory(book.getUsed))
      book
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
    /** Runtime kill switch (`SET spark.graft.groupedTopK.rewrite=false`):
      * the heap operator holds its retained set resident (accounted, but
      * non-spillable — see [[HeapBook]]), so a session can opt back into
      * Spark's spillable window sort per-query without a redeploy. */
    val EnabledKey = "spark.graft.groupedTopK.rewrite"
    val MaxRewriteK = 10000
    /** Planning-time budget for the per-task retained heap set; when
      * the child's statistics estimate MORE than this, the rewrite
      * declines and the query keeps Spark's spillable window sort —
      * the failure mode becomes "didn't rewrite", never a mid-job
      * task kill from [[HeapBook]] exhaustion. */
    val MaxHeapBytesKey = "spark.graft.groupedTopK.maxHeapBytesPerTask"
    val DefaultMaxHeapBytesPerTask: Long = 256L << 20

    /** Estimated per-task heap bytes vs budget, from whatever logical
      * stats exist (coarse by design — this is a veto, not a cost
      * model):
      *  - key distinct-counts known (CBO / ANALYZE): retained rows =
      *    min(#keys × k, rows);
      *  - only rowCount known (e.g. range, local relations): worst
      *    case every row is its own key → retained = rows;
      *  - bytes only (un-analyzed scans): worst case the whole child
      *    stays resident → compare sizeInBytes directly.
      * The conservative direction is deliberate: an unknown key
      * cardinality at 100 TB is exactly when a non-spillable resident
      * heap is the wrong physical choice. */
    private def withinHeapBudget(part: Seq[Expression], k: Int, child: LogicalPlan): Boolean = {
      val budget = BigInt(conf.getConfString(
        MaxHeapBytesKey, DefaultMaxHeapBytesPerTask.toString).toLong)
      val stats = child.stats
      val tasks = BigInt(math.max(1, conf.numShufflePartitions))
      val avgRow: BigInt = stats.rowCount.filter(_ > 0)
        .map(rc => (stats.sizeInBytes / rc).max(BigInt(24))).getOrElse(BigInt(128))
      val keyAttrs = part.collect { case a: Attribute => a }
      val distinctKeys: Option[BigInt] =
        if (keyAttrs.length == part.length && keyAttrs.forall(a =>
          stats.attributeStats.get(a).exists(_.distinctCount.isDefined)))
          Some(keyAttrs.map(a => stats.attributeStats(a).distinctCount.get).product)
        else None
      (distinctKeys, stats.rowCount) match {
        case (Some(keys), rc) =>
          val retained = rc.fold(keys * k)(r => (keys * k).min(r))
          retained * avgRow / tasks <= budget
        case (None, Some(rc)) => rc * avgRow / tasks <= budget
        case (None, None) => stats.sizeInBytes / tasks <= budget
      }
    }

    private def limitFromCond(cond: Expression, rn: ExprId): Option[Int] = cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rn => Some(k)
      case LessThan(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rn => Some(k - 1)
      case EqualTo(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rn && k == 1 => Some(1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference) if a.exprId == rn => Some(k)
      case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference) if a.exprId == rn => Some(k - 1)
      case _ => None
    }

    override def apply(plan: LogicalPlan): LogicalPlan =
      if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
      else plan.transformUp {
      case p @ Project(projList,
          Filter(cond,
            Window(Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)), part, ord, child, _)))
          if part.nonEmpty && ord.nonEmpty &&
            (part ++ ord).forall(_.deterministic) &&
            !projList.exists(_.references.contains(al.toAttribute)) =>
        limitFromCond(cond, al.exprId) match {
          case Some(k) if k > 0 && k <= MaxRewriteK &&
              withinHeapBudget(part, k, child) =>
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
