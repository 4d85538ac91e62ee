package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge

/** Per-key top-k as a first-class operator.
  *
  * Spark's own InferWindowGroupLimit (3.5+) already map-side-limits
  * the `filter(row_number <= k)` window pattern, but its partial stage
  * still SORTS every input partition (WindowGroupLimitExec requires
  * child ordering) — O(n log n) per partition. This operator runs a
  * bounded heap per key instead — O(n log k), no sort node at all —
  * and is callable on any DataFrame without window bookkeeping. Either
  * way at most k rows per (key, input-partition) reach the shuffle; at
  * 100 TB the win is skipping the full map-side sort of the fact
  * table.
  *
  * Shape: logical node → [[TopKStrategy]] plans a partial exec (no
  * distribution requirement) under a final exec (requires clustering
  * by key, so EnsureRequirements inserts exactly one exchange between
  * them) — the same partial/final split Spark's HashAggregate uses.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Expression, tie: Expression,
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKExec {
  /** Partial-stage retained-row budget before a FLUSH (emit all
    * current heaps downstream, clear, continue). The per-key heap map
    * is otherwise unbounded in DISTINCT-KEY cardinality: a partial
    * task over an un-clustered input can see the whole key universe —
    * measured at 400× (878.8M mirrored pair rows, ~2M distinct keys
    * per task × k row copies × 24 concurrent tasks) as a heap OOM
    * that 96 GB could not absorb. Flushing is HashAggregate's
    * partial-agg semantics: the final exec re-heaps per key, so an
    * early flush emits more-than-k rows per key across epochs (each
    * epoch ≤ k per key) and costs shuffle volume, never correctness.
    * 2²⁰ retained rows ≈ 100-200 MB of UnsafeRow copies per task.
    */
  val partialFlushRows: Int = 1 << 20

  /** Bounded per-key heaps over one partition's rows; emits each key's
    * current top-k (unsorted — the final exec re-heaps anyway and the
    * caller appends a deterministic orderBy). `flushRows` bounds the
    * retained-row count (partial stage only; the final stage passes
    * Int.MaxValue — its per-partition key count is already divided by
    * the shuffle, and exact per-key top-k cannot flush early).
    */
  def localTopK(iter: Iterator[InternalRow], keyProj: UnsafeProjection,
      ordering: Ordering[InternalRow], k: Int,
      flushRows: Int = Int.MaxValue): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      // GenerateOrdering: compare(a,b) < 0 ⇔ a sorts FIRST (a is
      // better). A PQ maximizes its ordering, so the PQ max under
      // `ordering` is the row that sorts LAST — the weakest kept row —
      // exactly the eviction candidate. No reversal.
      private var retained = 0
      private var out: Iterator[InternalRow] = Iterator.empty
      private def refill(): Unit = {
        while (!out.hasNext && iter.hasNext) {
          while (iter.hasNext && retained < flushRows) {
            val row = iter.next()
            val key = keyProj(row)
            // probe with the transient projection row; copy the key
            // only on a miss — getOrElseUpdate(key.copy(), ...) paid
            // an UnsafeRow allocation per INPUT row (~99.8% map hits
            // on the motivating 878.8M-row graph seed)
            val heap = heaps.get(key) match {
              case Some(h) => h
              case None =>
                val h = scala.collection.mutable.PriorityQueue
                  .empty[InternalRow](ordering)
                heaps.put(key.copy(), h)
                h
            }
            if (heap.size < k) { heap.enqueue(row.copy()); retained += 1 }
            else if (ordering.lt(row, heap.head)) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          }
          // snapshot THEN clear — the rows are already copies, so the
          // flush materializes no new data beyond the retained budget
          val snap = new Array[InternalRow](retained)
          var i = 0
          heaps.valuesIterator.foreach(_.foreach { r => snap(i) = r; i += 1 })
          heaps.clear(); retained = 0
          out = snap.iterator
        }
      }
      override def hasNext: Boolean = { if (!out.hasNext) refill(); out.hasNext }
      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException("empty top-k iterator")
        out.next()
      }
    }
}

case class TopKPartialExec(keys: Seq[Expression], order: Expression, tie: Expression,
    k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] = {
    val (keyExprs, sortOrders) = TopKStrategy.bound(keys, order, tie, child.output)
    child.execute().mapPartitions { iter =>
      TopKExec.localTopK(iter, UnsafeProjection.create(keyExprs),
        GenerateOrdering.generate(sortOrders), k, TopKExec.partialFlushRows)
    }
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
    copy(child = newChild)
}

case class TopKFinalExec(keys: Seq[Expression], order: Expression, tie: Expression,
    k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(TopKStrategy.bound(keys, order, tie, child.output)._1) :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val (keyExprs, sortOrders) = TopKStrategy.bound(keys, order, tie, child.output)
    child.execute().mapPartitions { iter =>
      TopKExec.localTopK(iter, UnsafeProjection.create(keyExprs),
        GenerateOrdering.generate(sortOrders), k)
    }
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
    copy(child = newChild)
}

/** Optimizer rule: push a deterministic filter that references only
  * the TopK key columns BELOW the TopK node. Selecting whole key
  * groups commutes with per-key top-k (dropping a group never changes
  * another group's top-k), but Catalyst can't know that for a foreign
  * node — without this rule a `topK(...).filter(key = x)` pays the
  * full top-k over every group and the filter never reaches the scan.
  * Registered via GraftExtensions.injectOptimizerRule; the pushed
  * filter then participates in normal scan pushdown at planning time.
  */
object TopKFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, t @ TopKPerKeyNode(keys, _, _, _, child))
        if cond.deterministic &&
          cond.references.subsetOf(AttributeSet(keys.flatMap(_.references))) =>
      t.copy(child = Filter(cond, child))
  }
}

object TopKStrategy extends SparkStrategy {
  /** Resolve against the child's output, then bind to input ordinals
    * (AttributeReference alone is Unevaluable in exec code). Resolution
    * is by exprId first — name matching would silently bind the wrong
    * column when the child output carries duplicate names (self-join
    * outputs); the name fallback only covers attributes re-created by
    * an optimizer rewrite that didn't preserve ids.
    */
  private[plans] def bound(keys: Seq[Expression], order: Expression, tie: Expression,
      output: Seq[Attribute]): (Seq[Expression], Seq[SortOrder]) = {
    def bind(e: Expression): Expression = {
      val resolved = e.transform {
        case a: Attribute =>
          output.find(_.exprId == a.exprId)
            .orElse {
              // Fallback for ids re-created by an optimizer rewrite. An
              // ambiguous name here (self-join output) must fail loudly —
              // picking the first match would silently bind the wrong
              // column.
              val byName = output.filter(_.name == a.name)
              if (byName.size > 1) throw new IllegalStateException(
                s"TopKPerKey: ambiguous attribute '${a.name}' (exprId miss, " +
                  s"${byName.size} name matches) — cannot bind safely")
              byName.headOption
            }
            .getOrElse(a)
      }
      org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(resolved, org.apache.spark.sql.catalyst.expressions.AttributeSeq(output))
    }
    (keys.map(bind), Seq(SortOrder(bind(order), Descending), SortOrder(bind(tie), Ascending)))
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, tie, k, child) =>
      TopKFinalExec(keys, order, tie, k,
        TopKPartialExec(keys, order, tie, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** DataFrame API: top-k rows per key, ranked by `orderCol` desc with
    * `tieCol` asc as the deterministic tie-break. Registers the planner
    * strategy idempotently so it works on any session.
    */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
      tieCol: String, k: Int): DataFrame =
    perKey(df, keyCols.map(df(_)), df(orderCol), df(tieCol), k)

  /** Column-based variant for inputs whose output carries duplicate
    * names (e.g. a self-join) — name lookup can't address those, but a
    * side-qualified Column (`joined("a.v")`) carries the exprId the
    * binder resolves by.
    */
  def perKey(df: DataFrame, keys: Seq[Column], order: Column,
      tie: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    val node = TopKPerKeyNode(
      keys.map(Bridge.expression),
      Bridge.expression(order),
      Bridge.expression(tie),
      k, Bridge.logicalPlan(df))
    Bridge.ofRows(spark, node)
  }
}
