package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Whole-operator custom plan: top-k rows per key WITHOUT sorting.
  *
  * The classic `row_number().over(partitionBy(key).orderBy(...)) <= k`
  * pattern is planned by Spark 4 as WindowGroupLimit(Partial) → Sort →
  * Exchange → Sort → WindowGroupLimit(Final) → Window — the group limit
  * bounds emitted rows, but BOTH sides still fully SORT every partition
  * (O(n log n) + sort buffers + spills). At 100 TB the sorts, not the
  * limit, are the cost.
  *
  * This operator re-plans the same pattern as two bounded-HEAP passes
  * (O(n log k), no sort, no spill): a Partial exec reduces every map
  * partition to ≤ keys×k rows, EnsureRequirements inserts the hash
  * exchange demanded by the Final exec's ClusteredDistribution, and the
  * Final exec re-heaps per key and emits rows with their rank. Output
  * rows/values are IDENTICAL to the window formulation (same order
  * semantics, deterministic given a total order).
  *
  * Registered the Spark-native way — [[graft.GraftExtensions]] for
  * `spark.sql.extensions`, or [[TopKPerKeyExtension.install]] via the
  * public `spark.experimental` hooks on a live session. This is the
  * (c)-tier custom operator path: LogicalPlan + Rule[LogicalPlan] +
  * SparkStrategy + SparkPlan.
  */
object TopKPerKeyPlans {

  /** Logical node: child's rows, top `k` per `partitionExprs` under
    * `order`, plus the rank attribute the original window produced.
    */
  case class TopKPerKey(k: Int, partitionExprs: Seq[Expression],
      order: Seq[SortOrder], rankAttr: Attribute, child: LogicalPlan)
      extends logical.UnaryNode {
    override def output: Seq[Attribute] = child.output :+ rankAttr
    override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
      copy(child = newChild)
  }

  /** Rewrite Filter(rank ≤ k, Window(row_number() …)) → TopKPerKey.
    * Conservative: fires only on a single row_number window expression
    * with a non-empty order and a plain rank bound — anything else is
    * left to Spark's own planning.
    */
  object TopKRewriteRule extends Rule[LogicalPlan] {

    /** Long literal → Int only when it fits; out-of-range bounds mean
      * "keep (almost) everything" and must fall through to Spark's own
      * planning, not silently truncate to a tiny k.
      */
    private def longK(v: Long): Option[Int] =
      if (v >= 1 && v <= Int.MaxValue) Some(v.toInt) else None

    /** rank bound: (attr ≤ k) | (attr < k) | (k ≥ attr) | (k > attr). */
    private def boundOf(cond: Expression): Option[(Attribute, Int)] = cond match {
      case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType)) => Some((a, v))
      case LessThanOrEqual(a: Attribute, Literal(v: Long, LongType)) => longK(v).map((a, _))
      case LessThan(a: Attribute, Literal(v: Int, IntegerType)) => Some((a, v - 1))
      case LessThan(a: Attribute, Literal(v: Long, LongType)) => longK(v - 1).map((a, _))
      case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute) => Some((a, v))
      case GreaterThan(Literal(v: Int, IntegerType), a: Attribute) => Some((a, v - 1))
      case _ => None
    }

    /** The aliased window must be row_number() (optionally cast). */
    private def isRowNumber(e: Expression): Boolean = e match {
      case WindowExpression(_: RowNumber, _) => true
      case Cast(inner, _, _, _) => isRowNumber(inner)
      case _ => false
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      // partitionSpec must be non-empty: the Final exec demands
      // ClusteredDistribution(partitionExprs), and Spark rejects an
      // empty clustering — global top-k stays on Spark's own plan.
      case f @ logical.Filter(cond, w: logical.Window)
          if w.windowExpressions.size == 1 && w.orderSpec.nonEmpty &&
            w.partitionSpec.nonEmpty =>
        (w.windowExpressions.head, boundOf(cond)) match {
          case (alias @ Alias(expr, _), Some((rankAttr, k)))
              if isRowNumber(expr) && rankAttr.semanticEquals(alias.toAttribute)
                && k >= 1 =>
            // Spark's own InferWindowGroupLimit may already have slid a
            // WindowGroupLimit under the Window — subsume it.
            val base = w.child match {
              case g: logical.WindowGroupLimit => g.child
              case c => c
            }
            TopKPerKey(k, w.partitionSpec, w.orderSpec, alias.toAttribute, base)
          case _ => f
        }
    }
  }

  /** Plan TopKPerKey as Partial (map-side heap, no distribution demand)
    * feeding Final (ClusteredDistribution → EnsureRequirements inserts
    * the one hash exchange between them).
    */
  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKey(k, parts, order, rankAttr, child) =>
        val partial = TopKPerKeyExec(k, parts, order, None, planLater(child))
        TopKPerKeyExec(k, parts, order, Some(rankAttr), partial) :: Nil
      case _ => Nil
    }
  }

  /** Bounded-heap per-key top-k. `rankAttr = None` → Partial (emits the
    * retained rows only); `Some(attr)` → Final (clustered input, emits
    * rank 1..k per key, best first).
    */
  case class TopKPerKeyExec(k: Int, partitionExprs: Seq[Expression],
      order: Seq[SortOrder], rankAttr: Option[Attribute], child: SparkPlan)
      extends UnaryExecNode {

    override def output: Seq[Attribute] = child.output ++ rankAttr
    override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
    override def outputPartitioning: Partitioning = child.outputPartitioning
    override def requiredChildDistribution: Seq[Distribution] = rankAttr match {
      case Some(_) => ClusteredDistribution(partitionExprs) :: Nil
      case None => UnspecifiedDistribution :: Nil
    }
    override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
      copy(child = newChild)

    override protected def doExecute(): RDD[InternalRow] = {
      val childOutput = child.output
      val kLocal = k
      val partsLocal = partitionExprs
      val orderLocal = order
      val rankLocal = rankAttr
      val outLocal = output
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(partsLocal, childOutput)
        // ascending comparator: compare < 0 ⇔ ranks earlier (better);
        // PriorityQueue max under it = the WORST retained row (the
        // eviction candidate)
        val ord = GenerateOrdering.generate(orderLocal, childOutput)
        val heaps = new java.util.LinkedHashMap[UnsafeRow,
          scala.collection.mutable.PriorityQueue[InternalRow]]()
        iter.foreach { row =>
          val key = keyProj(row)
          var h = heaps.get(key)
          if (h == null) {
            h = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(key.copy(), h)
          }
          if (h.size < kLocal) h.enqueue(row.copy())
          else if (ord.compare(row, h.head) < 0) {
            h.dequeue()
            h.enqueue(row.copy())
          }
        }
        import scala.jdk.CollectionConverters._
        rankLocal match {
          case None =>
            heaps.values().iterator().asScala.flatMap(_.iterator)
          case Some(attr) =>
            val join = new JoinedRow
            val rankRow = new GenericInternalRow(1)
            val proj = UnsafeProjection.create(outLocal, childOutput :+ attr)
            val isLong = attr.dataType == LongType
            heaps.values().iterator().asScala.flatMap { h =>
              // dequeueAll = priority order = worst first; reverse = rank order
              val best = h.dequeueAll.reverse
              best.iterator.zipWithIndex.map { case (r, i) =>
                if (isLong) rankRow.setLong(0, (i + 1).toLong)
                else rankRow.setInt(0, i + 1)
                proj(join(r, rankRow))
              }
            }
        }
      }, preservesPartitioning = true)
    }
  }

  /** Runtime installation through the public experimental hooks. */
  object TopKPerKeyExtension {
    def install(spark: SparkSession): Unit = {
      if (!spark.experimental.extraOptimizations.contains(TopKRewriteRule))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ TopKRewriteRule
      if (!spark.experimental.extraStrategies.contains(TopKStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKStrategy
    }
  }
}
