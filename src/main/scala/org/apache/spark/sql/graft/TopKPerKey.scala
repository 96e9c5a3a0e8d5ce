package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** `TopKPerKey(keys, order, k)` — keep the top-k rows of each key group.
  *
  * The DataFrame idiom (`row_number().over(Window.partitionBy(keys)
  * .orderBy(order)) <= k`) shuffles on the keys and then SORTS every row
  * of every group before discarding all but k — at N rows per hot key
  * that is N·log N work and N rows of sort buffer for k survivors. This
  * operator keeps the same clustered shuffle but replaces the sort with
  * one bounded k-heap per key: O(N·log k) time, O(keys·k) memory, no
  * spill pressure from doomed rows.
  *
  * Logical node + planner strategy (injected by graft.GraftExtensions);
  * rows within a group come back in arbitrary order — callers that want
  * ranks sort the ≤ keys·k survivors, which is the cheap part.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keysLocal = keys
    val orderLocal = order
    val schema = child.output
    val kLocal = k
    child.execute().mapPartitionsInternal { it =>
      val keyProj = UnsafeProjection.create(keysLocal, schema)
      // "largest" under this ordering = the WORST kept row → heap head
      val rowOrd = new LazilyGeneratedOrdering(orderLocal, schema)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val cmp = new java.util.Comparator[UnsafeRow] {
        // reversed: priority queue head = max = worst-ranked row
        def compare(a: UnsafeRow, b: UnsafeRow): Int = rowOrd.compare(b, a)
      }
      it.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, cmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) {
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        } else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to the exec node. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Public constructor (lives here because Dataset.ofRows is private[sql]). */
object TopKPerKey {
  def apply(df: org.apache.spark.sql.DataFrame,
            keys: Seq[org.apache.spark.sql.Column],
            order: Seq[org.apache.spark.sql.Column],
            k: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // self-heal sessions built without GraftExtensions: without a strategy
    // for the node the planner would throw, so register through the public
    // experimental hook (idempotent; harmless next to the injected copy)
    if (!spark.sessionState.planner.strategies.contains(TopKPerKeyStrategy) &&
        !spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    // session.expression converts Column nodes into real catalyst
    // expressions (GraftBridge's lazy wrapper is only resolved by the
    // Dataset layer, which this custom node bypasses)
    val keyExprs = keys.map(spark.expression)
    val sortExprs = order.map { c =>
      spark.expression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark, TopKPerKeyPlan(keyExprs, sortExprs, k, df.queryExecution.analyzed))
  }
}
