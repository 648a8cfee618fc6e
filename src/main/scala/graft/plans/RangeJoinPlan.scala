package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Custom physical operator demo — the full (c) extension path: logical
  * node → planner Strategy → SparkPlan with a hand-written doExecute.
  *
  * Interval (range) joins have no equi-key, so Spark plans them as a
  * broadcast-nested-loop: every probe row is tested against every interval
  * WITH full expression evaluation per pair. This operator exploits the
  * interval structure instead: the (small) interval side is collected once,
  * sorted by `lo`, broadcast, and each probe row scans only candidate
  * intervals with primitive comparisons — no per-pair expression eval.
  *
  * Scale shape: probe side streams (narrow, no shuffle); interval side must
  * be broadcast-small, which is the only scalable interval-join layout
  * anyway. Registered via `GraftExtensions` (strategy injection); the
  * `exec()` helper applies it eagerly for extension-built sessions.
  */
case class RangeJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    valueCol: String,
    loCol: String,
    hiCol: String
) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  // the join columns are referenced by name, not by expressions — declare
  // them so column pruning doesn't strip them from the children
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output.filter(_.name == valueCol) ++
        right.output.filter(a => a.name == loCol || a.name == hiCol))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinNode =
    copy(left = newLeft, right = newRight)
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinNode(l, r, v, lo, hi) =>
      BroadcastRangeJoinExec(planLater(l), planLater(r), v, lo, hi) :: Nil
    case _ => Nil
  }
}

case class BroadcastRangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    valueCol: String,
    loCol: String,
    hiCol: String
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def doExecute(): RDD[InternalRow] = {
    val valIdx = left.output.indexWhere(_.name == valueCol)
    val loIdx = right.output.indexWhere(_.name == loCol)
    val hiIdx = right.output.indexWhere(_.name == hiCol)
    require(valIdx >= 0 && loIdx >= 0 && hiIdx >= 0,
      s"range join columns not found: $valueCol/$loCol/$hiCol")
    // collect + broadcast the interval side, sorted by lo
    val intervals = right.executeCollect()
      .map(r => (r.getDouble(loIdx), r.getDouble(hiIdx), r.copy()))
      .sortBy(_._1)
    val bc = session.sparkContext.broadcast(intervals)
    val out = output
    left.execute().mapPartitions { rows =>
      val ivs = bc.value
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(out, out)
      rows.flatMap { lrow =>
        val v = lrow.getDouble(valIdx)
        // intervals sorted by lo: stop scanning once lo > v
        ivs.iterator.takeWhile(_._1 <= v).collect {
          case (_, hi, rrow) if v < hi => proj(joined(lrow, rrow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)
}

object RangeJoinPlan {
  /** Build a DataFrame over the custom node (session must carry
    * GraftExtensions so RangeJoinStrategy can plan it). Value/lo/hi columns
    * must be DoubleType. */
  def exec(left: DataFrame, intervals: DataFrame,
      valueCol: String, loCol: String, hiCol: String): DataFrame =
    GraftBridge.ofRows(left.sparkSession,
      RangeJoinNode(GraftBridge.logicalPlan(left),
        GraftBridge.logicalPlan(intervals), valueCol, loCol, hiCol))
}
