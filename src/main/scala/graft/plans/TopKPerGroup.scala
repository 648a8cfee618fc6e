package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom logical operator: top-k rows per group — the "whole-operator
  * semantics" extension path (SURVEY.md §2: custom `LogicalPlan` +
  * `Rule` + `SparkSessionExtensions`).
  *
  * The node itself carries only intent; [[ResolveTopKPerGroup]] lowers it
  * onto the standard Window(row_number) + Filter + Project shape, so
  * Catalyst's existing window planning (single shuffle on the group keys,
  * sort within partition, AQE) does the heavy lifting — a custom
  * `SparkPlan` would only re-implement what the engine already plans
  * optimally. Lowering happens either eagerly ([[TopKPerGroup.apply]]) or
  * during analysis when the rule is injected via `graft.GraftExtensions`.
  */
case class TopKPerGroup(
    groupCols: Seq[String],
    orderCol: String,
    descending: Boolean,
    k: Int,
    child: LogicalPlan
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object ResolveTopKPerGroup extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case TopKPerGroup(groups, orderCol, desc, k, child) if child.resolved =>
      def attr(name: String): Attribute =
        child.output.find(_.name == name).getOrElse(
          throw new IllegalArgumentException(
            s"TopKPerGroup: column '$name' not in ${child.output.map(_.name)}"))
      val partitionSpec: Seq[Expression] = groups.map(attr)
      val orderSpec = Seq(SortOrder(attr(orderCol),
        if (desc) Descending else Ascending))
      val rn = Alias(
        WindowExpression(
          RowNumber(),
          WindowSpecDefinition(partitionSpec, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
        "_graft_rn")()
      val window = Window(Seq(rn), partitionSpec, orderSpec, child)
      val filtered = Filter(LessThanOrEqual(rn.toAttribute, Literal(k)), window)
      Project(child.output, filtered)
  }
}

object TopKPerGroup {
  /** Eager API: lower immediately (works on any session; sessions built
    * with GraftExtensions can also analyze the raw node). */
  def apply(df: DataFrame, groupCols: Seq[String], orderCol: String,
      descending: Boolean, k: Int): DataFrame =
    GraftBridge.ofRows(df.sparkSession,
      ResolveTopKPerGroup(TopKPerGroup(groupCols, orderCol, descending, k,
        GraftBridge.logicalPlan(df))))
}
