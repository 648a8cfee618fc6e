package graft

import graft.expressions.ArrayDot
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available to SQL. Attach at session build time:
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (exprs: Seq[Expression]) => ArrayDot(exprs(0), exprs(1))))
    e.injectResolutionRule(_ => graft.plans.ResolveTopKPerGroup)
    e.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
  }
}

/** Runtime registration for sessions built without extensions. */
object GraftFunctions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot",
      (exprs: Seq[Expression]) => ArrayDot(exprs(0), exprs(1)),
      "scala_udf")
}
