package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.graft.ColumnBridge

/** User-facing entry for the native as-of join physical operator. */
object NativeAsOf {

  /** Backward as-of join through [[AsOfJoinPlan]]/[[AsOfJoinExec]].
    * Output: all left columns + the right columns except its key/ts
    * (null when no match). Registers the planner strategy on the session
    * if absent (or build the session with graft.GraftExtensions). */
  def backward(left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTsCol: String, rightTsCol: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

    val lPlan = left.queryExecution.analyzed
    // re-alias the right side so self-joins never share expression ids
    val rAnalyzed = right.queryExecution.analyzed
    val rPlan = Project(rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${out.map(_.name)}"))
    val rOut = rPlan.output
    ColumnBridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan.output, leftKeyCol), attr(rOut, rightKeyCol),
      attr(lPlan.output, leftTsCol), attr(rOut, rightTsCol)))
  }
}
