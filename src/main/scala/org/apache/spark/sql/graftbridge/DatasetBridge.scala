package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Access bridge for constructing DataFrames from custom logical plans
  * (`Dataset.ofRows` is `private[sql]`) — the [[ColumnBridge]] sibling
  * for whole-plan extensions like graft's TopKPerKey. */
object DatasetBridge {
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(s.asInstanceOf[CSparkSession], plan)

  /** The analyzed plan of a DataFrame, usable as a child of a custom
    * logical node. */
  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[CDataset[_]].queryExecution.analyzed

  /** EAGER Column → Catalyst conversion through the session's
    * ColumnNodeToExpressionConverter. Unlike [[ColumnBridge.expression]]
    * (a lazy `ColumnNodeExpression` wrapper, fine inside standard
    * operators that re-enter the Dataset API), this produces the real
    * catalyst tree immediately — required when the expression is stored
    * in a CUSTOM logical node, where nothing later unwraps the lazy
    * node and e.g. a `.desc` Column would otherwise reach execution as
    * an unresolved, non-serializable wrapper. */
  def sessionExpression(s: SparkSession, c: org.apache.spark.sql.Column)
  : org.apache.spark.sql.catalyst.expressions.Expression =
    s.asInstanceOf[CSparkSession].expression(c)
}
