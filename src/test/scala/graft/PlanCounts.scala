package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** Shared AQE-aware plan-node counters for plan-shape asserts.
  * QueryStageExec (incl. Spark 4's ResultQueryStage) is a LEAF node, so
  * a naive collect over an executed adaptive plan sees NOTHING inside
  * materialized stages — a zero-exchange assert without this recursion
  * passes vacuously (the round-15 lesson; Queries.scala keeps its own
  * main-scope copy for the in-query j14 assert). */
object PlanCounts {
  def countIn(p: SparkPlan)(pf: PartialFunction[SparkPlan, Int]): Int =
    p.collect {
      case a: AdaptiveSparkPlanExec => countIn(a.executedPlan)(pf)
      case q: QueryStageExec => countIn(q.plan)(pf)
      case n if pf.isDefinedAt(n) => pf(n)
    }.sum

  def exchanges(p: SparkPlan): Int = countIn(p) { case _: ShuffleExchangeExec => 1 }
  def smjs(p: SparkPlan): Int = countIn(p) { case _: SortMergeJoinExec => 1 }
}
