package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` seam this engine crosses: turning a custom
  * [[LogicalPlan]] node into a user-facing [[DataFrame]]. Spark exposes
  * injection points for custom STRATEGIES and RULES through
  * `SparkSessionExtensions`, but constructing a frame over a custom
  * logical node requires `Dataset.ofRows`, which is package-private —
  * so this accessor lives under `org.apache.spark.sql`, the standard
  * pattern Spark extension libraries use for exactly this call. Nothing
  * else in the engine reaches into Spark internals this way. */
object GraftSql {

  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
