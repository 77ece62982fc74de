// Lives in an org.apache.spark.sql subpackage ON PURPOSE: Dataset.ofRows —
// the one blessed way to wrap a custom LogicalPlan as a DataFrame — is
// private[sql]. This shim is the entire surface we take from the internal
// API; everything else in graft.plans uses public/developer-api types.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

object PlanBridge {
  def ofRows(s: org.apache.spark.sql.SparkSession, p: LogicalPlan): org.apache.spark.sql.DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], p)
}
