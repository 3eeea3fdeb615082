package graft.core

import org.apache.spark.sql.DataFrame

/** Measurement hook (optimization guide §1/§7.2): when `GRAFT_PLAN_DIR`
  * is set, write a DataFrame's formatted physical plan to
  * `$GRAFT_PLAN_DIR/<name>.txt`. Used by operators whose hot plan is
  * internal (built and executed inside the operator) so before/after
  * plan evidence can be captured without running the Spark UI. No-op
  * in normal runs.
  */
object PlanDump {
  def dump(name: String, df: DataFrame): Unit =
    sys.env.get("GRAFT_PLAN_DIR").foreach { pd =>
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$pd/$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
}
