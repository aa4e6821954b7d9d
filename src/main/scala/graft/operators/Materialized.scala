package graft.operators

import org.apache.spark.sql.DataFrame

/** Lifecycle handle for the materialized (checkpointed) blocks some
  * operators leave resident behind their returned DataFrame.
  *
  * `dedupClusters` (final label set), `packSequences` and
  * `quotaSample`/`quotaSampleBudgets` (the sized range layout their
  * totals and spans both read) each return a plan backed by one
  * checkpointed RDD — the caller's working set. Intermediates are freed
  * inside the operators; the backing block CANNOT be (executing the
  * returned plan still needs it), so on a long-lived session each
  * invocation pins one O(ids) block until the caller releases it. This
  * is the release: call it once the result has been written/collected
  * and the DataFrame will not be executed again.
  */
object Materialized {

  /** Unpersists every materialized RDD in `df`'s lineage. After this
    * the DataFrame MUST NOT be executed again — a localCheckpoint's
    * lineage is truncated and cannot recompute (Spark logs the same
    * warning), and a reliable checkpoint would re-read from the
    * checkpoint dir only if its files still exist. */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
