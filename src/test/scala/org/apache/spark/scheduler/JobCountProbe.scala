package org.apache.spark.scheduler

import org.apache.spark.SparkContext

/** Test probe: the number of jobs EVER submitted to this context's
  * DAGScheduler. `nextJobId` increments synchronously inside
  * `submitJob` on the submitting thread, so "jobs after − jobs before"
  * is a deterministic zero-jobs assertion — unlike listener-based
  * counting, which races the async listener bus, and unlike
  * QueryExecutionListener, which never sees bare RDD jobs at all. */
object JobCountProbe {
  def totalJobsSubmitted(sc: SparkContext): Int =
    sc.dagScheduler.nextJobId.get()
}
