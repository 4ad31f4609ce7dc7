package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{SortedIntersectCount, SortedLastLeq, VecDot}

/** Spark extension entry point — the idiomatic way to ship the engine's
  * custom Catalyst expressions as a LIBRARY: add
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * to the session config (no code changes) and `sorted_last_leq`,
  * `sorted_intersect_count` and `vec_dot` resolve in `spark.sql(...)`
  * and `expr(...)` like built-ins, on every session of the application,
  * including sessions created before any graft API is touched.
  *
  * The `register(spark)` helpers on each expression object stay for
  * programmatic use (the query catalog calls them idempotently); this
  * class is the deployment-config path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // the SQL front door: temporal clauses + DML on GraftServer-registered
    // tables resolve in plain spark.sql — locally and over Spark Connect
    ext.injectParser((session, delegate) =>
      new graft.server.GraftSqlParser(session, delegate))
    // matview point reads: full-group-key equality → bucket-dir pruning
    ext.injectOptimizerRule(_ => graft.plans.MvBucketPrune)
    ext.injectFunction((FunctionIdentifier("sorted_last_leq"),
      new ExpressionInfo(classOf[SortedLastLeq].getName, "sorted_last_leq"),
      (exprs: Seq[Expression]) => SortedLastLeq(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs.head, exprs(1))))
  }
}
