package graft.util

import org.apache.spark.sql.DataFrame

/** Thread-local "plans-only" mode for EXPLAIN over statements that
  * substitute graft procedures.
  *
  * Procedure substitution normally PINS expensive intermediate stages
  * with `localCheckpoint()` (each pin runs a job) so a multi-consumer
  * pipeline executes its shared upstream once. Under EXPLAIN the
  * contract is the opposite: render the full substituted plan WITHOUT
  * running anything. This flag flips the pins to identity for the
  * current thread while the EXPLAIN's inner parse substitutes — the
  * rendered plan is the complete lazy pipeline (a strict superset of
  * the executed one: every stage a checkpoint would have hidden is
  * visible), and zero jobs launch.
  *
  * Scope is the thread because statement parsing is thread-confined
  * (the SQL front doors parse on the serving thread); the flag restores
  * on exit so nested parses and later statements see the mode they
  * started with.
  */
object PlansOnly {
  private val flag = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  def active: Boolean = flag.get()

  def apply[T](body: => T): T = {
    val prev = flag.get()
    flag.set(true)
    try body finally flag.set(prev)
  }

  /** Stage pin: `localCheckpoint()` (one job, result reused across
    * consumers) in normal execution, identity in plans-only mode. */
  def cp(df: DataFrame): DataFrame =
    if (active) df else df.localCheckpoint()
}
