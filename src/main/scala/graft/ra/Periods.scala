package graft.ra

import org.apache.spark.sql.Column

/** SQL:2011 period predicates over half-open intervals `[from, to)`.
  *
  * The reference engine implements these in its expression compiler for
  * valid-/system-time periods (xtdb/core2 `core2/expression/temporal.clj`;
  * bitemporality per /root/reference/README.adoc:11). Spark has no PERIOD
  * type, so a period is simply a pair of timestamp Columns; every
  * predicate composes from built-in comparisons — fully codegen'd, fully
  * pushdown-friendly (a sargable inequality reaches the parquet scan,
  * which is what makes temporal pruning work at 100 TB; SURVEY.md §1.4).
  */
object Periods {

  /** A period value: half-open `[from, to)`. `to` uses a far-future
    * sentinel rather than NULL for "unbounded" so range predicates stay
    * sargable and parquet-stat-prunable. */
  final case class Period(from: Column, to: Column)

  def period(from: Column, to: Column): Period = Period(from, to)

  /** a OVERLAPS b — the intervals share at least one instant. */
  def overlaps(a: Period, b: Period): Column =
    a.from < b.to && b.from < a.to

  /** a CONTAINS b (period version). */
  def contains(a: Period, b: Period): Column =
    a.from <= b.from && a.to >= b.to

  /** a CONTAINS ts (point version). */
  def containsTs(a: Period, ts: Column): Column =
    a.from <= ts && ts < a.to

  /** a EQUALS b. */
  def equalsP(a: Period, b: Period): Column =
    a.from === b.from && a.to === b.to

  /** a PRECEDES b — a ends at or before b starts. */
  def precedes(a: Period, b: Period): Column = a.to <= b.from

  /** a SUCCEEDS b — a starts at or after b ends. */
  def succeeds(a: Period, b: Period): Column = a.from >= b.to

  /** a IMMEDIATELY PRECEDES b — a ends exactly where b starts. */
  def immediatelyPrecedes(a: Period, b: Period): Column = a.to === b.from

  /** a IMMEDIATELY SUCCEEDS b — a starts exactly where b ends. */
  def immediatelySucceeds(a: Period, b: Period): Column = a.from === b.to
}
