package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Cross-engine deterministic rounding.
  *
  * Engine-native `round(double, k)` differs between Spark and DuckDB on
  * representation ties (Spark rounds the shortest decimal rendering via
  * BigDecimal.valueOf, DuckDB rounds the exact binary value), so a value
  * like 65764.165 rounds to .17 in Spark and .16 in DuckDB. The
  * composition floor(x*10^k + 0.5)/10^k uses only exact IEEE-754 ops and
  * therefore yields bit-identical results in any engine; oracle SQL twins
  * spell out the same formula.
  */
object Rounding {
  def r(c: Column, k: Int): Column = {
    val p = math.pow(10, k)
    floor(c * p + 0.5) / p
  }
}
