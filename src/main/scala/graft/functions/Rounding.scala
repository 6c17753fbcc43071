package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Engine-portable decimal rounding for oracle-checked quotients.
  *
  * `round(x, n)` on a double is NOT portable: Spark rounds the
  * shortest decimal representation (BigDecimal HALF_UP) while DuckDB
  * rounds the binary value — they disagree whenever the shortest repr
  * sits on a half boundary the binary value is just below (e.g.
  * 2469/20000). `floor(x * 10^n + 0.5) / 10^n` is the same IEEE
  * multiply/add/floor/divide sequence in both engines, so identical
  * input doubles give identical output doubles. Use for any ratio /
  * quotient column in an oracle-checked query; sums may keep plain
  * `round` (applied after order-independent aggregation).
  */
object Rounding {
  def portableRound4(c: Column): Column = floor(c * 10000 + 0.5) / 10000
}
