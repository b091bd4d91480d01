package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar helpers shared across operators.
  *
  * Reference semantics covered (SURVEY.md §2.6):
  *  - X1 bool→0/1 normalization applied by schema walk
  *    (reference: `Azure_datalake_etl/Gonukkad_Merchants.py:71-72,123` —
  *    `convert_boolean` over a dynamically inferred schema).
  *  - X3 `"Not_Found"` null-sentinel defaulting
  *    (reference: `buisness_profile_etl/main.py:501-513,531-535`).
  *
  * Determinism: cross-engine (Spark vs DuckDB oracle) double sums are
  * order-dependent in the last bits, so any money-style aggregate first
  * casts each value to `decimal(18,6)` (exact for ≤3-factor products of
  * 2-decimal inputs), sums exactly in decimal (order-independent), and
  * casts the final total back to double (one deterministic rounding).
  */
object Scalars {
  val NotFoundSentinel = "Not_Found"

  /** X3: null → "Not_Found" (BP:501 et al.). */
  def notFound(c: Column): Column = coalesce(c, lit(NotFoundSentinel))

  /** Deterministic per-value fixed-point view of a double. Scale 6: the
    * testdata money values have ≤2 decimal digits, so products of up to
    * three of them have ≤6 — the cast is then EXACT on both engines
    * (scale 4 would round x.xxxx5 halves differently: Spark rounds the
    * shortest decimal repr of the double, DuckDB the binary value).
    */
  def money(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Order-independent sum of a double column, returned as double. */
  def moneySum(c: Column): Column = sum(money(c)).cast(DoubleType)

  /** Deterministic average: exact decimal sum → double, / count. */
  def moneyAvg(c: Column): Column = moneySum(c) / count(lit(1))

  /** X1: 0/1-normalize every BooleanType column found in the runtime
    * schema (the reference walks `rows[0].keys()`, so this must not
    * hardcode column names — SURVEY §7.4).
    */
  def normalizeBooleans(df: DataFrame): DataFrame =
    df.schema.fields.filter(_.dataType == BooleanType).foldLeft(df) {
      (d, f) => d.withColumn(f.name, col(f.name).cast(IntegerType))
    }
}
