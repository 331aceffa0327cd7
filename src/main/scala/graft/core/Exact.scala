package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-arithmetic helpers for oracle-parity aggregation.
  *
  * The fixture money columns (`*price`, `*acctbal`, `l_discount`, `value`)
  * are clean 2-decimal doubles. Summing doubles directly is
  * order-dependent (Spark's partial/final hash agg adds in partition order;
  * DuckDB in its own order), so the last few bits of a plain `sum(double)`
  * can differ between engines. Aggregating exact integer cents instead makes
  * every sum order-independent and bitwise identical on both sides — the
  * same trick works at any scale because `BIGINT` cents overflow only past
  * ~92 PB-dollars.
  */
object Exact {
  /** Column as exact integer cents. */
  def cents(c: Column): Column = round(c * 100).cast("bigint")

  /** Exact sum of a 2-decimal double column, returned as double dollars. */
  def sumMoney(c: Column): Column = (sum(cents(c)) / 100.0)

  /** Exact average of a 2-decimal double column (double division of exact
    * integer sum — deterministic and identical across engines). */
  def avgMoney(c: Column): Column = sum(cents(c)) / 100.0 / count(lit(1))

  /** SQL fragment mirrors (keep in sync with the Column versions). */
  def sqlCents(e: String): String    = s"CAST(round(($e) * 100) AS BIGINT)"
  def sqlSumMoney(e: String): String = s"(sum(${sqlCents(e)}) / 100.0)"
  def sqlAvgMoney(e: String): String = s"(sum(${sqlCents(e)}) / 100.0 / count(*))"
}
