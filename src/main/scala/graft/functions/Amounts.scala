package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar functions for on-chain amounts, timestamps and identifiers.
  *
  * The reference stores u128 yoctoNEAR amounts as *strings* and converts
  * with Python Decimal (base/utils.py:11-13, tokens/models.py:59-62). u128
  * max ≈ 3.4e38 fits DecimalType(38,0) exactly, so all amount math stays in
  * exact decimal arithmetic — never double — and only the final presentation
  * layer may cast down.
  */
object Amounts {

  /** u128-as-string → exact decimal (SURVEY §1.3).
    *
    * DecimalType(38,0) covers 10^38−1: every practically occurring
    * yoctoNEAR amount (total NEAR supply ≈ 1.2e33 yocto) but NOT the full
    * u128 range (2^128−1 has 39 digits). try_cast degrades out-of-range or
    * malformed strings to null instead of failing the job — required under
    * Spark 4's default ANSI mode, and matching the reference's per-record
    * try/except quarantine (handler.py:446-447). */
  val U128: DecimalType = DecimalType(38, 0)

  def u128(c: Column): Column = c.try_cast(U128)

  /** amount / 10^decimals, exact (reference: tokens/models.py:59-62
    * `format_price`). decimals ≤ 38 keeps the result in decimal space.
    */
  def scaleByDecimals(amount: Column, decimals: Column): Column =
    // Divisor built as an exact decimal "1" + d zeros: pow(10, d) returns a
    // double, which is only exact up to 10^22 and would coerce the whole
    // division to lossy double arithmetic (mantissa is 53 bits; real
    // yoctoNEAR amounts exceed 2^53).
    u128(amount) / concat(lit("1"), repeat(lit("0"), decimals)).try_cast(U128)

  /** Fee arithmetic: net = total − protocol − referrer(0) − chef(0) when the
    * payload carries net as missing/zero (reference: utils.py:875-884,
    * donations/migrations/0012:6-16). Null fees count as zero.
    */
  def netAmount(total: Column, protocolFee: Column, referrerFee: Column, chefFee: Column): Column = {
    val zero = lit(0).cast(U128)
    u128(total) -
      coalesce(u128(protocolFee), zero) -
      coalesce(u128(referrerFee), zero) -
      coalesce(u128(chefFee), zero)
  }

  /** USD conversion: scaled amount × price (reference:
    * donations/models.py:210-247). Null-propagating by construction. */
  def toUsd(scaledAmount: Column, priceUsd: Column): Column =
    scaledAmount * priceUsd

  /** Block-header nanoseconds → timestamp (reference: handler.py:50-52).
    * Integer division: a double route loses precision above 2^53 ns, i.e.
    * for every real block timestamp. */
  def nsToTimestamp(ns: Column): Column =
    timestamp_micros(call_function("div", ns, lit(1000L)).cast("long"))

  /** Event-payload milliseconds → timestamp (reference: utils.py:886-888). */
  def msToTimestamp(ms: Column): Column = timestamp_millis(ms.cast("long"))

  /** `isdigit` guard before integer cast (reference: tasks.py:200-204):
    * returns the cast value when the string is all digits, else null.
    */
  def digitGuardedLong(s: Column): Column =
    when(s.rlike("^[0-9]+$"), s.try_cast(org.apache.spark.sql.types.LongType))

  /** Slug for chain names (reference: chains/models.py:14-21 AutoSlugField). */
  def slugify(name: Column): Column =
    regexp_replace(lower(name), "[^a-z0-9]+", "-")

  /** Coingecko date key dd-MM-yyyy (reference: base/utils.py:4-8). */
  def dateKey(ts: Column): Column = date_format(ts, "dd-MM-yyyy")
}
