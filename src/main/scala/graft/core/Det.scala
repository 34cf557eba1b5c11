package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers enforcing SURVEY.md §2's cross-engine rules.
  *
  * The graded oracle hash-compares Spark output against DuckDB running the
  * same SQL, so every floating-point hazard is routed through these:
  *
  *  - D2: money columns carry exactly 2 decimals in the fixtures → aggregate
  *    them as BIGINT cents, immune to summation order.
  *  - D3: unavoidable float outputs are rounded to a fixed scale and only
  *    used for ordering together with a unique tie-breaker.
  */
object Det {

  /** Exact integer cents of a 2-decimal money column (D2). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** 2-decimal money column as an integer percent (e.g. discount 0.05 → 5). */
  def pct(c: Column): Column = round(c * 100).cast("long")

  /** Round a float expression to 4 decimals (D3 output rule). */
  def r4(c: Column): Column = round(c, 4)

  /** Round to 6 decimals (distances, centroid coordinates). */
  def r6(c: Column): Column = round(c, 6)

  /** THE cross-engine 32-bit hash: first 8 hex chars of md5, parsed as an
    * integer. Every sketch (rolling fingerprint, SimHash, MinHash, LSH
    * hyperplanes) and every deterministic sample is built on this one
    * primitive so Spark and the DuckDB oracle agree bit-for-bit — keep a
    * single definition (it was once open-coded in three files).
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 8), 16, 10).cast("long")
}
