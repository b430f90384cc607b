package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graft.{RollingHashColumns, VecDotColumns}

/** Public column-function surface for graft's native Catalyst
  * expressions (implementations under org.apache.spark.sql.graft). */
package object functions {
  object VecMath {
    /** Dot product of two float/double array columns (codegen'd —
      * see [[org.apache.spark.sql.graft.VecDot]]). */
    def vec_dot(a: Column, b: Column): Column = VecDotColumns.vecDot(a, b)

    /** L2 norm of an array column. */
    def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))
  }

  /** Winnowed Rabin–Karp rolling-hash fingerprints (ARRAY<BIGINT>) —
    * see [[org.apache.spark.sql.graft.RollingHashFingerprint]]. */
  def rolling_fingerprint(text: Column, window: Int = 16, winnow: Int = 8): Column =
    RollingHashColumns.rollingFingerprint(text, window, winnow)
}
