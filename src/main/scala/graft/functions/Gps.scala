package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gaussian-process helpers (SURVEY §2.10 P1/P2).
  *
  * P1 abs_diff (/root/reference/africanus/gps/utils.py:7-43) is a pairwise
  * |x_i - x_j| — in Spark a crossJoin projection, distributed instead of a
  * materialized (n,n) matrix.
  * P2 exponential_squared (/root/reference/africanus/gps/kernels.py:8-47):
  * sigma^2 exp(-d^2 / (2 l^2)).
  */
object Gps {
  def absDiff(xi: Column, xj: Column): Column = abs(xi - xj)

  def exponentialSquared(d: Column, sigmaSq: Double, lScale: Double): Column =
    lit(sigmaSq) * exp(-(d * d) / lit(2.0 * lScale * lScale))
}
