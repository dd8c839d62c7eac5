package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Elementwise vector sum over `array<double>` rows as a typed
  * `Aggregator` — the centroid-building aggregate behind
  * [[graft.ext.Similarity]].
  *
  * Replaces the per-dimension `sum(element_at(v, i))` expansion, which
  * needed the vector width up front (a driver-side `.head()` peek when the
  * caller didn't know it) and planned d separate aggregate expressions.
  * Here the width comes from the first row seen on each executor, state is
  * one O(d) buffer per group, and the merge is associative — Spark runs it
  * partial-then-final with map-side combine exactly like a builtin sum, so
  * at 100 TB the centroid pass is one scan + one k×d shuffle regardless of
  * dimensionality. Ragged inputs are summed positionally (buffer grows to
  * the widest row); null rows are ignored.
  *
  * Summation order within a group is partition-dependent, as it already
  * was with per-dim builtin sums — consumers round through Num.r6/r9
  * before any cross-engine comparison for exactly this reason.
  */
object VecSum {
  private def add(b: Array[Double], a: Array[Double]): Array[Double] = {
    if (a == null || a.isEmpty) return b
    val out = if (b.length >= a.length) b else java.util.Arrays.copyOf(b, a.length)
    var i = 0
    while (i < a.length) { out(i) += a(i); i += 1 }
    out
  }

  // primitive Array[Double] end-to-end: the expression encoders use the
  // no-boxing toDoubleArray/fromPrimitiveArray paths, which matters when
  // every corpus row passes through reduce()
  val agg: Aggregator[Array[Double], Array[Double], Array[Double]] =
    new Aggregator[Array[Double], Array[Double], Array[Double]] {
      def zero: Array[Double] = Array.emptyDoubleArray
      def reduce(b: Array[Double], a: Array[Double]): Array[Double] = add(b, a)
      def merge(x: Array[Double], y: Array[Double]): Array[Double] = add(x, y)
      def finish(b: Array[Double]): Array[Double] = b
      def bufferEncoder: Encoder[Array[Double]] = Encoders.kryo[Array[Double]]
      def outputEncoder: Encoder[Array[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    }

  /** The one shared UserDefinedFunction. Callers MUST use this instead of
    * wrapping `agg` themselves: every `udaf(...)` call builds fresh encoder
    * expression trees, and plans containing different instances stop being
    * cache-equal — repeated invocations of a centroid query would then miss
    * the persisted-subplan cache they rely on. */
  lazy val fn: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(agg)
}
