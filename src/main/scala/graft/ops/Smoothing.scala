package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Centered rolling means (SURVEY §2.6 W2/W3): pandas
  * `.rolling(window=2*half+1, center=True, min_periods=1).mean()` over the
  * PRESENT rows (neighbors-by-position, not by-time — §7.4 hard-part 5),
  * analyse.py:90 (window 5) and analyse.py:297 (window 3).
  *
  * Implemented as an explicit lag/lead sum rather than an
  * `avg over rowsBetween` frame: both engines then evaluate the identical
  * left-associated IEEE expression, whereas windowed AVG internals (sliding
  * segment trees etc.) are free to re-order the summation and drift an ulp.
  * The shrinking edge count reproduces `min_periods=1` exactly.
  */
object Smoothing {
  def centeredMean(v: Column, w: WindowSpec, half: Int): Column = {
    val terms: Seq[Column] = (-half to half).map { k =>
      if (k == 0) v else if (k < 0) lag(v, -k).over(w) else lead(v, k).over(w)
    }
    val s = terms.map(t => coalesce(t, lit(0.0))).reduce(_ + _)
    val n = terms.map(t => when(t.isNotNull, lit(1)).otherwise(lit(0))).reduce(_ + _)
    // all-null window (possible on a NaN-filled grid) → NULL, matching the
    // pandas NaN result and DuckDB's x/0 — guarded lazily so ANSI mode
    // never sees the zero divisor
    when(n > lit(0), s / n)
  }

  /** Identical expression as SQL; `w` is a named WINDOW clause. */
  def centeredMeanSql(v: String, w: String, half: Int): String = {
    val terms: Seq[String] = (-half to half).map { k =>
      if (k == 0) v else if (k < 0) s"lag($v, ${-k}) OVER $w" else s"lead($v, $k) OVER $w"
    }
    val s = terms.map(t => s"coalesce($t, 0.0)").reduce((a, b) => s"($a + $b)")
    val n = terms.map(t => s"(CASE WHEN $t IS NULL THEN 0 ELSE 1 END)").reduce((a, b) => s"($a + $b)")
    s"($s) / ($n)"
  }
}
