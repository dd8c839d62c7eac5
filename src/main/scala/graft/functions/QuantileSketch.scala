package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch over integer cents as a typed `Aggregator` —
  * the log-linear-histogram design (public lineage: HdrHistogram's
  * exponent+mantissa bucketing; DDSketch's relative-error log buckets,
  * Masson et al., VLDB 2019): a value's bucket is its bit length plus the
  * next [[SubBits]] mantissa bits, so bucket width grows with magnitude
  * and the midpoint estimate is within 2^-([[SubBits]]+1) = 1/16 relative
  * error of the true rank statistic.
  *
  * Completes the sketch family (KMV distinct, CMS counts, bloom
  * membership): the quantile member replaces the exact `percentile` —
  * a corpus-wide sort per group at 100 TB — with bounded O(cells) state
  * that Spark plans partial-then-final like any builtin aggregate.
  *
  * Two properties the stock sketches (t-digest, KLL) do NOT give, and the
  * reason this design is the house choice:
  *   - merge is CELL-WISE COUNT ADDITION — associative, commutative, and
  *     merge-ORDER-INDEPENDENT, so the estimate is bit-identical no matter
  *     how Spark partitions the data (t-digest/KLL results drift with
  *     merge order, which would make a hash-compared oracle impossible);
  *   - every step is integer arithmetic (bit length, shift, mask, floor
  *     division), so DuckDB reproduces the ESTIMATE itself, not just an
  *     error bound.
  *
  * DOMAIN: signed, DDSketch-style — the store is MIRRORED around a single
  * zero cell: negative values land in a negated copy of the positive
  * magnitude buckets (signed cell = sign · magnitude-cell, array index =
  * signed cell + [[Offset]]), so the cell index stays monotone in the
  * value, merge stays cell-wise addition, and the 1/16 relative-error
  * contract holds on BOTH sides of zero (|est − v| ≤ |v|/16). The sole
  * remaining precondition is cents > Long.MinValue (whose magnitude is
  * unrepresentable); a zero value is exact.
  */
object QuantileSketch {
  /** Mantissa bits kept per bucket: 3 → 8 sub-buckets per octave,
    * relative error ≤ 1/16 for magnitudes ≥ 2^([[SubBits]]+1). */
  val SubBits = 3
  private val SubCount = 1 << SubBits        // 8
  private val ExactMax = 1 << (SubBits + 1)  // 16: magnitudes below this are exact cells
  /** Magnitude cells per sign: 0 = zero, 1..15 = exact, then 8 per octave
    * for bit lengths 5..63. */
  val PosCells: Int = ExactMax + (63 - SubBits - 1) * SubCount // 488
  /** Array index of signed cell 0 — the zero-value cell sits mid-array. */
  val Offset: Int = PosCells - 1
  /** Store width: negative mirror + zero cell + positive cells. */
  val MaxCells: Int = 2 * PosCells - 1 // 975

  /** Magnitude cell of a POSITIVE value; monotone in the value. */
  private def posCellOf(mag: Long): Int =
    if (mag < ExactMax) mag.toInt
    else {
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(mag)
      val sub = ((mag >> (bl - 1 - SubBits)) & (SubCount - 1)).toInt
      ExactMax + (bl - SubBits - 2) * SubCount + sub
    }

  /** SIGNED cell of a cents value, in [-[[Offset]], +[[Offset]]];
    * monotone in the value (larger negatives → more negative cells). */
  def cellOf(cents: Long): Int =
    if (cents == 0L) 0
    else if (cents > 0L) posCellOf(cents)
    else -posCellOf(-cents)

  /** Midpoint magnitude (in cents) of a POSITIVE magnitude cell — integer
    * floor midpoint, identical to the oracle's formula. */
  private def posEstOf(cell: Int): Long =
    if (cell < ExactMax) cell.toLong
    else {
      val octave = (cell - ExactMax) / SubCount          // bl - SubBits - 2
      val sub = (cell - ExactMax) % SubCount
      val shift = octave + 1                             // bl - 1 - SubBits
      val lo = (SubCount.toLong + sub) << shift
      lo + ((1L << shift) - 1L) / 2L
    }

  /** Midpoint estimate (in cents) of a SIGNED cell. */
  def estOf(cell: Int): Long =
    if (cell >= 0) posEstOf(cell) else -posEstOf(-cell)

  /** The quantiles the registered query reports, as exact integer
    * fractions (num, den) so the 0-based rank floor((n-1)·num/den) is
    * computed identically on both engines. */
  val Quantiles: Seq[(Long, Long)] = Seq(1L -> 2L, 9L -> 10L, 99L -> 100L)

  /** Finished sketch output: estimated cents at p50/p90/p99 plus the
    * total count the ranks were taken against. */
  final case class Est(p50_cents: Long, p90_cents: Long, p99_cents: Long, n: Long)

  /** The ONE cell-wise addition all three aggregators merge through — the
    * bit-identical write/read round-trip rests on there being a single
    * definition of "merge". */
  private def addCells(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < MaxCells) { a(i) += b(i); i += 1 }
    a
  }

  /** Signed cell holding the 0-based target rank — array order IS value
    * order (negative mirror first), so one ascending cumulative pass. */
  private def quantileCell(buf: Array[Long], n: Long, num: Long, den: Long): Int = {
    val rank = (num * (n - 1)) / den // 0-based target rank
    var cum = 0L
    var i = 0
    while (i < buf.length) {
      cum += buf(i)
      if (cum > rank) return i - Offset
      i += 1
    }
    buf.length - 1 - Offset // unreachable when n > 0
  }

  val agg: Aggregator[Long, Array[Long], Est] = new Aggregator[Long, Array[Long], Est] {
    def zero: Array[Long] = new Array[Long](MaxCells)
    def reduce(b: Array[Long], cents: Long): Array[Long] = { b(Offset + cellOf(cents)) += 1L; b }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = addCells(a, b)
    def finish(b: Array[Long]): Est = {
      var n = 0L
      var i = 0
      while (i < MaxCells) { n += b(i); i += 1 }
      if (n == 0L) Est(0L, 0L, 0L, 0L)
      else {
        val Seq(p50, p90, p99) =
          Quantiles.map { case (num, den) => estOf(quantileCell(b, n, num, den)) }
        Est(p50, p90, p99, n)
      }
    }
    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Est] = Encoders.product[Est]
  }

  // ------------------------------------------------- sketch as a COLUMN
  /** Warehouse forms of the sketch — the cross-JOB merge path: a sharded
    * ingest job persists each shard's raw cell vector as a plain
    * array<bigint> parquet column ([[cellsAgg]]), and any later job
    * re-aggregates the persisted vectors back into the finished estimate
    * ([[mergeAgg]]) — bit-identical to running [[agg]] over the raw
    * values, for ANY sharding, because merge is cell-wise addition
    * (QuantileSketchSpec pins the round-trip). This is what "mergeable"
    * buys beyond partition-parallelism: per-shard/per-day sketch columns
    * become warehouse state, and corpus-wide quantiles are a ≤cells-width
    * re-aggregation instead of a re-scan of the raw values. */
  val cellsAgg: Aggregator[Long, Array[Long], Seq[Long]] =
    new Aggregator[Long, Array[Long], Seq[Long]] {
      def zero: Array[Long] = agg.zero
      def reduce(b: Array[Long], cents: Long): Array[Long] = agg.reduce(b, cents)
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = addCells(a, b)
      def finish(b: Array[Long]): Seq[Long] = b.toSeq
      def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
      def outputEncoder: Encoder[Seq[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    }

  /** Re-aggregate persisted cell vectors (array<bigint> columns) into the
    * finished estimate — the read side of the warehouse round-trip. The
    * vector's LENGTH is its version tag (each store generation has a
    * distinct width, so no separate marker column is needed): a
    * [[MaxCells]]-wide vector is the current signed store; a
    * [[PosCells]]-wide vector is the round-12 non-negative store, whose
    * magnitude cell c maps to signed index [[Offset]]+c — the documented
    * upgrade path, so mixed-generation warehouses merge exactly instead
    * of hard-failing (ADVICE r13). Any other length is a corrupt row and
    * fails fast rather than silently misaligning cells. */
  val mergeAgg: Aggregator[Seq[Long], Array[Long], Est] =
    new Aggregator[Seq[Long], Array[Long], Est] {
      def zero: Array[Long] = agg.zero
      def reduce(b: Array[Long], cells: Seq[Long]): Array[Long] = {
        if (cells.length == PosCells) { // legacy unsigned store: shift into the mirror
          var i = 0
          while (i < PosCells) { b(Offset + i) += cells(i); i += 1 }
          b
        } else {
          require(cells.length == MaxCells,
            s"stored sketch has ${cells.length} cells, expected $MaxCells (or legacy $PosCells)")
          addCells(b, cells.toArray)
        }
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = addCells(a, b)
      def finish(b: Array[Long]): Est = agg.finish(b)
      def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
      def outputEncoder: Encoder[Est] = Encoders.product[Est]
    }

  /** Matching oracle SQL: relation with ($groupCol, p50_cents, p90_cents,
    * p99_cents, n) — the same integer cell/rank/midpoint pipeline over
    * SIGNED cells (sign · magnitude cell; the mirror keeps cell order =
    * value order, so the cumulative rank pass is unchanged). `centsExpr`
    * must be the BIGINT cents form of the value. */
  def estimateSql(centsExpr: String, from: String, groupCol: String): String = {
    val blSql = "length(bin(mag))" // no leading zeros: = bit length
    val posCellSql =
      s"""CASE WHEN mag < $ExactMax THEN mag
         |     ELSE $ExactMax + ($blSql - ${SubBits + 2}) * $SubCount
         |          + ((mag >> ($blSql - ${SubBits + 1})) & ${SubCount - 1})
         |END""".stripMargin
    val posEstSql =
      s"""CASE WHEN ac < $ExactMax THEN ac
         |     ELSE (($SubCount + (ac - $ExactMax) % $SubCount) << ((ac - $ExactMax) // $SubCount + 1))
         |          + ((1::BIGINT << ((ac - $ExactMax) // $SubCount + 1)) - 1) // 2
         |END""".stripMargin
    def pick(num: Long, den: Long, as: String) =
      s"min(CASE WHEN cum > ($num * (tot - 1)) // $den THEN est END) AS $as"
    s"""WITH qs_in AS (
       |  SELECT $groupCol, CAST($centsExpr AS BIGINT) AS c FROM $from),
       |qs_mag AS (
       |  SELECT $groupCol, CASE WHEN c < 0 THEN -1 ELSE 1 END AS sg, abs(c) AS mag
       |  FROM qs_in),
       |qs_cells AS (
       |  SELECT $groupCol, CAST(sg * ($posCellSql) AS BIGINT) AS cell, count(*) AS cn
       |  FROM qs_mag GROUP BY 1, 2),
       |qs_est AS (
       |  SELECT $groupCol, cell, cn, abs(cell) AS ac FROM qs_cells),
       |qs_cum AS (
       |  SELECT $groupCol,
       |         CAST(CASE WHEN cell < 0 THEN -($posEstSql) ELSE $posEstSql END AS BIGINT) AS est,
       |         sum(cn) OVER (PARTITION BY $groupCol ORDER BY cell
       |                       ROWS UNBOUNDED PRECEDING) AS cum,
       |         sum(cn) OVER (PARTITION BY $groupCol) AS tot
       |  FROM qs_est)
       |SELECT $groupCol,
       |       ${pick(1L, 2L, "p50_cents")},
       |       ${pick(9L, 10L, "p90_cents")},
       |       ${pick(99L, 100L, "p99_cents")},
       |       CAST(max(tot) AS BIGINT) AS n
       |FROM qs_cum GROUP BY $groupCol""".stripMargin
  }
}
