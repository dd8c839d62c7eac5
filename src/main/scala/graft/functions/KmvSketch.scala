package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed `Aggregator` —
  * the mergeable-sketch pattern: bounded O(k) state per group, associative
  * and commutative merge, so Spark runs it partial-then-final like any
  * builtin aggregate (map-side combine before the shuffle).
  *
  * Unlike HLL implementations, this sketch is DETERMINISTIC given the
  * hash function, and the hash (28-bit md5 prefix, the engine-wide
  * portable hash — see graft.ext.Dedup.baseHash) is computable in ANSI
  * SQL, so the estimate itself is oracle-checkable in DuckDB:
  * bottom-k of distinct hashes, estimate = (k-1) * 2^28 / h_k, exact
  * count when fewer than k distinct values exist.
  */
object KmvSketch {
  val K = 64
  val HashSpace = 268435456.0 // 2^28

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 28-bit md5-prefix hash of the value's string form — identical to
    * Spark's conv(substring(md5(s),1,7),16,10) and DuckDB's
    * ('0x'||substr(md5(s),1,7))::BIGINT. Hot path of the sketch update:
    * thread-local reusable digest, bits taken straight from the first 4
    * digest bytes (7 hex chars = 28 bits), no string formatting. */
  def hash28(s: String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) | ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >> 4)
  }

  /** Buffer: ascending sorted distinct hashes, at most K of them. */
  type Buf = Array[Long]

  private def insert(buf: Buf, h: Long): Buf = {
    if (buf.length == K && h >= buf(K - 1)) buf
    else if (java.util.Arrays.binarySearch(buf, h) >= 0) buf
    else {
      val merged = (buf :+ h).sorted
      if (merged.length > K) merged.take(K) else merged
    }
  }

  private def mergeBufs(a: Buf, b: Buf): Buf = {
    val m = (a ++ b).distinct.sorted
    if (m.length > K) m.take(K) else m
  }

  private def estimateOf(buf: Buf): Double =
    if (buf.length < K) buf.length.toDouble
    else (K - 1) * HashSpace / buf(K - 1)

  val agg: Aggregator[String, Buf, Double] = new Aggregator[String, Buf, Double] {
    def zero: Buf = Array.empty[Long]
    def reduce(b: Buf, a: String): Buf = if (a == null) b else insert(b, hash28(a))
    def merge(b1: Buf, b2: Buf): Buf = mergeBufs(b1, b2)
    def finish(b: Buf): Double = estimateOf(b)
    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Matching oracle SQL fragment: distinct-value bottom-k of the same
    * hash, same estimate formula. `valExpr` must be the VARCHAR form of
    * the hashed value. */
  def estimateSql(valExpr: String, from: String, groupCol: String): String =
    s"""WITH hs AS (
       |  SELECT DISTINCT $groupCol, ('0x' || substr(md5($valExpr), 1, 7))::BIGINT AS hv
       |  FROM $from
       |  WHERE $valExpr IS NOT NULL),
       |rk AS (
       |  SELECT $groupCol, hv,
       |         row_number() OVER (PARTITION BY $groupCol ORDER BY hv) AS rn,
       |         count(*) OVER (PARTITION BY $groupCol) AS n_distinct_hash
       |  FROM hs)
       |SELECT $groupCol,
       |       CASE WHEN max(n_distinct_hash) < $K THEN CAST(max(n_distinct_hash) AS DOUBLE)
       |            ELSE ($K - 1) * $HashSpace / max(CASE WHEN rn = $K THEN hv END) END AS est_distinct
       |FROM rk WHERE rn <= $K
       |GROUP BY $groupCol""".stripMargin
}
