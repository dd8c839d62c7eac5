package graft.ext

import graft.Q
import graft.ops.{Num, Tables}
import graft.ops.Num.{r6, r6Sql}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection over `documents` / `embeddings` — the dedup
  * family a 100 TB pretraining pipeline runs before anything else.
  *
  * Scale design, common to every variant: candidate generation is always a
  * BUCKETED self-join (LSH bands / simhash bands / blocking keys), never an
  * all-pairs cross join — pair count stays near-linear in corpus size and
  * each bucket is one shuffle partition's work. Hash functions are built
  * from md5 (available and bit-identical on both engines) so every query
  * here is DuckDB-oracle-checkable; swapping in xxhash64 for speed is a
  * one-line change that keeps the same plan shape.
  */
object Dedup {
  // ------------------------------------------------------------ exact dedup
  /** Exact dedup via content-hash groupBy (hash-groupBy dedup): one shuffle
    * on the fingerprint, min(doc_id) as the canonical survivor. */
  def exactOn(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", md5(Text.normalized(col("text"))))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("canonical_doc_id"), count(lit(1)).as("n_docs"))
      .select("canonical_doc_id", "n_docs")
      .orderBy("canonical_doc_id")

  def exact(spark: SparkSession, dir: String): DataFrame =
    exactOn(Tables.documents(spark, dir))

  val exactSql: String =
    """SELECT min(doc_id) AS canonical_doc_id, count(*) AS n_docs
      |FROM (SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp FROM documents)
      |GROUP BY fp ORDER BY canonical_doc_id""".stripMargin

  // ------------------------------------------------------- shared shingling
  /** Distinct word 3-gram shingles. Guarded sequence: Spark's sequence(a,b)
    * DESCENDS when a > b, so short docs must short-circuit to an empty
    * array. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= lit(3),
      array_distinct(transform(sequence(lit(0), size(toks) - lit(3)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(3))))))
      .otherwise(array().cast("array<string>"))

  def shingles3Sql(t: String): String =
    s"""CASE WHEN len($t) >= 3
       |     THEN list_distinct(list_transform(range(0, len($t) - 2), i -> array_to_string(($t)[i+1:i+3], ' ')))
       |     ELSE [] END""".stripMargin

  /** 28-bit base hash from the md5 hex prefix — engine-portable: Spark
    * conv(hex,16,10) ≡ DuckDB ('0x'||hex)::BIGINT. Small enough that
    * (a*h+b) stays under 2^63 in exact integer arithmetic. */
  def baseHash(s: Column): Column = conv(substring(md5(s), 1, 7), 16, 10).cast("long")
  def baseHashSql(s: String): String = s"('0x' || substr(md5($s), 1, 7))::BIGINT"

  // ---------------------------------------------------------- MinHash + LSH
  /** Universal-hash family (a_i * h + b_i) mod P over the 28-bit base hash;
    * the formula generates any number of hash functions, so the signature
    * width is a free knob — constants spliced identically into the oracle
    * SQL for the registry's default configuration. */
  val P = 2147483647L // 2^31 - 1
  val NumHashes = 16
  val NumBands = 4
  val RowsPerBand = NumHashes / NumBands
  def hashAOf(i: Int): Long = math.max(1L, (1103515245L * (i + 1) + 12345L) % P)
  def hashBOf(i: Int): Long = (69069L * (i + 1) + 1L) % P
  val hashA: IndexedSeq[Long] = (0 until NumHashes).map(hashAOf)
  val hashB: IndexedSeq[Long] = (0 until NumHashes).map(hashBOf)

  /** MinHash signatures + banded LSH candidate pairs with the estimated
    * Jaccard (= fraction of agreeing minhashes). NOTE: persists the
    * signature table for the duration of the job (4 downstream consumers);
    * batch callers invoking this repeatedly in one session should
    * `spark.catalog.clearCache()` between invocations. The classic
    * shingle → minhash → band → bucket-join pipeline: band buckets are the
    * join key, so the self-join is linear-ish in corpus size; the 4×4
    * banding targets ~0.5 Jaccard at the usual S-curve threshold.
    *
    * At 100 TB: explode(shingles) is the widest stage — it map-side combines
    * into min() partials before the one shuffle per signature, and band
    * buckets are salted by construction (md5 keys distribute uniformly). */
  /** `numHashes`/`numBands` are free knobs (numBands must divide numHashes):
    * more bands of fewer rows → more candidates (higher recall, lower
    * precision) — the S-curve tuning every production LSH job does. Banding
    * is aligned (band j = rows [j*r, (j+1)*r)), so halving the band width
    * strictly grows the candidate set (DedupSpec property). */
  /** MinHash signature table (doc_id, mh_0..mh_{n-1}) — the shared subplan
    * behind the LSH pair query and the LSH-fed Jaccard verify. Callers
    * persist it (2-4 downstream consumers each). */
  def minhashSigsOn(docs: DataFrame, numHashes: Int = NumHashes): DataFrame = {
    val toks = Text.tokens(col("text"))
    val exploded = docs
      .select(col("doc_id"), explode(shingles3(toks)).as("s"))
      .withColumn("hh", baseHash(col("s")))
    val mhCols = (0 until numHashes).map(i =>
      min((lit(hashAOf(i)) * col("hh") + lit(hashBOf(i))) % lit(P)).as(s"mh_$i"))
    exploded.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
  }

  /** Band signatures (doc_id, band_idx, sig) of a signature table — band
    * sigs are md5 (bucket count grows with data, salt-free). Shared by the
    * batch self-join and the incremental new-vs-all join. */
  def minhashBands(mh: DataFrame, numHashes: Int, numBands: Int): DataFrame = {
    require(numHashes % numBands == 0, s"numBands=$numBands must divide numHashes=$numHashes")
    val rowsPerBand = numHashes / numBands
    mh.select(col("doc_id"), explode(array((0 until numBands).map { j =>
      struct(lit(j).as("band_idx"),
        md5(concat_ws(",", (0 until rowsPerBand).map(k => col(s"mh_${j * rowsPerBand + k}")): _*)).as("sig"))
    }: _*)).as("b")).select(col("doc_id"), col("b.band_idx"), col("b.sig"))
  }

  /** Banded candidate pairs (doc_a < doc_b) from a signature table — the
    * bucket-join that keeps every MinHash consumer near-linear. */
  def minhashCandidates(mh: DataFrame, numHashes: Int, numBands: Int): DataFrame = {
    val bands = minhashBands(mh, numHashes, numBands)
    bands.as("l").join(bands.as("r"),
        col("l.band_idx") === col("r.band_idx") && col("l.sig") === col("r.sig")
          && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** Incremental candidates: banded pairs between NEW signatures and the
    * full signature set (old ∪ new), normalized to doc_a < doc_b. Every
    * pair here involves at least one new doc, so a stream that calls this
    * per micro-batch emits each unordered pair exactly once — in the batch
    * its later member arrives in ([[graft.streaming.Streams
    * .minhashDedupBatches]]). */
  def minhashCandidatesAgainst(newSigs: DataFrame, allSigs: DataFrame,
                               numHashes: Int, numBands: Int): DataFrame = {
    val bn = minhashBands(newSigs, numHashes, numBands)
    val ba = minhashBands(allSigs, numHashes, numBands)
    bn.as("l").join(ba.as("r"),
        col("l.band_idx") === col("r.band_idx") && col("l.sig") === col("r.sig")
          && col("l.doc_id") =!= col("r.doc_id"))
      .select(least(col("l.doc_id"), col("r.doc_id")).as("doc_a"),
        greatest(col("l.doc_id"), col("r.doc_id")).as("doc_b"))
      .distinct()
  }

  /** Candidate pairs + the estimated Jaccard (= fraction of agreeing
    * minhashes), via the signature rejoin — the one implementation behind
    * the batch and incremental variants. Unsorted. */
  def minhashEstJaccard(cand: DataFrame, mh: DataFrame, numHashes: Int): DataFrame = {
    val agree = (0 until numHashes).map(i =>
      when(col(s"x.mh_$i") === col(s"y.mh_$i"), lit(1)).otherwise(lit(0))).reduce(_ + _)
    cand
      .join(mh.as("x"), col("doc_a") === col("x.doc_id"))
      .join(mh.as("y"), col("doc_b") === col("y.doc_id"))
      .select(col("doc_a"), col("doc_b"), (agree / lit(numHashes.toDouble)).as("est_jaccard"))
  }

  def minhashLshOn(docs: DataFrame,
                   numHashes: Int = NumHashes, numBands: Int = NumBands): DataFrame = {
    // persisted: referenced 4x downstream (both band sides + both signature
    // rejoins) — without it the explode+md5+n-min subplan runs 4 times
    val mh = minhashSigsOn(docs, numHashes).persist()
    val cand = minhashCandidates(mh, numHashes, numBands)
    minhashEstJaccard(cand, mh, numHashes)
      .orderBy("doc_a", "doc_b")
  }

  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashLshOn(Tables.documents(spark, dir))

  /** CTE chain toks→sh→ex→h→mh→bands→cand — the oracle twin of
    * [[minhashSigsOn]] + [[minhashCandidates]], shared by every MinHash
    * oracle so the two engines' candidate sets can never drift. */
  private def minhashCandCtes(numHashes: Int, numBands: Int): String = {
    s"""${minhashSigCtes("", "documents", numHashes)},
       |${minhashBandCtes("", numHashes, numBands)},
       |cand AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r ON l.band_idx = r.band_idx AND l.sig = r.sig AND l.doc_id < r.doc_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** Signature CTE chain `${p}toks → ${p}sh → ${p}ex → ${p}h → ${p}mh` over
    * an arbitrary source relation — the oracle twin of [[minhashSigsOn]],
    * prefix-parameterized so two corpora (train + eval) can carry
    * signatures in one oracle query without CTE-name collisions. */
  private def minhashSigCtes(p: String, from: String, numHashes: Int): String = {
    val mhCols = (0 until numHashes)
      .map(i => s"min((${hashAOf(i)} * hh + ${hashBOf(i)}) % $P) AS mh_$i").mkString(",\n         ")
    s"""${p}toks AS (SELECT doc_id, ${Text.tokensSql("text")} AS t FROM $from),
       |${p}sh AS (SELECT doc_id, ${shingles3Sql("t")} AS shingles FROM ${p}toks),
       |${p}ex AS (SELECT doc_id, unnest(shingles) AS s FROM ${p}sh),
       |${p}h AS (SELECT doc_id, ${baseHashSql("s")} AS hh FROM ${p}ex),
       |${p}mh AS MATERIALIZED (
       |  SELECT doc_id,
       |         $mhCols
       |  FROM ${p}h GROUP BY doc_id)""".stripMargin
  }

  /** Band CTE `${p}bands` over `${p}mh` — the oracle twin of
    * [[minhashBands]]. */
  private def minhashBandCtes(p: String, numHashes: Int, numBands: Int): String = {
    val rowsPerBand = numHashes / numBands
    val bandSelects = (0 until numBands).map { j =>
      val cols = (0 until rowsPerBand).map(k => s"mh_${j * rowsPerBand + k}").mkString(", ")
      s"SELECT doc_id, $j AS band_idx, md5(concat_ws(',', $cols)) AS sig FROM ${p}mh"
    }.mkString("\n  UNION ALL\n  ")
    s"""${p}bands AS MATERIALIZED (
       |  $bandSelects)""".stripMargin
  }

  /** Signature-agreement fraction between aliases x and y — shared by every
    * oracle that rejoins signatures, so the estimate can never drift
    * between them. */
  private def agreeSql(numHashes: Int): String = {
    val agree = (0 until numHashes)
      .map(i => s"(CASE WHEN x.mh_$i = y.mh_$i THEN 1 ELSE 0 END)").reduce((a, b) => s"($a + $b)")
    s"$agree / ${numHashes.toDouble}"
  }

  val minhashLshSql: String =
    s"""WITH ${minhashCandCtes(NumHashes, NumBands)}
       |SELECT c.doc_a, c.doc_b, ${agreeSql(NumHashes)} AS est_jaccard
       |FROM cand c JOIN mh x ON c.doc_a = x.doc_id JOIN mh y ON c.doc_b = y.doc_id
       |ORDER BY c.doc_a, c.doc_b""".stripMargin

  // ------------------------------------------- fuzzy (MinHash) decontamination
  /** A training doc is contaminated when an eval doc's estimated Jaccard
    * reaches this. est_jaccard is an exact multiple of 1/NumHashes (n/16),
    * so the threshold compare is float-exact on both engines. */
  val FuzzyContamMin = 0.5

  /** Cross-corpus FUZZY contamination: flag training documents that are
    * MinHash near-duplicates of an evaluation document — the near-dup form
    * of [[Corpus.decontaminateAgainstOn]]'s exact n-gram overlap. The two
    * are complementary (production pipelines run both): exact shingle
    * overlap catches verbatim quotes of benchmark items inside larger
    * documents, MinHash catches lightly edited whole-document copies that
    * share few exact 13-gram-style windows but most of their shingle set.
    *
    * Output is a full train-side manifest: (doc_id, n_eval_matches,
    * max_est_jaccard, keep) for EVERY training doc, keep = no eval match at
    * [[FuzzyContamMin]].
    *
    * 100 TB design: eval suites are tiny next to the corpus, so the eval
    * band table BROADCASTS and the candidate join is band-bucketed on the
    * corpus side — one signature shuffle (min() partials map-side combine
    * on the explode) and zero corpus-sized joins; only candidate pairs
    * rejoin signatures, and the final manifest join carries (doc_id, long,
    * double), never text. */
  def fuzzyDecontaminateAgainstOn(train: DataFrame, evalDocs: DataFrame,
                                  numHashes: Int = NumHashes, numBands: Int = NumBands): DataFrame = {
    // persisted: 2 consumers (band side + signature rejoin); job-lifetime
    // cache, same contract as minhashLshOn
    val (out, _) = fuzzyDecontaminateWithCaches(train, evalDocs, numHashes, numBands)
    out
  }

  /** [[fuzzyDecontaminateAgainstOn]] plus handles to its two persisted
    * signature tables, for callers that must release them per invocation —
    * [[graft.streaming.Streams.fuzzyDecontaminateBatches]] unpersists after
    * every micro-batch (a long-running trigger would otherwise accumulate
    * two cached tables per batch). Batch callers use the public method and
    * the job-lifetime cache contract. */
  private[graft] def fuzzyDecontaminateWithCaches(
      train: DataFrame, evalDocs: DataFrame,
      numHashes: Int = NumHashes, numBands: Int = NumBands): (DataFrame, Seq[DataFrame]) = {
    val tSigs = minhashSigsOn(train, numHashes).persist()
    val eSigs = minhashSigsOn(evalDocs, numHashes).persist()
    val bt = minhashBands(tSigs, numHashes, numBands)
    val be = minhashBands(eSigs, numHashes, numBands)
      .withColumnRenamed("doc_id", "eval_id")
    val cand = bt.join(broadcast(be), Seq("band_idx", "sig"))
      .select(col("doc_id"), col("eval_id")).distinct()
    val agree = (0 until numHashes).map(i =>
      when(col(s"x.mh_$i") === col(s"y.mh_$i"), lit(1)).otherwise(lit(0))).reduce(_ + _)
    val hits = cand.as("c")
      .join(tSigs.as("x"), col("c.doc_id") === col("x.doc_id"))
      .join(broadcast(eSigs.as("y")), col("c.eval_id") === col("y.doc_id"))
      .select(col("c.doc_id").as("doc_id"), (agree / lit(numHashes.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= lit(FuzzyContamMin))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_matches"), max(col("est_jaccard")).as("max_est_jaccard"))
    val out = train.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_eval_matches"), lit(0L)).as("n_eval_matches"),
        coalesce(col("max_est_jaccard"), lit(0.0)).as("max_est_jaccard"),
        col("n_eval_matches").isNull.as("keep"))
      .orderBy("doc_id")
    (out, Seq(tSigs, eSigs))
  }

  /** Registered form: the deterministic doc_id-slice stands in as the eval
    * set — the SAME slice ([[Corpus.BenchSlice]]) as `t_decontaminate`, so
    * the exact and fuzzy manifests are directly comparable row-for-row. */
  def fuzzyDecontaminateOn(docs: DataFrame): DataFrame =
    fuzzyDecontaminateAgainstOn(
      docs.filter(pmod(col("doc_id"), lit(10)) =!= lit(Corpus.BenchSlice)),
      docs.filter(pmod(col("doc_id"), lit(10)) === lit(Corpus.BenchSlice)))

  def fuzzyDecontaminate(spark: SparkSession, dir: String): DataFrame =
    fuzzyDecontaminateOn(Tables.documents(spark, dir))

  lazy val fuzzyDecontaminateSql: String =
    s"""WITH tdocs AS (SELECT * FROM documents WHERE doc_id % 10 <> ${Corpus.BenchSlice}),
       |edocs AS (SELECT * FROM documents WHERE doc_id % 10 = ${Corpus.BenchSlice}),
       |${minhashSigCtes("t", "tdocs", NumHashes)},
       |${minhashSigCtes("e", "edocs", NumHashes)},
       |${minhashBandCtes("t", NumHashes, NumBands)},
       |${minhashBandCtes("e", NumHashes, NumBands)},
       |cand AS (
       |  SELECT l.doc_id, r.doc_id AS eval_id
       |  FROM tbands l JOIN ebands r ON l.band_idx = r.band_idx AND l.sig = r.sig
       |  GROUP BY 1, 2),
       |hits AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_eval_matches, max(est_jaccard) AS max_est_jaccard
       |  FROM (
       |    SELECT c.doc_id, ${agreeSql(NumHashes)} AS est_jaccard
       |    FROM cand c JOIN tmh x ON c.doc_id = x.doc_id JOIN emh y ON c.eval_id = y.doc_id)
       |  WHERE est_jaccard >= $FuzzyContamMin
       |  GROUP BY doc_id)
       |SELECT d.doc_id,
       |       CAST(coalesce(h.n_eval_matches, 0) AS BIGINT) AS n_eval_matches,
       |       coalesce(h.max_est_jaccard, 0.0) AS max_est_jaccard,
       |       h.n_eval_matches IS NULL AS keep
       |FROM tdocs d LEFT JOIN hits h ON d.doc_id = h.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------------- shingle novelty
  /** Per-document n-gram novelty: the fraction of a doc's DISTINCT shingles
    * that appear in no other document — the memorization-risk / novelty
    * axis (a doc of mostly corpus-unique shingles contributes new content;
    * one of mostly shared shingles is boilerplate or near-copy). The
    * inverse complement of the span-coverage view: coverage asks "how much
    * of this doc is duplicated elsewhere", novelty asks "how much exists
    * nowhere else". Shingle-less docs score 1.0 (they share nothing).
    *
    * 100 TB design: the shingle census is one map-side-combinable
    * aggregate keyed on the 28-bit shingle hash; the rejoin carries
    * (doc_id, hash, long) — never text — and the per-doc rollup combines
    * map-side. Same shuffle shape as the decontamination family. */
  def ngramNoveltyOn(docs: DataFrame): DataFrame = {
    val sh = docs.select(col("doc_id"), explode(shingles3(Text.tokens(col("text")))).as("s"))
      .withColumn("h", baseHash(col("s")))
    // shingles3 dedups within a doc, so the census counts DOCUMENTS per shingle
    val census = sh.groupBy("h").agg(count(lit(1)).as("n_docs_with"))
    val perDoc = sh.join(census, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("n_docs_with") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty", Num.r6(col("n_unique") / col("n_shingles")))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        coalesce(col("novelty"), lit(1.0)).as("novelty"))
      .orderBy("doc_id")
  }

  def ngramNovelty(spark: SparkSession, dir: String): DataFrame =
    ngramNoveltyOn(Tables.documents(spark, dir))

  lazy val ngramNoveltySql: String =
    s"""WITH toks AS (SELECT doc_id, ${Text.tokensSql("text")} AS t FROM documents),
       |sh AS (SELECT doc_id, unnest(${shingles3Sql("t")}) AS s FROM toks),
       |h AS (SELECT doc_id, ${baseHashSql("s")} AS h FROM sh),
       |census AS (SELECT h, count(*) AS n_docs_with FROM h GROUP BY h),
       |pd AS (
       |  SELECT hh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       |         CAST(sum(CASE WHEN c.n_docs_with = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
       |  FROM h hh JOIN census c ON hh.h = c.h
       |  GROUP BY hh.doc_id)
       |SELECT d.doc_id,
       |       CAST(coalesce(p.n_shingles, 0) AS BIGINT) AS n_shingles,
       |       CAST(coalesce(p.n_unique, 0) AS BIGINT) AS n_unique,
       |       coalesce(${r6Sql("p.n_unique / p.n_shingles")}, 1.0) AS novelty
       |FROM documents d LEFT JOIN pd p ON d.doc_id = p.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ----------------------------------------------------------------- SimHash
  /** 64-bit SimHash fingerprints (the Manku/Charikar web-dedup width):
    * per-token hash bits voted with ±1 weights (multiplicity counts), bit
    * set where the vote is positive.
    *
    * Engine-portable 64-bit construction: a full 16-hex-char md5 parse can
    * exceed signed-BIGINT range, so the 64 token bits come from TWO 32-bit
    * md5 windows (hex chars 1-8 → bits 0-31, chars 9-16 → bits 32-63). Bit
    * 63's fingerprint contribution is Long.MinValue (the signed value whose
    * bit pattern is 1<<63), so the summed fingerprint is the signed 64-bit
    * reinterpretation of the bit pattern and no partial sum leaves BIGINT
    * range on either engine (bits 0-62 sum to ≤ 2^63−1, added first). */
  val SimBits = 64

  /** Signed contribution of bit `b` to the fingerprint sum. */
  private def bitValue(b: Int): Long = if (b == 63) Long.MinValue else 1L << b
  private def bitValueSql(b: Int): String =
    if (b == 63) "(-9223372036854775807 - 1)" else (1L << b).toString

  /** Unordered fingerprints — the shared subplan. The registry query
    * (simhashOn) adds the presentation sort; simhashPairsOn must NOT
    * inherit it, or the persisted pair input carries a useless full
    * range-shuffle+sort before the band join re-shuffles anyway. */
  def simhashFps(docs: DataFrame): DataFrame = {
    val exploded = docs
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .withColumn("h_lo", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
      .withColumn("h_hi", conv(substring(md5(col("tok")), 9, 8), 16, 10).cast("long"))
    def bit(b: Int): Column =
      if (b < 32) shiftright(col("h_lo"), b).bitwiseAND(lit(1L))
      else shiftright(col("h_hi"), b - 32).bitwiseAND(lit(1L))
    val voteCols = (0 until SimBits).map(b =>
      sum(when(bit(b) === lit(1L), lit(1)).otherwise(lit(-1))).as(s"w_$b"))
    val votes = exploded.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
    val fp = (0 until SimBits).map(b =>
      when(col(s"w_$b") > lit(0), lit(bitValue(b))).otherwise(lit(0L))).reduce(_ + _)
    votes.select(col("doc_id"), fp.as("simhash"))
  }

  def simhashOn(docs: DataFrame): DataFrame =
    simhashFps(docs).orderBy("doc_id")

  def simhash(spark: SparkSession, dir: String): DataFrame =
    simhashOn(Tables.documents(spark, dir))

  /** Shared oracle SQL: per-bit vote expression over the two hash windows. */
  private def voteSql(b: Int): String =
    if (b < 32) s"sum(CASE WHEN (h_lo >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS w_$b"
    else s"sum(CASE WHEN (h_hi >> ${b - 32}) & 1 = 1 THEN 1 ELSE -1 END) AS w_$b"
  private def fpSql: String = (0 until SimBits)
    .map(b => s"(CASE WHEN w_$b > 0 THEN ${bitValueSql(b)} ELSE 0 END)").reduce((a, b) => s"($a + $b)")

  lazy val simhashSql: String = {
    val votes = (0 until SimBits).map(voteSql).mkString(",\n         ")
    s"""WITH ex AS (
       |  SELECT doc_id, unnest(${Text.tokensSql("text")}) AS tok FROM documents),
       |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h_lo,
       |             ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h_hi FROM ex),
       |votes AS (
       |  SELECT doc_id,
       |         $votes
       |  FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST($fpSql AS BIGINT) AS simhash
       |FROM votes ORDER BY doc_id""".stripMargin
  }

  /** SimHash near-dup pairs, Manku-style banding: the 64-bit fingerprint
    * splits into `nBands` contiguous blocks of 64/nBands bits as the bucket
    * key (pigeonhole: hamming ≤ nBands−1 ⟹ at least one band agrees, so
    * candidate generation is COMPLETE for the default hamming ≤ 3 at 4
    * bands), exact hamming verify via bit_count(xor).
    *
    * Scale: 16-bit bands give 65,536 buckets per band — 256× the old 8-bit
    * bucket space — so within-bucket self-join work is output-bound (driven
    * by real near-dup multiplicity) instead of collision-bound until corpus
    * sizes where a band bucket exceeds a task; past that, `nBands`/band
    * width re-knob the space (Manku's rotated-table refinement keeps the
    * same plan shape). DedupSpec pins band-containment and the 10× study
    * measures pair growth against duplicate multiplicity. */
  val HammingMax = 3
  val SimBands = 4

  /** RECALL CONTRACT: candidate generation is complete only for
    * `hammingMax ≤ nBands − 1` (the pigeonhole bound). Larger cutoffs are
    * allowed — the result is then "pairs within hammingMax AMONG band-
    * sharing candidates", useful for recall studies (DedupSpec) — but a
    * caller needing complete recall at a larger radius must raise nBands. */
  def simhashPairsOn(docs: DataFrame, nBands: Int = SimBands,
                     hammingMax: Int = HammingMax): DataFrame = {
    require(nBands >= 2 && SimBits % nBands == 0, s"nBands=$nBands must divide $SimBits")
    require(hammingMax >= 0, s"hammingMax=$hammingMax must be non-negative")
    val bandBits = SimBits / nBands
    val mask = (1L << bandBits) - 1 // bandBits ≤ 32 in practice; < 64 by require
    val fp = simhashFps(docs).persist() // both sides of the band self-join; unsorted
    val bands = fp.select(col("doc_id"), col("simhash"), explode(array((0 until nBands).map { k =>
      struct(lit(k).as("band_idx"),
        shiftright(col("simhash"), k * bandBits).bitwiseAND(lit(mask)).as("band"))
    }: _*)).as("b")).select(col("doc_id"), col("simhash"), col("b.band_idx"), col("b.band"))
    bands.as("l").join(bands.as("r"),
        col("l.band_idx") === col("r.band_idx") && col("l.band") === col("r.band")
          && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= lit(hammingMax))
      .orderBy("doc_a", "doc_b")
  }

  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    simhashPairsOn(Tables.documents(spark, dir))

  lazy val simhashPairsSql: String = {
    val votes = (0 until SimBits).map(voteSql).mkString(",\n         ")
    val bandBits = SimBits / SimBands
    val mask = (1L << bandBits) - 1
    val ks = (0 until SimBands).mkString(", ")
    s"""WITH ex AS (
       |  SELECT doc_id, unnest(${Text.tokensSql("text")}) AS tok FROM documents),
       |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h_lo,
       |             ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h_hi FROM ex),
       |votes AS (SELECT doc_id, $votes FROM h GROUP BY doc_id),
       |fps AS (SELECT doc_id, CAST($fpSql AS BIGINT) AS simhash FROM votes),
       |bands AS (
       |  SELECT doc_id, simhash, k AS band_idx, (simhash >> (k * $bandBits)) & $mask AS band
       |  FROM fps, (SELECT unnest([$ks]) AS k)),
       |pairs AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
       |         bit_count(xor(l.simhash, r.simhash)) AS hamming
       |  FROM bands l JOIN bands r ON l.band_idx = r.band_idx AND l.band = r.band AND l.doc_id < r.doc_id
       |  GROUP BY 1, 2, 3)
       |SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
       |FROM pairs WHERE hamming <= $HammingMax
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // -------------------------------------------------------- n-gram Jaccard
  /** Exact word-2-gram Jaccard over blocked candidate pairs. Blocking key =
    * (lang, exact token count): cheap, deterministic, and keeps the
    * self-join near-linear; at 100 TB the same plan holds with a coarser
    * length bucket. */
  val JaccardMin = 0.05

  /** Jaccard is computed over distinct 28-bit gram HASHES, not gram strings:
    * the per-pair intersection compares fixed-width longs instead of
    * variable-length strings (the hash is engine-portable, so a collision —
    * ~1e-4 per doc at 60 grams — changes both engines identically and the
    * oracle still matches). Candidate pairs come from the (lang, token
    * count) blocking join; per-pair work is a codegen'd array_intersect.
    * A gram-explode + count plan was measured 2.4× slower here: hot common
    * grams ("of the", ...) fan the join out quadratically per gram. At
    * 100 TB the blocking key coarsens (length bucket) and candidates come
    * from MinHash bands instead, same per-pair verify. */
  /** Distinct sorted 2-gram hash array — sorted + distinct is the contract
    * sorted_intersect_count needs; shared by both Jaccard variants. */
  private def grams2(toks: Column): Column =
    when(size(toks) >= lit(2),
      array_sort(array_distinct(transform(sequence(lit(0), size(toks) - lit(2)),
        i => baseHash(concat_ws(" ", slice(toks, i + lit(1), lit(2))))))))
      .otherwise(array().cast("array<long>"))

  private def grams2Sql(t: String): String =
    s"""CASE WHEN len($t) >= 2
       |     THEN list_distinct(list_transform(range(0, len($t) - 1), i -> ${baseHashSql(s"array_to_string(($t)[i+1:i+2], ' ')")}))
       |     ELSE [] END""".stripMargin

  /** Test hook: the shared 2-gram hash array on raw text (DedupSpec's
    * independent recomputation path). */
  def shingles2ForTest(text: Column): Column = grams2(Text.tokens(text))

  def ngramJaccardOn(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = Text.tokens(col("text"))
    val grams = grams2(toks)
    val blocked = docs
      .select(col("doc_id"), col("lang"), size(toks).cast("long").as("n_tok"), grams.as("grams"))
      .persist() // reused by both sides of the self-join
    val pairs = blocked.as("l").join(blocked.as("r"),
      col("l.lang") === col("r.lang") && col("l.n_tok") === col("r.n_tok")
        && col("l.doc_id") < col("r.doc_id"))
    pairs
      .withColumn("n_inter", call_function("sorted_intersect_count", col("l.grams"), col("r.grams")))
      .withColumn("n_union", size(col("l.grams")).cast("long") + size(col("r.grams")).cast("long") - col("n_inter"))
      .filter(col("n_union") > lit(0L))
      .withColumn("jaccard", col("n_inter") / col("n_union"))
      .filter(col("jaccard") >= lit(JaccardMin))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"), col("n_inter"), col("n_union"),
        r6(col("jaccard")).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardOn(Tables.documents(spark, dir))

  lazy val ngramJaccardSql: String = {
    s"""WITH toks AS (SELECT doc_id, lang, ${Text.tokensSql("text")} AS t FROM documents),
       |docs AS (
       |  SELECT doc_id, lang, CAST(len(t) AS BIGINT) AS n_tok, ${grams2Sql("t")} AS grams
       |  FROM toks),
       |pairs AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
       |         CAST(len(list_intersect(l.grams, r.grams)) AS BIGINT) AS n_inter,
       |         CAST(len(l.grams) + len(r.grams) - len(list_intersect(l.grams, r.grams)) AS BIGINT) AS n_union
       |  FROM docs l JOIN docs r ON l.lang = r.lang AND l.n_tok = r.n_tok AND l.doc_id < r.doc_id)
       |SELECT doc_a, doc_b, n_inter, n_union, ${r6Sql("n_inter / n_union")} AS jaccard
       |FROM pairs WHERE n_union > 0 AND n_inter / n_union >= $JaccardMin
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** The 100 TB Jaccard form: candidate pairs come from MinHash LSH bands
    * (data-adaptive bucket count, near-linear self-join) instead of the
    * constant-cardinality (lang, token-count) blocking above; the per-pair
    * verify is unchanged — exact 2-gram Jaccard via sorted_intersect_count.
    * Recall follows the LSH S-curve (numHashes/numBands knobs) rather than
    * the blocking key's exact-length coincidence, which is the trade every
    * production dedup makes. The blocked twin stays registered as the
    * small-scale exact-recall variant. */
  def ngramJaccardLshOn(docs: DataFrame,
                        numHashes: Int = NumHashes, numBands: Int = NumBands): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val gtab = docs.select(col("doc_id"), grams2(Text.tokens(col("text"))).as("grams"))
      .persist() // both pair sides
    val mh = minhashSigsOn(docs, numHashes).persist() // both band sides
    val cand = minhashCandidates(mh, numHashes, numBands)
    cand
      .join(gtab.as("l"), col("doc_a") === col("l.doc_id"))
      .join(gtab.as("r"), col("doc_b") === col("r.doc_id"))
      .withColumn("n_inter", call_function("sorted_intersect_count", col("l.grams"), col("r.grams")))
      .withColumn("n_union", size(col("l.grams")).cast("long") + size(col("r.grams")).cast("long") - col("n_inter"))
      .filter(col("n_union") > lit(0L))
      .withColumn("jaccard", col("n_inter") / col("n_union"))
      .filter(col("jaccard") >= lit(JaccardMin))
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_union"),
        r6(col("jaccard")).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  def ngramJaccardLsh(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardLshOn(Tables.documents(spark, dir))

  val ngramJaccardLshSql: String =
    s"""WITH ${minhashCandCtes(NumHashes, NumBands)},
       |g AS (SELECT doc_id, ${grams2Sql("t")} AS grams FROM toks),
       |p AS (
       |  SELECT c.doc_a, c.doc_b,
       |         CAST(len(list_intersect(l.grams, r.grams)) AS BIGINT) AS n_inter,
       |         CAST(len(l.grams) + len(r.grams) - len(list_intersect(l.grams, r.grams)) AS BIGINT) AS n_union
       |  FROM cand c JOIN g l ON c.doc_a = l.doc_id JOIN g r ON c.doc_b = r.doc_id)
       |SELECT doc_a, doc_b, n_inter, n_union, ${r6Sql("n_inter / n_union")} AS jaccard
       |FROM p WHERE n_union > 0 AND n_inter / n_union >= $JaccardMin
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------- duplicated-span coverage
  /** Exact-substring duplication coverage (the training-data dedup measure
    * of Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    * Better", at token granularity): for every overlapping [[SpanK]]-token
    * span, count global occurrences of its hash across the corpus; a span
    * seen ≥2 times anywhere is DUPLICATED, and a document's dup_frac is the
    * fraction of its tokens covered by the union of its duplicated spans
    * (interval union, so overlapping spans don't double-count). Documents
    * above [[SpanDupFracMax]] are the memorization/boilerplate risk the
    * pipeline drops or trims.
    *
    * 100 TB shape: per-doc span totals come from array length (zero
    * shuffle); the global span census is one map-side-combinable
    * groupBy(h) carrying only (28-bit hash, count) partials; duplicated
    * hashes (count ≥ 2 — a small fraction of distinct spans) hash-join
    * back against the exploded spans, so the only doc-keyed shuffle
    * carries duplicated (doc_id, pos) pairs. The per-doc interval union is
    * an array op bounded by document length. */
  val SpanK = 4
  val SpanDupFracMax = 0.5

  /** Shared census behind coverage and trim: per doc with ≥1 duplicated
    * span, the duplicated-span count and the DISTINCT covered token
    * positions (interval union as a long array). The shared guarded n-gram
    * builder supplies the spans; posexplode carries each span's 0-based
    * start position. */
  private def spanCensus(docs: DataFrame): DataFrame = {
    val flat = docs
      .select(col("doc_id"), posexplode(Text.ngrams(Text.tokens(col("text")), SpanK)).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        baseHash(col("gram")).as("h"))
    val dupH = flat.groupBy("h").agg(count(lit(1)).as("c")).filter(col("c") > 1).select("h")
    flat.join(dupH, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_spans"),
        array_distinct(flatten(collect_list(
          sequence(col("pos"), col("pos") + lit(SpanK - 1L))))).as("covered"))
  }

  def spanCoverageOn(docs: DataFrame): DataFrame = {
    val toks = Text.tokens(col("text"))
    // span count is pure arithmetic — building the gram strings a second
    // time just to size() them would double the row-local work
    val base = docs
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        when(size(toks) >= lit(SpanK), (size(toks) - lit(SpanK - 1)).cast("long"))
          .otherwise(lit(0L)).as("n_spans"))
    val perdoc = spanCensus(docs)
      .select(col("doc_id"), col("n_dup_spans"),
        size(col("covered")).cast("long").as("covered_tokens"))
    base
      .join(perdoc, Seq("doc_id"), "left")
      .withColumn("n_dup_spans", coalesce(col("n_dup_spans"), lit(0L)))
      .withColumn("covered_tokens", coalesce(col("covered_tokens"), lit(0L)))
      .withColumn("dup_frac",
        coalesce(r6(col("covered_tokens") / nullif(col("n_tokens"), lit(0L))), lit(0.0)))
      .withColumn("keep", col("dup_frac") <= lit(SpanDupFracMax))
      .select("doc_id", "n_tokens", "n_spans", "n_dup_spans", "covered_tokens",
        "dup_frac", "keep")
      .orderBy("doc_id")
  }

  def spanCoverage(spark: SparkSession, dir: String): DataFrame =
    spanCoverageOn(Tables.documents(spark, dir))

  lazy val spanCoverageSql: String =
    s"""WITH toks AS (SELECT doc_id, ${Text.tokensSql("text")} AS t FROM documents),
       |base AS (
       |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
       |         CAST(CASE WHEN len(t) >= $SpanK THEN len(t) - ${SpanK - 1} ELSE 0 END AS BIGINT) AS n_spans
       |  FROM toks),
       |g AS (SELECT doc_id, ${Text.ngramsSql("t", SpanK)} AS g FROM toks),
       |sp0 AS (SELECT doc_id, unnest(range(0, len(g))) AS pos, unnest(g) AS gram FROM g),
       |sp AS (SELECT doc_id, pos, ${baseHashSql("gram")} AS h FROM sp0),
       |duph AS (SELECT h FROM sp GROUP BY h HAVING count(*) > 1),
       |perdoc AS (
       |  SELECT s.doc_id, count(*) AS n_dup_spans,
       |         CAST(len(list_distinct(flatten(list(range(s.pos, s.pos + $SpanK))))) AS BIGINT) AS covered_tokens
       |  FROM sp s JOIN duph d ON s.h = d.h
       |  GROUP BY s.doc_id)
       |SELECT b.doc_id, b.n_tokens, b.n_spans,
       |       CAST(coalesce(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       |       CAST(coalesce(p.covered_tokens, 0) AS BIGINT) AS covered_tokens,
       |       coalesce(${r6Sql("coalesce(p.covered_tokens, 0) / nullif(b.n_tokens, 0)")}, 0.0) AS dup_frac,
       |       coalesce(${r6Sql("coalesce(p.covered_tokens, 0) / nullif(b.n_tokens, 0)")}, 0.0) <= $SpanDupFracMax AS keep
       |FROM base b LEFT JOIN perdoc p ON b.doc_id = p.doc_id
       |ORDER BY b.doc_id""".stripMargin

  // ------------------------------------------------ duplicated-span trim
  /** The TRANSFORMATION the span census exists for (Lee et al. 2021 remove
    * duplicated substrings rather than whole documents): rebuild each
    * document with every token covered by a duplicated span removed. Output
    * carries the md5 of the retained token stream, so the oracle verifies
    * the exact surviving text, not just counts. Same plan as
    * [[spanCoverageOn]] up to the census; the rebuild is a per-row indexed
    * list filter (bounded by doc length, codegen'd). */
  def spanTrimOn(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), Text.tokens(col("text")).as("t"))
    val cov = spanCensus(docs).select("doc_id", "covered")
    base.join(cov, Seq("doc_id"), "left")
      .withColumn("covered", coalesce(col("covered"), array().cast("array<long>")))
      // positions via array_except (hash-based, order-preserving on the
      // left array): O(n + covered) per row — a per-token array_contains
      // scan would be O(n · covered), quadratic on heavily duplicated docs.
      // Guarded sequence: sequence(0, -1) would DESCEND on empty docs.
      .withColumn("retained_pos",
        array_except(
          when(size(col("t")) >= 1, sequence(lit(0L), size(col("t")).cast("long") - 1))
            .otherwise(array().cast("array<long>")),
          col("covered")))
      .withColumn("retained",
        transform(col("retained_pos"), i => element_at(col("t"), (i + 1).cast("int"))))
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
        (size(col("t")) - size(col("retained"))).cast("long").as("n_removed"),
        md5(concat_ws(" ", col("retained"))).as("retained_md5"))
      .orderBy("doc_id")
  }

  def spanTrim(spark: SparkSession, dir: String): DataFrame =
    spanTrimOn(Tables.documents(spark, dir))

  /** DuckDB list_filter's optional lambda index is 1-BASED (Spark's is
    * 0-based) — hence the `i - 1`. */
  lazy val spanTrimSql: String =
    s"""WITH toks AS (SELECT doc_id, ${Text.tokensSql("text")} AS t FROM documents),
       |g AS (SELECT doc_id, ${Text.ngramsSql("t", SpanK)} AS g FROM toks),
       |sp0 AS (SELECT doc_id, unnest(range(0, len(g))) AS pos, unnest(g) AS gram FROM g),
       |sp AS (SELECT doc_id, pos, ${baseHashSql("gram")} AS h FROM sp0),
       |duph AS (SELECT h FROM sp GROUP BY h HAVING count(*) > 1),
       |cov AS (
       |  SELECT s.doc_id, list_distinct(flatten(list(range(s.pos, s.pos + $SpanK)))) AS covered
       |  FROM sp s JOIN duph d ON s.h = d.h GROUP BY s.doc_id),
       |trimmed AS (
       |  SELECT tk.doc_id, CAST(len(tk.t) AS BIGINT) AS n_tokens,
       |         list_filter(tk.t, (x, i) -> NOT list_contains(coalesce(c.covered, []), i - 1)) AS retained
       |  FROM toks tk LEFT JOIN cov c ON tk.doc_id = c.doc_id)
       |SELECT doc_id, n_tokens, CAST(n_tokens - len(retained) AS BIGINT) AS n_removed,
       |       -- DuckDB array_to_string([]) is NULL where Spark concat_ws gives ''
       |       md5(coalesce(array_to_string(retained, ' '), '')) AS retained_md5
       |FROM trimmed ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- near-dup clustering
  /** Connected components over the near-dup pair graph + canonical
    * selection — the step a dedup pipeline runs AFTER pair generation:
    * pairs only say "these two match"; what the corpus keeps is one
    * canonical doc per transitive cluster.
    *
    * Edges: MinHash pairs with est_jaccard ≥ [[ClusterEstMin]]. Components
    * by iterative min-label propagation with pointer jumping — each round
    * every doc takes the min label among itself and its neighbors, then
    * shortcuts to its label's label (path halving), so convergence is
    * O(log n) rounds even on a long transitive chain and the loop runs to
    * the exact fixpoint the closure oracle computes (no iteration cap).
    * This is the standard distributed CC shape: each round is a shuffle
    * join + aggregate + self-join, state is (doc_id, label), and the
    * driver sees only an O(1) convergence count per round — the same
    * per-iteration driver role Lloyd training has.
    *
    * Output per doc: its cluster id (min doc_id in the component), the
    * cluster size, and whether this doc is the canonical survivor. */
  val ClusterEstMin = 0.5

  /** `checkpointRounds` (default true) replaces each round's persist() with
    * an eager localCheckpoint(): same caching, but the LOGICAL plan is cut
    * each round, so per-round analysis/optimization/cache-lookup cost stays
    * O(1) in round count instead of growing with the nested lineage.
    * Measured (BASELINE.md round 7): sf0.1 min 3.1 s vs 5.9 s persist —
    * and the persist path is BIMODAL (5.9–20 s across identical runs; the
    * round-5 "13.4 s regression" was this mode, not box load) while the
    * checkpointed path is stable; at 10× data 6.9 s vs 16.9 s. This is the
    * same per-iteration checkpoint every production distributed-CC
    * implementation carries. The trade: checkpointed blocks drop the
    * lineage fallback, so an executor loss mid-job fails the query instead
    * of recomputing — on a real cluster an iterative job at this round
    * count either accepts that (retry is cheap, rounds are few) or swaps
    * in reliable checkpointing to the cluster FS; `checkpointRounds =
    * false` keeps the pure-lineage form for callers that need it. */
  def dupClustersOn(docs: DataFrame,
                    numHashes: Int = NumHashes, numBands: Int = NumBands,
                    checkpointRounds: Boolean = true): DataFrame =
    propagateComponents(docs.select("doc_id"),
      dupEdgesOn(docs, numHashes, numBands), checkpointRounds)
      .orderBy("doc_id")

  /** The thresholded near-dup pair table — the edge set [[dupClustersOn]]
    * clusters over, exposed as warehouse state in its own right: the
    * incremental update ([[dupClustersIncrementalOn]]) needs the OLD
    * snapshot's edges persisted next to its manifest, because components
    * alone cannot SPLIT (whether removing a doc disconnects its cluster
    * depends on which pairs the remaining members share). */
  def dupEdgesOn(docs: DataFrame,
                 numHashes: Int = NumHashes, numBands: Int = NumBands): DataFrame =
    minhashLshOn(docs, numHashes, numBands)
      .filter(col("est_jaccard") >= lit(ClusterEstMin))
      .select("doc_a", "doc_b")

  /** Round count of the LAST [[propagateComponents]] run in this JVM —
    * a diagnostics/spec hook (DedupSpec's O(log n) chain bound, the
    * CcSkewStudy), not part of the operator API. */
  private[graft] val lastPropagationRounds = new java.util.concurrent.atomic.AtomicInteger(0)

  // Env-gated (GRAFT_CC_DEBUG) per-round shuffle meter for the CC loop:
  // task-end shuffle read/write sums plus the max single-task shuffle
  // read — the number that exposes a hot-label partition (one task
  // draining an entire skewed key) that round totals would hide.
  // keyed by applicationId so a restarted SparkContext in the same JVM
  // gets its own listener (a stale registration would silently report
  // 0 MB rounds); bytes from CONCURRENT non-CC jobs do land in the
  // deltas — the study runs the loop alone, and the lines are debug
  // output, not a gate
  private val ccMeterApp = new java.util.concurrent.atomic.AtomicReference[String](null)
  private val ccRead = new java.util.concurrent.atomic.AtomicLong
  private val ccWrite = new java.util.concurrent.atomic.AtomicLong
  private[graft] val ccMaxTaskRead = new java.util.concurrent.atomic.AtomicLong
  private def ensureCcMeter(sc: org.apache.spark.SparkContext): Unit =
    if (ccMeterApp.getAndSet(sc.applicationId) != sc.applicationId)
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            val r = m.shuffleReadMetrics.totalBytesRead
            ccRead.addAndGet(r)
            ccWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            ccMaxTaskRead.accumulateAndGet(r, Math.max(_, _))
          }
        }
      })

  /** Min-label propagation + pointer jumping over (ids, pair edges) — the
    * loop of [[dupClustersOn]], shared with the incremental update so the
    * two can never disagree on clustering semantics. Returns the manifest
    * columns (doc_id, cluster_id, cluster_size, is_canonical), unsorted. */
  private[graft] def propagateComponents(ids: DataFrame, pairs: DataFrame,
                                  checkpointRounds: Boolean): DataFrame = {
    val sym = pairs.union(pairs.select(col("doc_b"), col("doc_a"))).persist()
    // Only nodes with at least one edge can ever change label — a node
    // absent from the edge table is its own singleton component by
    // construction. Excluding singletons from the loop state means every
    // round's join/aggregate/jump shuffles only the CLUSTERED minority
    // (most of a deduped corpus is singleton at any scale; sf0.1: 490 of
    // 5,000 docs carry an edge), instead of dragging every doc through
    // every round to conclude nothing. Singletons rejoin after the loop
    // with comp = own id — exactly the label the loop would have left
    // them. The label-sum convergence invariant is unaffected (it only
    // ever watched rows that could move).
    val edgeIds = sym.select(col("doc_a").as("doc_id")).distinct()
    var comp = ids.join(edgeIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("doc_id").as("comp")).persist()
    // convergence via the label-sum invariant: every step can only DECREASE
    // a node's label, so sum(comp) is strictly decreasing until the
    // fixpoint and equality means no node moved — one cheap aggregate per
    // round instead of a full old-vs-new join. Summed as DECIMAL(38,0):
    // Spark's non-ANSI Long sum wraps silently, and at corpus scale
    // (billions of docs × 64-bit ids) a wrapped sum could collide across
    // rounds and terminate the loop one round early.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val r = df.agg(sum(col("comp").cast("decimal(38,0)"))).head()
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    var curSum = labelSum(comp)
    var changed = 1L
    var rounds = 0
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    if (debug) ensureCcMeter(sym.sparkSession.sparkContext)
    while (changed > 0) {
      rounds += 1
      val (r0, w0) = (ccRead.get(), ccWrite.get())
      if (debug) ccMaxTaskRead.set(0L)
      val nbrMin = sym
        .join(comp.select(col("doc_id").as("nbr"), col("comp").as("nbr_comp")),
          col("doc_b") === col("nbr"))
        .groupBy(col("doc_a"))
        .agg(min("nbr_comp").as("nbr_min"))
      val prop = comp
        .join(nbrMin, comp("doc_id") === nbrMin("doc_a"), "left")
        .select(comp("doc_id"),
          least(comp("comp"), coalesce(col("nbr_min"), comp("comp"))).as("comp"))
      // pointer jump (path halving): comp(v) := comp(comp(v)). Labels only
      // ever point at equal-or-smaller ids, so the jump is monotone and the
      // label distance to the component min halves — convergence in
      // O(log n) rounds even on a long chain, which is why the loop needs
      // no iteration cap to stay exact (matching the closure oracle).
      val jumped = prop.as("a")
        .join(prop.select(col("doc_id").as("p_id"), col("comp").as("p_comp")).as("b"),
          col("a.comp") === col("p_id"))
        .select(col("a.doc_id").as("doc_id"), col("p_comp").as("comp"))
      val t0 = System.nanoTime()
      // LAZY checkpoint/persist: the convergence aggregate right below is
      // the round's one action and materializes the cached blocks as it
      // sums them — an eager checkpoint here would run the identical plan
      // as a SEPARATE job first (round 18: two driver actions per round
      // collapsed to one; same blocks, same lineage cut).
      val next = if (checkpointRounds) jumped.localCheckpoint(eager = false)
                 else jumped.persist()
      val nextSum = graft.ops.Prof(ids.sparkSession, s"cc: round $rounds")(
        labelSum(next))
      if (debug) {
        val mb = 1024.0 * 1024.0
        println(f"CC_ROUND $rounds%d round=${(System.nanoTime() - t0) / 1e9}%.2f " +
          f"shuf_read=${(ccRead.get() - r0) / mb}%.1fMB shuf_write=${(ccWrite.get() - w0) / mb}%.1fMB " +
          f"max_task_read=${ccMaxTaskRead.get() / mb}%.1fMB")
        if (sys.env.contains("GRAFT_CC_PLAN"))
          println(jumped.queryExecution.executedPlan.toString.take(6000))
      }
      changed = if (nextSum.compareTo(curSum) == 0) 0L else 1L
      curSum = nextSum
      comp.unpersist()
      comp = next
    }
    lastPropagationRounds.set(rounds)
    // sym fed only the loop, and the final comp cache is already
    // materialized (labelSum aggregated over every partition) — drop the
    // edge cache now; worst case under later eviction is a recompute
    // through lineage, never a wrong result
    sym.unpersist()
    val sizes = comp.groupBy(col("comp").as("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    // the final comp stays persisted DELIBERATELY, same convention as
    // minhashLshOn's signature cache: the returned plan consumes comp
    // twice (sizes + join), and a repeated invocation in one session
    // plan-matches the cache — measured 60% slower per repeat when it is
    // unpersisted here (the whole LSH + loop recomputes). Batch callers
    // should spark.catalog.clearCache() between invocations, as Verify and
    // Bench both do.
    comp.select(col("doc_id"), col("comp").as("cluster_id"))
      .join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("is_canonical"))
      // edge-less nodes sat out the loop (they cannot move); each is its
      // own singleton component, exactly what the loop would have emitted.
      // Anti-join against the CACHED final comp (its doc_id set IS
      // ids ∩ edge endpoints), not against edgeIds — edgeIds' lineage
      // reaches through the just-unpersisted sym into the full edge build
      .unionByName(ids.join(comp.select("doc_id"), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("cluster_id"),
          lit(1L).as("cluster_size"), lit(true).as("is_canonical")))
  }

  /** Incremental dup-cluster manifest update — the 100 TB ingestion shape:
    * instead of re-running connected components over the whole corpus, the
    * snapshot delta ([[Corpus.snapshotDeltaOn]]) decides which components
    * the change can possibly affect, and ONLY those re-cluster; every
    * other manifest row passes through untouched. Output is bit-identical
    * to `dupClustersOn(newDocs)` (spec-pinned, and the registered query
    * shares the from-scratch recursive-CTE oracle).
    *
    * Inputs are the OLD snapshot's warehouse state — its manifest AND its
    * edge table ([[dupEdgesOn]]); edges are required because components
    * alone cannot split — plus both snapshots.
    *
    * What re-clusters: the old components of every removed/changed doc
    * (their clusters may split) and of every endpoint of a NEW pair edge
    * (those clusters may merge), plus added docs. New pair edges are
    * generated only for added/changed docs, banded against the full new
    * corpus ([[minhashCandidatesAgainst]]) — every other edge is carried
    * over from the old edge table (minus those touching removed/changed
    * docs), never recomputed.
    *
    * Scale shape: the delta classify is one co-keyed outer join; fresh-edge
    * generation is |delta| bands probing the corpus band table (the same
    * bounded join the streaming dedup twin makes per micro-batch); the CC
    * loop runs over touched components only. With `oldSigs` supplied (the
    * registered query reads them from the frozen base), signatures are
    * warehouse state: unchanged docs reuse their stored signature (same
    * text → same signature) and only fresh docs get signed, so NO stage of
    * the steady-state update is corpus-proportional except the delta
    * classify itself. Without `oldSigs` the new corpus is signed in full
    * (the self-contained library form). */
  /** `precomputedDelta`/`precomputedFresh`: a composed update that already
    * ran the snapshot-delta classify (and materialized the fresh text
    * slice) threads them in here — like `oldSigs`, a seam so the
    * corpus-proportional passes run ONCE per snapshot, not once per
    * consuming update family ([[graft.ext.Corpus.manifestIncrementalOn]]
    * is the caller). Both must derive from the same (oldDocs, newDocs)
    * pair; `precomputedFresh` must be exactly the added ∪ changed slice of
    * the NEW snapshot. */
  def dupClustersIncrementalOn(oldDocs: DataFrame, newDocs: DataFrame,
                               oldManifest: DataFrame, oldEdges: DataFrame,
                               numHashes: Int = NumHashes, numBands: Int = NumBands,
                               checkpointRounds: Boolean = true,
                               oldSigs: Option[DataFrame] = None,
                               precomputedDelta: Option[DataFrame] = None,
                               precomputedFresh: Option[DataFrame] = None): DataFrame =
    dupWarehouseUpdateOn(oldDocs, newDocs, oldManifest, oldEdges, numHashes,
      numBands, checkpointRounds, oldSigs, precomputedDelta, precomputedFresh).manifest

  /** The dedup warehouse of one snapshot: the cluster manifest, the
    * near-dup edge table, and the per-doc signature table — exactly what
    * [[frozenIncrementalBase]] freezes at bootstrap, and what
    * [[dupWarehouseUpdateOn]] both consumes and PRODUCES, so daily
    * snapshots chain state → state → state without ever re-signing or
    * re-clustering the untouched majority (DedupSpec pins two chained
    * updates ≡ the from-scratch build of the final snapshot). */
  case class DupWarehouse(manifest: DataFrame, edges: DataFrame, sigs: DataFrame) {
    /** Release cached blocks this state holds (the update persists the new
      * signature table for its multi-consumer build). A CHAINED ingestion
      * loop must call this on the CONSUMED old state once the next
      * update's outputs are materialized (written or checkpointed) —
      * otherwise each snapshot leaves one corpus-sized signature cache
      * behind. No-op on frames that were never persisted. */
    def release(): Unit =
      Seq(manifest, edges, sigs).foreach(df => df.unpersist())
  }

  /** The STATE-ROLLING form of the incremental update: returns the new
    * snapshot's full warehouse, not just its manifest — the production
    * ingestion loop (each snapshot's update feeds the next). The new edge
    * table is exact by construction: surviving old edges (neither endpoint
    * gone) ∪ fresh-doc edges — an edge between two unchanged docs cannot
    * appear or vanish (their signatures are unchanged), so the union IS
    * the new snapshot's edge set. The new signature table reuses stored
    * signatures for unchanged docs and signs only the fresh slice (or
    * signs everything when no warehouse sigs are supplied). */
  def dupWarehouseUpdateOn(oldDocs: DataFrame, newDocs: DataFrame,
                           oldManifest: DataFrame, oldEdges: DataFrame,
                           numHashes: Int = NumHashes, numBands: Int = NumBands,
                           checkpointRounds: Boolean = true,
                           oldSigs: Option[DataFrame] = None,
                           precomputedDelta: Option[DataFrame] = None,
                           precomputedFresh: Option[DataFrame] = None): DupWarehouse = {
    // LINEAGE DISCIPLINE: every delta-bounded frame below is eagerly
    // localCheckpoint'ed, not persist'ed. Each frame is referenced 2-4
    // times downstream, and Catalyst plans are TREES, not DAGs — a
    // persisted frame's full logical subtree is re-embedded (and
    // re-analyzed, on the driver) at every reference, so the composed
    // update's tree grows multiplicatively with pipeline depth: profiled
    // at sf0.1, the CC rounds spent 12-29 s in driver-side planning over
    // ~200-row frames before this change, ~1 s after. Checkpointing
    // truncates each reference to an ExistingRDD leaf. The frames are
    // |delta|-bounded by construction, so executor-local checkpoint
    // storage is cheap at any corpus scale; only corpus-sized `mh` keeps
    // persist + lineage (recompute-on-eviction matters there).
    val delta = precomputedDelta.getOrElse(
      graft.ops.Prof(oldDocs.sparkSession, "dwu: delta ckpt")(
        graft.ext.Corpus.snapshotDeltaOn(oldDocs, newDocs).localCheckpoint()))
    val gone = delta.filter(col("status").isin("removed", "changed")).select("doc_id")
    val fresh = delta.filter(col("status").isin("added", "changed")).select("doc_id")

    // the new corpus's signature table: from warehouse sigs + delta-only
    // signing when available, else signed from scratch (persisted: both
    // band sides + both sig rejoins)
    val mh = (oldSigs match {
      case Some(sigs) =>
        sigs.join(gone, Seq("doc_id"), "left_anti")
          .unionByName(minhashSigsOn(
            precomputedFresh.getOrElse(
              newDocs.join(fresh, Seq("doc_id"), "left_semi")), numHashes))
      case None => minhashSigsOn(newDocs, numHashes)
    }).persist()
    // delta-bounded (|fresh edges|), and referenced from BOTH the
    // touched-component discovery and the sub-problem edge union —
    // without materialization the signature/band-probe subplan above it
    // runs once per consumer (measured: the probe re-ran inside the final
    // untouched anti-join's lineage, doubling the whole update)
    val freshEdges = graft.ops.Prof(oldDocs.sparkSession, "dwu: freshEdges ckpt")(
      minhashEstJaccard(
        minhashCandidatesAgainst(mh.join(fresh, "doc_id"), mh, numHashes, numBands),
        mh, numHashes)
      .filter(col("est_jaccard") >= lit(ClusterEstMin))
      .select("doc_a", "doc_b")
      .localCheckpoint())

    // old edges that survive the delta: neither endpoint removed/changed
    val keptEdges = oldEdges
      .join(gone.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_anti")
      .join(gone.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_anti")

    val manifestNew = componentUpdateFrom(oldManifest, delta, keptEdges,
        freshEdges, checkpointRounds)
      .orderBy("doc_id")
    // kept ∪ fresh edges are disjoint by construction (a fresh edge always
    // touches a fresh doc; kept edges never do) and together exact; the
    // explicit select restores (doc_a, doc_b) column ORDER — the doc_b
    // anti-join above moved its key to the front, which the by-name CC
    // consumers never see but a positional warehouse reader would
    DupWarehouse(manifestNew,
      keptEdges.select("doc_a", "doc_b").unionByName(freshEdges), mh)
  }

  /** Delta-bounded component reconciliation — the edge-source-agnostic
    * core of the incremental cluster update, shared by the text warehouse
    * ([[dupWarehouseUpdateOn]], MinHash-LSH edges) and the media warehouse
    * ([[graft.multimodal.Multimodal.mediaClustersUpdateOn]], banded DCT
    * edges): given the old cluster manifest, the snapshot delta, the
    * surviving old edges and the fresh-doc edges, recompute ONLY the
    * touched components and carry every untouched cluster verbatim.
    * `delta` must carry (doc_id, status); `keptEdges`/`freshEdges` carry
    * (doc_a, doc_b). Exact: an edge between two unchanged docs cannot
    * appear or vanish, so components not holding churned docs or fresh
    * edges are unchanged by construction. */
  private[graft] def componentUpdateFrom(oldManifest: DataFrame, delta: DataFrame,
                                         keptEdges: DataFrame, freshEdges: DataFrame,
                                         checkpointRounds: Boolean = true): DataFrame = {
    val gone = delta.filter(col("status").isin("removed", "changed")).select("doc_id")
    // components the delta can affect: those holding a removed/changed doc
    // or an endpoint of a fresh edge (added docs have no old component);
    // |touched clusters|-sized, consumed by three branches (sub-problem
    // ids, sub-problem edges, the untouched anti-join)
    val touchedComps = oldManifest
      .join(gone
          .union(freshEdges.select(col("doc_a").as("doc_id")))
          .union(freshEdges.select(col("doc_b").as("doc_id")))
          .distinct(),
        "doc_id")
      .select("cluster_id").distinct()
    val touchedCompsCk = graft.ops.Prof(oldManifest.sparkSession, "cuf: touchedComps ckpt")(
      touchedComps.localCheckpoint())

    // the sub-problem: surviving members of touched components + added
    // docs; checkpointed so the CC loop's rounds start from leaf scans
    val subIds = graft.ops.Prof(oldManifest.sparkSession, "cuf: subIds ckpt")(
      oldManifest.join(touchedCompsCk, "cluster_id")
      .select("doc_id")
      .join(delta.filter(col("status") === "removed").select("doc_id"), Seq("doc_id"), "left_anti")
      .union(delta.filter(col("status") === "added").select("doc_id"))
      .distinct()
      .localCheckpoint())
    // a kept edge's endpoints share one old component, so filtering doc_a
    // against touched members keeps exactly the touched components' edges
    val subEdges = graft.ops.Prof(oldManifest.sparkSession, "cuf: subEdges ckpt")(
      keptEdges
      .join(oldManifest.join(touchedCompsCk, "cluster_id").select(col("doc_id").as("doc_a")), "doc_a")
      .select("doc_a", "doc_b")
      .union(freshEdges.select("doc_a", "doc_b"))
      .distinct()
      .localCheckpoint())

    // an edgeless sub-problem (pure additions/removals with no near-dup
    // pairing — the quiet-ingestion case) needs no propagation loop at
    // all: every member is its own singleton cluster
    val recomputed =
      if (graft.ops.Prof(oldManifest.sparkSession, "cuf: subEdges count")(
            subEdges.count()) == 0)
        subIds.select(col("doc_id"), col("doc_id").as("cluster_id"),
          lit(1L).as("cluster_size"), lit(true).as("is_canonical"))
      else propagateComponents(subIds, subEdges, checkpointRounds)
    oldManifest.join(touchedCompsCk, Seq("cluster_id"), "left_anti")
      .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
      .unionByName(recomputed.select("doc_id", "cluster_id", "cluster_size", "is_canonical"))
  }

  /** Materialized dup-cluster manifest, built once per (corpus, knobs) and
    * read back from parquet on every later invocation — the production
    * shape of connected components: the iterative CC job writes a manifest
    * TABLE, and everything downstream (the dedup deletion, the savings
    * report) reads that table instead of re-running the loop. In-process
    * the manifest lives in a temp dir keyed by corpus; at 100 TB it is the
    * same write, pointed at the warehouse. Unlike the frozen ANN models
    * this is corpus-sized, so it is never collected to the driver. */
  private val manifestCache = new graft.ops.FrozenCaches.Memo[(Int, Int), String](
    // the manifest owns on-disk temp state: delete it, not just the keys
    beforeClear = _.forEach(p =>
      graft.ops.FrozenCaches.deleteTree(java.nio.file.Paths.get(p).getParent.toString)),
    label = "dup_manifest")

  private def frozenManifest(spark: SparkSession, dir: String): DataFrame = {
    val path = manifestCache.get(dir, (NumHashes, NumBands)) {
      val p = java.nio.file.Files.createTempDirectory("graft_dup_manifest")
        .toString + "/manifest.parquet"
      dupClustersOn(Tables.documents(spark, dir)).write.parquet(p)
      p
    }
    spark.read.parquet(path)
  }

  def dupClusters(spark: SparkSession, dir: String): DataFrame =
    // parquet round-trip loses row order; re-sort to the manifest contract
    frozenManifest(spark, dir).orderBy("doc_id")

  /** Frozen warehouse state of the simulated OLD snapshot (manifest + edge
    * table) — what a real ingestion pipeline has on disk when a new
    * snapshot lands; built once per corpus so the registered incremental
    * query measures the UPDATE, not the base build. */
  private val incrementalBaseCache =
    new graft.ops.FrozenCaches.Memo[(Int, Int), (String, String, String)](
      beforeClear = _.forEach(p =>
        graft.ops.FrozenCaches.deleteTree(
          java.nio.file.Paths.get(p._1).getParent.toString)),
      label = "dup_incr_base")

  /** Frozen (manifest, edges, signatures) warehouse state of the simulated
    * OLD snapshot, built once per corpus and shared by [[dupClustersBase]]
    * (which measures the bootstrap) and [[dupClustersIncremental]] (which
    * measures the steady-state update). Signatures persist next to the
    * manifest — the production warehouse layout — so the update signs only
    * fresh docs. */
  private[ext] def frozenIncrementalBase(spark: SparkSession, dir: String,
                                         old: DataFrame): (String, String, String) =
    incrementalBaseCache.get(dir, (NumHashes, NumBands)) {
      val base = java.nio.file.Files.createTempDirectory("graft_dup_incr_base").toString
      // one signature table feeds the edge build AND freezes as warehouse
      // state; one edge computation feeds BOTH remaining artifacts — the
      // full MinHash-LSH pipeline over the old corpus is the expensive
      // stage of the base build, and clustering consumes exactly these edges
      val sigs = minhashSigsOn(old).persist()
      sigs.write.parquet(s"$base/sigs.parquet")
      val edges = minhashEstJaccard(
          minhashCandidates(sigs, NumHashes, NumBands), sigs, NumHashes)
        .filter(col("est_jaccard") >= lit(ClusterEstMin))
        .select("doc_a", "doc_b")
        .persist()
      edges.write.parquet(s"$base/edges.parquet")
      propagateComponents(old.select("doc_id"), edges, checkpointRounds = true)
        .orderBy("doc_id").write.parquet(s"$base/manifest.parquet")
      edges.unpersist()
      sigs.unpersist()
      (s"$base/manifest.parquet", s"$base/edges.parquet", s"$base/sigs.parquet")
    }

  /** The warehouse BOOTSTRAP, registered as its own row (VERDICT r9 #2:
    * base build and steady-state update are different operating regimes
    * and must not share one measurement): the full MinHash-LSH + CC build
    * over the simulated old snapshot, frozen as the (manifest, edges)
    * state [[dupClustersIncremental]] then updates. Runs before the
    * incremental row in the name-ordered bench, so that row measures ONLY
    * the per-snapshot delta update — the regime the design targets.
    * Oracled against the from-scratch recursive closure over the old
    * snapshot. */
  def dupClustersBase(spark: SparkSession, dir: String): DataFrame = {
    val old = graft.ext.Corpus.deltaOldSlice(Tables.documents(spark, dir))
    val (manifestPath, _, _) = frozenIncrementalBase(spark, dir, old)
    spark.read.parquet(manifestPath).orderBy("doc_id")
  }

  lazy val dupClustersBaseSql: String =
    s"""WITH RECURSIVE oldsnap AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE ${graft.ext.Corpus.deltaOldWhereSql}),
       |${dupClustersCtesFor("oldsnap")}
       |SELECT c.doc_id, c.cluster_id, s.cluster_size, c.doc_id = c.cluster_id AS is_canonical
       |FROM comp c JOIN sizes s ON c.cluster_id = s.cluster_id
       |ORDER BY c.doc_id""".stripMargin

  /** The registered incremental-update simulation, sharing
    * [[graft.ext.Corpus.snapshotDelta]]'s old/new slice convention
    * (6% churn at [[graft.ext.Corpus.DeltaMod]] = 50 — production
    * ingestion shape) so every delta class (added, removed, changed,
    * unchanged) is exercised: the old snapshot's manifest + edges come
    * from the frozen store, and the update reconciles them to the new
    * snapshot. Its oracle is the SAME from-scratch recursive closure over
    * the new snapshot — the incremental path earns correctness by
    * matching the full rebuild. */
  def dupClustersIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val old = graft.ext.Corpus.deltaOldSlice(docs)
    val nw = graft.ext.Corpus.deltaNewSlice(docs)
    val (manifestPath, edgesPath, sigsPath) = frozenIncrementalBase(spark, dir, old)
    dupClustersIncrementalOn(old, nw,
      spark.read.parquet(manifestPath), spark.read.parquet(edgesPath),
      oldSigs = Some(spark.read.parquet(sigsPath)))
  }

  /** Second-hop churn classes of the rolled series — the convention the
    * manifest family's churn-impact series shares (ManifestIncrSpec): hop 2
    * re-adds the first hop's removed class, retires [[RolledRemoved2]] and
    * revises [[RolledChanged2]]. */
  val RolledRemoved2 = 7
  val RolledChanged2 = 8

  /** Registered 2-hop chain of [[dupWarehouseUpdateOn]] — the dedup twin of
    * `s_ivf_rolled`, and the production ingestion loop AS a registry row:
    * hop 1 is the registered churn (adds [[graft.ext.Corpus.DeltaAdded]],
    * retires [[graft.ext.Corpus.DeltaRemoved]], revises
    * [[graft.ext.Corpus.DeltaChanged]]), hop 2 re-adds the retired class,
    * retires [[RolledRemoved2]] and revises [[RolledChanged2]] — so the
    * second update starts from ROLLED warehouse state (manifest + edges +
    * signatures produced by the first), never from the bootstrap. The
    * oracle is the from-scratch recursive closure over the FINAL snapshot:
    * the chained state earns its row by landing on the rebuild exactly.
    * Each hop signs only its fresh slice and re-clusters only touched
    * components; hop 1's warehouse freezes once per corpus (a LEDGERED
    * build — `dd_clusters_incremental` already measures that hop) so the
    * registered row measures the steady-state regime: one update FROM
    * rolled state. */
  /** The rolled series' FINAL snapshot: hop-1 revisions carried, hop-2
    * revisions applied, hop-1's removed class back, [[RolledRemoved2]]
    * out. Shared with DedupSpec so the spec's churn-class assertions can't
    * drift from the registered construction. */
  private[graft] def rolledFinalSlice(docs: DataFrame): DataFrame = {
    val r = pmod(col("doc_id"), lit(graft.ext.Corpus.DeltaMod))
    docs
      .withColumn("text",
        when(r === lit(graft.ext.Corpus.DeltaChanged), concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")))
      .withColumn("text",
        when(r === lit(RolledChanged2), concat(col("text"), lit(" [rev3]")))
          .otherwise(col("text")))
      .filter(r =!= lit(RolledRemoved2))
  }

  /** Frozen ROLLED warehouse: the s1 snapshot's (manifest, edges, sigs)
    * as PRODUCED BY the first [[dupWarehouseUpdateOn]] hop — not a
    * bootstrap — persisted once per corpus, so the registered rolled row
    * measures the second update FROM rolled state (the regime the
    * production loop lives in every day after day one) and hop 1's cost
    * stays ledgered where `dd_clusters_incremental` already measures it.
    * The in-process 2-hop chain (and its N-hop ScalaCheck form) lives in
    * DedupSpec. */
  private val rolledBaseCache =
    new graft.ops.FrozenCaches.Memo[(Int, Int), (String, String, String)](
      beforeClear = _.forEach(p =>
        graft.ops.FrozenCaches.deleteTree(
          java.nio.file.Paths.get(p._1).getParent.toString)),
      label = "dup_rolled_base")

  private[ext] def frozenRolledWarehouse(spark: SparkSession, dir: String): (String, String, String) =
    rolledBaseCache.get(dir, (NumHashes, NumBands)) {
      val docs = Tables.documents(spark, dir)
      val s0 = graft.ext.Corpus.deltaOldSlice(docs)
      val s1 = graft.ext.Corpus.deltaNewSlice(docs)
      val (mPath, ePath, sPath) = frozenIncrementalBase(spark, dir, s0)
      val w1 = dupWarehouseUpdateOn(s0, s1,
        spark.read.parquet(mPath), spark.read.parquet(ePath),
        oldSigs = Some(spark.read.parquet(sPath)))
      val base = java.nio.file.Files.createTempDirectory("graft_dup_rolled").toString
      w1.manifest.write.parquet(s"$base/manifest.parquet")
      w1.edges.write.parquet(s"$base/edges.parquet")
      w1.sigs.write.parquet(s"$base/sigs.parquet")
      w1.release()
      (s"$base/manifest.parquet", s"$base/edges.parquet", s"$base/sigs.parquet")
    }

  def dupClustersRolled(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val s1 = graft.ext.Corpus.deltaNewSlice(docs)
    val s2 = rolledFinalSlice(docs)
    val (m1, e1, g1) = frozenRolledWarehouse(spark, dir)
    dupWarehouseUpdateOn(s1, s2,
      spark.read.parquet(m1), spark.read.parquet(e1),
      oldSigs = Some(spark.read.parquet(g1)))
      .manifest.orderBy("doc_id")
  }

  /** Oracle: deliberately the from-scratch closure over the final rolled
    * snapshot — no incremental formulation anywhere. */
  lazy val dupClustersRolledSql: String = {
    val mod = graft.ext.Corpus.DeltaMod
    s"""WITH RECURSIVE s2 AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % $mod = ${graft.ext.Corpus.DeltaChanged} THEN text || ' [rev2]'
       |              WHEN doc_id % $mod = $RolledChanged2 THEN text || ' [rev3]'
       |              ELSE text END AS text
       |  FROM documents WHERE doc_id % $mod <> $RolledRemoved2),
       |${dupClustersCtesFor("s2")}
       |SELECT c.doc_id, c.cluster_id, s.cluster_size, c.doc_id = c.cluster_id AS is_canonical
       |FROM comp c JOIN sizes s ON c.cluster_id = s.cluster_id
       |ORDER BY c.doc_id""".stripMargin
  }

  /** Exact transitive closure via recursive CTE through relations `comp`
    * (doc_id, cluster_id) and `sizes` (cluster_id, cluster_size) over an
    * arbitrary snapshot relation — the shared oracle tail of the cluster
    * query, the cluster-stats report, and the incremental update,
    * semantically the fixpoint the propagation loop converges to. */
  private[ext] def dupClustersCtesFor(from: String): String =
    s"""${minhashSigCtes("", from, NumHashes)},
       |${minhashBandCtes("", NumHashes, NumBands)},
       |cand AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r ON l.band_idx = r.band_idx AND l.sig = r.sig AND l.doc_id < r.doc_id
       |  GROUP BY 1, 2),
       |edges AS MATERIALIZED (
       |  SELECT c.doc_a, c.doc_b
       |  FROM cand c JOIN mh x ON c.doc_a = x.doc_id JOIN mh y ON c.doc_b = y.doc_id
       |  WHERE ${agreeSql(NumHashes)} >= $ClusterEstMin),
       |sym AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM edges
       |        UNION ALL SELECT doc_b, doc_a FROM edges),
       |reach(src, dst) AS (
       |  SELECT doc_id, doc_id FROM $from
       |  UNION
       |  SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a),
       |comp AS MATERIALIZED (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
       |sizes AS MATERIALIZED (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)""".stripMargin

  private def dupClustersCtes: String = dupClustersCtesFor("documents")

  /** Oracle: the from-scratch closure over the simulated NEW snapshot —
    * deliberately NOT an incremental formulation, so the incremental
    * plan's output must equal a full rebuild to pass. */
  lazy val dupClustersIncrementalSql: String = {
    s"""WITH RECURSIVE newsnap AS (
       |  SELECT doc_id, ${graft.ext.Corpus.deltaNewTextSql} AS text
       |  FROM documents WHERE ${graft.ext.Corpus.deltaNewWhereSql}),
       |${dupClustersCtesFor("newsnap")}
       |SELECT c.doc_id, c.cluster_id, s.cluster_size, c.doc_id = c.cluster_id AS is_canonical
       |FROM comp c JOIN sizes s ON c.cluster_id = s.cluster_id
       |ORDER BY c.doc_id""".stripMargin
  }

  /** Oracle: exact transitive closure via recursive CTE, component =
    * min reachable doc_id — tractable at oracle scale. Parameterized over
    * an arbitrary snapshot relation for the pipeline-manifest family;
    * `dupClustersSql` is the degenerate `documents` instance. */
  def dupClustersSqlFor(rel: String): String =
    s"""WITH RECURSIVE ${dupClustersCtesFor(rel)}
       |SELECT c.doc_id, c.cluster_id, s.cluster_size, c.doc_id = c.cluster_id AS is_canonical
       |FROM comp c JOIN sizes s ON c.cluster_id = s.cluster_id
       |ORDER BY c.doc_id""".stripMargin

  val dupClustersSql: String = dupClustersSqlFor("documents")

  // ------------------------------------------------- dedup savings report
  /** Cluster-size histogram over the near-dup components: how many
    * clusters of each size exist, how many documents they hold, and how
    * many a keep-one-per-cluster dedup REMOVES — the "what does dedup buy
    * us" report a curation run reads before committing to the deletion
    * (size-1 singletons ⇒ nothing to remove). Layered on [[dupClustersOn]]
    * (filter to the one canonical row per cluster, then a |distinct sizes|-
    * row aggregate), so the report can never disagree with the manifest. */
  private def clusterStatsTail(manifest: DataFrame): DataFrame =
    manifest
      .filter(col("is_canonical"))
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("n_removable"))
      .orderBy("cluster_size")

  def clusterStatsOn(docs: DataFrame,
                     numHashes: Int = NumHashes, numBands: Int = NumBands): DataFrame =
    clusterStatsTail(dupClustersOn(docs, numHashes, numBands))

  def clusterStats(spark: SparkSession, dir: String): DataFrame =
    // reads the materialized manifest: the savings report costs one
    // |clusters|-row aggregate, not a rerun of the CC loop
    clusterStatsTail(frozenManifest(spark, dir))

  val clusterStatsSql: String =
    s"""WITH RECURSIVE $dupClustersCtes
       |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       |       CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
       |       CAST((cluster_size - 1) * count(*) AS BIGINT) AS n_removable
       |FROM sizes GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  // ------------------------------------------------- quality-aware dedup
  /** Keep-BEST dedup: per near-dup cluster, the survivor is the member
    * with the highest composite quality score ([[Text.textStatsRowsOn]]),
    * doc_id as tiebreak — the curation refinement over keep-min-id
    * canonical dedup (a boilerplate notice and the full article can share
    * a cluster; production pipelines keep the better copy, not the
    * lexicographically-first one).
    *
    * Plan: the cluster manifest joins per-doc scores on doc_id (both
    * |docs| rows, co-keyed), then ONE hash aggregate by cluster_id with a
    * max_by on the (score, -doc_id) key — partial-aggregates map-side, the
    * shuffle carries |clusters| rows. Scores are r6-rounded, so the argmax
    * key is bit-identical on both engines. */
  /** The per-cluster election over ALREADY-SCORED docs — the seam the
    * incremental manifest re-elects touched clusters through: quality
    * scores are doc-local warehouse state, so a delta update never
    * re-reads untouched text. `scored` must expose (doc_id,
    * quality_score); [[keepBestOn]] is the score-then-elect composition,
    * so the two cannot drift. */
  def keepBestFrom(manifest: DataFrame, scored: DataFrame): DataFrame =
    manifest.join(scored.select(col("doc_id"), col("quality_score")), "doc_id")
      .groupBy("cluster_id")
      .agg(
        max_by(col("doc_id"), struct(col("quality_score"), (lit(0L) - col("doc_id")).as("nid")))
          .as("keep_doc_id"),
        max(col("quality_score")).as("keep_score"),
        min(col("cluster_size")).as("cluster_size"))
      .select(col("cluster_id"), col("keep_doc_id"), col("keep_score"),
        col("cluster_size"), (col("cluster_size") - lit(1L)).as("n_removed"))
      .orderBy("cluster_id")

  def keepBestOn(docs: DataFrame, manifest: DataFrame): DataFrame =
    keepBestFrom(manifest, Text.textStatsRowsOn(docs))

  def keepBest(spark: SparkSession, dir: String): DataFrame =
    keepBestOn(Tables.documents(spark, dir), frozenManifest(spark, dir))

  /** Parameterized twin over an arbitrary snapshot relation — membership
    * state, so the manifest family always points it at the snapshot being
    * judged (see [[graft.ext.Text.textStatsSqlFor]]). */
  def keepBestSqlFor(rel: String): String =
    s"""WITH RECURSIVE ${dupClustersCtesFor(rel)},
       |scored AS (SELECT doc_id, quality_score FROM (${Text.textStatsSqlFor(rel)})),
       |ranked AS (
       |  SELECT c.cluster_id, c.doc_id, s.quality_score, z.cluster_size,
       |         row_number() OVER (PARTITION BY c.cluster_id
       |                            ORDER BY s.quality_score DESC, c.doc_id) AS rn
       |  FROM comp c JOIN scored s ON c.doc_id = s.doc_id
       |       JOIN sizes z ON c.cluster_id = z.cluster_id)
       |SELECT cluster_id, doc_id AS keep_doc_id, quality_score AS keep_score,
       |       cluster_size, CAST(cluster_size - 1 AS BIGINT) AS n_removed
       |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin

  val keepBestSql: String = keepBestSqlFor("documents")

  // ------------------------------------------------- embedding near-dup
  /** Embedding-cosine near-dup with banded sign-LSH blocking: band j's
    * bucket = (label, sign bits of planes [j·nPlanes, (j+1)·nPlanes)) — a
    * deterministic random-hyperplane LSH with coordinate hyperplanes. Pairs
    * form inside any agreeing band (union over bands), then the exact
    * cosine verify filters.
    *
    * The knobs mirror [[minhashLshOn]]: more planes per band → finer
    * buckets (2^nPlanes per band per label — the cardinality lever the
    * fixed 16-bucket version lacked; 100 TB jobs run 16+ planes for
    * ~65k·|labels| buckets); more bands → recall (any-band union).
    * Monotonicity (DedupSpec): at one band, pairs(nPlanes+k) ⊆
    * pairs(nPlanes) — prefix planes refine; at fixed nPlanes, more bands
    * only add pairs. Requires nPlanes·nBands ≤ vector width. */
  val CosineMin = 0.25
  val EmbedPlanes = 4
  val EmbedBands = 1

  /** The scale knobs, registered as their own oracle-checked query
    * (`dd_embed_neardup_scale`): 12 planes × 4 bands → 4,096 buckets per
    * band per label — bucket space ≫ corpus at the oracle's sf0.01 (500
    * vectors), which is exactly the operating regime a production job tunes
    * planes INTO at any corpus size (the within-bucket self-join stays
    * output-bound; same cardinality argument as the 16-bit simhash bands —
    * at billions of vectors the same regime is 16+ planes). The 4 bands
    * buy back recall band-union-style where single-band 12-plane blocking
    * keeps only sign-identical prefixes (knob sweep in BASELINE.md round
    * 7: 16 planes find nothing even at 2-4 bands on this corpus — the
    * testdata has no near-exact duplicate embeddings). The default 4-plane
    * knobs stay registered as the high-recall small-scale variant. */
  val EmbedScalePlanes = 12
  val EmbedScaleBands = 4

  def embedNearDupOn(embeddings: DataFrame,
                     nPlanes: Int = EmbedPlanes, nBands: Int = EmbedBands): DataFrame = {
    require(nPlanes >= 1 && nPlanes <= 62 && nBands >= 1, s"bad knobs: $nPlanes planes, $nBands bands")
    val e = Similarity.withNorm(embeddings).persist() // band explode + both verify sides
    val bands = e.select(col("vec_id"), col("label"), explode(array((0 until nBands).map { j =>
      struct(lit(j).as("band_idx"),
        Similarity.signBucket(col("embedding"), nPlanes, j * nPlanes).as("bucket"))
    }: _*)).as("b")).select(col("vec_id"), col("label"), col("b.band_idx"), col("b.bucket"))
    val cand = bands.as("l").join(bands.as("r"),
        col("l.label") === col("r.label") && col("l.band_idx") === col("r.band_idx")
          && col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(e.as("x"), col("vec_a") === col("x.vec_id"))
      .join(e.as("y"), col("vec_b") === col("y.vec_id"))
      .withColumn("cos",
        Similarity.fastDot(col("x.embedding"), col("y.embedding")) / (col("x.nrm") * col("y.nrm")))
      .filter(col("cos") >= lit(CosineMin))
      .select(col("vec_a"), col("vec_b"), r6(col("cos")).as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  def embedNearDup(spark: SparkSession, dir: String): DataFrame =
    embedNearDupOn(Tables.embeddings(spark, dir))

  def embedNearDupScale(spark: SparkSession, dir: String): DataFrame =
    embedNearDupOn(Tables.embeddings(spark, dir), EmbedScalePlanes, EmbedScaleBands)

  /** Oracle twin of [[embedNearDupOn]] for any (nPlanes, nBands) — one SQL
    * builder behind both registered knob sets so banding semantics can
    * never drift between them. */
  def embedNearDupSqlFor(nPlanes: Int, nBands: Int): String = {
    val bandSelects = (0 until nBands).map { j =>
      s"SELECT vec_id, label, $j AS band_idx, ${Similarity.signBucketSql("embedding", nPlanes, j * nPlanes)} AS bucket FROM e"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding, ${Similarity.normSql("embedding")} AS nrm
       |  FROM embeddings),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT l.vec_id AS vec_a, r.vec_id AS vec_b
       |  FROM bands l JOIN bands r ON l.label = r.label AND l.band_idx = r.band_idx
       |    AND l.bucket = r.bucket AND l.vec_id < r.vec_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT c.vec_a, c.vec_b,
       |         ${Similarity.dotSql("x.embedding", "y.embedding")} / (x.nrm * y.nrm) AS cos
       |  FROM cand c JOIN e x ON c.vec_a = x.vec_id JOIN e y ON c.vec_b = y.vec_id)
       |SELECT vec_a, vec_b, ${r6Sql("cos")} AS cosine
       |FROM pairs WHERE cos >= $CosineMin
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  val embedNearDupSql: String = embedNearDupSqlFor(EmbedPlanes, EmbedBands)
  val embedNearDupScaleSql: String = embedNearDupSqlFor(EmbedScalePlanes, EmbedScaleBands)

  // ------------------------------------------------------- semantic dedup
  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * a k-means coarse quantizer partitions the embedding space, pairwise
    * cosine runs ONLY inside each cluster, and a vector is dropped iff ANY
    * smaller vec_id in its cluster sits within the threshold — the
    * ordering-greedy rule of the published implementation (the shadow may
    * itself be dropped when similarity chains; cosine is not transitive,
    * and resolving chains exactly is the connected-components job
    * [[dupClustersOn]] already does). Emits one verdict row per vector:
    * its cluster, whether it is kept, and the smallest partner that
    * shadows it.
    *
    * Scale shape: the quantizer is the SAME broadcast-centroid Lloyd loop
    * the IVF family trains ([[Similarity.kmeansCentroidsOn]] /
    * [[Similarity.assignCells]] — one map-side pass per iteration), and the
    * in-cluster self-join replaces the O(n²) all-pairs compare with
    * O(Σ|cell|²): at 100 TB, k grows with the corpus (FAISS-style √n cells)
    * so cells stay bounded and each cell is one shuffle partition's work —
    * this cluster-bounding is the entire point of the published method. */
  /** Keep threshold: ~p95 of in-cluster pair cosines on the testdata (the
    * knob sweep is in BASELINE.md round 7) — prunes 80/500 vectors (16%),
    * the published method's typical prune-rate regime; the synthetic
    * corpus has no true semantic duplicates, so the verdict structure, not
    * a specific pair set, is what the oracle pins. */
  val SemDedupMin = 0.35

  def semDedupOn(embeddings: DataFrame,
                 cosMin: Double = SemDedupMin,
                 cfg: Similarity.KmeansCfg = Similarity.KmeansCfg()): DataFrame =
    // persisted: the centroid table feeds every assignment task
    semDedupWith(embeddings, Similarity.kmeansCentroidsOn(embeddings, cfg).persist(), cosMin)

  /** The cluster-bounded pair phase against a GIVEN quantizer — shared by
    * the self-training form and the frozen-model registered query. */
  private def semDedupWith(embeddings: DataFrame, cent: DataFrame,
                           cosMin: Double): DataFrame = {
    // cells persisted: consumed three times (both self-join sides + the
    // verdict spine). Same session-cache convention as minhashLshOn —
    // batch callers clearCache() between invocations (Verify/Bench do).
    val cells = Similarity.assignCells(Similarity.withNorm(embeddings), cent).persist()
    val dupOf = cells.as("l").join(cells.as("r"),
        col("l.cell") === col("r.cell") && col("l.vec_id") > col("r.vec_id"))
      .withColumn("cos",
        Similarity.fastDot(col("l.embedding"), col("r.embedding")) / (col("l.nrm") * col("r.nrm")))
      .filter(col("cos") >= lit(cosMin))
      .groupBy(col("l.vec_id").as("vec_id"))
      .agg(min(col("r.vec_id")).as("dup_of"))
    cells.select(col("vec_id"), col("cell"))
      .join(dupOf, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("dup_of"),
        col("dup_of").isNull.as("is_kept"))
      .orderBy("vec_id")
  }

  def semDedup(spark: SparkSession, dir: String): DataFrame =
    // frozen quantizer (train-once contract, shared with the IVF family —
    // the SAME frozen centroids serve search, assignment and semdedup, so
    // the clusters literally cannot drift between queries in a session)
    semDedupWith(Tables.embeddings(spark, dir),
      Similarity.frozenCentroids(spark, dir, Similarity.KmeansCfg(dims = Similarity.Dims)),
      SemDedupMin)

  /** Oracle twin: the SHARED coarse-quantizer CTEs ([[Similarity.kmeansCellsSql]]
    * — identical text to the IVF/IVF-PQ oracles, so the clusters cannot
    * drift), then the in-cluster pair filter and keep-first verdict. */
  lazy val semDedupSql: String =
    s"""WITH ${Similarity.kmeansCellsSql},
       |dup AS (
       |  SELECT l.vec_id, min(r.vec_id) AS dup_of
       |  FROM cells l JOIN cells r ON l.cell = r.cell AND l.vec_id > r.vec_id
       |  WHERE ${Similarity.dotSql("l.embedding", "r.embedding")} / (l.nrm * r.nrm) >= $SemDedupMin
       |  GROUP BY l.vec_id)
       |SELECT c.vec_id, c.cell, d.dup_of, d.dup_of IS NULL AS is_kept
       |FROM cells c LEFT JOIN dup d ON c.vec_id = d.vec_id
       |ORDER BY c.vec_id""".stripMargin

  // ---------------------------------------------------- LSH recall monitor
  /** Candidate-recall of the MinHash-LSH banding against the exact-Jaccard
    * truth set — the dedup twin of `s_knn_recall`: the S-curve knobs
    * (numHashes/numBands) trade recall for candidate volume, and this
    * query makes that trade a MONITORED number in the correctness/bench
    * artifacts instead of a one-off study. Truth = the blocked exact twin
    * ([[ngramJaccardOn]]: same-lang, same-token-count pairs with 2-gram
    * Jaccard ≥ [[JaccardMin]]); a banding change that silently drops true
    * duplicate pairs moves `recall` and fails the hash gate.
    *
    * One summary row: |truth|, |LSH candidates|, |intersection|, recall.
    * 100 TB shape: both sides are the already-bounded registered plans
    * (blocked pairs / banded buckets); the comparison itself is one join
    * on (doc_a, doc_b) + a single-row aggregate. */
  def lshRecallOn(docs: DataFrame,
                  numHashes: Int = NumHashes, numBands: Int = NumBands): DataFrame = {
    val truth = ngramJaccardOn(docs)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("is_true"))
    val mh = minhashSigsOn(docs, numHashes).persist()
    val cand = minhashCandidates(mh, numHashes, numBands)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("is_cand"))
    truth.join(cand, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        coalesce(sum(col("is_true")), lit(0L)).as("n_true"),
        coalesce(sum(col("is_cand")), lit(0L)).as("n_cand"),
        coalesce(sum(col("is_true") * col("is_cand")), lit(0L)).as("n_hit"))
      .select(col("n_true"), col("n_cand"), col("n_hit"),
        when(col("n_true") === lit(0L), lit(0.0))
          .otherwise(r6(col("n_hit").cast("double") / col("n_true"))).as("recall"))
  }

  def lshRecall(spark: SparkSession, dir: String): DataFrame =
    lshRecallOn(Tables.documents(spark, dir))

  lazy val lshRecallSql: String =
    s"""WITH ${minhashCandCtes(NumHashes, NumBands)},
       |etoks AS (SELECT doc_id, lang, ${Text.tokensSql("text")} AS t FROM documents),
       |edocs AS (
       |  SELECT doc_id, lang, CAST(len(t) AS BIGINT) AS n_tok, ${grams2Sql("t")} AS grams
       |  FROM etoks),
       |epairs AS (
       |  SELECT l.doc_id AS doc_a, r.doc_id AS doc_b,
       |         CAST(len(list_intersect(l.grams, r.grams)) AS BIGINT) AS n_inter,
       |         CAST(len(l.grams) + len(r.grams) - len(list_intersect(l.grams, r.grams)) AS BIGINT) AS n_union
       |  FROM edocs l JOIN edocs r ON l.lang = r.lang AND l.n_tok = r.n_tok AND l.doc_id < r.doc_id),
       |etruth AS (SELECT doc_a, doc_b FROM epairs
       |           WHERE n_union > 0 AND n_inter / n_union >= $JaccardMin),
       |s AS (
       |  SELECT (SELECT count(*) FROM etruth) AS n_true,
       |         (SELECT count(*) FROM cand) AS n_cand,
       |         (SELECT count(*) FROM etruth t JOIN cand c
       |            ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b) AS n_hit)
       |SELECT n_true, n_cand, n_hit,
       |       CASE WHEN n_true = 0 THEN 0.0
       |            ELSE ${r6Sql("CAST(n_hit AS DOUBLE) / n_true")} END AS recall
       |FROM s""".stripMargin

  // ------------------------------------------------- threshold-tuning curve
  /** Candidate-pair mass by estimated-Jaccard level — the knob-tuning
    * curve behind [[ClusterEstMin]]: for each distinct signature-agreement
    * level the banded candidates reach, how many pairs score exactly there
    * and how many survive a ≥ cut at that level. Raising or lowering the
    * dedup threshold is a read off this table instead of a rerun-and-count
    * experiment. est_jaccard is an exact multiple of 1/numHashes (a dyadic
    * double for the default 16), so grouping is exact on both engines; the
    * cumulative window runs over ≤ numHashes+1 rows by construction. */
  def thresholdCurveOn(docs: DataFrame,
                       numHashes: Int = NumHashes, numBands: Int = NumBands): DataFrame = {
    val w = Window.orderBy(col("est_jaccard").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    minhashLshOn(docs, numHashes, numBands)
      .groupBy("est_jaccard").agg(count(lit(1)).as("n_pairs"))
      .withColumn("n_pairs_at_or_above", sum(col("n_pairs")).over(w).cast("long"))
      .select(r6(col("est_jaccard")).as("est_jaccard"),
        col("n_pairs"), col("n_pairs_at_or_above"))
      .orderBy(col("est_jaccard").desc)
  }

  def thresholdCurve(spark: SparkSession, dir: String): DataFrame =
    thresholdCurveOn(Tables.documents(spark, dir))

  val thresholdCurveSql: String =
    s"""WITH lsh AS (SELECT * FROM ($minhashLshSql)),
       |g AS (SELECT est_jaccard, count(*) AS n_pairs FROM lsh GROUP BY 1)
       |SELECT ${r6Sql("est_jaccard")} AS est_jaccard, n_pairs,
       |       CAST(sum(n_pairs) OVER (ORDER BY est_jaccard DESC
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |         AS n_pairs_at_or_above
       |FROM g ORDER BY est_jaccard DESC""".stripMargin

  val all: Seq[Q] = Seq(
    Q("dd_exact", exact _, exactSql),
    Q("dd_threshold_curve", thresholdCurve _, thresholdCurveSql),
    Q("dd_minhash_lsh", minhashLsh _, minhashLshSql),
    Q("dd_simhash", simhash _, simhashSql),
    Q("dd_simhash_pairs", simhashPairs _, simhashPairsSql),
    Q("dd_ngram_jaccard", ngramJaccard _, ngramJaccardSql),
    Q("dd_ngram_jaccard_lsh", ngramJaccardLsh _, ngramJaccardLshSql),
    Q("dd_span_coverage", spanCoverage _, spanCoverageSql),
    Q("dd_span_trim", spanTrim _, spanTrimSql),
    Q("dd_embed_neardup", embedNearDup _, embedNearDupSql),
    Q("dd_embed_neardup_scale", embedNearDupScale _, embedNearDupScaleSql),
    Q("dd_semdedup", semDedup _, semDedupSql),
    Q("dd_dup_clusters", dupClusters _, dupClustersSql),
    Q("dd_clusters_base", dupClustersBase _, dupClustersBaseSql),
    Q("dd_clusters_incremental", dupClustersIncremental _, dupClustersIncrementalSql),
    Q("dd_clusters_rolled", dupClustersRolled _, dupClustersRolledSql),
    Q("t_decontaminate_fuzzy", fuzzyDecontaminate _, fuzzyDecontaminateSql),
    Q("dd_cluster_stats", clusterStats _, clusterStatsSql),
    Q("dd_keep_best", keepBest _, keepBestSql),
    Q("t_ngram_novelty", ngramNovelty _, ngramNoveltySql),
    Q("dd_lsh_recall", lshRecall _, lshRecallSql),
  )
}
