package graft.ext

import graft.Q
import graft.ops.{Num, Tables}
import graft.ops.Num.{r6, r6Sql}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis over the `documents` table — the language-ID / quality /
  * token-counting / fingerprinting operators a training-data pipeline needs
  * (beyond the reference surface; BASELINE.json north-star).
  *
  * Everything is built from codegen'd builtins (split/regexp/md5/aggregate)
  * — no UDFs — so the operators stay inside whole-stage codegen and scale
  * linearly with document count; there is no per-doc driver work anywhere.
  */
object Text {
  /** Whitespace tokens with empties dropped — identical semantics to DuckDB
    * list_filter(string_split_regex(...)). NULL text coalesces to the empty
    * token list ON BOTH SIDES: under the pinned ansi=false session Spark's
    * legacy sizeOfNull would otherwise make size(tokens(NULL)) = -1 (a
    * NULL-text doc silently SUBTRACTING a token from any sum) while
    * DuckDB's len(NULL) = NULL is skipped by sum() — divergent and both
    * wrong; a doc with no text has zero tokens. */
  def tokens(text: Column): Column =
    filter(split(coalesce(text, lit("")), "\\s+"), t => t =!= lit(""))

  def tokensSql(text: String): String =
    s"list_filter(string_split_regex(coalesce($text, ''), '\\s+'), t -> t <> '')"

  /** Overlapping word n-grams (non-distinct, in document order). Guarded
    * sequence: Spark's sequence(a,b) DESCENDS when a > b, so short docs
    * short-circuit to an empty array. */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= lit(n),
      transform(sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))

  def ngramsSql(t: String, n: Int): String =
    s"""CASE WHEN len($t) >= $n
       |     THEN list_transform(range(0, len($t) - ${n - 1}), i -> array_to_string(($t)[i+1:i+$n], ' '))
       |     ELSE [] END""".stripMargin

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")
  private val punctClass = "[!-/:-@\\[-`{-~]" // ASCII punctuation ranges — same regex dialect on both engines

  /** Per-document quality metrics: token count, mean token length,
    * punctuation ratio, stopword ratio, and a composite quality score —
    * the length/punct/stopword heuristics of C4/Gopher-style filters. */
  /** Unsorted per-doc stats — pure row-local projections, so the frame
    * streams unchanged (the quality filter's streaming twin builds on
    * this); the registry query adds the presentation sort. */
  /** The per-doc stat COLUMNS over `col("text")` — ONE definition,
    * projected by [[textStatsRowsOn]] and composed inline by the manifest
    * feature fusion (round 18:
    * [[graft.ext.Corpus.manifestDocFeatures]] computes all doc-local
    * features in a single projection instead of joining per-feature
    * frames), so the two can never drift.
    * nullif guards: x / 0 must be NULL (the coerce-to-null convention and
    * the DuckDB behavior) even on a stock session with ANSI mode ON —
    * library callers' sessions don't get the harness's ansi=false. */
  private[graft] def textStatsCols: Seq[Column] = {
    val toks = tokens(col("text"))
    val nTokens = size(toks).cast("long")
    val lenChars = length(col("text")).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
    val nPunct = regexp_count(col("text"), lit(punctClass)).cast("long")
    val nStop = size(filter(toks, t => t.isInCollection(stopwords))).cast("long")
    val avgLen = sumLen / nullif(nTokens, lit(0L))
    val punct = nPunct / nullif(lenChars, lit(0L))
    val stop = nStop / nullif(nTokens, lit(0L))
    val qs = r6(
      (least(lit(1.0), nTokens / lit(100.0))
        + (lit(1.0) - least(lit(1.0), punct * lit(10.0)))
        + least(lit(1.0), stop * lit(5.0))) / lit(3.0))
    Seq(nTokens.as("n_tokens"), lenChars.as("len_chars"),
      r6(avgLen).as("avg_token_len"), r6(punct).as("punct_ratio"),
      r6(stop).as("stop_ratio"), qs.as("quality_score"))
  }

  /** The quality-gate predicate over [[textStatsCols]] OUTPUT columns
    * (the r6-rounded ratios, exactly what the registered filter compares)
    * — shared by [[qualityFilterRowsOn]] and the manifest feature fusion. */
  private[graft] def qualityPassCol: Column =
    col("n_tokens") >= lit(MinTokens) &&
      (col("punct_ratio") < lit(MaxPunctRatio) || col("punct_ratio").isNull) &&
      col("quality_score") >= lit(MinQuality)

  def textStatsRowsOn(docs: DataFrame): DataFrame =
    docs.select(col("doc_id") +: textStatsCols: _*)

  def textStatsOn(docs: DataFrame): DataFrame =
    textStatsRowsOn(docs).orderBy("doc_id")

  def textStats(spark: SparkSession, dir: String): DataFrame =
    textStatsOn(Tables.documents(spark, dir))

  private val stopList = stopwords.map(s => s"'$s'").mkString("(", ", ", ")")

  /** [[textStatsSql]] over an arbitrary snapshot relation (must expose
    * doc_id, text) — the parameterized twin the pipeline-manifest family
    * composes over its old/new snapshot CTEs; `textStatsSql` is the
    * degenerate `documents` instance, so the two can never drift. */
  def textStatsSqlFor(rel: String): String =
    s"""WITH base AS (
       |  SELECT doc_id,
       |         CAST(len(${tokensSql("text")}) AS BIGINT) AS n_tokens,
       |         CAST(length(text) AS BIGINT) AS len_chars,
       |         CAST(coalesce(list_sum(list_transform(${tokensSql("text")}, t -> length(t))), 0) AS BIGINT) AS sum_token_len,
       |         CAST(len(regexp_extract_all(text, '$punctClass')) AS BIGINT) AS n_punct,
       |         CAST(len(list_filter(${tokensSql("text")}, t -> t IN $stopList)) AS BIGINT) AS n_stop
       |  FROM $rel),
       |ratios AS (
       |  SELECT *, sum_token_len / n_tokens AS avg_token_len,
       |         n_punct / len_chars AS punct_ratio,
       |         n_stop / n_tokens AS stop_ratio
       |  FROM base)
       |SELECT doc_id, n_tokens, len_chars,
       |       ${r6Sql("avg_token_len")} AS avg_token_len,
       |       ${r6Sql("punct_ratio")} AS punct_ratio,
       |       ${r6Sql("stop_ratio")} AS stop_ratio,
       |       ${r6Sql("(((least(1.0, n_tokens / 100.0) + (1.0 - least(1.0, punct_ratio * 10.0))) + least(1.0, stop_ratio * 5.0)) / 3.0)")} AS quality_score
       |FROM ratios ORDER BY doc_id""".stripMargin

  val textStatsSql: String = textStatsSqlFor("documents")

  /** Language ID via marker-word n-gram counts (the classic stopword
    * heuristic — fastText-style models plug in here the same way, as a
    * per-partition scorer). Deterministic argmax with a fixed priority
    * order. */
  private val markers = Seq(
    "en" -> "\\b(the|and|of|to|is|a)\\b",
    "de" -> "\\b(der|die|und|das|ist)\\b",
    "fr" -> "\\b(le|la|et|les|est)\\b",
    "es" -> "\\b(el|los|las|que|es)\\b",
  )

  def langIdOn(docs: DataFrame): DataFrame = {
    val scored = markers.foldLeft(docs) { case (df, (l, pat)) =>
      df.withColumn(s"c_$l", regexp_count(lower(col("text")), lit(pat)).cast("long"))
    }
    scored
      .withColumn("predicted_lang",
        when(col("c_en") + col("c_de") + col("c_fr") + col("c_es") === lit(0L), lit("und"))
          .when(col("c_en") >= col("c_de") && col("c_en") >= col("c_fr") && col("c_en") >= col("c_es"), lit("en"))
          .when(col("c_de") >= col("c_fr") && col("c_de") >= col("c_es"), lit("de"))
          .when(col("c_fr") >= col("c_es"), lit("fr"))
          .otherwise(lit("es")))
      .withColumn("is_match", when(col("predicted_lang") === col("lang"), lit(1L)).otherwise(lit(0L)))
      .select("doc_id", "lang", "c_en", "c_de", "c_fr", "c_es", "predicted_lang", "is_match")
      .orderBy("doc_id")
  }

  def langId(spark: SparkSession, dir: String): DataFrame =
    langIdOn(Tables.documents(spark, dir))

  val langIdSql: String = {
    val counts = markers.map { case (l, pat) =>
      s"CAST(len(regexp_extract_all(lower(text), '$pat')) AS BIGINT) AS c_$l"
    }.mkString(",\n       ")
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |       $counts
       |  FROM documents)
       |SELECT doc_id, lang, c_en, c_de, c_fr, c_es,
       |       CASE WHEN c_en + c_de + c_fr + c_es = 0 THEN 'und'
       |            WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
       |            WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
       |            WHEN c_fr >= c_es THEN 'fr'
       |            ELSE 'es' END AS predicted_lang,
       |       CAST(CASE WHEN (CASE WHEN c_en + c_de + c_fr + c_es = 0 THEN 'und'
       |            WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
       |            WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
       |            WHEN c_fr >= c_es THEN 'fr'
       |            ELSE 'es' END) = lang THEN 1 ELSE 0 END AS BIGINT) AS is_match
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  /** Confusion matrix of the language-ID heuristic against the corpus
    * labels — the classifier-eval table that turns [[langIdOn]]'s per-doc
    * verdicts into the per-language precision picture a pipeline owner
    * reads before trusting lang-conditioned operators (temperature mixing,
    * CCNet buckets, fertility) downstream of the detector. Sparse matrix
    * form: observed (label, prediction) pairs with counts and the
    * within-label share; labels the detector cannot emit (e.g. zh has no
    * marker set) surface as their own misprediction rows instead of
    * hiding. Row count is ≤ |langs|², so everything after the per-doc
    * scoring pass is model-sized. */
  def langIdConfusionOn(docs: DataFrame): DataFrame = {
    val wl = Window.partitionBy("lang")
    langIdOn(docs)
      .groupBy("lang", "predicted_lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("share", r6(col("n_docs") / sum("n_docs").over(wl)))
      .select(col("lang"), col("predicted_lang"), col("n_docs"), col("share"),
        (col("lang") === col("predicted_lang")).as("is_correct"))
      .orderBy("lang", "predicted_lang")
  }

  def langIdConfusion(spark: SparkSession, dir: String): DataFrame =
    langIdConfusionOn(Tables.documents(spark, dir))

  val langIdConfusionSql: String =
    s"""WITH li AS (SELECT lang, predicted_lang FROM ($langIdSql)),
       |cm AS (SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
       |       FROM li GROUP BY 1, 2)
       |SELECT lang, predicted_lang, n_docs,
       |       ${r6Sql("n_docs * 1.0 / sum(n_docs) OVER (PARTITION BY lang)")} AS share,
       |       lang = predicted_lang AS is_correct
       |FROM cm ORDER BY lang, predicted_lang""".stripMargin

  /** Token counting two ways: whitespace and a BPE-ish lexical regex
    * (letter runs | digit runs | single non-space symbol) — the standard
    * cheap proxy for LLM token budgets. */
  private val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def tokenCountOn(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_ws_tokens", size(tokens(col("text"))).cast("long"))
      .withColumn("n_bpe_tokens", regexp_count(col("text"), lit(bpePattern)).cast("long"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "n_ws_tokens", "n_bpe_tokens", "n_chars")
      .orderBy("doc_id")

  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    tokenCountOn(Tables.documents(spark, dir))

  /** Per-language tokenizer-fertility / budget table: doc count, total
    * chars and BPE-ish tokens, chars-per-token (the fertility metric
    * multilingual tokenizer analyses balance across languages), and EXACT
    * interpolated p50/p95 tokens-per-doc (context-window planning). The
    * percentile aggregate buffers a count-map keyed by DISTINCT per-doc
    * token counts — bounded by max document length, not corpus size — so
    * it partial-aggregates map-side like any sum; both engines use the
    * same rank = p·(n−1) linear interpolation, r6-rounded. */
  def tokenFertilityOn(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_bpe_tokens", regexp_count(col("text"), lit(bpePattern)).cast("long"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        sum("n_bpe_tokens").as("total_tokens"),
        expr("percentile(n_bpe_tokens, array(0.5D, 0.95D))").as("q"))
      .withColumn("chars_per_token",
        r6(col("total_chars") / nullif(col("total_tokens"), lit(0L))))
      .select(col("lang"), col("n_docs"), col("total_chars"), col("total_tokens"),
        col("chars_per_token"),
        r6(element_at(col("q"), 1)).as("p50_tokens"),
        r6(element_at(col("q"), 2)).as("p95_tokens"))
      .orderBy("lang")

  def tokenFertility(spark: SparkSession, dir: String): DataFrame =
    tokenFertilityOn(Tables.documents(spark, dir))

  val tokenFertilitySql: String =
    s"""WITH per AS (
       |  SELECT lang,
       |         CAST(len(regexp_extract_all(text, '$bpePattern')) AS BIGINT) AS n_bpe_tokens,
       |         CAST(length(text) AS BIGINT) AS n_chars
       |  FROM documents)
       |SELECT lang, count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |       CAST(sum(n_bpe_tokens) AS BIGINT) AS total_tokens,
       |       ${r6Sql("sum(n_chars) / nullif(sum(n_bpe_tokens), 0)")} AS chars_per_token,
       |       ${r6Sql("quantile_cont(n_bpe_tokens, 0.5)")} AS p50_tokens,
       |       ${r6Sql("quantile_cont(n_bpe_tokens, 0.95)")} AS p95_tokens
       |FROM per GROUP BY lang ORDER BY lang""".stripMargin

  val tokenCountSql: String =
    s"""SELECT doc_id,
       |       CAST(len(${tokensSql("text")}) AS BIGINT) AS n_ws_tokens,
       |       CAST(len(regexp_extract_all(text, '$bpePattern')) AS BIGINT) AS n_bpe_tokens,
       |       CAST(length(text) AS BIGINT) AS n_chars
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Document fingerprinting: md5 over the whitespace-normalized lowercase
    * text (the content-defined fingerprint a rolling-hash scheme reduces to
    * for whole-document identity), plus the canonical (minimum) doc_id per
    * fingerprint group. NB DuckDB regexp_replace needs the 'g' flag to match
    * Spark's replace-all default. */
  def normalized(text: Column): Column = lower(regexp_replace(text, "\\s+", " "))

  /** Oracle twin of [[normalized]] (DuckDB needs the 'g' flag to match
    * Spark's replace-all default). */
  def normalizedSql(e: String): String = s"lower(regexp_replace($e, '\\s+', ' ', 'g'))"

  /** Unsorted fingerprint rows — the composition seam (the funnel's
    * canonical gate and the manifest-base feature build join these on
    * doc_id; only the registered listing pays the presentation sort). */
  def fingerprintRowsOn(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("fp")
    docs
      .withColumn("fp", md5(normalized(col("text"))))
      .withColumn("canonical_doc_id", min(col("doc_id")).over(w))
      .withColumn("is_canonical", when(col("doc_id") === col("canonical_doc_id"), lit(1L)).otherwise(lit(0L)))
      .select("doc_id", "fp", "canonical_doc_id", "is_canonical")
  }

  def fingerprintOn(docs: DataFrame): DataFrame =
    fingerprintRowsOn(docs).orderBy("doc_id")

  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    fingerprintOn(Tables.documents(spark, dir))

  /** Parameterized twin over an arbitrary snapshot relation (see
    * [[textStatsSqlFor]]) — canonicality is MEMBERSHIP state, so the
    * pipeline-manifest family always points this at the snapshot being
    * judged, never at a frozen model relation. */
  def fingerprintSqlFor(rel: String): String =
    s"""WITH fps AS (
       |  SELECT doc_id, md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp FROM $rel)
       |SELECT doc_id, fp,
       |       min(doc_id) OVER (PARTITION BY fp) AS canonical_doc_id,
       |       CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY fp) THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
       |FROM fps ORDER BY doc_id""".stripMargin

  val fingerprintSql: String = fingerprintSqlFor("documents")

  /** Rolling-hash winnowing fingerprints (the MOSS scheme over word
    * tokens): polynomial rolling hash of each 4-token window, then keep the
    * MINIMUM hash of every 5-window band — near-duplicate regions share
    * fingerprints even when absolute positions shift. All exact integer
    * arithmetic on the portable 28-bit token hash, so DuckDB computes the
    * identical fingerprint set. */
  private val RollW = 4   // tokens per hash window
  private val WinnowW = 5 // windows per winnow band
  private val RollB = 1000003L // polynomial base, keeps 4-term sums < 2^63
  private val RollP = 2147483647L

  def winnowFingerprintsOn(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val th = transform(toks, t => graft.ext.Dedup.baseHash(t))
    // hash of window starting at i (0-based): ((h0*B + h1)%P *B + h2)%P ...
    val wh = when(size(toks) >= lit(RollW),
      transform(sequence(lit(0), size(toks) - lit(RollW)),
        i => (1 until RollW).foldLeft(element_at(th, i + 1)) { (acc, k) =>
          (acc * lit(RollB) + element_at(th, i + k + 1)) % lit(RollP)
        }))
      .otherwise(array().cast("array<long>"))
    val fps = when(size(col("wh")) >= lit(WinnowW),
      array_distinct(transform(sequence(lit(0), size(col("wh")) - lit(WinnowW)),
        i => array_min(slice(col("wh"), i + 1, lit(WinnowW))))))
      .otherwise(array_distinct(col("wh")))
    docs
      .withColumn("wh", wh)
      .withColumn("fps", fps)
      .select(col("doc_id"),
        size(col("wh")).cast("long").as("n_windows"),
        size(col("fps")).cast("long").as("n_fingerprints"),
        coalesce(array_min(col("fps")), lit(-1L)).as("min_fp"))
      .orderBy("doc_id")
  }

  def winnowFingerprints(spark: SparkSession, dir: String): DataFrame =
    winnowFingerprintsOn(Tables.documents(spark, dir))

  lazy val winnowFingerprintsSql: String = {
    val tokH = s"list_transform(${tokensSql("text")}, t -> ${graft.ext.Dedup.baseHashSql("t")})"
    val poly = (1 until RollW).foldLeft("th[i+1]") { (acc, k) => s"(($acc * $RollB + th[i+${k + 1}]) % $RollP)" }
    s"""WITH th0 AS (SELECT doc_id, $tokH AS th FROM documents),
       |wh0 AS (
       |  SELECT doc_id,
       |         CASE WHEN len(th) >= $RollW
       |              THEN list_transform(range(0, len(th) - ${RollW - 1}), i -> $poly)
       |              ELSE [] END AS wh
       |  FROM th0),
       |fp0 AS (
       |  SELECT doc_id, wh,
       |         CASE WHEN len(wh) >= $WinnowW
       |              THEN list_distinct(list_transform(range(0, len(wh) - ${WinnowW - 1}),
       |                     i -> list_min(wh[i+1:i+$WinnowW])))
       |              ELSE list_distinct(wh) END AS fps
       |  FROM wh0)
       |SELECT doc_id, CAST(len(wh) AS BIGINT) AS n_windows,
       |       CAST(len(fps) AS BIGINT) AS n_fingerprints,
       |       coalesce(list_min(fps), -1) AS min_fp
       |FROM fp0 ORDER BY doc_id""".stripMargin
  }

  /** Corpus-level heavy hitters: top 100 word 2-grams by exact count
    * (explode → map-side-combined count → global top-k). Deterministic
    * ties: (count DESC, gram ASC) — binary string compare on both engines.
    * At 100 TB the exact count shuffles |distinct grams| rows after partial
    * aggregation; a count-min sketch slots into the same query shape when
    * that's too much. */
  val TopGrams = 100

  def ngramFreqOn(docs: DataFrame): DataFrame = {
    val grams = ngrams(tokens(col("text")), 2)
    docs
      .select(explode(grams).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(TopGrams)
  }

  def ngramFreq(spark: SparkSession, dir: String): DataFrame =
    ngramFreqOn(Tables.documents(spark, dir))

  val ngramFreqSql: String =
    s"""WITH toks AS (SELECT ${tokensSql("text")} AS t FROM documents),
       |grams AS (
       |  SELECT unnest(${ngramsSql("t", 2)}) AS gram
       |  FROM toks)
       |SELECT gram, count(*) AS n FROM grams
       |GROUP BY gram ORDER BY n DESC, gram LIMIT $TopGrams""".stripMargin

  /** C4/Gopher-style quality FILTER as an operator: keep documents passing
    * the length / punctuation / stopword gates, emit the metrics that
    * justified the decision. This is the shape a pretraining pipeline runs
    * corpus-wide — a codegen'd filter over the per-doc stats, no shuffle at
    * all until the output sort. */
  val MinTokens = 5L
  val MaxPunctRatio = 0.2
  val MinQuality = 0.4

  /** Unsorted filter — stateless per-row gates, so it runs unchanged on a
    * STREAMING documents frame (each micro-batch filters independently and
    * makes the same keep decisions the batch run makes; StreamsSpec
    * asserts the parity). The registry query adds the presentation sort. */
  def qualityFilterRowsOn(docs: DataFrame): DataFrame =
    textStatsRowsOn(docs)
      .filter(qualityPassCol)
      .select("doc_id", "n_tokens", "punct_ratio", "quality_score")

  def qualityFilterOn(docs: DataFrame): DataFrame =
    qualityFilterRowsOn(docs).orderBy("doc_id")

  def qualityFilter(spark: SparkSession, dir: String): DataFrame =
    qualityFilterOn(Tables.documents(spark, dir))

  /** Parameterized twin over an arbitrary snapshot relation (see
    * [[textStatsSqlFor]]). */
  def qualityFilterSqlFor(rel: String): String =
    s"""WITH stats AS (${textStatsSqlFor(rel)})
       |SELECT doc_id, n_tokens, punct_ratio, quality_score
       |FROM stats
       |WHERE n_tokens >= $MinTokens
       |  AND (punct_ratio < $MaxPunctRatio OR punct_ratio IS NULL)
       |  AND quality_score >= $MinQuality
       |ORDER BY doc_id""".stripMargin

  val qualityFilterSql: String = qualityFilterSqlFor("documents")

  // ---------------------------------------------------- repetition filtering
  /** Gopher-style repetition gates (Rae et al. 2021 §A1.1): documents whose
    * content is dominated by repeated tokens or a single repeated n-gram are
    * boilerplate/spam, not prose. Per doc: duplicate-token fraction
    * (1 − distinct/total), the most frequent token's share, and the token
    * share of the most frequent word 2-gram (counting overlapping
    * occurrences, ×2 tokens each). Thresholds are tuned to the synthetic
    * corpus the same way Gopher's 0.18/0.2 char-fraction gates were tuned to
    * web text; the metrics are the operator, the knobs are free.
    *
    * 100 TB shape: two explode → two-level hash aggregates, both map-side
    * combinable — the only shuffled rows are (doc_id, token/gram) partial
    * counts, never text — then a doc_id-keyed join of three tiny per-doc
    * frames. No windows, no driver state. */
  val DupTokenMax = 0.75
  val TopTokenMax = 0.25
  val Top2GramMax = 0.18

  /** Max multiplicity of any element of `arr` (0 on empty), computed
    * ROW-LOCALLY as the longest run of a sorted copy. The repetition
    * metrics are per-document facts, but the explode → groupBy(doc_id,
    * token) → groupBy(doc_id) → join formulation paid two exchanges per
    * metric to compute them (round 18: manifestDocFeatures' composed
    * feature plan carried 43 exchanges at 200 fresh docs). The sorted-run
    * fold yields the identical integer with ZERO exchanges — "most
    * frequent element's count" needs no cross-row state. Same trade
    * [[textStatsRowsOn]] already makes (aggregate/filter HOFs over the
    * token array beat shuffles; at corpus scale the removed shuffles
    * carried (doc_id, token) pairs — corpus-token-proportional bytes). */
  private def maxRunCount(arr: Column): Column =
    aggregate(array_sort(arr),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(acc.getField("prev") === x, acc.getField("run") + lit(1L))
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      })
      .getField("best")

  /** The repetition-gate COLUMNS over `col("text")` — one definition,
    * projected by [[repetitionStatsOn]] and composed inline by the
    * manifest feature fusion (the [[textStatsCols]] convention). */
  private[graft] def repetitionCols: Seq[Column] = {
    val t = tokens(col("text"))
    val nTokens = size(t).cast("long")
    val nDistinct = size(array_distinct(t)).cast("long")
    val topTok = maxRunCount(t)
    val topGram = maxRunCount(ngrams(t, 2))
    val dupFrac = coalesce(r6(lit(1.0) - nDistinct / nullif(nTokens, lit(0L))), lit(0.0))
    val topTokFrac = coalesce(r6(topTok / nullif(nTokens, lit(0L))), lit(0.0))
    // overlapping occurrences each count 2 tokens, so the raw share can
    // exceed 1 on degenerate docs ("a a a a") — cap at 1.0. NB least()
    // skips NULLs on both engines, so the zero-token case needs an
    // explicit guard, not coalesce-after-least.
    val top2Frac = when(nTokens === 0, lit(0.0))
      .otherwise(r6(least(lit(1.0), topGram * lit(2.0) / nTokens)))
    val keep = dupFrac <= lit(DupTokenMax) &&
      topTokFrac <= lit(TopTokenMax) && top2Frac <= lit(Top2GramMax)
    Seq(nTokens.as("n_tokens"), nDistinct.as("n_distinct"),
      topTok.as("top_token_c"), topGram.as("top_gram_c"),
      dupFrac.as("dup_token_frac"), topTokFrac.as("top_token_frac"),
      top2Frac.as("top_2gram_frac"), keep.as("keep"))
  }

  /** Just the keep/drop verdict of [[repetitionCols]], for composition. */
  private[graft] def repetitionKeepCol: Column = repetitionCols.last

  def repetitionStatsOn(docs: DataFrame): DataFrame =
    docs.select(col("doc_id") +: repetitionCols: _*).orderBy("doc_id")

  def repetitionStats(spark: SparkSession, dir: String): DataFrame =
    repetitionStatsOn(Tables.documents(spark, dir))

  /** Parameterized twin over an arbitrary snapshot relation (see
    * [[textStatsSqlFor]]). */
  def repetitionStatsSqlFor(rel: String): String =
    s"""WITH toks AS (SELECT doc_id, ${tokensSql("text")} AS t FROM $rel),
       |base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
       |tokc AS (
       |  SELECT doc_id, token, count(*) AS c
       |  FROM (SELECT doc_id, unnest(t) AS token FROM toks) GROUP BY 1, 2),
       |uni AS (
       |  SELECT doc_id, count(*) AS n_distinct, max(c) AS top_token_c FROM tokc GROUP BY 1),
       |gramc AS (
       |  SELECT doc_id, gram, count(*) AS c
       |  FROM (SELECT doc_id, unnest(${ngramsSql("t", 2)}) AS gram FROM toks) GROUP BY 1, 2),
       |g2 AS (SELECT doc_id, max(c) AS top_gram_c FROM gramc GROUP BY 1),
       |m AS (
       |  SELECT b.doc_id, b.n_tokens,
       |         CAST(coalesce(u.n_distinct, 0) AS BIGINT) AS n_distinct,
       |         CAST(coalesce(u.top_token_c, 0) AS BIGINT) AS top_token_c,
       |         CAST(coalesce(g.top_gram_c, 0) AS BIGINT) AS top_gram_c,
       |         coalesce(${r6Sql("1.0 - coalesce(u.n_distinct, 0) / nullif(b.n_tokens, 0)")}, 0.0) AS dup_token_frac,
       |         coalesce(${r6Sql("coalesce(u.top_token_c, 0) / nullif(b.n_tokens, 0)")}, 0.0) AS top_token_frac,
       |         CASE WHEN b.n_tokens = 0 THEN 0.0
       |              ELSE ${r6Sql("least(1.0, coalesce(g.top_gram_c, 0) * 2.0 / b.n_tokens)")} END AS top_2gram_frac
       |  FROM base b LEFT JOIN uni u ON b.doc_id = u.doc_id
       |              LEFT JOIN g2 g ON b.doc_id = g.doc_id)
       |SELECT doc_id, n_tokens, n_distinct, top_token_c, top_gram_c,
       |       dup_token_frac, top_token_frac, top_2gram_frac,
       |       (dup_token_frac <= $DupTokenMax AND top_token_frac <= $TopTokenMax
       |          AND top_2gram_frac <= $Top2GramMax) AS keep
       |FROM m ORDER BY doc_id""".stripMargin

  val repetitionStatsSql: String = repetitionStatsSqlFor("documents")

  // --------------------------------------------- CMS-pruned heavy hitters
  /** EXACT heavy hitters with bounded aggregate state — the scale form the
    * [[ngramFreqOn]] scaladoc promises: all word 2-grams with global count ≥
    * [[HeavyHitterMin]]. Pass 1 builds a count-min sketch over the gram
    * stream DISTRIBUTED-side (the `count_min_sketch` SQL aggregate; ~1 MB
    * driver state, like the decontamination bloom); pass 2 filters each gram on its
    * sketch estimate BEFORE the hash aggregate and counts survivors exactly.
    * CMS never undercounts, so the pruned set is a SUPERSET of the true
    * heavy hitters and the exact count + HAVING re-filter make the output
    * EXACT — the oracle is a plain GROUP BY/HAVING.
    *
    * Why it matters at 100 TB: an exact gram census must hold |distinct
    * grams| aggregation state (billions of keys on web-scale corpora); here
    * the hash agg only ever sees grams the sketch already considers heavy —
    * state bounded near |true heavy hitters| + (eps·N)-overcounted stragglers
    * — while the sketch build is fixed-size mergeable state per task. On
    * this synthetic corpus the tiny vocab makes most grams heavy (the prune
    * is demonstrative, not load-bearing); on Zipfian text it is the
    * difference between a spilling census and a bounded one. */
  val HeavyHitterMin = 30L
  val CmsEps = 0.0001
  val CmsConfidence = 0.99
  val CmsSeed = 42

  private def gramStream(docs: DataFrame): DataFrame =
    docs.select(explode(ngrams(tokens(col("text")), 2)).as("gram"))

  /** The CMS build pass: one fixed-size mergeable aggregate over the gram
    * stream. Built via the codegen'd count_min_sketch AGGREGATE, not
    * stat.countMinSketch — the stat helper drops to an RDD aggregate that
    * deserializes every row (measured 2.2x slower in-suite, BASELINE.md);
    * both hash the same UTF-8 bytes, so the probe contract is identical.
    * O(w·d) bytes come back to the driver, like the decontamination bloom. */
  def gramCmsOn(docs: DataFrame): Array[Byte] =
    gramStream(docs)
      .agg(expr(s"count_min_sketch(gram, CAST($CmsEps AS DOUBLE), " +
        s"CAST($CmsConfidence AS DOUBLE), $CmsSeed)").as("cms"))
      .head().getAs[Array[Byte]](0)

  /** The exact census pass against a GIVEN sketch. */
  private def heavyHittersWithCms(docs: DataFrame, cmsBytes: Array[Byte]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    gramStream(docs)
      .filter(call_function("graft_cms_estimate", lit(cmsBytes), col("gram"))
        >= lit(HeavyHitterMin))
      .groupBy("gram")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= lit(HeavyHitterMin))
      .orderBy(col("n").desc, col("gram"))
  }

  def heavyHittersOn(docs: DataFrame): DataFrame =
    heavyHittersWithCms(docs, gramCmsOn(docs))

  /** Frozen CMS per corpus: the sketch is a fixed-size model (train-once
    * contract, as with the IVF centroids) — the registered query builds it
    * on first invocation and every later call is the census pass only. */
  private val gramCmsCache = new graft.ops.FrozenCaches.Memo[Unit, Array[Byte]](label = "gram_cms")

  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val bytes = gramCmsCache.get(dir, ())(gramCmsOn(Tables.documents(spark, dir)))
    heavyHittersWithCms(Tables.documents(spark, dir), bytes)
  }

  val heavyHittersSql: String =
    s"""WITH toks AS (SELECT ${tokensSql("text")} AS t FROM documents),
       |grams AS (SELECT unnest(${ngramsSql("t", 2)}) AS gram FROM toks)
       |SELECT gram, count(*) AS n FROM grams
       |GROUP BY gram HAVING count(*) >= $HeavyHitterMin
       |ORDER BY n DESC, gram""".stripMargin

  // -------------------------------------------------- TF-IDF keyword extract
  /** Per-document keyword extraction: the top [[TopKeywords]] terms by
    * smoothed TF-IDF (tf · (ln((N+1)/(df+1)) + 1), scikit-learn's smooth-idf
    * form). Ranking uses the repo's r9 convention ([[graft.ops.Num.r9]]): the
    * score is rounded to 9 decimals as the primary sort key so an engine
    * log()-ulp difference can't flip a rank, with (tf DESC, df ASC, term
    * ASC) breaking exact score ties deterministically; the value column is
    * the usual r6 rounding.
    *
    * 100 TB shape: (doc_id, term) partial counts shuffle once; the df table
    * is |vocab|-sized and BROADCASTS (vocab ≪ corpus — a few M terms at
    * most); N is a 1-row broadcast cross join. The only window partitions by
    * doc_id over ≤|distinct terms per doc| rows. */
  val TopKeywords = 3

  def tfidfKeywordsOn(docs: DataFrame): DataFrame = {
    // persisted: the (doc_id, term, tf) table feeds BOTH the df() census
    // and the scored join — without it the corpus-wide explode+agg (the
    // heaviest shuffle here) runs twice (same convention as minhashSigsOn)
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist()
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(graft.ops.Num.r9(col("tfidf")).desc,
        col("tf").desc, col("df").asc, col("term").asc)
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= lit(TopKeywords))
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        r6(col("tfidf")).as("tfidf"))
      .orderBy("doc_id", "rank")
  }

  def tfidfKeywords(spark: SparkSession, dir: String): DataFrame =
    tfidfKeywordsOn(Tables.documents(spark, dir))

  lazy val tfidfKeywordsSql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(${tokensSql("text")}) AS term FROM documents)
       |  GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |         tf.tf * (ln(((SELECT count(*) FROM documents) + 1.0) / (df.df + 1.0)) + 1.0) AS tfidf,
       |         row_number() OVER (PARTITION BY tf.doc_id
       |           ORDER BY ${graft.ops.Num.r9Sql("tf.tf * (ln(((SELECT count(*) FROM documents) + 1.0) / (df.df + 1.0)) + 1.0)")} DESC,
       |                    tf.tf DESC, df.df ASC, tf.term ASC) AS rank
       |  FROM tf JOIN df ON tf.term = df.term)
       |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, ${r6Sql("tfidf")} AS tfidf
       |FROM scored WHERE rank <= $TopKeywords
       |ORDER BY doc_id, rank""".stripMargin

  // ------------------------------------------------------------- PII scrub
  /** PII redaction — the corpus-wide scrub a pretraining pipeline runs
    * before data ships: emails → <EMAIL>, phone numbers → <PHONE>, IPv4
    * literals → <IP>, with per-doc match counts for audit. The synthetic
    * corpus contains no PII, so the query first INJECTS deterministic
    * doc-keyed PII strings (self-seeding, documented — the redaction is
    * the operator under test), then counts and strips them; the oracle
    * md5-compares the ENTIRE scrubbed text. Regexes stay within the
    * Java-regex ∩ RE2 common dialect (classes, bounded repeats — no
    * lookaround, no \b) so both engines match identically. Pure regexp
    * projections: scan-bound, codegen'd, no shuffle before the sort. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\(\\d{3}\\) \\d{3}-\\d{4}"
  val IpRe = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  def piiSeeded(docs: DataFrame): DataFrame =
    docs.withColumn("seeded_text", concat(col("text"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com now")))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          concat(lit(" call (555) 123-4567 ref"), col("doc_id").cast("string")))
        .otherwise(concat(lit(" from 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
          lit(".7 gateway")))))

  /** The redaction chain itself — one definition, used by the query AND
    * the completeness spec so they can never drift. */
  def piiClean(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"), IpRe, "<IP>")

  def piiScrubOn(docs: DataFrame): DataFrame =
    piiSeeded(docs)
      .withColumn("n_emails", regexp_count(col("seeded_text"), lit(EmailRe)).cast("long"))
      .withColumn("n_phones", regexp_count(col("seeded_text"), lit(PhoneRe)).cast("long"))
      .withColumn("n_ips", regexp_count(col("seeded_text"), lit(IpRe)).cast("long"))
      .withColumn("clean", piiClean(col("seeded_text")))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        length(col("clean")).cast("long").as("clean_len"), md5(col("clean")).as("clean_md5"))
      .orderBy("doc_id")

  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    piiScrubOn(Tables.documents(spark, dir))

  val piiScrubSql: String = {
    // the SAME escaped pattern text works verbatim in both engines
    val (email, phone, ip) = (EmailRe, PhoneRe, IpRe)
    s"""WITH seeded AS (
       |  SELECT doc_id, text ||
       |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
       |         WHEN doc_id % 3 = 1 THEN ' call (555) 123-4567 ref' || CAST(doc_id AS VARCHAR)
       |         ELSE ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 gateway' END AS seeded_text
       |  FROM documents),
       |counted AS (
       |  SELECT doc_id,
       |         CAST(len(regexp_extract_all(seeded_text, '$email')) AS BIGINT) AS n_emails,
       |         CAST(len(regexp_extract_all(seeded_text, '$phone')) AS BIGINT) AS n_phones,
       |         CAST(len(regexp_extract_all(seeded_text, '$ip')) AS BIGINT) AS n_ips,
       |         regexp_replace(regexp_replace(regexp_replace(seeded_text,
       |           '$email', '<EMAIL>', 'g'), '$phone', '<PHONE>', 'g'), '$ip', '<IP>', 'g') AS clean
       |  FROM seeded)
       |SELECT doc_id, n_emails, n_phones, n_ips,
       |       CAST(length(clean) AS BIGINT) AS clean_len, md5(clean) AS clean_md5
       |FROM counted ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------- LM-fluency proxy scoring
  /** CCNet-style fluency gate with a count-based LM proxy: each document
    * scores the MEAN CORPUS FREQUENCY of its word bigrams — a document made
    * of common constructions scores high, one made of rare/garbled
    * sequences scores low. This is the quantity CCNet thresholds with a
    * KenLM perplexity (Wenzek et al. 2020, arXiv:1911.00359), recast so
    * the oracle gate stays exact: integer bigram mass, one r6-rounded
    * division at the end, and the gate compares the ROUNDED score so an
    * engine ulp can't flip a verdict.
    *
    * Scale shape: the census is one map-side-combinable (gram) aggregate;
    * only bigrams at/above [[FluencyHeavyMin]] survive it, so the scorer
    * joins against a BOUNDED heavy-gram table (broadcast — same bound
    * argument as [[heavyHittersOn]]; everything below the floor contributes
    * the smoothing count 1 via the left join's null). The per-doc aggregate
    * shuffles (doc_id, long) once. Docs with <2 tokens keep a verdict row
    * (0 bigrams, NULL score, not fluent) through the spine left join. */
  val FluencyHeavyMin = 30L
  val FluencyMin = 15.0

  private def fluencyGrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(ngrams(tokens(col("text")), 2)).as("gram"))

  /** The heavy-bigram census table (gram, n) a fluency scorer probes —
    * trained once over a reference corpus, bounded by the census floor. */
  def fluencyCensusOn(docs: DataFrame): DataFrame =
    fluencyGrams(docs).groupBy("gram").agg(count(lit(1)).as("n"))
      .filter(col("n") >= lit(FluencyHeavyMin))

  /** Score documents against a FIXED heavy-gram census (the deployment
    * entry point: the census trains once, then any amount of new text
    * streams through — see Streams.fluencyBatches). */
  /** Unsorted scoring rows — the composition seam (the funnel and the
    * ccnet bucket family consume the verdicts by join/aggregate; only the
    * registered listing pays the presentation sort). */
  def lmFluencyAgainstRowsOn(docs: DataFrame, heavy: DataFrame): DataFrame = {
    val scored = fluencyGrams(docs).join(broadcast(heavy), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("n"), lit(1L))).as("mass"))
      .withColumn("fluency", r6(col("mass").cast("double") / col("n_bigrams")))
    docs.select(col("doc_id"), col("lang"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("fluency"),
        coalesce(col("fluency") >= lit(FluencyMin), lit(false)).as("is_fluent"))
  }

  def lmFluencyAgainstOn(docs: DataFrame, heavy: DataFrame): DataFrame =
    lmFluencyAgainstRowsOn(docs, heavy).orderBy("doc_id")

  def lmFluencyRowsOn(docs: DataFrame): DataFrame =
    lmFluencyAgainstRowsOn(docs, fluencyCensusOn(docs))

  def lmFluencyOn(docs: DataFrame): DataFrame =
    lmFluencyAgainstOn(docs, fluencyCensusOn(docs))

  /** Frozen heavy-gram census per corpus (same train-once contract as the
    * IVF centroids): the census is bounded by the [[FluencyHeavyMin]] floor
    * — broadcast-sized by the scaladoc's own argument — so the registered
    * query collects it once and replays it as a local relation. */
  private val fluencyCensusCache =
    new graft.ops.FrozenCaches.Memo[Unit, Seq[(String, Long)]](label = "fluency_census")

  def lmFluency(spark: SparkSession, dir: String): DataFrame =
    lmFluencyRows(spark, dir).orderBy("doc_id")

  /** Unsorted frozen-census scoring — the registered [[lmFluency]] minus
    * the presentation sort, for composing consumers (the funnel build). */
  def lmFluencyRows(spark: SparkSession, dir: String): DataFrame = {
    val rows = fluencyCensusCache.get(dir, ()) {
      fluencyCensusOn(Tables.documents(spark, dir)).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1)))
    }
    import spark.implicits._
    lmFluencyAgainstRowsOn(Tables.documents(spark, dir), rows.toDF("gram", "n"))
  }

  /** [[lmFluencySql]] split across two snapshot relations: the heavy-gram
    * census (the trained model) comes from `model`, the per-doc scoring
    * spine from `spine` — the train-once contract ([[lmFluencyAgainstOn]])
    * expressed in SQL, for oracles that must judge a refreshed snapshot
    * against a census frozen at base time. `spine == model` degenerates to
    * the registered gate's semantics (the census trains on the pool it
    * scores). */
  def lmFluencySqlFor(spine: String, model: String): String =
    s"""WITH mtoks AS (SELECT doc_id, ${tokensSql("text")} AS t FROM $model),
       |mgrams AS (SELECT doc_id, unnest(${ngramsSql("t", 2)}) AS gram FROM mtoks),
       |heavy AS (SELECT gram, count(*) AS n FROM mgrams
       |          GROUP BY gram HAVING count(*) >= $FluencyHeavyMin),
       |stoks AS (SELECT doc_id, ${tokensSql("text")} AS t FROM $spine),
       |sgrams AS (SELECT doc_id, unnest(${ngramsSql("t", 2)}) AS gram FROM stoks),
       |sc AS (
       |  SELECT g.doc_id, count(*) AS n_bigrams,
       |         ${r6Sql("CAST(sum(coalesce(h.n, 1)) AS DOUBLE) / count(*)")} AS fluency
       |  FROM sgrams g LEFT JOIN heavy h ON g.gram = h.gram
       |  GROUP BY 1)
       |SELECT d.doc_id, d.lang, coalesce(sc.n_bigrams, 0) AS n_bigrams, sc.fluency,
       |       coalesce(sc.fluency >= $FluencyMin, false) AS is_fluent
       |FROM $spine d LEFT JOIN sc ON d.doc_id = sc.doc_id
       |ORDER BY d.doc_id""".stripMargin

  val lmFluencySql: String =
    s"""WITH toks AS (SELECT doc_id, ${tokensSql("text")} AS t FROM documents),
       |grams AS (SELECT doc_id, unnest(${ngramsSql("t", 2)}) AS gram FROM toks),
       |heavy AS (SELECT gram, count(*) AS n FROM grams
       |          GROUP BY gram HAVING count(*) >= $FluencyHeavyMin),
       |sc AS (
       |  SELECT g.doc_id, count(*) AS n_bigrams,
       |         ${r6Sql("CAST(sum(coalesce(h.n, 1)) AS DOUBLE) / count(*)")} AS fluency
       |  FROM grams g LEFT JOIN heavy h ON g.gram = h.gram
       |  GROUP BY 1)
       |SELECT d.doc_id, d.lang, coalesce(sc.n_bigrams, 0) AS n_bigrams, sc.fluency,
       |       coalesce(sc.fluency >= $FluencyMin, false) AS is_fluent
       |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------- token entropy / diversity
  /** Per-document lexical-diversity signals: unigram token entropy (bits)
    * and type-token ratio — the compression-ratio-style quality axis the
    * length/punct/stopword heuristics miss. Machine-generated or template
    * text repeats a small vocabulary (low entropy, low TTR) at normal
    * length and punctuation, so curation pipelines gate on diversity
    * separately from [[textStatsOn]]'s shape features.
    *
    * Entropy uses the algebraic form H = log2(n) − (Σ c·log2 c)/n — one
    * log per DISTINCT token, fewer float ops than −Σ(c/n)·log2(c/n), and
    * the identical expression runs on both engines (r6-rounded output).
    *
    * 100 TB design: two hash aggregates, both map-side combinable — the
    * (doc_id, token) count absorbs repeats before its shuffle and the
    * per-doc rollup carries one row per distinct token; corpus-LINEAR like
    * t_ngram_freq (the explode dominates), with no corpus-sized join
    * anywhere (the manifest left join carries (doc_id, longs)). */
  def tokenEntropyOn(docs: DataFrame): DataFrame = {
    val perTok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val perDoc = perTok.groupBy("doc_id").agg(
      sum("c").as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(col("c").cast("double") * log2(col("c").cast("double"))).as("clc"))
    val scored = perDoc.select(col("doc_id"), col("n_tokens"), col("n_types"),
      Num.r6(col("n_types").cast("double") / col("n_tokens")).as("type_token_ratio"),
      Num.r6(log2(col("n_tokens").cast("double")) - col("clc") / col("n_tokens")).as("entropy"))
    docs.select("doc_id").join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("type_token_ratio"), lit(0.0)).as("type_token_ratio"),
        coalesce(col("entropy"), lit(0.0)).as("entropy"))
      .orderBy("doc_id")
  }

  def tokenEntropy(spark: SparkSession, dir: String): DataFrame =
    tokenEntropyOn(Tables.documents(spark, dir))

  val tokenEntropySql: String =
    s"""WITH tok AS (SELECT doc_id, unnest(${tokensSql("text")}) AS tok FROM documents),
       |pt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
       |pd AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, CAST(count(*) AS BIGINT) AS n_types,
       |         sum(c * log2(c)) AS clc
       |  FROM pt GROUP BY doc_id),
       |scored AS (
       |  SELECT doc_id, n_tokens, n_types,
       |         ${r6Sql("n_types / n_tokens")} AS type_token_ratio,
       |         ${r6Sql("log2(n_tokens) - clc / n_tokens")} AS entropy
       |  FROM pd)
       |SELECT d.doc_id,
       |       CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
       |       CAST(coalesce(s.n_types, 0) AS BIGINT) AS n_types,
       |       coalesce(s.type_token_ratio, 0.0) AS type_token_ratio,
       |       coalesce(s.entropy, 0.0) AS entropy
       |FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------- vocabulary coverage
  /** Vocabulary budget of the registered coverage table (a free knob). */
  val VocabTopV = 256

  /** Token-vocabulary coverage table: the corpus's [[VocabTopV]] most
    * frequent tokens ranked with their cumulative share of ALL token
    * occurrences — the table a tokenizer-budget decision reads ("what vocab
    * size covers 95% of the corpus?") and the OOV-rate planner for fixed
    * vocabularies. Ties break on the token string so ranks are total and
    * deterministic on both engines.
    *
    * 100 TB design: the token census is one map-side-combinable aggregate;
    * the top-V cut is a bounded TakeOrdered (never a global sort of the
    * vocabulary), and the running-share window runs on V rows — the only
    * single-partition stage is 256 rows by construction. */
  def vocabCoverageOn(docs: DataFrame): DataFrame = {
    val counts = docs.select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = counts.agg(sum("c").as("n"))
    val ord = Window.orderBy(col("c").desc, col("tok"))
    counts.orderBy(col("c").desc, col("tok")).limit(VocabTopV)
      .crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("cum_frac", Num.r6(
        sum(col("c")).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          / col("n")))
      .select(col("rank"), col("tok"), col("c"), col("cum_frac"))
      .orderBy("rank")
  }

  def vocabCoverage(spark: SparkSession, dir: String): DataFrame =
    vocabCoverageOn(Tables.documents(spark, dir))

  val vocabCoverageSql: String =
    s"""WITH tokc AS (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(${tokensSql("text")}) AS tok FROM documents)
       |  GROUP BY tok),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tokc),
       |top AS (SELECT tok, c FROM tokc ORDER BY c DESC, tok LIMIT $VocabTopV)
       |SELECT CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rank, tok, c,
       |       ${r6Sql("sum(c) OVER (ORDER BY c DESC, tok ROWS UNBOUNDED PRECEDING) / n")} AS cum_frac
       |FROM top, tot
       |ORDER BY rank""".stripMargin

  // ------------------------------------------------- bigram PMI collocations
  /** Pair-count floor and table size of the registered PMI query (free
    * knobs): rare pairs make PMI explode (log of a tiny denominator), so
    * every collocation miner floors the pair count first. */
  val PmiMinPair = 5L
  val PmiTopK = 64

  /** Collocation mining: the corpus's top adjacent-token pairs by
    * pointwise mutual information — PMI = log2(P(xy) / (P(x)·P(y))) over
    * the unigram and bigram censuses. High-PMI pairs are the
    * tokenizer-merge / multi-word-expression candidates ("new york"-style
    * units) a vocabulary builder promotes; [[vocabCoverageOn]] sizes the
    * vocabulary, this ranks what to merge into it. Arithmetic is all-double
    * past the exact integer censuses (N² overflows BIGINT at corpus scale),
    * the identical expression on both engines, ranked on the r6-rounded
    * score with the pair string as tiebreak — a total order, so the top-K
    * cut is deterministic.
    *
    * 100 TB design: two map-side-combinable censuses (unigram, bigram);
    * the pair-count floor prunes the bigram table before its two
    * vocabulary-keyed joins; the top-K cut is a bounded TakeOrdered and
    * the rank window runs on K rows. */
  def bigramPmiOn(docs: DataFrame): DataFrame = {
    val toks = docs.select(tokens(col("text")).as("t"))
    val uni = toks.select(explode(col("t")).as("w")).groupBy("w").agg(count(lit(1)).as("c"))
    val tot = toks.agg(
      sum(size(col("t")).cast("long")).as("n"),
      sum(greatest(lit(0L), size(col("t")).cast("long") - 1)).as("m"))
    val bi = toks.select(explode(ngrams(col("t"), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= lit(PmiMinPair))
    val scored = bi
      .withColumn("x", element_at(split(col("bigram"), " "), 1))
      .withColumn("y", element_at(split(col("bigram"), " "), 2))
      .join(uni.select(col("w").as("x"), col("c").as("cx")), Seq("x"))
      .join(uni.select(col("w").as("y"), col("c").as("cy")), Seq("y"))
      .crossJoin(broadcast(tot))
      .withColumn("pmi", Num.r6(log2(
        (col("n_pair").cast("double") * col("n").cast("double") * col("n").cast("double"))
          / (col("m").cast("double") * col("cx").cast("double") * col("cy").cast("double")))))
    val ord = Window.orderBy(col("pmi").desc, col("bigram"))
    scored.orderBy(col("pmi").desc, col("bigram")).limit(PmiTopK)
      .withColumn("rank", row_number().over(ord).cast("long"))
      .select(col("rank"), col("bigram"), col("n_pair"), col("pmi"))
      .orderBy("rank")
  }

  def bigramPmi(spark: SparkSession, dir: String): DataFrame =
    bigramPmiOn(Tables.documents(spark, dir))

  val bigramPmiSql: String =
    s"""WITH toks AS (SELECT ${tokensSql("text")} AS t FROM documents),
       |uni AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
       |tot AS (
       |  SELECT CAST(sum(len(t)) AS BIGINT) AS n,
       |         CAST(sum(greatest(0, len(t) - 1)) AS BIGINT) AS m
       |  FROM toks),
       |bi AS (
       |  SELECT bigram, CAST(count(*) AS BIGINT) AS n_pair
       |  FROM (SELECT unnest(${ngramsSql("t", 2)}) AS bigram FROM toks)
       |  GROUP BY bigram HAVING count(*) >= $PmiMinPair),
       |scored AS (
       |  SELECT b.bigram, b.n_pair,
       |         ${r6Sql("log2((CAST(b.n_pair AS DOUBLE) * CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)) / (CAST(t.m AS DOUBLE) * CAST(ux.c AS DOUBLE) * CAST(uy.c AS DOUBLE)))")} AS pmi
       |  FROM bi b
       |  JOIN uni ux ON ux.w = string_split(b.bigram, ' ')[1]
       |  JOIN uni uy ON uy.w = string_split(b.bigram, ' ')[2]
       |  CROSS JOIN tot t),
       |top AS (SELECT * FROM scored ORDER BY pmi DESC, bigram LIMIT $PmiTopK)
       |SELECT CAST(row_number() OVER (ORDER BY pmi DESC, bigram) AS BIGINT) AS rank,
       |       bigram, n_pair, pmi
       |FROM top ORDER BY rank""".stripMargin

  // ------------------------------------------------------------ BM25 search
  /** Okapi BM25 retrieval of a fixed query set against the corpus — the
    * curation-side retrieval operator (seed-set building for quality
    * classifiers, domain-relevance spot checks, targeted corpus audits all
    * start with "find the docs that match these terms"). Standard
    * Robertson k1/b form: idf(t) = ln(1 + (N − df + ½)/(df + ½)),
    * tf-part = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).
    *
    * Determinism: ranking keys on the repo's r9 convention
    * ([[graft.ops.Num.r9]]) with doc_id tiebreak; the reported score is r6.
    * The query table is one shared constant ([[Bm25Queries]]) rendered into
    * both the Spark literal frame and the oracle VALUES clause, so the two
    * engines cannot drift.
    *
    * 100 TB shape: the postings explode is pre-filtered by a BROADCAST
    * semi-ish join on the query vocabulary, so only postings of queried
    * terms (≪ corpus) ever reach a shuffle; df and the (N, avgdl) stats
    * are broadcast-sized; the only window partitions by query_id over that
    * query's candidate set. Everything else is scan-bound. */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25TopK = 5
  val Bm25Queries: Seq[(Long, String)] = Seq(
    0L -> "hash", 0L -> "join",
    1L -> "scan", 1L -> "filter", 1L -> "fast",
    2L -> "merge", 2L -> "sort")

  private def bm25QueryFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Bm25Queries.toDF("query_id", "term")
  }

  private def bm25Postings(docs: DataFrame): (DataFrame, DataFrame) = {
    val q = bm25QueryFrame(docs.sparkSession)
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("t"))
    val dl = toks.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
    val tf = toks.select(col("doc_id"), explode(col("t")).as("term"))
      .join(broadcast(q.select("term").distinct()), Seq("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    (tf, dl)
  }

  /** The shared scoring tail over (tf, dl) postings and FROZEN (df, stats)
    * model frames — one implementation behind the one-shot top-k and the
    * streaming score-against form, so the formula cannot drift. */
  private def bm25ScoreTail(tf: DataFrame, dl: DataFrame,
                            dft: DataFrame, stats: DataFrame, q: DataFrame): DataFrame = {
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfPart = col("tf") * lit(Bm25K1 + 1.0) /
      (col("tf") + lit(Bm25K1) *
        (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl")))
    tf.join(broadcast(dft), Seq("term"))
      .join(broadcast(q), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib", idf * tfPart)
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("score"), count(lit(1)).as("n_terms_hit"))
  }

  /** Corpus-statistics model for BM25: the query-vocabulary df table and
    * the 1-row (n_docs, avgdl) frame — train once, then score any amount
    * of new text against it ([[bm25ScoreAgainstOn]],
    * [[graft.streaming.Streams.bm25Batches]]). */
  def bm25StatsOn(docs: DataFrame): (DataFrame, DataFrame) = {
    val (tf, dl) = bm25Postings(docs)
    (tf.groupBy("term").agg(count(lit(1)).as("df")),
      dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")))
  }

  /** Score documents against a FIXED BM25 model (the deployment entry
    * point): one row per (query, doc) hit with the r6 score, unranked —
    * global top-k is the consumer's final aggregate over all batches, not
    * a per-batch operation. Stateless per row, so it runs unchanged on a
    * streaming frame. */
  def bm25ScoreAgainstOn(docs: DataFrame, dft: DataFrame, stats: DataFrame): DataFrame = {
    val (tf, dl) = bm25Postings(docs)
    bm25ScoreTail(tf, dl, dft, stats, bm25QueryFrame(docs.sparkSession))
      .select(col("query_id"), col("doc_id"), col("n_terms_hit"),
        r6(col("score")).as("score"))
  }

  def bm25TopKOn(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    // persisted: the filtered postings feed BOTH the df census and the
    // scoring join; tiny after the query-vocabulary filter
    val (tf0, dl) = bm25Postings(docs)
    val tf = tf0.persist()
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val w = Window.partitionBy("query_id")
      .orderBy(Num.r9(col("score")).desc, col("doc_id").asc)
    bm25ScoreTail(tf, dl, dft, stats, bm25QueryFrame(spark))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= lit(Bm25TopK))
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_terms_hit"),
        r6(col("score")).as("score"))
      .orderBy("query_id", "rank")
  }

  def bm25TopK(spark: SparkSession, dir: String): DataFrame =
    bm25TopKOn(Tables.documents(spark, dir))

  lazy val bm25TopKSql: String = {
    val values = Bm25Queries
      .map { case (qid, t) => s"(CAST($qid AS BIGINT), '$t')" }.mkString(", ")
    val scoreSql = s"""ln(1 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
         * tf.tf * ${Bm25K1 + 1.0} / (tf.tf + $Bm25K1 * (${1.0 - Bm25B} + $Bm25B * dl.dl / st.avgdl))"""
    s"""WITH q(query_id, term) AS (VALUES $values),
       |toks AS (SELECT doc_id, ${tokensSql("text")} AS t FROM documents),
       |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, term, count(*) AS tf
       |       FROM (SELECT doc_id, unnest(t) AS term FROM toks)
       |       WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |sc AS (
       |  SELECT q.query_id, tf.doc_id, count(*) AS n_terms_hit,
       |         sum($scoreSql) AS score
       |  FROM q JOIN tf USING (term) JOIN df USING (term)
       |       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
       |  GROUP BY 1, 2),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |         ORDER BY ${Num.r9Sql("score")} DESC, doc_id) AS rank FROM sc)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, n_terms_hit,
       |       ${r6Sql("score")} AS score
       |FROM rk WHERE rank <= $Bm25TopK ORDER BY query_id, rank""".stripMargin
  }

  // ------------------------------------------------ hybrid retrieval (RRF)
  /** Reciprocal-rank fusion of the library's two retrieval systems over
    * the SHARED fixed probe set (VERDICT r16 task 4): for each probe
    * document, the DENSE list is brute-force embedding cosine (the
    * `s_knn_brute` convention: cos desc, id tiebreak) and the SPARSE list
    * is more-like-this BM25 — the probe doc's distinct tokens as the
    * query against the corpus, through the registered `t_bm25_topk`
    * machinery — each to depth [[HybridDepth]], self excluded from both.
    * Fusion is the standard RRF: score(d) = Σ_sys 1/([[RrfK]] + rank_sys)
    * with an absent system contributing 0 — a row-local expression over
    * the full-outer-joined rank lists (exactly two terms, so no float
    * summation-order hazard), ranked on the house r9/doc_id key. A doc
    * both systems rank high outranks any single-system winner at the same
    * rank by construction (1/(K+r) + 1/(K+r') > 1/(K+r) — RrfSpec pins
    * it).
    *
    * 100 TB shape: probes and their term vocabulary are broadcast-sized
    * (ProbeBudget docs); the dense pass is one corpus scan against the
    * broadcast probe matrix, the sparse pass one postings scan
    * pre-filtered to the broadcast vocabulary; the fusion joins two
    * (probes × depth)-sized rank lists — model-sized, not corpus-sized. */
  val RrfK = 60L
  val HybridDepth = 20
  val HybridTopK = 5

  private def hybridDense(embeddings: DataFrame): DataFrame = {
    import graft.ext.Similarity
    val e = Similarity.withNorm(embeddings)
    val probes = Similarity.probeFilter(e)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    e.join(broadcast(probes), col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        Similarity.fastDot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
      .withColumn("r_dense", row_number().over(w).cast("long"))
      .filter(col("r_dense") <= lit(HybridDepth.toLong))
      .select(col("q_id"), col("vec_id").as("doc_id"), col("r_dense"))
  }

  private def hybridSparse(docs: DataFrame, probeIds: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("t"))
    // the probe doc's DISTINCT tokens are its query — more-like-this
    val qt = toks.join(broadcast(probeIds), col("doc_id") === col("q_id"))
      .select(col("q_id").as("query_id"), explode(array_distinct(col("t"))).as("term"))
    val dl = toks.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
    // feeds the df census AND the scoring join — deliberately NOT
    // persisted (ADVICE r17: a lazy library path must not leak a cache it
    // can never release): the two consumers contain the IDENTICAL
    // tf-aggregate Exchange subtree, so ReuseExchange dedups it and the
    // tokenize+postings scan runs once per materialization anyway
    val tf = toks.select(col("doc_id"), explode(col("t")).as("term"))
      .join(broadcast(qt.select("term").distinct()), Seq("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val w = Window.partitionBy("query_id")
      .orderBy(Num.r9(col("score")).desc, col("doc_id"))
    bm25ScoreTail(tf, dl, dft, stats, qt)
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("r_sparse", row_number().over(w).cast("long"))
      .filter(col("r_sparse") <= lit(HybridDepth.toLong))
      .select(col("query_id").as("q_id"), col("doc_id"), col("r_sparse"))
  }

  /** The fusion core over two explicit rank lists (q_id, doc_id,
    * r_dense/r_sparse) — public so RrfSpec can drive engineered lists. */
  def rrfFuse(dense: DataFrame, sparse: DataFrame, topK: Int = HybridTopK): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(Num.r9(col("rrf")).desc, col("doc_id"))
    dense.join(sparse, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(RrfK) + col("r_dense")).cast("double"), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("r_sparse")).cast("double"), lit(0.0)))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= lit(topK.toLong))
  }

  private def rrfProject(fused: DataFrame): DataFrame =
    fused.select(col("q_id").as("query_id"), col("rank"), col("doc_id"),
        coalesce(col("r_dense"), lit(-1L)).as("r_dense"),
        coalesce(col("r_sparse"), lit(-1L)).as("r_sparse"),
        r6(col("rrf")).as("rrf_score"))
      .orderBy("query_id", "rank")

  def hybridRrfOn(docs: DataFrame, embeddings: DataFrame): DataFrame = {
    val probeIds = graft.ext.Similarity.probeFilter(embeddings)
      .select(col("vec_id").as("q_id"))
    rrfProject(rrfFuse(hybridDense(embeddings), hybridSparse(docs, probeIds)))
  }

  /** Frozen per-corpus rank lists of the two retrieval systems — each is
    * (probes × depth)-sized, a MODEL (the bpe_merges convention), so the
    * suite pays the corpus-scan dense pass and the tokenize+postings
    * sparse pass once, not once per hybrid row. */
  private val hybridCache = new graft.ops.FrozenCaches.Memo[
      (Int, Int), (Seq[(Long, Long, Long)], Seq[(Long, Long, Long)])](
    label = "hybrid_lists")

  private def frozenHybridLists(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val (d, s) = hybridCache.get(dir, (HybridDepth, graft.ext.Similarity.ProbeBudget)) {
      val docs = Tables.documents(spark, dir)
      val emb = Tables.embeddings(spark, dir)
      val probeIds = graft.ext.Similarity.probeFilter(emb).select(col("vec_id").as("q_id"))
      (hybridDense(emb).as[(Long, Long, Long)].collect().toSeq,
        hybridSparse(docs, probeIds).as[(Long, Long, Long)].collect().toSeq)
    }
    (d.toDF("q_id", "doc_id", "r_dense"), s.toDF("q_id", "doc_id", "r_sparse"))
  }

  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val (d, s) = frozenHybridLists(spark, dir)
    rrfProject(rrfFuse(d, s))
  }

  /** The dense + sparse + fused CTE chain shared by both hybrid oracles:
    * relations `d` (q_id, doc_id, r_dense), `s` (…, r_sparse), `f`
    * (fused scores) and `rk` (fused ranks). */
  private def hybridCtes: String = {
    val scoreSql = s"""ln(1 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
         * tf.tf * ${Bm25K1 + 1.0} / (tf.tf + $Bm25K1 * (${1.0 - Bm25B} + $Bm25B * dl.dl / st.avgdl))"""
    s"""e AS (SELECT vec_id, embedding, ${graft.ext.Similarity.normSql("embedding")} AS nrm FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM e
       |      WHERE ${graft.ext.Similarity.probeInSql("vec_id", "e")}),
       |dscored AS (
       |  SELECT q.q_id, e.vec_id AS doc_id,
       |         ${graft.ext.Similarity.dotSql("q.q_emb", "e.embedding")} / (q.q_nrm * e.nrm) AS cos
       |  FROM e JOIN q ON e.vec_id <> q.q_id),
       |d AS (SELECT q_id, doc_id, r_dense FROM (
       |        SELECT q_id, doc_id,
       |               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, doc_id) AS r_dense
       |        FROM dscored) WHERE r_dense <= $HybridDepth),
       |toks AS (SELECT doc_id, ${tokensSql("text")} AS t FROM documents),
       |qt AS (SELECT DISTINCT q.q_id AS query_id, term
       |       FROM q JOIN (SELECT doc_id, unnest(t) AS term FROM toks) x ON x.doc_id = q.q_id),
       |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, term, count(*) AS tf
       |       FROM (SELECT doc_id, unnest(t) AS term FROM toks)
       |       WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |sc AS (
       |  SELECT qt.query_id AS q_id, tf.doc_id, sum($scoreSql) AS score
       |  FROM qt JOIN tf USING (term) JOIN df USING (term)
       |       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
       |  WHERE tf.doc_id <> qt.query_id
       |  GROUP BY 1, 2),
       |s AS (SELECT q_id, doc_id, r_sparse FROM (
       |        SELECT q_id, doc_id,
       |               row_number() OVER (PARTITION BY q_id ORDER BY ${Num.r9Sql("score")} DESC, doc_id) AS r_sparse
       |        FROM sc) WHERE r_sparse <= $HybridDepth),
       |f AS (
       |  SELECT coalesce(d.q_id, s.q_id) AS q_id, coalesce(d.doc_id, s.doc_id) AS doc_id,
       |         d.r_dense, s.r_sparse,
       |         coalesce(1.0 / CAST($RrfK + d.r_dense AS DOUBLE), 0.0)
       |           + coalesce(1.0 / CAST($RrfK + s.r_sparse AS DOUBLE), 0.0) AS rrf
       |  FROM d FULL OUTER JOIN s ON d.q_id = s.q_id AND d.doc_id = s.doc_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |         ORDER BY ${Num.r9Sql("rrf")} DESC, doc_id) AS rank FROM f)""".stripMargin
  }

  lazy val hybridRrfSql: String =
    s"""WITH $hybridCtes
       |SELECT q_id AS query_id, CAST(rank AS BIGINT) AS rank, doc_id,
       |       coalesce(r_dense, -1) AS r_dense, coalesce(r_sparse, -1) AS r_sparse,
       |       ${r6Sql("rrf")} AS rrf_score
       |FROM rk WHERE rank <= $HybridTopK ORDER BY query_id, rank""".stripMargin

  /** Hybrid retrieval EVAL: micro-averaged same-label recall@k of each
    * half and the fusion over the shared probes — relevance = the
    * embedding table's own label column (the supervision it carries),
    * n_possible = Σ_q min(k, |same-label others|), one integer-exact
    * division per row. Reports whether fusion actually buys recall over
    * either half alone on this corpus. */
  def hybridRecallOn(docs: DataFrame, embeddings: DataFrame): DataFrame = {
    val probeIds = graft.ext.Similarity.probeFilter(embeddings)
      .select(col("vec_id").as("q_id"))
    hybridRecallFrom(embeddings,
      hybridDense(embeddings).localCheckpoint(),   // probes × depth
      hybridSparse(docs, probeIds).localCheckpoint())
  }

  /** The eval over caller-supplied (frozen) rank lists. */
  def hybridRecallFrom(embeddings: DataFrame, dense: DataFrame,
                       sparse: DataFrame): DataFrame = {
    import graft.ext.Similarity
    val k = HybridTopK
    val fused = rrfFuse(dense, sparse).select(col("q_id"), col("doc_id"), col("rank"))
    val lab = embeddings.select(col("vec_id").as("doc_id"), col("label"))
    val qlab = Similarity.probeFilter(embeddings)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"))
    val poss = embeddings.select(col("vec_id"), col("label"))
      .join(broadcast(qlab), col("vec_id") =!= col("q_id") && col("label") === col("q_label"))
      .groupBy("q_id").agg(count(lit(1)).as("n_rel"))
    val totals = qlab.join(poss, Seq("q_id"), "left")
      .select(least(lit(k.toLong), coalesce(col("n_rel"), lit(0L))).as("p"))
      .agg(sum(col("p")).as("n_possible"), count(lit(1)).as("n_queries"))
    def sys(list: DataFrame, rankCol: String, name: String): DataFrame =
      list.filter(col(rankCol) <= lit(k.toLong))
        .join(lab, Seq("doc_id"))
        .join(broadcast(qlab), Seq("q_id"))
        .agg(sum((col("label") === col("q_label")).cast("long")).as("h"))
        .select(lit(name).as("system"), coalesce(col("h"), lit(0L)).as("n_hits"))
    sys(dense, "r_dense", "dense")
      .unionByName(sys(sparse, "r_sparse", "sparse"))
      .unionByName(sys(fused, "rank", "fused"))
      .crossJoin(totals)
      .select(col("system"), lit(k.toLong).as("k"), col("n_queries"),
        col("n_hits"), col("n_possible"),
        when(col("n_possible") === lit(0L), lit(0.0))
          .otherwise(r6(col("n_hits").cast("double") / col("n_possible"))).as("recall"))
      .orderBy("system")
  }

  def hybridRecall(spark: SparkSession, dir: String): DataFrame = {
    val (d, s) = frozenHybridLists(spark, dir)
    hybridRecallFrom(Tables.embeddings(spark, dir), d, s)
  }

  lazy val hybridRecallSql: String = {
    val k = HybridTopK
    s"""WITH $hybridCtes,
       |lab AS (SELECT vec_id AS doc_id, label FROM embeddings),
       |qlab AS (SELECT q_id, label AS q_label FROM q JOIN lab ON q.q_id = lab.doc_id),
       |poss AS (
       |  SELECT ql.q_id, count(*) AS n_rel
       |  FROM embeddings x JOIN qlab ql ON x.vec_id <> ql.q_id AND x.label = ql.q_label
       |  GROUP BY 1),
       |totals AS (
       |  SELECT CAST(sum(least($k, coalesce(p.n_rel, 0))) AS BIGINT) AS n_possible,
       |         count(*) AS n_queries
       |  FROM qlab LEFT JOIN poss p ON qlab.q_id = p.q_id),
       |hd AS (SELECT 'dense' AS system,
       |              CAST(coalesce(sum(CASE WHEN l.label = ql.q_label THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits
       |       FROM d JOIN lab l ON d.doc_id = l.doc_id JOIN qlab ql ON d.q_id = ql.q_id
       |       WHERE d.r_dense <= $k),
       |hs AS (SELECT 'sparse' AS system,
       |              CAST(coalesce(sum(CASE WHEN l.label = ql.q_label THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits
       |       FROM s JOIN lab l ON s.doc_id = l.doc_id JOIN qlab ql ON s.q_id = ql.q_id
       |       WHERE s.r_sparse <= $k),
       |hf AS (SELECT 'fused' AS system,
       |              CAST(coalesce(sum(CASE WHEN l.label = ql.q_label THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hits
       |       FROM rk JOIN lab l ON rk.doc_id = l.doc_id JOIN qlab ql ON rk.q_id = ql.q_id
       |       WHERE rk.rank <= $k),
       |u AS (SELECT * FROM hd UNION ALL SELECT * FROM hs UNION ALL SELECT * FROM hf)
       |SELECT u.system, CAST($k AS BIGINT) AS k, t.n_queries, u.n_hits, t.n_possible,
       |       CASE WHEN t.n_possible = 0 THEN 0.0
       |            ELSE ${r6Sql("u.n_hits / CAST(t.n_possible AS DOUBLE)")} END AS recall
       |FROM u CROSS JOIN totals t
       |ORDER BY u.system""".stripMargin
  }

  // ---------------------------------- hybrid retrieval: user-supplied queries
  /** Hybrid scoring of documents against USER-SUPPLIED queries and a
    * FROZEN sparse model — the deployment entry point the fixed-probe
    * rows ([[hybridRrfOn]]) only prove the math of (VERDICT r17 task 3).
    * `rows` carries one document per row with BOTH modalities
    * (doc_id, text, embedding); `queries` is the caller's query table
    * (q_id, q_text, q_emb); `dft`/`stats` are the frozen BM25 corpus
    * statistics for the query vocabulary ([[bm25StatsOn]] convention —
    * train once, score any amount of new text). Returns RAW per-pair
    * scores: every (query, doc) pair with its dense cosine plus the BM25
    * score of the matching-term docs (0 where no query term hits).
    * Stateless per row — [[graft.streaming.Streams.hybridScoreBatches]]
    * runs it unchanged on a streaming frame; global ranking is the
    * consumer's aggregate ([[hybridAgainstOn]] for the one-shot form).
    *
    * 100 TB shape: queries + their vocabulary + the frozen model are
    * broadcast-sized; the dense half is one data scan against the
    * broadcast query matrix (BroadcastNestedLoopJoin — |rows| × |queries|
    * output, query-count-bounded); the sparse half explodes only postings
    * of queried terms. Nothing corpus-sized shuffles. */
  private def hybridPairScores(rows: DataFrame, queries: DataFrame,
                               dft: DataFrame, stats: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(rows.sparkSession)
    val qn = queries.select(col("q_id").as("query_id"), col("q_emb"),
      sqrt(graft.ext.Similarity.fastDot(col("q_emb"), col("q_emb"))).as("q_nrm"))
    val dense = graft.ext.Similarity.withNorm(rows.select(col("doc_id"), col("embedding")))
      .crossJoin(broadcast(qn))
      .select(col("query_id"), col("doc_id"),
        (graft.ext.Similarity.fastDot(col("q_emb"), col("embedding")) /
          (col("q_nrm") * col("nrm"))).as("cos"))
    val qt = queries.select(col("q_id").as("query_id"),
        explode(array_distinct(tokens(col("q_text")))).as("term"))
    val toks = rows.select(col("doc_id"), tokens(col("text")).as("t"))
    val dl = toks.select(col("doc_id"), size(col("t")).cast("long").as("dl"))
    val tf = toks.select(col("doc_id"), explode(col("t")).as("term"))
      .join(broadcast(qt.select("term").distinct()), Seq("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val sparse = bm25ScoreTail(tf, dl, dft, stats, qt)
    dense.join(sparse, Seq("query_id", "doc_id"), "left")
      .select(col("query_id"), col("doc_id"), col("cos"),
        coalesce(col("score"), lit(0.0)).as("score"),
        coalesce(col("n_terms_hit"), lit(0L)).as("n_terms_hit"))
  }

  /** The unranked score form (r6-rounded, unordered) — what the streaming
    * twin emits per batch; union over batches ≡ this over the union. */
  def hybridScoreAgainstOn(rows: DataFrame, queries: DataFrame,
                           dft: DataFrame, stats: DataFrame): DataFrame =
    hybridPairScores(rows, queries, dft, stats)
      .select(col("query_id"), col("doc_id"), r6(col("cos")).as("cos"),
        r6(col("score")).as("bm25"), col("n_terms_hit"))

  /** The one-shot ranked form: per query, the dense list (cos desc — the
    * `s_knn_brute` key) and the sparse list (matching docs only, r9(score)
    * desc — the `t_bm25_topk` key) to `depth`, RRF-fused by the shared
    * [[rrfFuse]] core. Output schema ≡ the fixed-probe `t_hybrid_rrf` row. */
  def hybridAgainstOn(rows: DataFrame, queries: DataFrame,
                      dft: DataFrame, stats: DataFrame,
                      depth: Int = HybridDepth, topK: Int = HybridTopK): DataFrame = {
    // two consumers (dense rank list + sparse rank list): checkpointed so
    // the pair-scoring subtree (corpus tokenize + dense scoring + BM25
    // tail) runs once, not once per rank list (the scd2HistoryOn
    // discipline; lazy — one materialization at the first action)
    val sc = hybridPairScores(rows, queries, dft, stats).localCheckpoint(eager = false)
    val wd = Window.partitionBy("query_id").orderBy(col("cos").desc, col("doc_id"))
    val ws = Window.partitionBy("query_id")
      .orderBy(Num.r9(col("score")).desc, col("doc_id"))
    val d = sc.withColumn("r_dense", row_number().over(wd).cast("long"))
      .filter(col("r_dense") <= lit(depth.toLong))
      .select(col("query_id").as("q_id"), col("doc_id"), col("r_dense"))
    val s = sc.filter(col("n_terms_hit") > lit(0L))
      .withColumn("r_sparse", row_number().over(ws).cast("long"))
      .filter(col("r_sparse") <= lit(depth.toLong))
      .select(col("query_id").as("q_id"), col("doc_id"), col("r_sparse"))
    rrfProject(rrfFuse(d, s, topK))
  }

  /** Fixed demo query table for the registered row: the [[Bm25Queries]]
    * term lists as query TEXT, paired with the embedding of
    * vec_id == q_id as the query VECTOR — arbitrary (text, emb) pairs the
    * corpus does not contain as a unit, exercising the genuinely
    * user-supplied path while staying oracle-reproducible (the oracle
    * rebuilds the same table from the VALUES clause + an embeddings
    * lookup). */
  private def hybridFixedQueries(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val texts = Bm25Queries.groupBy(_._1).view
      .mapValues(_.map(_._2).mkString(" ")).toSeq
      .map { case (qid, t) => (qid, t) }
    texts.toDF("q_id", "q_text")
      .join(broadcast(Tables.embeddings(spark, dir)
        .filter(col("vec_id").isin(texts.map(_._1): _*))
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))), Seq("q_id"))
  }

  /** Frozen sparse-model half for the fixed query set: the query-vocab df
    * table + (n_docs, avgdl) — model-sized (≤ |query vocab| + 1 rows). */
  private val hybridQStatsCache =
    new graft.ops.FrozenCaches.Memo[String, (Seq[(String, Long)], Seq[(Long, Double)])](
      label = "hybrid_q_stats")

  private def frozenHybridQStats(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val qkey = Bm25Queries.map { case (i, t) => s"$i:$t" }.mkString(",")
    val (dftRows, statRows) = hybridQStatsCache.get(dir, qkey) {
      val (dft, stats) = bm25StatsOn(Tables.documents(spark, dir))
      (dft.as[(String, Long)].collect().toSeq,
        stats.as[(Long, Double)].collect().toSeq)
    }
    (dftRows.toDF("term", "df"), statRows.toDF("n_docs", "avgdl"))
  }

  def hybridAgainst(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.documents(spark, dir).select("doc_id", "text")
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
    val (dft, stats) = frozenHybridQStats(spark, dir)
    hybridAgainstOn(rows, hybridFixedQueries(spark, dir), dft, stats)
  }

  /** The registered row's pair-scoring frame alone — package-visible so
    * PlanSpec can pin the scoring plan itself (the qsRawScores
    * convention: the public row checkpoints the scores, so the final
    * frame's plan no longer shows the scoring subtree). */
  private[graft] def hybridAgainstScores(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.documents(spark, dir).select("doc_id", "text")
      .join(Tables.embeddings(spark, dir)
        .select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
    val (dft, stats) = frozenHybridQStats(spark, dir)
    hybridPairScores(rows, hybridFixedQueries(spark, dir), dft, stats)
  }

  /** Oracle: the same dense cross-score + frozen-convention sparse score
    * (stats inline over the identical corpus ≡ the frozen model), ranked
    * and fused with the registered [[hybridRrfSql]] keys. */
  lazy val hybridAgainstSql: String = {
    val qvalues = Bm25Queries.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (qid, ts) =>
        s"(CAST($qid AS BIGINT), '${ts.map(_._2).mkString(" ")}')" }
      .mkString(", ")
    val scoreSql = s"""ln(1 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
         * tf.tf * ${Bm25K1 + 1.0} / (tf.tf + $Bm25K1 * (${1.0 - Bm25B} + $Bm25B * dl.dl / st.avgdl))"""
    s"""WITH qtxt(q_id, q_text) AS (VALUES $qvalues),
       |qe AS (SELECT q.q_id, q.q_text, e.embedding AS q_emb,
       |              ${graft.ext.Similarity.normSql("e.embedding")} AS q_nrm
       |       FROM qtxt q JOIN embeddings e ON e.vec_id = q.q_id),
       |rows0 AS (SELECT d.doc_id, d.text, e.embedding
       |          FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
       |dn AS (SELECT doc_id, embedding, ${graft.ext.Similarity.normSql("embedding")} AS nrm
       |       FROM rows0),
       |dscored AS (
       |  SELECT q.q_id, dn.doc_id,
       |         ${graft.ext.Similarity.dotSql("q.q_emb", "dn.embedding")} / (q.q_nrm * dn.nrm) AS cos
       |  FROM dn CROSS JOIN qe q),
       |d AS (SELECT q_id, doc_id, r_dense FROM (
       |        SELECT q_id, doc_id,
       |               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, doc_id) AS r_dense
       |        FROM dscored) WHERE r_dense <= $HybridDepth),
       |qt AS (SELECT DISTINCT q_id AS query_id, unnest(${tokensSql("q_text")}) AS term FROM qtxt),
       |toks AS (SELECT doc_id, ${tokensSql("text")} AS t FROM rows0),
       |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
       |tf AS (SELECT doc_id, term, count(*) AS tf
       |       FROM (SELECT doc_id, unnest(t) AS term FROM toks)
       |       WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |sc AS (
       |  SELECT qt.query_id AS q_id, tf.doc_id, sum($scoreSql) AS score
       |  FROM qt JOIN tf USING (term) JOIN df USING (term)
       |       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
       |  GROUP BY 1, 2),
       |s AS (SELECT q_id, doc_id, r_sparse FROM (
       |        SELECT q_id, doc_id,
       |               row_number() OVER (PARTITION BY q_id
       |                 ORDER BY ${Num.r9Sql("score")} DESC, doc_id) AS r_sparse
       |        FROM sc) WHERE r_sparse <= $HybridDepth),
       |f AS (
       |  SELECT coalesce(d.q_id, s.q_id) AS q_id,
       |         coalesce(d.doc_id, s.doc_id) AS doc_id,
       |         d.r_dense, s.r_sparse,
       |         coalesce(1.0 / CAST($RrfK + d.r_dense AS DOUBLE), 0.0)
       |           + coalesce(1.0 / CAST($RrfK + s.r_sparse AS DOUBLE), 0.0) AS rrf
       |  FROM d FULL OUTER JOIN s ON d.q_id = s.q_id AND d.doc_id = s.doc_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |         ORDER BY ${Num.r9Sql("rrf")} DESC, doc_id) AS rank FROM f)
       |SELECT q_id AS query_id, CAST(rank AS BIGINT) AS rank, doc_id,
       |       coalesce(r_dense, -1) AS r_dense, coalesce(r_sparse, -1) AS r_sparse,
       |       ${r6Sql("rrf")} AS rrf_score
       |FROM rk WHERE rank <= $HybridTopK ORDER BY query_id, rank""".stripMargin
  }

  // ------------------------------------------------ wordpiece segmentation
  /** Greedy longest-match wordpiece segmentation against a FROZEN,
    * corpus-derived vocabulary — applying a tokenizer, not just counting
    * tokens: the missing piece between the token censuses
    * ([[vocabCoverageOn]], [[tokenFertilityOn]]) and an actual subword
    * pipeline. Vocabulary = every single character seen in corpus words
    * (guarantees total coverage, the `[UNK]`-free wordpiece closure) ∪ the
    * top-`topTokens` most frequent whole tokens of length ≤ `maxPiece`
    * (count desc, token asc — integer-exact rank). Each distinct word is
    * segmented by the standard greedy rule: at every position take the
    * LONGEST vocabulary piece matching there.
    *
    * Spark plan: the greedy next-position function is a finite functional
    * graph, so the per-word piece walk is solved by POINTER DOUBLING —
    * ceil(log₂(maxlen+1)) rounds of self-composition (the
    * `dd_dup_clusters` iterative idiom, localCheckpoint per round) instead
    * of a per-character sequential loop. All joins are equi-joins against
    * a broadcast vocabulary; the explode is |word|×maxPiece per DISTINCT
    * word (lexicon-sized, not corpus-sized). The oracle walks the same
    * function with a recursive CTE — semantically the closure the
    * doubling loop converges to.
    *
    * Registered knobs (4/16) are sized so the synthetic corpus (31
    * distinct words, ≤8 chars) actually exercises multi-piece splits and
    * char fallback; a production vocab would run e.g. (12, 50_000) — the
    * plan shape is knob-independent. */
  val WpMaxPiece = 4
  val WpTopTokens = 16

  def wordpieceOn(docs: DataFrame,
                  maxPiece: Int = WpMaxPiece, topTokens: Int = WpTopTokens): DataFrame = {
    // distinct-word lexicon with counts — reused by the vocab and the walk
    val words = docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .persist()
    val top = words.filter(length(col("w")) <= lit(maxPiece))
      .orderBy(col("n").desc, col("w").asc).limit(topTokens)
      .select(col("w").as("piece"))
    val chars = words
      .select(col("w"), explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(expr("substring(w, i, 1)").as("piece")).distinct()
    val vocab = chars.union(top).distinct()
    // The greedy longest-match walk as ONE row-local fold against the
    // broadcast vocabulary set — the [[uniViterbiOn]] mechanism (round 18;
    // previously a (word, position, length) candidate explode + two
    // persists + a log(maxLen)-round pointer-doubling loop of per-round
    // localCheckpoints). Greedy cuts are inherently sequential per word
    // and words are lexicon rows, so the walk is exactly a fold: at each
    // position on the cut path, take the longest vocab piece (the former
    // `best` table's max l) and jump past it. A position no vocab piece
    // covers stalls the walk — unreachable here because every character
    // of every lexicon word is in `chars` — mirroring the old plan, where
    // a cut with no `best` row dropped out of the reach join.
    val vs = vocab
      .agg(map_from_entries(collect_list(struct(col("piece"), lit(true)))).as("vs"))
    val w = col("w")
    val n = length(w)
    def bl(pos: Column): Column = coalesce(
      (maxPiece to 1 by -1).map { l =>
        when(pos + lit(l) - lit(1) <= n &&
          element_at(col("vs"), w.substr(pos, lit(l))).isNotNull, lit(l))
      }: _*)
    val walk = aggregate(
      sequence(lit(1), n),
      struct(lit(1).as("pos"), lit(0L).as("np"), lit("").as("seg")),
      (acc, i) => {
        val step = bl(acc.getField("pos"))
        when(i === acc.getField("pos") && step.isNotNull,
          struct((acc.getField("pos") + step).as("pos"),
            (acc.getField("np") + lit(1L)).as("np"),
            concat(acc.getField("seg"),
              when(acc.getField("np") > lit(0L), lit(" ")).otherwise(lit("")),
              w.substr(acc.getField("pos"), step)).as("seg")))
          .otherwise(acc)
      })
    words.crossJoin(broadcast(vs))
      .select(w.as("word"), n.cast("long").as("n_chars"),
        walk.getField("np").as("n_pieces"), walk.getField("seg").as("segmentation"))
      .orderBy("word")
  }

  def wordpiece(spark: SparkSession, dir: String): DataFrame =
    wordpieceOn(Tables.documents(spark, dir))

  /** The shared wordpiece CTE chain toks→words→vocab→best→cuts→seg —
    * `seg` is the (w, n_pieces, segmentation) lexicon, reused by the
    * segmentation oracle and the fertility oracle so the two cannot
    * drift. Must be opened with `WITH RECURSIVE`. */
  private def wordpieceCtes: String =
    s"""toks AS (SELECT unnest(${tokensSql("text")}) AS w FROM documents),
       |words AS (SELECT w, count(*) AS n FROM toks GROUP BY 1),
       |top AS (SELECT w AS piece FROM words WHERE length(w) <= $WpMaxPiece
       |        ORDER BY n DESC, w LIMIT $WpTopTokens),
       |chars AS (
       |  SELECT DISTINCT substr(w, CAST(i AS INT), 1) AS piece
       |  FROM (SELECT w, unnest(range(1, length(w) + 1)) AS i FROM words)),
       |vocab AS (SELECT DISTINCT piece FROM
       |          (SELECT piece FROM chars UNION ALL SELECT piece FROM top)),
       |cand AS (
       |  SELECT pw.w, pw.p, l.l
       |  FROM (SELECT w, unnest(range(1, length(w) + 1)) AS p FROM words) pw
       |  CROSS JOIN (SELECT unnest(range(1, ${WpMaxPiece + 1})) AS l) l
       |  WHERE pw.p + l.l - 1 <= length(pw.w)),
       |best AS (
       |  SELECT c.w, c.p, max(c.l) AS bl
       |  FROM cand c JOIN vocab v
       |    ON substr(c.w, CAST(c.p AS INT), CAST(c.l AS INT)) = v.piece
       |  GROUP BY 1, 2),
       |cuts(w, p) AS (
       |  SELECT w, CAST(1 AS BIGINT) FROM words
       |  UNION
       |  SELECT c.w, c.p + b.bl FROM cuts c JOIN best b ON c.w = b.w AND c.p = b.p),
       |seg AS (
       |  SELECT c.w, count(*) AS n_pieces,
       |         string_agg(substr(c.w, CAST(c.p AS INT), CAST(b.bl AS INT)), ' '
       |                    ORDER BY c.p) AS segmentation
       |  FROM cuts c JOIN best b ON c.w = b.w AND c.p = b.p
       |  GROUP BY 1)""".stripMargin

  val wordpieceSql: String =
    s"""WITH RECURSIVE $wordpieceCtes
       |SELECT s.w AS word, CAST(length(s.w) AS BIGINT) AS n_chars,
       |       s.n_pieces, s.segmentation
       |FROM seg s ORDER BY word""".stripMargin

  /** True subword fertility per language — the lexicon ([[wordpieceOn]])
    * applied back to the corpus token stream: subwords per word under the
    * frozen vocab, per lang. Complements [[tokenFertility]]'s
    * length-proxy with the actual tokenizer's number. The corpus pass
    * joins the token stream to the BROADCAST lexicon (distinct words ≪
    * corpus) and partial-aggregates per lang — one narrow shuffle. */
  def wordpieceFertilityOn(docs: DataFrame,
                           maxPiece: Int = WpMaxPiece, topTokens: Int = WpTopTokens): DataFrame = {
    val lex = wordpieceOn(docs, maxPiece, topTokens)
      .select(col("word").as("w"), col("n_pieces"))
    docs.select(col("lang"), explode(tokens(col("text"))).as("w"))
      .join(broadcast(lex), Seq("w"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_subwords"))
      .select(col("lang"), col("n_words"), col("n_subwords"),
        r6(col("n_subwords").cast("double") / col("n_words")).as("fertility"))
      .orderBy("lang")
  }

  def wordpieceFertility(spark: SparkSession, dir: String): DataFrame =
    wordpieceFertilityOn(Tables.documents(spark, dir))

  val wordpieceFertilitySql: String =
    s"""WITH RECURSIVE $wordpieceCtes,
       |ltoks AS (SELECT lang, unnest(${tokensSql("text")}) AS w FROM documents)
       |SELECT t.lang, count(*) AS n_words,
       |       CAST(sum(s.n_pieces) AS BIGINT) AS n_subwords,
       |       ${r6Sql("CAST(sum(s.n_pieces) AS DOUBLE) / count(*)")} AS fertility
       |FROM ltoks t JOIN seg s ON t.w = s.w
       |GROUP BY 1 ORDER BY t.lang""".stripMargin

  // ------------------------------------------------------ BPE merge training
  /** Byte-pair-encoding merge training (Sennrich, Haddow & Birch 2016,
    * arXiv:1508.07909 — the standard learned-tokenizer algorithm;
    * reference analyse.py has no tokenizer, this is pipeline-extension
    * surface): starting from the character segmentation of every distinct
    * word, repeatedly find the adjacent symbol pair with the highest
    * corpus-frequency-weighted count and merge it into one symbol,
    * emitting the learned merge table (rank, pair, merged symbol, count).
    * Ties break (count desc, left asc, right asc) — integer-exact, so
    * both engines learn the identical merge sequence.
    *
    * Segmentations are encoded as delimiter-wrapped symbol strings
    * (`<h><e><l><l><o>`): every symbol is bracketed, so applying a merge
    * is one literal `replace('<a><b>' → '<ab>')` — left-to-right
    * non-overlapping in both engines, which IS greedy BPE application
    * (`<a><a><a>` under merge (a,a) → `<aa><a>`, never `<a><aa>`). The
    * lexicon is restricted to `^[a-z0-9]+$` words so a symbol can never
    * contain the delimiter characters.
    *
    * Scale shape: ONE corpus-linear pass builds the word-frequency census
    * (map-side combinable, lexicon-sized output); every training round is
    * an explode + hash-aggregate over the LEXICON (distinct words), never
    * the corpus — the standard preprocessing trick that makes BPE training
    * corpus-size-independent. Per round only the single best pair (one
    * row, model-sized) reaches the driver; rounds localCheckpoint the
    * lexicon frame (the dd_dup_clusters loop idiom) so plan depth stays
    * constant. The merge table itself is model-sized (≤ [[BpeMerges]]
    * rows). The oracle unrolls the same rounds as a CTE chain (the Lloyd
    * -iteration oracle idiom). */
  /** ORACLE-CHECKABLE ceiling, not a capability limit: the DuckDB oracle
    * unrolls one CTE per merge round, so the registered row trains at 10.
    * Production vocabularies come through the `nMerges` knob — beyond the
    * ceiling the gate is property-based (TextSpec: the n-merge table is a
    * PREFIX of the (n+k)-merge table, segmentations reassemble their
    * words, per-word piece counts are monotone non-increasing in merge
    * count) and the cost shape is measured by
    * [[graft.tools.TokenizerScaleStudy]] (driver jobs scale with merges,
    * per-merge wall is lexicon-bounded — flat across 10× corpus). */
  val BpeMerges = 10
  val BpeMinPair = 2L

  /** The char-wrapped BPE lexicon (w, freq, seg) — one corpus-linear
    * census, shared by training and application. */
  private def bpeLexicon(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("seg", regexp_replace(col("w"), "(.)", "<$1>"))

  def bpeTrainOn(docs: DataFrame, nMerges: Int = BpeMerges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var segs = bpeLexicon(docs).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var done = false
    for (r <- 1 to nMerges if !done) {
      val syms = split(regexp_replace(col("seg"), "^<|>$", ""), "><")
      val prs = when(size(syms) >= lit(2),
          transform(sequence(lit(1), size(syms) - lit(1)),
            i => struct(element_at(syms, i).as("a"), element_at(syms, i + lit(1)).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))
      val best = segs.select(col("freq"), explode(prs).as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .filter(col("cnt") >= lit(BpeMinPair))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r.toLong, a, b, cnt))
        // a, b match ^[a-z0-9]+$ by construction — safe to splice
        segs = segs.withColumn("seg",
          expr(s"replace(seg, '<$a><$b>', '<$a$b>')")).localCheckpoint()
      }
    }
    merges.toSeq.toDF("merge_rank", "left_sym", "right_sym", "cnt")
      .withColumn("merged", concat(col("left_sym"), col("right_sym")))
      .select("merge_rank", "left_sym", "right_sym", "merged", "cnt")
      .orderBy("merge_rank")
  }

  /** Frozen learned merge table per (corpus, rounds) — train once, replay
    * after (the ANN-model convention; the table is model-sized). */
  private val bpeCache =
    new graft.ops.FrozenCaches.Memo[Int, Seq[(Long, String, String, String, Long)]](label = "bpe_merges")

  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = bpeCache.get(dir, BpeMerges) {
      bpeTrainOn(Tables.documents(spark, dir)).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    }
    rows.toDF("merge_rank", "left_sym", "right_sym", "merged", "cnt")
      .orderBy("merge_rank")
  }

  /** Oracle: the same rounds unrolled as a CTE chain. Every per-round CTE
    * is MATERIALIZED — DuckDB CTEs are inlined by default, and each round
    * references its predecessor several times, so the un-materialized
    * chain re-executes exponentially (measured: the 10-round chain
    * exhausted the fd limit re-opening the parquet). The 0-or-1-row
    * `best` table applies via LEFT JOIN ON true + coalesce, mirroring the
    * engine's merge-or-no-op round. */
  private def bpeSymsOf(seg: String): String =
    s"string_split(regexp_replace($seg, '^<|>$$', '', 'g'), '><')"

  /** Shared CTE chain words → seg0 → (pc/best/seg)×rounds — the oracle
    * spine of both the training query (reads the `best` tables) and the
    * application query (reads the final `seg`). */
  private def bpeCtes: String = {
    val rounds = (0 until BpeMerges).map { r =>
      s"""pc$r AS MATERIALIZED (
         |  SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
         |    SELECT s.freq, s.sy[t.i] AS a, s.sy[t.i + 1] AS b
         |    FROM (SELECT freq, ${bpeSymsOf("seg")} AS sy FROM seg$r) s,
         |         unnest(range(1, len(s.sy))) AS t(i))
         |  GROUP BY a, b),
         |best$r AS MATERIALIZED (
         |  SELECT a, b, cnt FROM pc$r WHERE cnt >= $BpeMinPair
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |seg${r + 1} AS MATERIALIZED (
         |  SELECT s.w, s.freq,
         |         coalesce(replace(s.seg, '<' || b.a || '><' || b.b || '>',
         |                          '<' || b.a || b.b || '>'), s.seg) AS seg
         |  FROM seg$r s LEFT JOIN best$r b ON true)""".stripMargin
    }.mkString(",\n")
    s"""words AS MATERIALIZED (
       |  SELECT t.tok AS w, CAST(count(*) AS BIGINT) AS freq
       |  FROM documents, unnest(${tokensSql("text")}) AS t(tok)
       |  WHERE regexp_matches(t.tok, '^[a-z0-9]+$$')
       |  GROUP BY 1),
       |seg0 AS MATERIALIZED (SELECT w, freq, regexp_replace(w, '(.)', '<\\1>', 'g') AS seg FROM words),
       |$rounds""".stripMargin
  }

  val bpeTrainSql: String = {
    val finals = (0 until BpeMerges).map { r =>
      s"""SELECT CAST(${r + 1} AS BIGINT) AS merge_rank, a AS left_sym, b AS right_sym,
         |       a || b AS merged, cnt FROM best$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $bpeCtes
       |$finals
       |ORDER BY merge_rank""".stripMargin
  }

  // ---------------------------------------------------- BPE application
  /** The learned tokenizer APPLIED: every lexicon word segmented under the
    * [[bpeTrainOn]] merge table (merges replayed in rank order — exactly
    * the standard BPE encode step, which applies learned merges in
    * learning order). Pairs with [[wordpieceOn]] the way a production
    * stack pairs trained-BPE with a fixed wordpiece vocab; the registered
    * form replays the FROZEN merge table, so application is N literal
    * replaces over the lexicon — no training aggregates, no loop state.
    * Oracle: the shared CTE chain's FINAL seg table, so training and
    * application can never drift. */
  def bpeSegmentFrom(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val seg0 = bpeLexicon(docs)
    val segd = merges.foldLeft(seg0) { case (df, (a, b)) =>
      // a, b match ^[a-z0-9]+$ by construction — safe to splice
      df.withColumn("seg", expr(s"replace(seg, '<$a><$b>', '<$a$b>')"))
    }
    val syms = split(regexp_replace(col("seg"), "^<|>$", ""), "><")
    segd.select(col("w").as("word"), length(col("w")).cast("long").as("n_chars"),
        size(syms).cast("long").as("n_pieces"),
        array_join(syms, " ").as("segmentation"))
      .orderBy("word")
  }

  def bpeSegmentOn(docs: DataFrame, nMerges: Int = BpeMerges): DataFrame = {
    val merges = bpeTrainOn(docs, nMerges).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    bpeSegmentFrom(docs, merges)
  }

  def bpeSegment(spark: SparkSession, dir: String): DataFrame = {
    val rows = bpeCache.get(dir, BpeMerges) {
      bpeTrainOn(Tables.documents(spark, dir)).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    }
    bpeSegmentFrom(Tables.documents(spark, dir), rows.map(m => (m._2, m._3)))
  }

  val bpeSegmentSql: String =
    s"""WITH $bpeCtes
       |SELECT w AS word, CAST(length(w) AS BIGINT) AS n_chars,
       |       CAST(len(${bpeSymsOf("seg")}) AS BIGINT) AS n_pieces,
       |       array_to_string(${bpeSymsOf("seg")}, ' ') AS segmentation
       |FROM seg$BpeMerges ORDER BY word""".stripMargin

  // ---------------------------------------- unigram-LM tokenizer (SentencePiece-style)
  /** Unigram language-model tokenizer (Kudo 2018, arXiv:1804.10959 — the
    * SentencePiece algorithm), completing the tokenizer trio next to BPE
    * and wordpiece: a SEED vocabulary of frequent substrings is refined by
    * EM — each round Viterbi-segments the lexicon under the current piece
    * probabilities (hard EM, the Viterbi-training variant), re-estimates
    * probabilities from the frequency-weighted piece usage, and prunes
    * multi-char pieces that no best path uses (single chars never prune:
    * the coverage floor). Segmentation is the apply step under the final
    * frozen vocabulary.
    *
    * Float discipline (VERDICT r16 task 3): a piece's score is the
    * MICRONAT integer floor(ln(cnt/total)·1e6 + 0.5) — one float op per
    * (piece, round), re-verified by the oracle gate at both SFs; every
    * Viterbi path comparison downstream is an INTEGER sum, so EM ulps
    * cannot flip a piece. Ties (equal integer path score) break toward
    * the longer FINAL piece, recursively — a unique path: the DP at each
    * position compares (score, piece-length) against predecessors whose
    * own best is unique by induction; equivalently (the oracle's form)
    * the max-score path minimizing the REVERSED start-position list.
    *
    * Scale shape (the BPE discipline): ONE corpus-linear census builds
    * the word-frequency lexicon; every EM round is lexicon-sized. The
    * Viterbi DP is a row-local FOLD over word positions against the
    * broadcast piece→weight map — no loop rounds, no shuffle, no
    * per-character join cascade; a round's only aggregates are the
    * piece-usage count and the probability renormalization (model-sized).
    * The oracle instead ENUMERATES all segmentations per word (recursive
    * CTE) and picks the same maximum — tractable because the lexicon is
    * census-sized, and semantically the closure the DP computes. */
  val UniMaxPiece = 4
  /** ORACLE-CHECKABLE ceiling (the oracle enumerates all segmentations
    * per word): the registered row seeds 24 multi-char pieces. Production
    * vocabularies come through `unigramTrainOn`'s `seedTop` knob — beyond
    * the ceiling the gate is property-based (TextSpec: single-char
    * coverage floor intact, segmentations reassemble, aggregate fertility
    * non-increasing in seed size) with the cost shape measured by
    * [[graft.tools.TokenizerScaleStudy]]. */
  val UniSeedTop = 24
  val UniEmRounds = 2

  /** (piece, cnt) seed: every substring (len ≤ [[UniMaxPiece]]) of every
    * lexicon word, corpus-frequency weighted; all single chars plus the
    * top [[UniSeedTop]] multi-char pieces (cnt desc, piece asc —
    * integer-exact). */
  private def uniSeedOn(lex: DataFrame, seedTop: Int = UniSeedTop): DataFrame = {
    val subs = lex
      .select(col("w"), col("freq"), explode(sequence(lit(1), length(col("w")))).as("p"))
      .select(col("w"), col("freq"), col("p"), explode(sequence(lit(1), lit(UniMaxPiece))).as("l"))
      .filter(col("p") + col("l") - lit(1) <= length(col("w")))
      .select(col("w").substr(col("p"), col("l")).as("piece"), col("freq"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
      .persist() // feeds the char floor AND the top-K pick
    // the seed is model-sized (chars + seedTop rows): materialize it
    // eagerly so the substring cache can be released HERE instead of
    // leaking into a long-lived session (ADVICE r17)
    try subs.filter(length(col("piece")) === 1)
      .unionByName(subs.filter(length(col("piece")) >= 2)
        .orderBy(col("cnt").desc, col("piece")).limit(seedTop))
      .localCheckpoint()
    finally subs.unpersist(blocking = false)
  }

  /** Micronat weights from counts — the ONE float op of the trainer. */
  private def uniWeighted(vocab: DataFrame): DataFrame = {
    val tot = vocab.agg(sum(col("cnt")).as("tot"))
    vocab.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        floor(log(col("cnt").cast("double") / col("tot")) * lit(1e6) + lit(0.5))
          .cast("long").as("wgt"))
  }

  /** Viterbi best segmentation of every lexicon word under a weighted
    * vocabulary — the integer DP as one row-local fold. Returns
    * (w, freq, starts) where starts are the 1-based piece start
    * positions of the unique best path. */
  private def uniViterbiOn(lex: DataFrame, vocab: DataFrame): DataFrame = {
    val vm = vocab.agg(map_from_entries(collect_list(struct(col("piece"), col("wgt")))).as("vm"))
    val n = length(col("w"))
    val dp = aggregate(
      sequence(lit(2), n + lit(1)),
      array(struct(lit(0L).as("score"), array().cast("array<int>").as("starts"))),
      (acc: Column, p: Column) => {
        val cands = filter(
          transform(sequence(lit(1), least(lit(UniMaxPiece), p - lit(1))),
            l => {
              val j = (p - l).cast("int")
              val prev = element_at(acc, j)
              val wgt = element_at(col("vm"), col("w").substr(j, l.cast("int")))
              // prev-score guard: under a caller-supplied vocab a position
              // can be UNREACHABLE (its dp entry is the null max of an
              // empty candidate set) — extending it would smuggle a
              // null-score struct into later comparisons
              when(wgt.isNotNull && prev.getField("score").isNotNull, struct(
                (prev.getField("score") + wgt).as("score"),
                l.as("l"),
                concat(prev.getField("starts"), array(j)).as("starts")))
            }),
          c => c.isNotNull)
        // struct max = (score, then piece length); ties cannot reach the
        // starts field (same l ⇒ same predecessor ⇒ identical candidate)
        val best = array_max(cands)
        concat(acc, array(struct(best.getField("score").as("score"),
          best.getField("starts").as("starts"))))
      })
    lex.crossJoin(broadcast(vm))
      .select(col("w"), col("freq"),
        element_at(dp, (n + lit(1)).cast("int")).getField("starts").as("starts"))
  }

  /** Piece strings of a (w, starts) row — start-delta substrings. */
  private def uniPieces: Column = {
    val s = col("starts")
    transform(sequence(lit(1), size(s)), i =>
      col("w").substr(element_at(s, i),
        coalesce(element_at(s, i + lit(1)), length(col("w")) + lit(1)) - element_at(s, i)))
  }

  /** The EM trainer over a caller-supplied corpus — compositional form;
    * the registered rows replay the FROZEN vocabulary. */
  def unigramTrainOn(docs: DataFrame, rounds: Int = UniEmRounds,
                     seedTop: Int = UniSeedTop): DataFrame = {
    val lex = bpeLexicon(docs).select("w", "freq").persist()
    // every lex consumer (seed + each EM round) lands in an EAGER
    // localCheckpoint, so the lexicon cache is released before returning
    // (ADVICE r17) — the returned frame depends only on the final vocab
    try {
      var vocab = uniWeighted(uniSeedOn(lex, seedTop)).localCheckpoint()
      for (_ <- 1 to rounds) {
        val counts = uniViterbiOn(lex, vocab)
          .select(col("freq"), explode(uniPieces).as("piece"))
          .groupBy("piece").agg(sum(col("freq")).as("used"))
        vocab = uniWeighted(
          vocab.select("piece").join(counts, Seq("piece"), "left")
            .select(col("piece"),
              (coalesce(col("used"), lit(0L)) +
                when(length(col("piece")) === 1, lit(1L)).otherwise(lit(0L))).as("cnt"))
            .filter(col("cnt") > lit(0L)))
          .localCheckpoint()
      }
      vocab.select(col("piece"), length(col("piece")).cast("long").as("n_chars"),
          col("cnt"), col("wgt").as("weight"))
        .orderBy("piece")
    } finally lex.unpersist(blocking = false)
  }

  /** Frozen trained vocabulary per (corpus, knobs) — model-sized, the
    * bpe_merges convention. */
  private val uniCache =
    new graft.ops.FrozenCaches.Memo[(Int, Int, Int), Seq[(String, Long, Long, Long)]](
      label = "unigram_vocab")

  private def frozenUnigram(spark: SparkSession, dir: String): Seq[(String, Long, Long, Long)] =
    uniCache.get(dir, (UniMaxPiece, UniSeedTop, UniEmRounds)) {
      unigramTrainOn(Tables.documents(spark, dir)).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    }

  def unigramTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    frozenUnigram(spark, dir).toDF("piece", "n_chars", "cnt", "weight")
      .orderBy("piece")
  }

  /** The apply step: the corpus lexicon Viterbi-segmented under a given
    * trained vocabulary (piece, weight). A word the vocabulary cannot
    * fully cover (possible only for caller-supplied vocabs — trained
    * vocabularies carry the single-char coverage floor) has no complete
    * path and is OMITTED, matching the oracle twin's semantics, instead
    * of surfacing a null-starts garbage row. */
  def unigramSegmentFrom(docs: DataFrame, vocab: DataFrame): DataFrame =
    uniViterbiOn(bpeLexicon(docs).select("w", "freq"), vocab)
      .filter(col("starts").isNotNull)
      .select(col("w").as("word"), length(col("w")).cast("long").as("n_chars"),
        size(col("starts")).cast("long").as("n_pieces"),
        concat_ws(" ", uniPieces).as("segmentation"))
      .orderBy("word")

  def unigramSegmentOn(docs: DataFrame, rounds: Int = UniEmRounds): DataFrame =
    unigramSegmentFrom(docs,
      unigramTrainOn(docs, rounds).select(col("piece"), col("weight").as("wgt")))

  def unigramSegment(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    unigramSegmentFrom(Tables.documents(spark, dir),
      frozenUnigram(spark, dir).toDF("piece", "n_chars", "cnt", "wgt")
        .select("piece", "wgt"))
  }

  /** The shared oracle CTE chain: seed → (paths/best/counts/vocab) per
    * unrolled EM round (the Lloyd/BPE idiom; paths enumerate ALL
    * segmentations recursively, best picks max score then min reversed
    * starts — the DP's unique path). Emits `uvoc$r` for each round r and
    * `useg` (w, freq, starts, n_pieces, segmentation) under the final
    * vocabulary. Must be opened with WITH RECURSIVE. */
  private def uniCtes: String = {
    def wgtSql(rel: String): String =
      s"""SELECT piece, CAST(cnt AS BIGINT) AS cnt,
         |       CAST(floor(ln(cnt / CAST(t.tot AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS wgt
         |FROM $rel, (SELECT sum(cnt) AS tot FROM $rel) t""".stripMargin
    def pathsSql(r: Int): String =
      s"""upaths$r(w, freq, p, score, starts) AS (
         |  SELECT w, freq, CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST([] AS BIGINT[]) FROM uwords
         |  UNION ALL
         |  SELECT pa.w, pa.freq, pa.p + v.l, pa.score + v.wgt, list_append(pa.starts, pa.p)
         |  FROM upaths$r pa
         |  JOIN (SELECT piece, wgt, length(piece) AS l FROM uvoc$r) v
         |    ON pa.p + v.l - 1 <= length(pa.w)
         |   AND substr(pa.w, CAST(pa.p AS INT), CAST(v.l AS INT)) = v.piece),
         |ubest$r AS MATERIALIZED (
         |  SELECT w, freq, starts FROM (
         |    SELECT w, freq, starts,
         |           row_number() OVER (PARTITION BY w
         |             ORDER BY score DESC, list_reverse(starts)) AS rn
         |    FROM upaths$r WHERE p = length(w) + 1)
         |  WHERE rn = 1)""".stripMargin
    def piecesOf(rel: String): String =
      s"""unnest(list_transform(starts, (st, i) ->
         |  substr(w, CAST(st AS INT),
         |         CAST(coalesce(starts[CAST(i + 1 AS INT)], length(w) + 1) - st AS INT))))""".stripMargin
    val rounds = (0 until UniEmRounds).map { r =>
      s"""${pathsSql(r)},
         |ucnt$r AS (
         |  SELECT piece, CAST(sum(freq) AS BIGINT) AS used
         |  FROM (SELECT freq, ${piecesOf(s"ubest$r")} AS piece FROM ubest$r)
         |  GROUP BY 1),
         |uvc${r + 1} AS (
         |  SELECT v.piece,
         |         coalesce(c.used, 0) + CASE WHEN length(v.piece) = 1 THEN 1 ELSE 0 END AS cnt
         |  FROM uvoc$r v LEFT JOIN ucnt$r c ON v.piece = c.piece
         |  WHERE coalesce(c.used, 0) + CASE WHEN length(v.piece) = 1 THEN 1 ELSE 0 END > 0),
         |uvoc${r + 1} AS MATERIALIZED (${wgtSql(s"uvc${r + 1}")})""".stripMargin
    }.mkString(",\n")
    s"""uwords AS MATERIALIZED (
       |  SELECT t.tok AS w, CAST(count(*) AS BIGINT) AS freq
       |  FROM documents, unnest(${tokensSql("text")}) AS t(tok)
       |  WHERE regexp_matches(t.tok, '^[a-z0-9]+$$')
       |  GROUP BY 1),
       |usub AS MATERIALIZED (
       |  SELECT substr(w, CAST(p.p AS INT), CAST(l.l AS INT)) AS piece,
       |         CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM uwords, unnest(range(1, length(w) + 1)) AS p(p),
       |       unnest(range(1, ${UniMaxPiece + 1})) AS l(l)
       |  WHERE p.p + l.l - 1 <= length(w)
       |  GROUP BY 1),
       |useed AS MATERIALIZED (
       |  SELECT piece, cnt FROM usub WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (SELECT piece, cnt FROM usub WHERE length(piece) >= 2
       |                          ORDER BY cnt DESC, piece LIMIT $UniSeedTop)),
       |uvoc0 AS MATERIALIZED (${wgtSql("useed")}),
       |$rounds,
       |${pathsSql(UniEmRounds)},
       |useg AS MATERIALIZED (
       |  SELECT w, freq, starts, CAST(len(starts) AS BIGINT) AS n_pieces,
       |         array_to_string(list_transform(starts, (st, i) ->
       |           substr(w, CAST(st AS INT),
       |                  CAST(coalesce(starts[CAST(i + 1 AS INT)], length(w) + 1) - st AS INT))), ' ')
       |           AS segmentation
       |  FROM ubest$UniEmRounds)""".stripMargin
  }

  lazy val unigramTrainSql: String =
    s"""WITH RECURSIVE $uniCtes
       |SELECT piece, CAST(length(piece) AS BIGINT) AS n_chars, cnt, wgt AS weight
       |FROM uvoc$UniEmRounds ORDER BY piece""".stripMargin

  lazy val unigramSegmentSql: String =
    s"""WITH RECURSIVE $uniCtes
       |SELECT w AS word, CAST(length(w) AS BIGINT) AS n_chars, n_pieces, segmentation
       |FROM useg ORDER BY word""".stripMargin

  // ------------------------------------- tokenizer fertility comparison
  /** The three learned tokenizers compared on the SAME per-lang token
    * stream (the BPE-safe `^[a-z0-9]+$` subset, so every tokenizer
    * segments the identical word multiset): subwords per word under each
    * frozen model — the table a pipeline owner reads to pick the
    * tokenizer (and budget the token count) for a given language mix.
    * One corpus-linear stream pass per tokenizer against its broadcast
    * lexicon; n_words agrees across tokenizers by construction. */
  def tokenizerFertilityFrom(docs: DataFrame, bpeLex: DataFrame,
                             uniLex: DataFrame, wpLex: DataFrame): DataFrame = {
    // ONE corpus pass: aggregate the token stream to the per-(lang, word)
    // census up front — lexicon×lang-sized — and run the three tokenizer
    // comparisons over the census (round 18; previously the corpus-sized
    // (lang, w) stream was persisted and re-passed once per tokenizer).
    // n_words = Σcnt and n_subwords = Σcnt·n_pieces reproduce the
    // stream-join integers exactly: a lang has a matched occurrence iff
    // it has a matched census word, so the group sets agree too.
    val census = docs.select(col("lang"), explode(tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
      .groupBy("lang", "w").agg(count(lit(1)).as("cnt"))
      .persist() // three joins, one census pass each
    def side(lex: DataFrame, name: String): DataFrame =
      census.join(broadcast(lex.select(col("word").as("w"), col("n_pieces"))), Seq("w"))
        .groupBy("lang")
        .agg(sum(col("cnt")).as("n_words"),
          sum(col("cnt") * col("n_pieces")).as("n_subwords"))
        .select(lit(name).as("tokenizer"), col("lang"), col("n_words"), col("n_subwords"),
          r6(col("n_subwords").cast("double") / col("n_words")).as("fertility"))
    // the comparison table is (3 × langs) rows: materialize it eagerly so
    // the census cache is released HERE rather than left for the bench's
    // blanket unpersist (ADVICE r17 — a notebook session would accumulate
    // one cache per call)
    try side(bpeLex, "bpe")
      .unionByName(side(uniLex, "unigram"))
      .unionByName(side(wpLex, "wordpiece"))
      .orderBy("tokenizer", "lang")
      .localCheckpoint()
    finally census.unpersist(blocking = false)
  }

  def tokenizerFertilityOn(docs: DataFrame): DataFrame =
    tokenizerFertilityFrom(docs, bpeSegmentOn(docs), unigramSegmentOn(docs), wordpieceOn(docs))

  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    // frozen models: the BPE merge table and the unigram vocabulary replay
    val docs = Tables.documents(spark, dir)
    tokenizerFertilityFrom(docs, bpeSegment(spark, dir), unigramSegment(spark, dir),
      wordpiece(spark, dir))
  }

  lazy val tokenizerFertilitySql: String =
    s"""WITH stream AS (
       |  SELECT lang, t.tok AS w
       |  FROM documents, unnest(${tokensSql("text")}) AS t(tok)
       |  WHERE regexp_matches(t.tok, '^[a-z0-9]+$$')),
       |bseg AS (SELECT word AS w, n_pieces FROM ($bpeSegmentSql)),
       |useg2 AS (SELECT word AS w, n_pieces FROM ($unigramSegmentSql)),
       |wseg AS (SELECT word AS w, n_pieces FROM ($wordpieceSql)),
       |sides AS (
       |  SELECT 'bpe' AS tokenizer, s.lang, count(*) AS n_words,
       |         CAST(sum(b.n_pieces) AS BIGINT) AS n_subwords
       |  FROM stream s JOIN bseg b ON s.w = b.w GROUP BY 2
       |  UNION ALL
       |  SELECT 'unigram', s.lang, count(*), CAST(sum(u.n_pieces) AS BIGINT)
       |  FROM stream s JOIN useg2 u ON s.w = u.w GROUP BY 2
       |  UNION ALL
       |  SELECT 'wordpiece', s.lang, count(*), CAST(sum(p.n_pieces) AS BIGINT)
       |  FROM stream s JOIN wseg p ON s.w = p.w GROUP BY 2)
       |SELECT tokenizer, lang, n_words, n_subwords,
       |       ${r6Sql("n_subwords / CAST(n_words AS DOUBLE)")} AS fertility
       |FROM sides ORDER BY tokenizer, lang""".stripMargin

  val all: Seq[Q] = Seq(
    Q("t_text_stats", textStats _, textStatsSql),
    Q("t_bpe_train", bpeTrain _, bpeTrainSql),
    Q("t_bpe_segment", bpeSegment _, bpeSegmentSql),
    Q("t_unigram_train", unigramTrain _, unigramTrainSql),
    Q("t_unigram_segment", unigramSegment _, unigramSegmentSql),
    Q("t_tokenizer_fertility", tokenizerFertility _, tokenizerFertilitySql),
    Q("t_wordpiece", wordpiece _, wordpieceSql),
    Q("t_wordpiece_fertility", wordpieceFertility _, wordpieceFertilitySql),
    Q("t_quality_filter", qualityFilter _, qualityFilterSql),
    Q("t_pii_scrub", piiScrub _, piiScrubSql),
    Q("t_ngram_freq", ngramFreq _, ngramFreqSql),
    Q("t_lang_id", langId _, langIdSql),
    Q("t_langid_confusion", langIdConfusion _, langIdConfusionSql),
    Q("t_token_count", tokenCount _, tokenCountSql),
    Q("t_token_fertility", tokenFertility _, tokenFertilitySql),
    Q("t_fingerprint", fingerprint _, fingerprintSql),
    Q("t_winnow_fp", winnowFingerprints _, winnowFingerprintsSql),
    Q("t_repetition", repetitionStats _, repetitionStatsSql),
    Q("t_tfidf_keywords", tfidfKeywords _, tfidfKeywordsSql),
    Q("t_heavy_hitters", heavyHitters _, heavyHittersSql),
    Q("t_lm_fluency", lmFluency _, lmFluencySql),
    Q("t_token_entropy", tokenEntropy _, tokenEntropySql),
    Q("t_vocab_coverage", vocabCoverage _, vocabCoverageSql),
    Q("t_bigram_pmi", bigramPmi _, bigramPmiSql),
    Q("t_bm25_topk", bm25TopK _, bm25TopKSql),
    Q("t_hybrid_rrf", hybridRrf _, hybridRrfSql),
    Q("t_hybrid_recall", hybridRecall _, hybridRecallSql),
    Q("t_hybrid_against", hybridAgainst _, hybridAgainstSql),
  )
}
