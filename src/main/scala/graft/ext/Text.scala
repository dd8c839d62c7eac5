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
    * list_filter(string_split_regex(...)). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  def tokensSql(text: String): String =
    s"list_filter(string_split_regex($text, '\\s+'), t -> t <> '')"

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")
  private val punctClass = "[!-/:-@\\[-`{-~]" // ASCII punctuation ranges — same regex dialect on both engines

  /** Per-document quality metrics: token count, mean token length,
    * punctuation ratio, stopword ratio, and a composite quality score —
    * the length/punct/stopword heuristics of C4/Gopher-style filters. */
  /** Unsorted per-doc stats — pure row-local projections, so the frame
    * streams unchanged (the quality filter's streaming twin builds on
    * this); the registry query adds the presentation sort. */
  def textStatsRowsOn(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
    val stopHits = size(filter(toks, t => t.isInCollection(stopwords))).cast("long")
    val base = docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("len_chars", length(col("text")).cast("long"))
      .withColumn("sum_token_len", sumLen)
      .withColumn("n_punct", regexp_count(col("text"), lit(punctClass)).cast("long"))
      .withColumn("n_stop", stopHits)
      // nullif guards: x / 0 must be NULL (the coerce-to-null convention and
      // the DuckDB behavior) even on a stock session with ANSI mode ON —
      // library callers' sessions don't get the harness's ansi=false
      .withColumn("avg_token_len", col("sum_token_len") / nullif(col("n_tokens"), lit(0L)))
      .withColumn("punct_ratio", col("n_punct") / nullif(col("len_chars"), lit(0L)))
      .withColumn("stop_ratio", col("n_stop") / nullif(col("n_tokens"), lit(0L)))
    base
      .withColumn("quality_score", r6(
        (least(lit(1.0), col("n_tokens") / lit(100.0))
          + (lit(1.0) - least(lit(1.0), col("punct_ratio") * lit(10.0)))
          + least(lit(1.0), col("stop_ratio") * lit(5.0))) / lit(3.0)))
      .select(col("doc_id"), col("n_tokens"), col("len_chars"),
        r6(col("avg_token_len")).as("avg_token_len"),
        r6(col("punct_ratio")).as("punct_ratio"),
        r6(col("stop_ratio")).as("stop_ratio"),
        col("quality_score"))
  }

  def textStatsOn(docs: DataFrame): DataFrame =
    textStatsRowsOn(docs).orderBy("doc_id")

  def textStats(spark: SparkSession, dir: String): DataFrame =
    textStatsOn(Tables.documents(spark, dir))

  private val stopList = stopwords.map(s => s"'$s'").mkString("(", ", ", ")")

  val textStatsSql: String =
    s"""WITH base AS (
       |  SELECT doc_id,
       |         CAST(len(${tokensSql("text")}) AS BIGINT) AS n_tokens,
       |         CAST(length(text) AS BIGINT) AS len_chars,
       |         CAST(coalesce(list_sum(list_transform(${tokensSql("text")}, t -> length(t))), 0) AS BIGINT) AS sum_token_len,
       |         CAST(len(regexp_extract_all(text, '$punctClass')) AS BIGINT) AS n_punct,
       |         CAST(len(list_filter(${tokensSql("text")}, t -> t IN $stopList)) AS BIGINT) AS n_stop
       |  FROM documents),
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

  def fingerprintOn(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("fp")
    docs
      .withColumn("fp", md5(normalized(col("text"))))
      .withColumn("canonical_doc_id", min(col("doc_id")).over(w))
      .withColumn("is_canonical", when(col("doc_id") === col("canonical_doc_id"), lit(1L)).otherwise(lit(0L)))
      .select("doc_id", "fp", "canonical_doc_id", "is_canonical")
      .orderBy("doc_id")
  }

  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    fingerprintOn(Tables.documents(spark, dir))

  val fingerprintSql: String =
    """WITH fps AS (
      |  SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp FROM documents)
      |SELECT doc_id, fp,
      |       min(doc_id) OVER (PARTITION BY fp) AS canonical_doc_id,
      |       CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY fp) THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
      |FROM fps ORDER BY doc_id""".stripMargin

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

  val winnowFingerprintsSql: String = {
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
    val toks = tokens(col("text"))
    val grams = when(size(toks) >= lit(2),
      transform(sequence(lit(0), size(toks) - lit(2)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(2)))))
      .otherwise(array().cast("array<string>"))
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
       |  SELECT unnest(CASE WHEN len(t) >= 2
       |                THEN list_transform(range(0, len(t) - 1), i -> array_to_string((t)[i+1:i+2], ' '))
       |                ELSE [] END) AS gram
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
      .filter(col("n_tokens") >= lit(MinTokens) &&
        (col("punct_ratio") < lit(MaxPunctRatio) || col("punct_ratio").isNull) &&
        col("quality_score") >= lit(MinQuality))
      .select("doc_id", "n_tokens", "punct_ratio", "quality_score")

  def qualityFilterOn(docs: DataFrame): DataFrame =
    qualityFilterRowsOn(docs).orderBy("doc_id")

  def qualityFilter(spark: SparkSession, dir: String): DataFrame =
    qualityFilterOn(Tables.documents(spark, dir))

  val qualityFilterSql: String =
    s"""WITH stats AS ($textStatsSql)
       |SELECT doc_id, n_tokens, punct_ratio, quality_score
       |FROM stats
       |WHERE n_tokens >= $MinTokens
       |  AND (punct_ratio < $MaxPunctRatio OR punct_ratio IS NULL)
       |  AND quality_score >= $MinQuality
       |ORDER BY doc_id""".stripMargin

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

  val all: Seq[Q] = Seq(
    Q("t_text_stats", textStats _, textStatsSql),
    Q("t_quality_filter", qualityFilter _, qualityFilterSql),
    Q("t_pii_scrub", piiScrub _, piiScrubSql),
    Q("t_ngram_freq", ngramFreq _, ngramFreqSql),
    Q("t_lang_id", langId _, langIdSql),
    Q("t_token_count", tokenCount _, tokenCountSql),
    Q("t_fingerprint", fingerprint _, fingerprintSql),
    Q("t_winnow_fp", winnowFingerprints _, winnowFingerprintsSql),
  )
}
