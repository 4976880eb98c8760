package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline operators.
  *
  * Everything here is a native Catalyst expression tree (higher-order array
  * functions + xxhash64) — no UDFs, so the whole pipeline stays inside
  * whole-stage codegen and scales linearly with input bytes. That matters:
  * at 100 TB, a Python/Scala UDF in the shingle loop would dominate runtime.
  */
object TextFns {

  /** Lowercased whitespace tokens, empty strings dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > lit(0))

  /** k-word shingles ("n-grams of tokens") as strings. Documents shorter
    * than k yield one shingle (the whole document) so they still hash.
    */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) <= lit(k), array(concat_ws(" ", toks)))
      .otherwise(
        transform(
          sequence(lit(1), size(toks) - lit(k - 1)),
          i => concat_ws(" ", slice(toks, i, lit(k)))))

  /** xxhash64 of every shingle. */
  def shingleHashes(shingleArr: Column): Column =
    transform(shingleArr, s => xxhash64(s))

  /** MinHash signature (array<long> of length numHashes) from shingle hashes.
    * Delegates to the codegen'd kernel — the declarative aggregate/transform
    * formulation is interpreted and ~10⁴× slower (measured 130ms/doc).
    */
  def minhashSignature(hashes: Column, numHashes: Int): Column =
    graft.expressions.HashExprs.minhashSignature(hashes, numHashes)

  /** LSH band keys: split the signature into `bands` bands of `rowsPerBand`
    * and hash each band. Returns array<long> of length `bands`.
    */
  def lshBands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      j => xxhash64(slice(signature, j * lit(rowsPerBand) + lit(1), lit(rowsPerBand)), j))

  /** Estimated Jaccard similarity from two MinHash signatures: fraction of
    * matching components.
    */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    aggregate(
      zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0),
      (acc, v) => acc + v).cast("double") / size(sigA).cast("double")

  /** Exact Jaccard similarity of two string arrays (as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    size(array_intersect(da, db)).cast("double") /
      (size(da) + size(db) - size(array_intersect(da, db))).cast("double")
  }

  /** 64-bit SimHash over tokens: each token-hash votes ±1 on every bit, the
    * sign of the vote sum sets the output bit. Codegen'd kernel.
    */
  def simhash64(toks: Column): Column =
    graft.expressions.HashExprs.simhash64(transform(toks, t => xxhash64(t)))

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Rolling-hash document fingerprints (winnowing-style, Schleimer et al.
    * SIGMOD'03): hash char k-grams, keep the minimum hash in each sliding
    * window of `window` k-grams, distinct the result (first-occurrence
    * order). One fused kernel pass per document — the declarative
    * transform/slice/array_min chain this replaces was interpreted and
    * measured ~100ms/doc (50s for the sf0.1 bench; the kernel is ~1000×
    * that). Adds `fp` (array<long>).
    */
  def withFingerprints(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      k: Int,
      window: Int,
      out: String = "fp"): org.apache.spark.sql.DataFrame =
    df.withColumn(out, graft.expressions.TextKernels.winnowFingerprint(col(textCol), k, window))

  // --- Language identification (stopword-count heuristic) ------------------

  /** Marker stopwords per language. Deliberately tiny and deterministic so
    * the DuckDB oracle can mirror the scoring exactly.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "y", "que", "es", "un", "en"),
    "fr" -> Seq("le", "la", "de", "et", "est", "un", "une", "que"))

  /** Count of tokens contained in `words` (with repeats). */
  def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t))).cast("long")

  /** Predicted language: argmax of marker counts, ties broken by the fixed
    * language order above; "und" (undetermined) when all scores are zero.
    */
  def langId(toks: Column): Column = {
    val scores = langMarkers.map { case (lang, words) => lang -> markerCount(toks, words) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in fixed order) reaching the max wins the tie-break
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && s > lit(0L), lit(lang)).otherwise(acc)
    }
  }

  // --- Quality scoring ------------------------------------------------------

  /** Document quality features + a composite score, all exactly mirrorable
    * in ANSI SQL: token count, mean token length, punctuation ratio,
    * stopword ratio (English markers).
    */
  /** Corpus text normalization — the canonical pre-hash cleanup a training
    * pipeline runs before exact/near dedup (so that formatting noise never
    * defeats dedup): strip markup tags, URLs, e-mail addresses, and control
    * characters; lowercase; collapse runs of whitespace; trim. Pure
    * `regexp_replace` chains — codegen'd, one scan pass, no UDF.
    *
    * Patterns stay inside the regex subset Java and RE2 agree on, so the
    * DuckDB oracle can reproduce them verbatim.
    */
  def normalize(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    val noUrls = regexp_replace(noTags, "https?://[^ \\t\\n\\r]+", " ")
    val noMail = regexp_replace(noUrls, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", " ")
    val noCtl = regexp_replace(noMail, "[\\x00-\\x1f]", " ")
    trim(regexp_replace(lower(noCtl), "  +", " "))
  }

  /** PII patterns shared by [[redactPii]] and [[piiCounts]] — kept to the
    * Java/RE2-common regex subset (no lookaround, no backrefs) so a SQL
    * oracle evaluates them byte-identically.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhonePattern = "\\+?[0-9][0-9 -]{7,}[0-9]"

  /** PII redaction — the scrub a training corpus runs before anything else
    * sees the text: e-mails, IPv4 addresses, and phone-shaped digit runs
    * are replaced with typed placeholder tokens. Order matters and is
    * fixed: e-mails first (they contain dotted digit runs), then IPs (dots
    * block the phone pattern from crossing them), then phones. A codegen
    * `regexp_replace` chain — one scan pass, no UDF.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Per-kind PII match counts, mirroring [[redactPii]]'s replacement order
    * exactly: IPs are counted on e-mail-blanked text and phones on
    * e-mail-and-IP-blanked text, so a digit run inside an e-mail can never
    * double-count as a phone.
    */
  def piiCounts(text: Column): Map[String, Column] = {
    val noMail = regexp_replace(text, EmailPattern, " ")
    val noIp = regexp_replace(noMail, Ipv4Pattern, " ")
    Map(
      "n_emails" -> regexp_count(text, lit(EmailPattern)).cast("long"),
      "n_ips" -> regexp_count(noMail, lit(Ipv4Pattern)).cast("long"),
      "n_phones" -> regexp_count(noIp, lit(PhonePattern)).cast("long"))
  }

  /** How many normalization-target tokens the raw text carried (markup,
    * URLs, e-mails) — a cheap data-quality signal alongside [[normalize]].
    */
  def noiseCount(text: Column): Column =
    (regexp_count(text, lit("<[^>]*>")) +
      regexp_count(text, lit("https?://[^ \\t\\n\\r]+")) +
      regexp_count(text, lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"))).cast("long")

  def qualityFeatures(text: Column): Map[String, Column] = {
    val toks = tokens(text)
    val nToks = size(toks).cast("long")
    val meanLen = when(nToks > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long")).cast("double") / nToks.cast("double"))
      .otherwise(lit(0.0))
    val nPunct = regexp_count(text, lit("[.,!?;:]")).cast("long")
    val punctRatio = when(length(text) > 0, nPunct.cast("double") / length(text).cast("double"))
      .otherwise(lit(0.0))
    val nStop = markerCount(toks, langMarkers.head._2)
    val stopRatio = when(nToks > 0, nStop.cast("double") / nToks.cast("double")).otherwise(lit(0.0))
    Map(
      "n_tokens" -> nToks,
      "mean_token_len" -> meanLen,
      "punct_ratio" -> punctRatio,
      "stopword_ratio" -> stopRatio)
  }
}
