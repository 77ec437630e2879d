package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline surface
  * (SURVEY.md §2c D4): tokenization, quality scoring, language-ID
  * heuristic, shingling, fingerprinting. All pure column expressions
  * (codegen'd) — no UDFs.
  */
object TextFunctions {

  /** Word tokens: maximal runs of letters/digits, lowercased. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: alnum runs + punctuation marks each
    * count; long alnum runs count ceil(len/4) pieces (a public
    * rule-of-thumb approximation of byte-pair tokenizers). */
  def approxBpeTokenCount(text: Column): Column = {
    val pieces = transform(
      regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)),
      t => ceil(length(t).cast("double") / 4.0).cast("long"))
    aggregate(pieces, lit(0L), (a, x) => a + x)
  }

  def charCount(text: Column): Column = length(text)

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,;:!?'\"()\\[\\]{}-]"), lit(0)))

  def punctRatio(text: Column): Column =
    punctCount(text).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))

  private val defaultStopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  def stopwordCount(text: Column, stopwords: Seq[String] = defaultStopwords): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords)))

  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column =
    stopwordCount(text, stopwords).cast("double") /
      greatest(tokenCount(text).cast("double"), lit(1.0))

  /** Mean token length. */
  def meanTokenLen(text: Column): Column =
    aggregate(transform(tokens(text), t => length(t).cast("double")),
      lit(0.0), (a, x) => a + x) /
      greatest(tokenCount(text).cast("double"), lit(1.0))

  /** Composite quality score in [0,1]: penalizes extreme length, high
    * punctuation density, and stopword-free (unnatural) text. A
    * deterministic heuristic in the spirit of public quality-filter
    * pipelines (Gopher/C4 rules). */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val lenScore = when(n < 5, n / 5.0)
      .when(n > 5000, lit(0.2))
      .otherwise(1.0)
    val punctScore = when(punctRatio(text) > 0.2, 0.3).otherwise(1.0)
    val stopScore = when(stopwordRatio(text) < 0.005, 0.5).otherwise(1.0)
    round(lenScore * punctScore * stopScore, 6)
  }

  /** Character-n-gram profiles per language for the language-ID
    * heuristic: score = count of marker-token hits. Markers are common
    * function words of each language (public knowledge). */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "une"),
    "es" -> Seq("el", "los", "las", "es", "por", "para", "una", "que"),
    "zh" -> Seq.empty) // zh detected by CJK codepoints, not tokens

  /** n-gram-heuristic language ID: argmax of marker-hit ratios, with a
    * CJK-codepoint check for zh; 'und' when nothing scores. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val n = greatest(size(toks).cast("double"), lit(1.0))
    val scores: Seq[(String, Column)] = langMarkers.map {
      case ("zh", _) =>
        "zh" -> (size(regexp_extract_all(text, lit("[\\u4e00-\\u9fff]"), lit(0)))
          .cast("double") / greatest(length(text).cast("double"), lit(1.0)) * 4.0)
      case (lang, markers) =>
        lang -> (size(filter(toks, t => t.isInCollection(markers))).cast("double") / n)
    }
    // argmax; ties broken by language order (first wins), 'und' if all 0
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, sc), acc) =>
      when(sc === best && best > 0.0, lit(lang)).otherwise(acc)
    }
  }

  /** Word k-shingles (k consecutive tokens joined by a space). */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < k, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** PII patterns — deliberately RE2-compatible (no lookaround, no
    * backreferences) so the same patterns run identically in Spark
    * (java.util.regex) and the DuckDB oracle (RE2), and would port to
    * vectorized engines. Conservative by design: high-precision shapes
    * (emails, dotted quads, long digit runs), not a full PII model —
    * redaction recall beyond these is a model concern, not an engine
    * concern. */
  val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val longNumRe = "\\d{9,}"

  def emailCount(text: Column): Column = regexp_count(text, lit(emailRe))

  /** Redact PII in-place: emails → [EMAIL], IPv4 → [IP], 9+-digit runs
    * (account/card/phone-shaped) → [NUM]. Email first (it may contain
    * digits/dots the later patterns would tear apart); the IP pass
    * keeps long digit runs intact for the final pass. Pure codegen'd
    * string expressions — a linear scan per document, no UDF. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        ipv4Re, "[IP]"),
      longNumRe, "[NUM]")

  /** Rolling document fingerprint: polynomial hash-chain
    * h = (h*131 + codepoint) mod 2^31-1 over the space-joined token
    * stream — order-sensitive, whitespace-insensitive, overflow-free,
    * and portable (the DuckDB oracle replicates it exactly). Native
    * expression: one tight char loop per document. */
  def fingerprint(text: Column): Column =
    NativeExpressions.docFingerprint(text)
}
