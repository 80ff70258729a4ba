package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String/NLP scalar operators T1-T10 (SURVEY §2.9) as pure Column
  * expressions — everything stays inside whole-stage codegen; there is
  * no UDF and no Python boundary anywhere in this family.
  *
  * Reference: dwh/preprocessing_streaming_incremental_load.py:188-315.
  */
object Text {

  /** Deterministic stop-word list: a fixed English subset standing in
    * for the reference's NLTK-english + ~60 extra words
    * (py:240-251). Kept small and explicit so the DuckDB oracle can
    * inline the identical list. */
  val StopWords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "by", "at", "be", "this", "that",
    "from", "are", "was", "were", "has", "have", "not", "but")

  private val stopArray: Column = array(StopWords.map(lit): _*)

  /** T1 — clean_text (py:188-191): strip everything outside
    * [\w\s_-], lowercase. */
  def cleanText(c: Column): Column =
    lower(regexp_replace(c, "[^\\w\\s_-]", ""))

  /** T2 — normalize_keyword (py:224-228): lowercase, _/- → space,
    * collapse runs of whitespace, trim. */
  def normalizeKeyword(c: Column): Column =
    trim(regexp_replace(translate(lower(c), "_-", "  "), "\\s+", " "))

  /** T3 — tokenize + stop-word + len>1 filter (py:200-202). */
  def tokenize(c: Column): Column =
    filter(
      split(c, "\\s+"),
      t => length(t) > 1 && !array_contains(stopArray, t))

  /** n-grams over a token array as "w1 w2 ..." strings; empty when the
    * array is shorter than n. */
  def ngrams(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(
        sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(tokens, i + k)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Token array for T4: cleaned, 10k-truncated, tokenized content.
    * ALWAYS materialize this as its own projection (an alias column)
    * before feeding it to [[gramsFromTokens]]/[[ngrams]]: higher-order
    * functions disable Catalyst subexpression elimination, so passing
    * the raw subtree makes every element_at re-run the whole
    * split+filter — O(tokens²) per row (measured 80s vs 2s at sf0.1). */
  def contentTokens(content: Column): Column =
    tokenize(cleanText(substring(content, 1, 10000)))

  /** Unigrams + bigrams + trigrams from a STAGED token attribute. */
  def gramsFromTokens(ts: Column): Column =
    concat(ts, ngrams(ts, 2), ngrams(ts, 3))

  /** Convenience composition of the two stages — only for small inputs
    * or tests; hot paths must stage (see [[contentTokens]] scaladoc). */
  def contentGrams(content: Column): Column =
    gramsFromTokens(contentTokens(content))

  /** T6 — email shape check (py:547). */
  def isEmail(c: Column): Column = c.rlike("^[^@]+@[^@]+\\.[^@]+")

  /** T7 — URL validity (py:505). */
  def isUrl(c: Column): Column = c.startsWith("http")

  /** T8 — list→string canonicalization for grouping keys (py:344-346). */
  def canonicalizeList(c: Column): Column = array_join(c, ",")

  /** PII redaction for training corpora: emails then long digit runs
    * replaced by typed placeholders. Emails go first (they contain
    * digits); both patterns stay inside the RE2-compatible subset so
    * any engine replays them identically. Pure codegen'd
    * regexp_replace — embarrassingly parallel. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val NumRe = "[0-9]{4,}"
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), NumRe, "<NUM>")

  /** T5 — exact_keywords synthesis (py:230-315): union of the
    * normalized search keyword (unless blank), the normalized
    * tmp-keywords list, and the content top-k — deduped and sorted for
    * a deterministic output order (the reference's set() ordering is
    * arbitrary; we pin it). */
  def exactKeywords(searchKw: Column, tmpKws: Column, contentKws: Column): Column =
    array_sort(
      array_distinct(
        concat(
          filter(array(normalizeKeyword(searchKw)), k => length(k) > 0),
          transform(tmpKws, normalizeKeyword(_)),
          contentKws)))
}
