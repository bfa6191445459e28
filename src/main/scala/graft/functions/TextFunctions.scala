package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders (SURVEY.md §2.5). All are composed
  * from codegen'd built-ins — no Scala UDFs in per-row hot paths,
  * except the rolling-hash fingerprint which is a candidate for a
  * native Expression in a later round.
  */
object TextFunctions {

  /** Reference tokenizer as a Column (mapreduce.c:110-130): split on
    * single spaces, strip non-ASCII-letters per token, lowercase, drop
    * empties.
    */
  def refTokens(text: Column): Column =
    filter(
      transform(split(text, " "), tok => lower(regexp_replace(tok, "[^A-Za-z]", ""))),
      w => w =!= "")

  /** Whitespace tokens (no stripping). */
  def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= "")

  /** BPE-ish pre-tokenization: letter runs, digit runs, single other
    * non-space chars — the usual GPT-2-style pre-split shape.
    */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]"

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0))).cast("long")

  /** Quality-gate columns shared by the batch (Pipeline.corpusBuild)
    * and streaming (Streams.corpusIngest) corpus builds — one source
    * of truth so the twins cannot drift.
    */
  def nTokens(text: Column): Column = size(wsTokens(lower(text))).cast("long")

  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
      nullif(length(text).cast("double"), lit(0.0))

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "for", "on", "with")

  /** Count of stopword tokens. */
  def stopwordCount(tokens: Column): Column =
    size(filter(tokens, w => w.isInCollection(stopwords))).cast("long")

  /** Word n-gram shingles (distinct) from a token array. */
  def shingles(tokens: Column, n: Int): Column =
    array_distinct(
      filter(
        transform(tokens, (_, i) => concat_ws(" ", slice(tokens, i + 1, lit(n)))),
        s => size(split(s, " ")) === n))

  /** Tiny deterministic language-ID: score = stopword hits per
    * language profile, argmax; 'und' when nothing hits. Heuristic
    * n-gram/stopword LID in the fastText spirit, shrunk to a few
    * profiles so it stays a pure column expression.
    */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "que"),
    "fr" -> Seq("le", "la", "les", "est", "une", "des", "que", "dans"))

  def langId(tokens: Column): Column = {
    val scored = langProfiles.map { case (lang, words) =>
      struct(size(filter(tokens, w => w.isInCollection(words))).as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Polynomial rolling hash (Rabin–Karp style) over the UTF-8 bytes,
    * mod 2^61-1 — a deterministic whole-document fingerprint. The
    * per-byte arithmetic is the long-only mulmod kernel in
    * [[Signatures.fingerprint64]] (the original BigInt formulation
    * allocated two BigInts per byte).
    */
  def fingerprint(text: Column): Column = Signatures.fingerprintCol(text)
}
