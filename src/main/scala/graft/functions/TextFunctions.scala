package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline surface
  * (SURVEY.md §2.3). Everything here is built from codegen'd
  * `org.apache.spark.sql.functions` — no UDFs — so the expressions stay
  * inside whole-stage codegen and scale linearly with input bytes.
  *
  * Each primitive is designed to be *reproducible in ANSI SQL* (the
  * DuckDB oracle mirrors the same arithmetic), so correctness is
  * hash-verifiable, not eyeballed.
  */
object TextFunctions {

  /** Lowercased whitespace tokenization. `\s+` split; a leading empty
    * token can only appear if the text starts with whitespace (the
    * testdata does not). */
  def tokens(text: Column): Column =
    split(lower(text), "\\s+")

  def tokenCount(text: Column): Column =
    size(tokens(text))

  /** BPE-ish subword count: alphanumeric runs and single punctuation
    * marks each count as one token (a cheap deterministic stand-in for
    * a real tokenizer's token count). The whitespace class is spelled
    * out explicitly: Java's \s includes vertical tab (\x0B), RE2's
    * (DuckDB) does not — an explicit class keeps both engines
    * byte-identical. */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(text), "([^a-z0-9]+)"), t => length(t) > 0)) +
      length(regexp_replace(text, "[a-z0-9A-Z \\t\\n\\x0B\\f\\r]", ""))

  /** Contiguous word n-grams ("shingles") over the token array.
    * Guarded: Spark's sequence(0, -1) would produce a *decreasing*
    * sequence, so short docs must short-circuit to an empty array. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct shingle set — the unit of Jaccard similarity. */
  def shingleSet(text: Column, n: Int): Column =
    array_distinct(shingles(tokens(text), n))

  /** Polynomial rolling hash of the whole string, mod 1_000_000_007.
    * acc = (acc * 31 + ascii(char)) % p — expressible identically in
    * DuckDB (list_reduce), and safe under ANSI overflow checking since
    * the accumulator stays < 2^30 * 31 + 255. */
  def fingerprint(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch)) % 1000000007L)

  /** Stopword ratio over a small fixed English stopword list. */
  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = filter(toks, t => t.isin(stopwords.map(x => x: Any): _*))
    when(size(toks) > 0, size(stops).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Punctuation character ratio (non-alphanumeric, non-space). */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[a-zA-Z0-9 ]", "")).cast("double") /
        length(text).cast("double"))
      .otherwise(lit(0.0))

  def meanWordLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0, 1]: rewards mid-length documents,
    * a sane stopword ratio and low punctuation density. The exact
    * formula is arbitrary but fixed — the oracle recomputes it. */
  def qualityScore(text: Column): Column = {
    val lengthTerm = least(tokenCount(text).cast("double") / lit(64.0), lit(1.0))
    val stopTerm = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctTerm = greatest(lit(1.0) - punctRatio(text) * 10.0, lit(0.0))
    round((lengthTerm + stopTerm + punctTerm) / 3.0, 6)
  }

  /** N-gram-profile language ID heuristic: score each candidate
    * language by counting hits of its characteristic function words /
    * character classes, take the argmax (deterministic tie-break by
    * fixed language order). */
  def langId(text: Column): Column = {
    val t = concat(lit(" "), lower(text), lit(" "))
    def hits(words: Seq[String]): Column =
      words.map(w => size(split(t, s"\\Q $w \\E")) - 1)
        .reduce(_ + _)
    val enScore = hits(Seq("the", "a", "of", "and", "to", "is"))
    val esScore = hits(Seq("el", "la", "de", "y", "que", "en"))
    val frScore = hits(Seq("le", "la", "de", "et", "que", "est"))
    val deScore = hits(Seq("der", "die", "das", "und", "ist"))
    // CJK: any han character is decisive.
    val hasHan = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", "")) > 0
    when(hasHan, lit("zh"))
      .when(enScore >= esScore && enScore >= frScore && enScore >= deScore && enScore > 0, lit("en"))
      .when(esScore >= frScore && esScore >= deScore && esScore > 0, lit("es"))
      .when(frScore >= deScore && frScore > 0, lit("fr"))
      .when(deScore > 0, lit("de"))
      .otherwise(lit("und"))
  }
}
