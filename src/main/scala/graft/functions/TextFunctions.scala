package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline
  * (language-ID, quality scoring, token counting, fingerprinting).
  *
  * Everything is Catalyst built-ins + higher-order array functions — no
  * UDFs, so the expressions stay inside whole-stage codegen and are
  * pushable/prunable. Hashing uses an explicit polynomial fold (not
  * Spark's murmur3 `hash()`) so the DuckDB oracle can reproduce results
  * bit-for-bit with `list_reduce` — the formulas are engine-agnostic.
  */
object TextFunctions {

  /** Large prime modulus for polynomial hashes; (p-1)*31 + 127 fits a
    * 64-bit long with huge headroom, so the fold never overflows. */
  val HashMod: Long = 1000000007L

  /** Whitespace tokenization of the lowercased, trimmed text. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: runs of letters, runs of digits, or single
    * non-alphanumeric glyphs — the shape a byte-pair tokenizer's
    * pre-tokenizer produces. Counted, not materialized. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    regexp_count(lower(text), lit(BpePattern))

  /** Punctuation-character ratio over non-space characters (case-folded
    * first so letters never count as punctuation). */
  def punctRatio(text: Column): Column = {
    val nonSpace = length(regexp_replace(lower(text), "\\s", ""))
    val punct = length(regexp_replace(regexp_replace(lower(text), "\\s", ""), "[a-z0-9]", ""))
    punct.cast("double") / greatest(nonSpace.cast("double"), lit(1.0))
  }

  /** English stopword lexicon (tiny, deterministic). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "of", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by")

  /** Count of tokens that are members of `lexicon`. */
  def lexiconHits(toks: Column, lexicon: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedlit(lexicon), t)))

  /** Let-binding for an expensive sub-expression: evaluate `x` ONCE per
    * row and hand it to `body` as a lambda variable (a plain slot read).
    * Referencing an expensive Column twice in a tree duplicates the
    * subtree — Catalyst's subexpression elimination does not reach
    * CodegenFallback HOFs, which is how the r13 langId when-chain grew
    * to ~24 token scans per row. transform over a 1-element array is
    * the cheapest binder the expression language offers. */
  private def bind(x: Column)(body: Column => Column): Column =
    element_at(transform(array(x), body), 1)

  /** One-pass token statistics — struct(n, len, stop) = (token count,
    * summed token length, stopword hits) from a SINGLE tokenization and
    * a single array traversal. The quality sub-metrics below all read
    * from this so scoring a row costs one split, not four (r13 verdict
    * task 1: tokens-once). `n` counts every split element (including
    * the empty token split() yields on empty input) so it equals
    * size(tokens(text)) exactly. */
  def tokenStats(text: Column): Column = tokenStatsOf(tokens(text))

  /** [[tokenStats]] over an already-materialized token array (e.g. a
    * projected `__toks` column a query shares across several metrics). */
  def tokenStatsOf(toks: Column): Column =
    aggregate(
      toks,
      struct(lit(0L).as("n"), lit(0L).as("len"), lit(0L).as("stop")),
      (acc, t) => struct(
        (acc.getField("n") + lit(1L)).as("n"),
        (acc.getField("len") + length(t)).as("len"),
        (acc.getField("stop") +
          when(array_contains(typedlit(Stopwords), t), lit(1L)).otherwise(lit(0L))).as("stop")))

  /** stopword_hits / max(n, 1) from a [[tokenStats]] struct. */
  def stopwordRatioFrom(stats: Column): Column =
    stats.getField("stop").cast("double") /
      greatest(stats.getField("n").cast("double"), lit(1.0))

  def stopwordRatio(text: Column): Column =
    bind(tokenStats(text))(stopwordRatioFrom)

  /** Mean token length from a [[tokenStats]] struct. */
  def avgTokenLenFrom(stats: Column): Column =
    stats.getField("len").cast("double") /
      greatest(stats.getField("n").cast("double"), lit(1.0))

  /** Mean token length. */
  def avgTokenLen(text: Column): Column =
    bind(tokenStats(text))(avgTokenLenFrom)

  /** Mean token length over an already-materialized token array.
    *
    * Length-only fold on purpose: the one caller (text_gopher_rules)
    * computes its stopword metric separately (different lexicon,
    * distinct-type counting), so routing through [[tokenStatsOf]] would
    * run a 15-word membership test per token into a `stop` accumulator
    * nobody reads. `toks` is referenced twice (fold + size) — pass a
    * materialized column (e.g. a projected `__toks` alias), not an
    * expression subtree. */
  def avgTokenLenOf(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks).cast("double"), lit(1.0))

  /** Composite quality score in [0,1]: rewards reasonable length,
    * low punctuation density, natural-language stopword density, and
    * word lengths near English norms. Weights are fixed constants; the
    * arithmetic order is pinned (left-to-right) for oracle parity. */
  def qualityScoreFrom(stats: Column, punctR: Column): Column = {
    val lenTerm = least(stats.getField("n").cast("double"), lit(100.0)) / lit(100.0)
    val punctTerm = lit(1.0) - least(punctR * lit(4.0), lit(1.0))
    val stopTerm = least(stopwordRatioFrom(stats) * lit(4.0), lit(1.0))
    val wordTerm = lit(1.0) - least(abs(avgTokenLenFrom(stats) - lit(5.0)) / lit(5.0), lit(1.0))
    lenTerm * lit(0.25) + punctTerm * lit(0.25) + stopTerm * lit(0.25) + wordTerm * lit(0.25)
  }

  def qualityScore(text: Column): Column =
    bind(tokenStats(text))(st => qualityScoreFrom(st, punctRatio(text)))

  /** Per-language function-word lexicons for the n-gram/stopword
    * language-ID heuristic. */
  val LangLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "for", "a", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "un", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "im", "ein"),
    "fr" -> Seq("le", "les", "de", "et", "des", "un", "une", "est", "dans", "pour"))

  /** Language-ID: argmax of lexicon hit counts, ties broken by lexicon
    * order (en > es > de > fr), all-zero → 'und'.
    *
    * Shape (r13): scores land in ONE array and the argmax is
    * array_max + first array_position — the earlier when-chain
    * re-embedded `greatest(4 lexicon scans)` inside every branch
    * (~24 token-array scans per row after tree expansion, vs 4 here).
    * array_position's first-match rule IS the lexicon-order
    * tie-break, matching the oracle's CASE chain.
    *
    * Shape (r14): `toks` and `scores` are let-bound via [[bind]] — the
    * r13 array form still re-split the text once per lexicon (each
    * lexiconHits reference duplicated the split subtree; that constant
    * was the measured sf0.1 regression, mix 0.84→2.0 s) and re-built
    * the scores array for each of array_max/array_position. Now: one
    * split, four filter passes over the materialized array, two scans
    * of the 4-element scores array. */
  def langId(text: Column): Column =
    bind(tokens(text)) { toks =>
      bind(array(LangLexicons.map { case (_, lex) => lexiconHits(toks, lex) }: _*)) { scores =>
        val langs = typedlit(LangLexicons.map(_._1))
        val best = array_max(scores)
        when(best > 0, element_at(langs, array_position(scores, best).cast("int")))
          .otherwise(lit("und"))
      }
    }

  /** Content fingerprint: md5 of the whitespace-normalized lowercased
    * text — engine-agnostic (hex string identical in DuckDB). */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling polynomial hash of a string: fold (acc*31 + codeUnit) mod p.
    * Compiled as the native codegen expression graft.plans.PolyHash (the
    * HOF formulation below can't whole-stage-codegen); reproducible in
    * DuckDB via list_reduce ([[polyHashSql]]) — the token-hash primitive
    * for fingerprints, MinHash and SimHash. */
  def polyHash(s: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.plans.PolyHash(org.apache.spark.sql.graftbridge.Bridge.expression(s)))

  /** The pure-built-in formulation of [[polyHash]] (higher-order fold
    * over per-character slices): kept as the semantic reference — the
    * spec pins polyHash == polyHashHof on arbitrary strings. Spark's
    * split keeps a trailing empty element (limit -1), so empties are
    * filtered before the fold. */
  def polyHashHof(s: Column): Column =
    aggregate(
      filter(split(s, ""), c => c =!= ""),
      lit(0L),
      (acc, c) => (acc * 31 + ascii(c)) % HashMod)

  /** Rolling-hash document fingerprint over the normalized text. */
  def fingerprintRolling(text: Column): Column =
    polyHash(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** PII / boilerplate redaction patterns (applied in order; order
    * matters — emails before bare domains would, e.g., half-redact). */
  val RedactionRules: Seq[(String, String)] = Seq(
    "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}" -> "<EMAIL>",
    "https?://[^\\s]+" -> "<URL>",
    "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b" -> "<PHONE>")

  /** Redact emails, URLs and phone numbers from (lowercased) text. */
  def redactPii(text: Column): Column =
    RedactionRules.foldLeft(lower(text)) { case (c, (pattern, tag)) =>
      regexp_replace(c, pattern, tag)
    }

  /** DuckDB rendering of [[redactPii]] ('g' flag = Spark's replace-all;
    * DuckDB string literals keep backslashes raw, so patterns embed
    * verbatim). */
  def redactPiiSql(expr: String): String =
    RedactionRules.foldLeft(s"lower($expr)") { case (e, (pattern, tag)) =>
      s"regexp_replace($e, '$pattern', '$tag', 'g')"
    }

  /** DuckDB rendering of [[polyHash]] over a string expression. */
  def polyHashSql(expr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($expr, ''), c -> CAST(ascii(c) AS BIGINT))), (acc, x) -> (acc * 31 + x) % $HashMod)"""
}
