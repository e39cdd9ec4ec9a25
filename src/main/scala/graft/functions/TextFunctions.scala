package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Column-level text primitives for the training-data pipeline operators
  * (dedup, quality scoring, language ID, fingerprinting).
  *
  * Everything here is a composition of codegen'd built-in functions —
  * no UDFs — so the whole document pipeline stays inside whole-stage
  * codegen and scales linearly with input size. Where a DuckDB oracle
  * recomputes the same value, the expression is chosen so both engines
  * produce bit-identical results (single IEEE double ops, md5 hex,
  * integer arithmetic).
  */
object TextFunctions {

  /** Whitespace-collapsed, trimmed, lower-cased normal form. */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Token list of the normal form. The normal form is trimmed and
    * single-spaced, so a literal single-space split equals
    * `regexp_extract_all('\\S+')` — and skips the regex engine, which
    * measured ~0.4 ms/doc (the dominant cost of every token query).
    *
    * The ONE case where a bare split diverges from the extract-all
    * form is blank/whitespace-only text: its normal form is '', whose
    * split is [''] — one phantom token, which would count blank docs
    * as 1 token in budgets and hand them a perfect q21 quality score
    * (stop_ratio 0). Guarded to the empty list instead; the oracle
    * twin (SparkEntry.toksSql) filters the same phantom with
    * list_filter. NULL text still yields NULL (split of NULL). */
  def tokens(c: Column): Column = {
    val nt = normText(c)
    when(nt === "", array().cast("array<string>"))
      .otherwise(split(nt, " "))
  }

  /** Deterministic document fingerprint: md5 of the normal form (both
    * Spark and DuckDB emit lowercase hex). */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Distinct 3-word shingles of raw text (empty when < 3 tokens) —
    * single-pass native expression over the normal form; equivalent to
    * array_distinct over concat'd token windows but ~100× faster (see
    * [[WordShingles]]). */
  def shingles3(text: Column): Column = wordShingles(text, 3)

  def wordShingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(WordShingles(Bridge.expression(normText(text)), n))
  }

  /** Max multiplicity among word n-grams of raw text — the per-row
    * repetition statistic (see [[NgramTopCount]]); 0 below n tokens,
    * NULL on NULL text. */
  def ngramTopCount(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NgramTopCount(Bridge.expression(normText(text)), n))
  }

  /** Winnowing fingerprint set of raw text: sorted distinct window-min
    * rolling hashes over character k-grams of the normal form — see
    * [[WinnowFingerprints]] for the scheme and portability contract. */
  def winnow(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(WinnowFingerprints(Bridge.expression(normText(text)), k, w))
  }

  /** 60-bit stable hash of a string: first 15 hex chars of md5, parsed
    * base-16. Engine-portable (DuckDB: CAST('0x'||substr(md5(s),1,15)
    * AS BIGINT)) unlike murmur3/xxhash which differ per engine. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Portable salted bucket of a numeric id: pmod(h60("id:salt"), mod)
    * — the ONE membership rule every deterministic sampling / split /
    * mixing / sharding operator derives from (q43/q52/q66/q67). Its
    * DuckDB rendering lives in SparkEntry.bucketSql; the pair must
    * stay in lockstep or the hash gates break. */
  def saltedBucket(id: Column, salt: String, mod: Int): Column =
    pmod(h60(concat(id.cast("string"), lit(":" + salt))), lit(mod))

  /** Exact Jaccard similarity of two (distinct-element) arrays, as one
    * double division so both engines agree bitwise. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** Token count of raw text. NULL text → NULL (matching DuckDB's
    * len(string_split(NULL)) = NULL, which SUM/AVG then skip). The
    * explicit guard PINS that semantics independent of session
    * settings: under this repo's defaults (Spark 4, ANSI on)
    * size(split(NULL)) is already NULL, but on an ANSI-off deployment
    * with spark.sql.legacy.sizeOfNull=true it is -1, which would
    * silently sum into token budgets where the oracle skips the row. */
  def tokenCount(c: Column): Column = when(c.isNotNull, size(tokens(c)))

  /** Ratio of tokens belonging to `words`, one double division.
    * NULL or EMPTY token list → NULL ratio (a 0-token doc has no
    * defined ratio — an unguarded 0.0/0 is NaN on Spark but
    * version-dependent NULL/NaN on DuckDB, so the NULL is pinned
    * explicitly on both sides; the size(toks) > 0 predicate also
    * covers the ANSI-off/legacy-sizeOfNull deployment where
    * size(NULL) is -1, not NULL). */
  def wordRatio(toks: Column, words: Seq[String]): Column =
    when(size(toks) > 0,
      size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))
        .cast("double") / size(toks))
}
