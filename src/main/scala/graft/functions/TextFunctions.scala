package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the documents pipeline: tokenization,
  * shingling, fingerprinting, language scoring. All built-ins / codegen'd
  * collection lambdas — every one of these runs as a narrow map over the
  * corpus, embarrassingly parallel at any scale.
  */
object TextFunctions {

  /** BPE-ish token pattern: letter runs, digit runs, single punctuation. */
  val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Token count via the shared pattern (mirrors DuckDB
    * `len(regexp_extract_all(text, pattern))`). */
  def tokenCount(text: Column): Column = regexp_count(text, lit(TokenPattern))

  /** Whitespace word array. */
  def words(text: Column): Column = split(text, " ")

  /** Portable 64-bit hash: the first 16 hex chars of md5, reinterpreted
    * as a long. Engine-independent by construction — any SQL engine
    * with md5 + hex conversion reproduces the exact bit pattern
    * (DuckDB: `('0x' || substr(md5(x),1,16))::UBIGINT`), which is what
    * makes the MinHash/SimHash dedup queries oracle-checkable instead
    * of spec-only. Built from codegen'd built-ins (md5/conv/shift);
    * costlier per row than xxhash64, the price of cross-engine
    * exactness. The two 32-bit halves convert separately because
    * `conv` yields an unsigned decimal string a signed-long cast
    * would null out above 2^63; the OR never carries, so no ANSI
    * overflow is reachable. */
  def hash64(c: Column): Column = {
    val m = md5(c)
    val hi = conv(substring(m, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(m, 9, 8), 16, 10).cast("long")
    shiftleft(hi, 32).bitwiseOR(lo)
  }

  /** Distinct word k-shingles as strings; empty array below k words.
    * (`sequence` would count DOWN for size < k — guard required.) */
  def shingles(w: Column, k: Int): Column =
    when(size(w) >= k,
      array_distinct(transform(
        sequence(lit(1), size(w) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(w, i + j)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Polynomial rolling hash over characters (mod 1e9+7) — the classic
    * document fingerprint. Left fold in array order; mirrored in DuckDB
    * by `list_reduce` over `string_split(text,'')`. ASCII corpus assumed
    * (`ascii()` reads the first code point, = the byte for ASCII). */
  def fingerprint(text: Column, init: Long = 7L): Column =
    aggregate(
      split(text, ""),
      lit(init),
      (acc, ch) => pmod(acc * 31 + ascii(ch), lit(1000000007L)))

  /** Count occurrences of each marker in the text (language-ID n-gram
    * heuristic: sum of marker-bigram/stopword hits). */
  def markerScore(text: Column, markers: Seq[String]): Column =
    markers.map(m => regexp_count(text, lit(java.util.regex.Pattern.quote(m))))
      .reduce(_ + _)
}
