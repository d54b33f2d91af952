package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the documents pipeline (SURVEY §2.6).
  * All composed from codegen'd builtins; formulas kept SQL-expressible so
  * the DuckDB oracle can replay them verbatim.
  */
object Text {

  /** Whitespace-collapsed, trimmed, lower-cased canonical form. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** md5 fingerprint of the normalized text (document identity for
    * exact dedup).
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Single-space tokenization (the corpus is space-separated). */
  def tokens(text: Column): Column = split(normalize(text), " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Character n-gram-of-words shingles (k word grams as strings). */
  def shingles(text: Column, k: Int = 3): Column = {
    val t = tokens(text)
    when(size(t) >= k,
      transform(sequence(lit(0), size(t) - k),
        i => concat_ws(" ", slice(t, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", t)))
  }

  /** Word k-grams of the normalized text as space-joined strings
    * (array<string>, length max(tokens-k+1, 0)) — one codegen kernel of
    * zero-copy buffer slices, value-identical to the
    * split → sequence → transform(slice → concat_ws) chain it replaces
    * (each gram IS the contiguous substring spanning tokens i..i+k-1,
    * single spaces included). Rows with fewer than k tokens yield an
    * empty array, so `explode` drops them exactly like the former
    * `size(tokens) >= k` guard.
    */
  def wordNgrams(text: Column, k: Int): Column =
    sketches.space_ngrams(normalize(text), k)

  /** Distinct shingle hashes (array<long>) — input to MinHash. Computed by
    * a native rolling-hash expression over the token array; the
    * string-materializing HOF equivalent (`transform(shingles, xxhash64)`)
    * dominated MinHash pipeline cost by an order of magnitude.
    */
  def shingleHashes(text: Column, k: Int = 3): Column =
    sketches.shingle_hashes(tokens(text), k)

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "dans", "que"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "个"))

  /** Heuristic stopword-ratio language ID: argmax over per-language
    * stopword hit counts (deterministic; ties broken by language code).
    */
  def langid(text: Column): (Column, Column) = {
    val t = tokens(text)
    val scores = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hits = size(filter(t, tok => array_contains(lit(words.toArray), tok)))
      (lang, hits)
    }
    // argmax via a struct sort: (hits desc, lang asc)
    val packed = array(scores.map { case (lang, hits) =>
      struct((-hits).as("neg"), lit(lang).as("lang"), hits.as("hits"))
    }: _*)
    val best = array_min(packed)
    (best.getField("lang"), best.getField("hits"))
  }
}
