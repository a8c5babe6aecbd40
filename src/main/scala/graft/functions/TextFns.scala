package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expression builders for the training-data pipeline tier.
  * All are compositions of built-in (codegen'd) functions — no UDFs — and
  * each has an exact DuckDB rendering (documented inline) so the oracle
  * can mirror the computation token-for-token.
  */
object TextFns {

  /** Lowercased alphanumeric word tokens, empties dropped.
    * DuckDB: list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
    *         x -> x != '') */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Word n-gram shingles (distinct, sorted) over the token array; the
    * standard near-dup unit. Requires size(tokens) >= n.
    * DuckDB (n=3): list_sort(list_distinct(list_transform(
    *   range(1, greatest(len(ts) - 1, 1)),
    *   i -> array_to_string(ts[i:i+2], ' ')))) */
  def shingles(toks: Column, n: Int = 3): Column =
    // Guard: Spark's sequence(0, -1) counts DOWN, so short docs need an
    // explicit empty (DuckDB's range(1, 1) is already empty).
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_sort(array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))))

  /** Jaccard similarity of two distinct-element arrays — exact integer
    * size ratio, bit-identical across engines.
    * DuckDB: CAST(len(list_intersect(a, b)) AS DOUBLE)
    *           / len(list_distinct(list_concat(a, b))) */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b)))

  /** Word-set fingerprint: md5 of the sorted distinct token set — catches
    * reorder/duplication near-dups exactly (Jaccard == 1.0 on word sets).
    * DuckDB: md5(array_to_string(list_sort(list_distinct(ts)), ' ')) */
  def wordSetFingerprint(toks: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks))))

  /** Stopword dictionaries for the lang-ID heuristic (tiny, deterministic;
    * ASCII only so both regex engines agree). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "nicht", "ein"),
    "fr" -> Seq("le", "les", "et", "des", "une", "dans", "pour", "est"),
    "es" -> Seq("el", "los", "de", "que", "y", "en", "por", "para"))

  /** Count of tokens drawn from a fixed word list.
    * DuckDB: len(list_filter(ts, t -> t IN (...))) */
  def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))
}
