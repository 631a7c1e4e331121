package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline extensions:
  * tokenization, quality scoring, stopword-based language ID. Everything
  * is built from codegen'd Catalyst functions (no UDFs), and every
  * primitive has a DuckDB-SQL twin (the `sql*` builders) so the whole
  * text surface is oracle-checkable.
  */
object TextFunctions {

  /** Whitespace tokens; NULL or blank text -> empty array (matching the
    * SQL twins' coalesce-to-zero semantics; Spark's `split("", "\\s+")`
    * would yield `[""]` and NULL would propagate). */
  def tokens(text: Column): Column =
    when(text.isNull || trim(text) === "", array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  def punctCount(text: Column): Column =
    coalesce(regexp_count(text, lit("[.,;:!?]")), lit(0))

  /** BPE-ish regex subtokens: alpha runs, digit runs, and single
    * non-alnum marks — the pre-tokenization split most BPE vocabularies
    * start from. Array form; NULL text -> empty array. */
  def subtokens(text: Column): Column =
    coalesce(regexp_extract_all(lower(text),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)), array().cast("array<string>"))

  def subtokenCount(text: Column): Column =
    coalesce(size(subtokens(text)), lit(0))

  /** Stopword hit count over whitespace tokens (with multiplicity). */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(
      array(stopwords.map(lit): _*), t)))

  val EnStop: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val EsStop: Seq[String] = Seq("el", "la", "de", "y", "que", "en", "un")
  val DeStop: Seq[String] = Seq("der", "die", "das", "und", "zu", "ein", "ist")

  /** N-gram-free heuristic language ID: argmax of stopword hits with a
    * deterministic en > es > de tie order. */
  def langId(text: Column): Column = {
    val en = stopwordCount(text, EnStop)
    val es = stopwordCount(text, EsStop)
    val de = stopwordCount(text, DeStop)
    when(en >= es && en >= de, "en").when(es >= de, "es").otherwise("de")
  }

  /** Characteristic character-trigram profiles (tiny stand-ins for real
    * frequency profiles; deterministic and SQL-reproducible). */
  val EnTri: Seq[String] = Seq("the", "ing", "ion", "and", "ent", "er ")
  val EsTri: Seq[String] = Seq("de ", "la ", "que", "ión", "los", "ent")
  val DeTri: Seq[String] = Seq("der", "die", "und", "sch", "ein", "ich")

  /** Weighted trigram coverage: Σ characters removed when deleting each
    * trigram — substring counting via replace-length arithmetic, no
    * regex, so Java and RE2 dialects cannot diverge. */
  private def triScore(text: Column, tris: Seq[String]): Column =
    coalesce(tris.map(t => length(lower(text)) -
      length(replace(lower(text), lit(t), lit("")))).reduce(_ + _), lit(0))

  /** Character-n-gram heuristic language ID: argmax of trigram-profile
    * hits with the same deterministic en > es > de tie order as
    * [[langId]]. */
  def langIdNgram(text: Column): Column = {
    val en = triScore(text, EnTri)
    val es = triScore(text, EsTri)
    val de = triScore(text, DeTri)
    when(en >= es && en >= de, "en").when(es >= de, "es").otherwise("de")
  }

  /** Composite quality score in [0,1]: length saturation, punctuation
    * penalty, stopword reward. Pure double arithmetic (oracle-exact). */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(lit(1.0), nTok / lit(20.0))
    val punctRatio = punctCount(text).cast("double") /
      greatest(nTok, lit(1.0))
    val stopRatio = stopwordCount(text, EnStop).cast("double") /
      greatest(nTok, lit(1.0))
    lit(0.4) * lenScore + lit(0.3) * (lit(1.0) - least(lit(1.0), punctRatio)) +
      lit(0.3) * least(lit(1.0), stopRatio * lit(5.0))
  }

  /** Canonical text cleaning: Unicode NFC composition (custom codegen'd
    * expression, [[NfcNormalize]]), lowercase, control chars to spaces,
    * whitespace runs collapsed, trimmed — the normalization pass a
    * training-data pipeline applies before dedup/fingerprinting so that
    * byte-different renderings of the same text collapse to one form. */
  def normalizeText(spark: SparkSession, text: Column): Column =
    trim(regexp_replace(regexp_replace(
      lower(NfcNormalize.nfcNormalize(spark, text)),
      "[\\p{Cntrl}]", " "), "\\s+", " "))

  /** DuckDB twin of [[normalizeText]] (RE2 classes; `g` = replace-all,
    * Spark's regexp_replace default). */
  def sqlNormalizeText(col: String): String =
    s"trim(regexp_replace(regexp_replace(lower(nfc_normalize($col)), " +
      s"'[[:cntrl:]]', ' ', 'g'), '\\s+', ' ', 'g'))"

  /** Rolling-hash document fingerprint (custom codegen'd expression). */
  def fingerprint(spark: SparkSession, text: Column): Column =
    GraftHash.graftHash(spark, text)

  /** Word n-gram shingles as an array of strings; docs shorter than n
    * tokens produce an empty array. */
  /** Word n-gram shingles as chained `zip_with`s over shifted slices of
    * the token array. The obvious `transform(sequence(...), i =>
    * slice(toks, i+1, n))` form is quadratic in document length: Spark's
    * subexpression elimination does not reach inside higher-order-
    * function lambdas, so a lambda body referencing the outer `toks`
    * tree re-tokenizes per ELEMENT. Here every lambda touches only its
    * bound arguments; `toks` appears only at top level, where codegen
    * CSE evaluates it once per row — O(n·T) per document. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val m = greatest(size(toks) - (n - 1), lit(0)) // shingle count
    val parts = (0 until n).map(k => slice(toks, lit(k + 1), m))
    val zipped = parts.reduce((a, b) =>
      zip_with(a, b, (x, y) => concat_ws(" ", x, y)))
    when(size(toks) >= n, zipped).otherwise(array().cast("array<string>"))
  }

  // ----------------------- DuckDB twins -----------------------

  def sqlTokens(col: String): String =
    s"(CASE WHEN trim($col) = '' THEN []::VARCHAR[] " +
      s"ELSE regexp_split_to_array(trim($col), '\\s+') END)"

  def sqlTokenCount(col: String): String =
    s"coalesce(array_length(${sqlTokens(col)}), 0)"

  def sqlPunctCount(col: String): String =
    s"coalesce(array_length(regexp_extract_all($col, '[.,;:!?]')), 0)"

  def sqlSubtokenCount(col: String): String =
    s"coalesce(array_length(regexp_extract_all(lower($col), '[a-z]+|[0-9]+|[^a-z0-9\\s]')), 0)"

  private def sqlInList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  def sqlStopwordCount(col: String, stopwords: Seq[String]): String =
    s"coalesce(array_length(list_filter(${sqlTokens(col)}, " +
      s"t -> list_contains(${sqlInList(stopwords)}, t))), 0)"

  private def sqlTriScore(col: String, tris: Seq[String]): String =
    // coalesce mirrors triScore's NULL guard: NULL text must score 0 in
    // both engines, or sqlLangIdNgram's CASE falls to 'de' while the
    // Spark twin returns 'en'.
    tris.map(t => s"(length(lower($col)) - length(replace(lower($col), '$t', '')))")
      .mkString("coalesce((", " + ", "), 0)")

  def sqlLangIdNgram(col: String): String = {
    val en = sqlTriScore(col, EnTri)
    val es = sqlTriScore(col, EsTri)
    val de = sqlTriScore(col, DeTri)
    s"(CASE WHEN $en >= $es AND $en >= $de THEN 'en' " +
      s"WHEN $es >= $de THEN 'es' ELSE 'de' END)"
  }

  def sqlLangId(col: String): String = {
    val en = sqlStopwordCount(col, EnStop)
    val es = sqlStopwordCount(col, EsStop)
    val de = sqlStopwordCount(col, DeStop)
    s"(CASE WHEN $en >= $es AND $en >= $de THEN 'en' " +
      s"WHEN $es >= $de THEN 'es' ELSE 'de' END)"
  }

  def sqlQualityScore(col: String): String = {
    val nTok = s"CAST(${sqlTokenCount(col)} AS DOUBLE)"
    val lenScore = s"least(1.0::DOUBLE, $nTok / 20.0::DOUBLE)"
    val punctRatio = s"(CAST(${sqlPunctCount(col)} AS DOUBLE) / greatest($nTok, 1.0::DOUBLE))"
    val stopRatio = s"(CAST(${sqlStopwordCount(col, EnStop)} AS DOUBLE) / greatest($nTok, 1.0::DOUBLE))"
    s"(0.4::DOUBLE * $lenScore + 0.3::DOUBLE * (1.0::DOUBLE - least(1.0::DOUBLE, $punctRatio)) " +
      s"+ 0.3::DOUBLE * least(1.0::DOUBLE, $stopRatio * 5.0::DOUBLE))"
  }

  def sqlShingles(col: String, n: Int): String = {
    val toks = sqlTokens(col)
    s"(CASE WHEN coalesce(array_length($toks), 0) >= $n THEN " +
      s"list_transform(generate_series(1, array_length($toks) - ${n - 1}), " +
      s"i -> " + (0 until n).map(k => s"($toks)[i + $k]")
        .mkString(" || ' ' || ") + ") " +
      s"ELSE []::VARCHAR[] END)"
  }
}
