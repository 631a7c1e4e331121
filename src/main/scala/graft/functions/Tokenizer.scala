package graft.functions

import org.apache.spark.sql.Column

/** Pluggable token-counting boundary for operators whose semantics
  * depend on a token budget (sequence packing, length gates, manifest
  * accounting). The engine ships two codegen'd implementations; a real
  * BPE tokenizer plugs in as a third without touching any operator:
  * implement `countTokens` as a custom Catalyst `Expression` carrying a
  * broadcast vocabulary (the codegen'd path, preferred), or — at user
  * discretion, off the zero-UDF guarantee — as a `udf` closing over a
  * tokenizer instance. Everything downstream (bucketing, pack ids,
  * manifests) is agnostic to where the counts came from.
  */
trait Tokenizer extends Serializable {
  /** Token count of `text` as a Column. Must return a non-negative
    * integral value; null/blank text counts 0. */
  def countTokens(text: Column): Column
}

/** Whitespace word count — the cheapest budget proxy. */
object WhitespaceTokenizer extends Tokenizer {
  override def countTokens(text: Column): Column =
    TextFunctions.tokenCount(text)
}

/** BPE-ish pre-tokenization count (alpha runs, digit runs, single
  * marks) — tracks real subword-vocabulary counts far closer than
  * whitespace while staying a pure codegen'd expression. */
object SubtokenTokenizer extends Tokenizer {
  override def countTokens(text: Column): Column =
    TextFunctions.subtokenCount(text)
}
