package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A real byte-pair-encoding vocabulary: an ordered merge list (the
  * standard `merges.txt` format — one `left right` pair per line, rank
  * = line order) applied over the same pre-tokenization the rest of
  * the text family uses (lowercased alpha runs / digit runs / single
  * marks, [[TextFunctions.subtokenCount]]).
  *
  * Application is CANONICAL BPE: per word, repeatedly merge the
  * adjacent symbol pair with the lowest rank (all occurrences,
  * leftmost-first) until no known pair remains — the GPT-2-encoder
  * algorithm, scaling with word length rather than vocabulary size.
  *
  * The constructor enforces WELL-FORMEDNESS: each merge's constituents
  * must be single characters or outputs of strictly earlier merges —
  * the invariant every trained BPE vocabulary has by construction
  * (a symbol is created exactly once, and a merge can only be learned
  * after its parts exist). Under it, applying a rank-r merge can never
  * create a pair of rank < r (any pair consuming r's output must have
  * been learned later), so canonical application visits ranks in
  * increasing order and equals ONE in-order sweep with a single
  * leftmost fold per merge. That sweep is a fixed K-stage
  * transformation — which is what makes the DuckDB oracle possible:
  * [[graft.Oracles.textBpeTokens]] replays the sweep as one CTE stage
  * per merge, exactly reproducing the canonical token count in plain
  * SQL. An ill-formed list would break the equivalence, so it is
  * rejected loudly instead of silently drifting from the oracle.
  *
  * 100 TB shape: the vocabulary rides the plan as a reference object
  * (broadcast once per executor, like any literal); counting is a
  * per-row codegen'd scalar expression — no shuffle, no UDF boundary,
  * no driver involvement.
  */
final class BpeVocab(val merges: IndexedSeq[(String, String)])
    extends Serializable {
  require(merges.nonEmpty, "BPE vocab needs at least one merge")
  locally {
    val produced = scala.collection.mutable.Set[String]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      def ok(s: String) = s.length == 1 || produced.contains(s)
      require(ok(a) && ok(b), s"merge #$i ('$a','$b') is ill-formed: " +
        "constituents must be single characters or outputs of earlier " +
        "merges (every trained BPE vocab satisfies this; see scaladoc)")
      produced += (a + b)
    }
  }

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  private val PreToken =
    java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")

  /** Canonical BPE segmentation of one pre-token. */
  def tokenize(word: String): Seq[String] = {
    var syms = word.map(_.toString).toArray
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else syms = BpeVocab.mergePass(syms, merges(best)._1, merges(best)._2)
    }
    syms.toSeq
  }

  /** Total BPE token count of a text: pre-tokenize (lowercased with
    * UTF8String semantics — exactly Spark's `lower()` — then the same
    * split as `subtokenCount`), tokenize each word, sum. */
  def countTokens(text: String): Long = {
    if (text == null) return 0L
    val lowered = UTF8String.fromString(text).toLowerCase.toString
    val m = PreToken.matcher(lowered)
    var n = 0L
    while (m.find()) n += tokenize(m.group()).length
    n
  }
}

object BpeVocab {

  /** One leftmost-first, non-overlapping fold of merge (a, b) over a
    * symbol sequence — the single merge semantics shared by the
    * tokenizer above, the distributed trainer's codegen'd fold
    * ([[graft.pipelines.BpeTrain]] `mergeFold`), and the driver-local
    * trainer (`trainMergesFast`): one definition, three call sites,
    * so the semantics cannot drift. */
  private[graft] def mergePass(syms: Array[String], a: String,
      b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (out.nonEmpty && out.last == a && syms(i) == b)
        out(out.length - 1) = a + b
      else out += syms(i)
      i += 1
    }
    out.toArray
  }

  /** Small well-formed demonstration vocabulary over common English
    * digraphs — rank order matters and chained merges (th→the, an→and,
    * in→ing) exercise the multi-level path. Swap in a trained
    * `merges.txt` via [[fromMergesFile]] for production use. */
  val Demo: BpeVocab = fromMerges(Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "a" -> "t", "e" -> "n",
    "o" -> "r", "e" -> "s", "i" -> "s", "i" -> "t", "a" -> "l",
    "o" -> "u", "l" -> "e", "c" -> "h", "s" -> "t", "in" -> "g",
    "t" -> "o", "e" -> "d", "c" -> "o", "s" -> "e"))

  def fromMerges(pairs: Seq[(String, String)]): BpeVocab =
    new BpeVocab(pairs.toIndexedSeq)

  /** Parse the standard `merges.txt` layout: one `left right` pair per
    * line, rank = line order; blank lines and `#…` headers skipped. */
  def fromMergesFile(path: String): BpeVocab = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try fromMerges(src.getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val parts = l.split(" ")
        require(parts.length == 2, s"malformed merges line: '$l'")
        (parts(0), parts(1))
      }.toSeq)
    finally src.close()
  }
}

/** Codegen'd Catalyst expression: total [[BpeVocab]] token count of a
  * string column. The vocabulary is attached to the plan via
  * `addReferenceObj` — serialized to executors once, no UDF boundary,
  * stays inside whole-stage codegen. */
case class BpeCount(child: Expression, vocab: BpeVocab)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_count requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  protected override def nullSafeEval(input: Any): Any =
    vocab.countTokens(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocab", vocab,
      classOf[BpeVocab].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

/** [[Tokenizer]] implementation backed by a real BPE vocabulary — the
  * third rung of the token-counting ladder (whitespace → subtoken →
  * BPE), injectable into sequence packing and every other consumer of
  * the trait without touching the operators. */
final class BpeTokenizer(vocab: BpeVocab) extends Tokenizer {
  override def countTokens(text: Column): Column = {
    val spark = SparkSession.active
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_count", exprs => BpeCount(exprs.head, vocab), "built-in")
    call_function("graft_bpe_count", text)
  }
}
