package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece APPLY kernel — greedy longest-match-first (MaxMatch)
  * segmentation against a learned vocabulary (Wu et al. 2016, the BERT
  * tokenizer's inference rule), as a codegen expression in the scan:
  * the vocabulary rides as a reference HashSet (the [[BpeOps]] /
  * [[PqEncode]] pattern), the generated code calls one static helper
  * per row, no UDF boundary, no encoder round-trip. A word that cannot
  * be fully segmented (a character outside the vocabulary) maps to ONE
  * [UNK] token — the real WordPiece rule, which also keeps the
  * [n_words, n_symbols] token-count bounds intact. */
object WordPieceOps {

  /** Greedy longest-match token count for one word; -1 means
    * unsegmentable (caller counts the word as a single [UNK]). */
  def maxMatchWord(word: String, vocab: java.util.HashSet[String],
                   maxLen: Int): Int = {
    val n = word.length
    var i = 0
    var toks = 0
    while (i < n) {
      var l = math.min(maxLen, n - i)
      var found = false
      while (l >= 1 && !found) {
        if (vocab.contains(word.substring(i, i + l))) found = true
        else l -= 1
      }
      if (!found) return -1
      toks += 1
      i += l
    }
    toks
  }

  /** Static per-row entry point the generated code calls: total WordPiece
    * token count of a whitespace-tokenized text. */
  def countTokens(text: UTF8String, vocab: java.util.HashSet[String],
                  maxLen: Int): Int = {
    val words = text.toString.split(" ")
    var total = 0
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        val t = maxMatchWord(word, vocab, maxLen)
        total += (if (t < 0) 1 else t) // [UNK]
      }
      w += 1
    }
    total
  }

  def vocabSetOf(vocab: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    vocab.foreach(s.add)
    s
  }

  def wordPieceTokenCount(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(WordPieceTokenCount(ColumnBridge.expression(text), vocab))
}

/** Total WordPiece token count of a text column under a learned
  * vocabulary (greedy longest-match; unsegmentable word = one [UNK]). */
case class WordPieceTokenCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType = IntegerType

  @transient private lazy val vocabSet = WordPieceOps.vocabSetOf(vocab)
  @transient private lazy val maxLen =
    if (vocab.isEmpty) 1 else vocab.map(_.length).max

  override def nullSafeEval(input: Any): Any =
    WordPieceOps.countTokens(input.asInstanceOf[UTF8String], vocabSet, maxLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wpVocab", vocabSet, "java.util.HashSet")
    val lenRef = ctx.addReferenceObj("wpMaxLen", Integer.valueOf(maxLen),
      "java.lang.Integer")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WordPieceOps.countTokens($t, $setRef, $lenRef);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
