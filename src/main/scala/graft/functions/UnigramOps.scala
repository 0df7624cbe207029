package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM APPLY kernel — Viterbi (max-likelihood) segmentation
  * against a learned (piece → logProb) vocabulary (Kudo 2018; the
  * SentencePiece inference rule), as a codegen expression in the scan:
  * the vocabulary rides as a reference HashMap (the [[WordPieceOps]] /
  * [[BpeOps]] pattern), generated code calls one static helper per row,
  * no UDF boundary. A word containing a character outside the
  * vocabulary maps to ONE [UNK] token, keeping the [n_words, n_symbols]
  * token-count bounds intact. Tie-break on equal path likelihoods:
  * the candidate ending with the SHORTER last piece wins (first strict
  * improvement is kept while scanning piece lengths ascending) — doubles
  * make exact ties vanishingly rare, but the rule makes the kernel a
  * pure function of the vocabulary either way. */
object UnigramOps {

  /** Viterbi token count for one word; -1 means unsegmentable (caller
    * counts the word as a single [UNK]). */
  def viterbiWord(word: String, vocab: java.util.HashMap[String, java.lang.Double],
                  maxLen: Int): Int = {
    val n = word.length
    val best = new Array[Double](n + 1)
    val cnt = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= math.min(maxLen, i)) {
        if (best(i - l) != Double.NegativeInfinity) {
          val lp = vocab.get(word.substring(i - l, i))
          if (lp != null) {
            val sc = best(i - l) + lp.doubleValue()
            if (sc > best(i)) { best(i) = sc; cnt(i) = cnt(i - l) + 1 }
          }
        }
        l += 1
      }
      i += 1
    }
    if (best(n) == Double.NegativeInfinity) -1 else cnt(n)
  }

  /** Static per-row entry point the generated code calls: total Viterbi
    * token count of a whitespace-tokenized text. */
  def countTokens(text: UTF8String, vocab: java.util.HashMap[String, java.lang.Double],
                  maxLen: Int): Int = {
    val words = text.toString.split(" ")
    var total = 0
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        val t = viterbiWord(word, vocab, maxLen)
        total += (if (t < 0) 1 else t) // [UNK]
      }
      w += 1
    }
    total
  }

  def vocabMapOf(vocab: Seq[(String, Double)]): java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    vocab.foreach { case (p, lp) => m.put(p, java.lang.Double.valueOf(lp)) }
    m
  }

  def unigramTokenCount(text: Column, vocab: Seq[(String, Double)]): Column =
    ColumnBridge.column(UnigramTokenCount(ColumnBridge.expression(text), vocab))
}

/** Total Unigram-LM token count of a text column under a learned
  * (piece, logProb) vocabulary (Viterbi segmentation; unsegmentable
  * word = one [UNK]). */
case class UnigramTokenCount(child: Expression, vocab: Seq[(String, Double)])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def dataType: DataType = IntegerType

  @transient private lazy val vocabMap = UnigramOps.vocabMapOf(vocab)
  @transient private lazy val maxLen =
    if (vocab.isEmpty) 1 else vocab.iterator.map(_._1.length).max

  override def nullSafeEval(input: Any): Any =
    UnigramOps.countTokens(input.asInstanceOf[UTF8String], vocabMap, maxLen)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("uniVocab", vocabMap, "java.util.HashMap")
    val lenRef = ctx.addReferenceObj("uniMaxLen", Integer.valueOf(maxLen),
      "java.lang.Integer")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.UnigramOps.countTokens($t, $mapRef, $lenRef);")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
