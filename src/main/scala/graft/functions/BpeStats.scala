package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenizer APPLICATION over one document (x32): tokenize the text on
  * whitespace, BPE-encode every lowercase-letter word against the PINNED
  * merge table [[BpeStats.Merges]], and return the four order-free totals
  * `[n_words, n_chars, n_tokens, sum_tok_ids]` — the pass a training
  * pipeline runs on 100% of the corpus once a tokenizer is trained (x30
  * pins the training inner loop; this pins the apply).
  *
  * Encoding contract (what the DuckDB oracle replays verbatim):
  *  - words = whitespace tokens of `lower(text)`;
  *  - a word of pure ASCII letters `[a-z]+` starts as its character list
  *    and each merge rule is applied IN RANK ORDER, merging the leftmost
  *    adjacent (a, b) pair repeatedly until none remain before the next
  *    rank (within one rule the single left-to-right greedy pass is the
  *    same fixpoint: the merged token `ab` can never be the `a` or the
  *    `b` of its own rule — it is strictly longer than either);
  *  - any other word counts as ONE token of id 0 (the byte-fallback slot
  *    — punctuation/digit handling is a pre-tokenizer concern, x01's
  *    regex face);
  *  - token ids: single letters map to 1..26, a rank-r merge product to
  *    26 + r. After applying all rules a token is by construction either
  *    a single letter or a rule's product, so the map is total.
  *
  * The merge table is MODEL STATE, pinned as a constant (the n04
  * discipline: models are broadcast/inlined, never re-derived per query)
  * so the oracle replays APPLICATION, not training — it was trained once
  * with the classic recipe (count pairs weighted by word frequency,
  * argmax with count-desc/pair-asc tie-break, merge, repeat x32 — the
  * iterated form of x30's one-step candidate count) over the sf0.001
  * `documents` stratum.
  *
  * Native Catalyst expression with `doGenCode` (the scan stays inside
  * whole-stage codegen); all four totals are BIGINT sums, so the per-doc
  * result is exact and shuffle-order-free. */
case class BpeStats(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_stats"

  // lowercase through UTF8String — the SAME mapping Spark's own lower()
  // applies, so x32 inherits exactly the cross-engine lower() contract
  // every other text entry already relies on (Java's String.toLowerCase
  // full-mapping differs on edge codepoints like U+0130)
  override protected def nullSafeEval(text: Any): Any =
    new GenericArrayData(
      BpeStats.stats(text.asInstanceOf[UTF8String].toLowerCase.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.BpeStats.stats($t.toLowerCase().toString()))")

  override protected def withNewChildInternal(newChild: Expression): BpeStats =
    copy(child = newChild)
}

object BpeStats {

  /** The pinned merge table, rank order. Trained once (see class doc);
    * results are all distinct, so `26 + rank` is a collision-free id. */
  val Merges: Array[(String, String)] = Array(
    "e" -> "r", "o" -> "r", "i" -> "n", "o" -> "w", "s" -> "t",
    "l" -> "u", "a" -> "r", "p" -> "ar", "m" -> "er", "a" -> "t",
    "a" -> "n", "c" -> "an", "s" -> "can", "c" -> "o", "co" -> "lu",
    "colu" -> "m", "colum" -> "n", "d" -> "ow", "in" -> "dow",
    "w" -> "indow", "d" -> "er", "or" -> "der", "or" -> "t",
    "s" -> "ort", "par" -> "t", "u" -> "p", "a" -> "g", "ag" -> "g",
    "a" -> "lu", "alu" -> "e", "v" -> "alue", "in" -> "e")

  /** token → id: letters 1..26, rank-r merge product 26 + r. */
  private val TokenId: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]
    var c = 'a'
    while (c <= 'z') { m.put(c.toString, c - 'a' + 1); c = (c + 1).toChar }
    Merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + b, 26 + i + 1) }
    m
  }

  private def isLetters(w: String): Boolean = {
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      if (c < 'a' || c > 'z') return false
      i += 1
    }
    w.length > 0
  }

  /** Encode one `[a-z]+` word: one greedy left-to-right pass per rule, in
    * rank order (see the class doc for why one pass is the fixpoint). */
  def encode(word: String): Array[String] = {
    var toks = new Array[String](word.length)
    var i = 0
    while (i < word.length) { toks(i) = String.valueOf(word.charAt(i)); i += 1 }
    var r = 0
    while (r < Merges.length) {
      val (a, b) = Merges(r)
      var changed = false
      var j = 0
      while (!changed && j < toks.length - 1) {
        changed = (toks(j) == a) && (toks(j + 1) == b)
        j += 1
      }
      if (changed) {
        val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
        var k = 0
        while (k < toks.length) {
          if (k + 1 < toks.length && toks(k) == a && toks(k + 1) == b) {
            out += a + b; k += 2
          } else { out += toks(k); k += 1 }
        }
        toks = out.toArray
      }
      r += 1
    }
    toks
  }

  /** `[n_words, n_chars, n_tokens, sum_tok_ids]` for one ALREADY
    * LOWERCASED document (the expression lowercases via UTF8String —
    * Spark's own lower() mapping). n_chars counts CODEPOINTS, not UTF-16
    * units, matching DuckDB's len() on supplementary-plane characters. */
  def stats(text: String): Array[Long] = {
    var nWords = 0L; var nChars = 0L; var nTokens = 0L; var idSum = 0L
    val words = text.split("\\s+")
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        nWords += 1
        nChars += w.codePointCount(0, w.length).toLong
        if (isLetters(w)) {
          val toks = encode(w)
          nTokens += toks.length
          var t = 0
          while (t < toks.length) { idSum += TokenId.get(toks(t)).toLong; t += 1 }
        } else nTokens += 1
      }
      i += 1
    }
    Array(nWords, nChars, nTokens, idSum)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_stats", exprs => BpeStats(exprs(0)), "built-in")
}
