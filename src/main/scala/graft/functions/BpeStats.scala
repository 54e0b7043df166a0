package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenizer APPLICATION over one document (x32): tokenize the text on
  * whitespace, BPE-encode every lowercase-letter word against the PINNED
  * merge table [[BpeMerges.Table]] (1024 ranks — production-shaped, not a
  * toy), and return the four order-free totals
  * `[n_words, n_chars, n_tokens, sum_tok_ids]` — the pass a training
  * pipeline runs on 100% of the corpus once a tokenizer is trained (x30
  * pins the training inner loop; this pins the apply).
  *
  * Encoding contract (what the DuckDB oracle replays verbatim):
  *  - words = whitespace tokens of `lower(text)`;
  *  - a word of pure ASCII letters `[a-z]+` starts as its character list
  *    and merges are applied LOWEST-RANK-FIRST: while any adjacent pair
  *    has a rank, merge the pair with the smallest rank, leftmost
  *    occurrence on ties — the standard BPE apply order;
  *  - any other word counts as ONE token of id 0 (the byte-fallback slot
  *    — punctuation/digit handling is a pre-tokenizer concern, x01's
  *    regex face);
  *  - token ids: single letters map to 1..26, a rank-r merge product to
  *    26 + r. After applying all rules a token is by construction either
  *    a single letter or a rule's product, so the map is total; the
  *    trainer only mints NEW product strings, so it is collision-free.
  *
  * ORDER EQUIVALENCE (why training and apply agree): every rule's product
  * is a string that was NOT in the vocabulary when the rule was created,
  * and its operands were. So a later rule can never mint a token equal to
  * an earlier rule's operand — once rank r's occurrences are gone they
  * cannot come back, which makes three orders produce identical
  * tokenizations: the training sequence (each rule applied at creation),
  * fixpoint-per-rank application, and the lowest-rank-first order this
  * kernel and the oracle implement. KernelPropertySpec pins heap ≡ naive
  * lowest-rank-first over RANDOM tables (algorithm correctness) and the
  * pinned table's per-rank ≡ lowest-rank-first agreement (table
  * well-formedness).
  *
  * COMPLEXITY — the production shape: per word, a pair-heap over a
  * doubly-linked token list gives O(L log L) for a length-L word,
  * INDEPENDENT of the table size (the rank map is O(1) per lookup). The
  * previous one-greedy-pass-per-rank form was O(ranks × L) — fine at 32
  * ranks, infeasible at a real tokenizer's 32k–100k merges for the one
  * pass every pipeline runs over the whole corpus. A per-thread LRU memo
  * caches word → (n_tokens, id_sum) — natural-language corpora are
  * Zipfian, so the hit rate approaches 1 (the same trick HuggingFace's
  * tokenizers ship); the memo is bounded (64k entries/thread) and holds
  * only primitives, so executor memory is safe.
  *
  * The merge table is MODEL STATE, pinned as a generated constant (the
  * n04 discipline: models are broadcast/inlined, never re-derived per
  * query) so the oracle replays APPLICATION, not training — provenance
  * and recipe in `graft.tools.BpeTrain` (test sources).
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

  /** The pinned merge table, rank order — generated, see [[BpeMerges]]. */
  val Merges: Array[(String, String)] = BpeMerges.Table

  /** Pair-key separator. Tokens are `[a-z]+`, so ' ' never collides
    * and (a, b) → `a + SEP + b` is injective. */
  private final val Sep = ' '

  /** (a, b) → rank (1-based), O(1) per adjacent-pair lookup. */
  private val Ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](Merges.length * 2)
    Merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(a + Sep + b, i + 1)
    }
    m
  }

  /** token → id: letters 1..26, rank-r merge product 26 + r. */
  private val TokenId: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](Merges.length * 2 + 64)
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

  /** Encode one `[a-z]+` word against the pinned table. */
  def encode(word: String): Array[String] = encode(word, Ranks)

  /** Heap/linked-list BPE apply — lowest rank first, leftmost on ties.
    *
    * Tokens live on a doubly-linked list over the word's positions; a
    * binary min-heap of packed (rank, leftPos) longs holds one entry per
    * pair CREATION (initial adjacencies + every post-merge neighbor).
    * Entries are validated on pop: the pair must still be adjacent and
    * its CURRENT rank must equal the entry's. Every live pair always has
    * an entry carrying its exact key, and pops are nondecreasing, so the
    * first entry that validates is the global (rank, pos) minimum — the
    * naive spec's choice. O(L log L) per word, table-size-independent.
    *
    * The rank map is a parameter so the property spec can drive RANDOM
    * tables through the exact production code path. */
  private[graft] def encode(word: String,
      ranks: java.util.HashMap[String, Integer]): Array[String] = {
    val n = word.length
    val tok = new Array[String](n)
    var i = 0
    while (i < n) { tok(i) = String.valueOf(word.charAt(i)); i += 1 }
    if (n < 2) return tok
    val nxt = new Array[Int](n)
    val prv = new Array[Int](n)
    i = 0
    while (i < n) { nxt(i) = i + 1; prv(i) = i - 1; i += 1 }
    nxt(n - 1) = -1
    // packed key: rank << 24 | leftPos — words are far below 2^24 chars,
    // ranks far below 2^39, and the packing preserves (rank, pos) order
    var heap = new Array[Long](math.min(n, 16))
    var size = 0
    def push(key: Long): Unit = {
      if (size == heap.length) heap = java.util.Arrays.copyOf(heap, size * 2)
      heap(size) = key
      var c = size; size += 1
      while (c > 0 && heap((c - 1) / 2) > heap(c)) {
        val p = (c - 1) / 2
        val t = heap(p); heap(p) = heap(c); heap(c) = t
        c = p
      }
    }
    def pop(): Long = {
      val top = heap(0)
      size -= 1
      heap(0) = heap(size)
      var c = 0
      var done = false
      while (!done) {
        val l = 2 * c + 1; val r = l + 1
        var m = c
        if (l < size && heap(l) < heap(m)) m = l
        if (r < size && heap(r) < heap(m)) m = r
        if (m == c) done = true
        else { val t = heap(m); heap(m) = heap(c); heap(c) = t; c = m }
      }
      top
    }
    // Key packing: rank in the high 32 bits, position in the low 32
    // (unsigned) — lowest-rank-then-leftmost pops first under plain long
    // order. 32 bits of position cover any single word/doc the engine
    // can materialize as a String (Int-indexed arrays bound n < 2^31);
    // a 24-bit pos would silently mis-extract past 16M letters.
    def pushPair(p: Int, q: Int): Unit = {
      val r = ranks.get(tok(p) + Sep + tok(q))
      if (r != null) push(r.longValue() << 32 | (p.toLong & 0xFFFFFFFFL))
    }
    i = 0
    while (i < n - 1) { pushPair(i, i + 1); i += 1 }
    while (size > 0) {
      val key = pop()
      val p = (key & 0xFFFFFFFFL).toInt
      val r = (key >>> 32).toInt
      if (tok(p) != null) {
        val q = nxt(p)
        if (q != -1) {
          val cur = ranks.get(tok(p) + Sep + tok(q))
          if (cur != null && cur.intValue() == r) {
            tok(p) = tok(p) + tok(q)
            tok(q) = null
            nxt(p) = nxt(q)
            if (nxt(q) != -1) prv(nxt(q)) = p
            if (prv(p) != -1) pushPair(prv(p), p)
            if (nxt(p) != -1) pushPair(p, nxt(p))
          }
        }
      }
    }
    var count = 0
    i = 0
    while (i != -1) { count += 1; i = nxt(i) }
    val out = new Array[String](count)
    i = 0; var j = 0
    while (i != -1) { out(j) = tok(i); j += 1; i = nxt(i) }
    out
  }

  /** Per-thread LRU memo of word → (n_tokens, id_sum). Zipfian corpora
    * hit it almost always; bounded at 64k primitive-pair entries so it is
    * executor-memory-safe model-adjacent state, never a leak. */
  private val wordMemo: ThreadLocal[java.util.LinkedHashMap[String, Array[Long]]] =
    ThreadLocal.withInitial(() =>
      new java.util.LinkedHashMap[String, Array[Long]](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[Long]]): Boolean =
          size() > 65536
      })

  private def encodeStats(w: String): Array[Long] = {
    val memo = wordMemo.get()
    val hit = memo.get(w)
    if (hit != null) return hit
    val toks = encode(w)
    var idSum = 0L
    var t = 0
    while (t < toks.length) { idSum += TokenId.get(toks(t)).toLong; t += 1 }
    val v = Array(toks.length.toLong, idSum)
    memo.put(w, v)
    v
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
          val s = encodeStats(w)
          nTokens += s(0)
          idSum += s(1)
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
