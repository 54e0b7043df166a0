package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003, the
  * MOSS algorithm) as ONE codegen kernel pass per document: hash every
  * k-gram, slide a w-window over the hash stream, keep the minimum of each
  * window (ties → leftmost), emit the distinct survivors as fixed-width
  * `md5hex:zero-padded-pos` composites — the exact composite the SQL oracle
  * replays with `MIN(hp) OVER (… ROWS BETWEEN CURRENT ROW AND w-1
  * FOLLOWING)`.
  *
  * This kernel exists for shuffle VOLUME, not semantics: the round-5 form
  * exploded every char position into a 43-byte composite row and shuffled
  * the full gram stream (~40× the corpus bytes) through a per-doc window —
  * correct, but the driver bench paid 26 s for it at sf0.1. Winnowing is
  * per-document local by definition, so the selection belongs INSIDE the
  * scan: this pass emits only the ~2/w surviving fingerprints, and the only
  * remaining movement is the output itself. At 100 TB that is the difference
  * between shuffling 4 PB of gram rows and shuffling a fingerprint index.
  *
  * Hash order: md5 hex compared as a fixed-width lowercase string — the one
  * total order both engines share bit-for-bit. Tie-break `<` keeps the
  * leftmost minimum, exactly the string-min of the `hash:pos` composite
  * (hash ASC, pos ASC). char = UTF-16 unit = ASCII byte on this corpus
  * (ReferenceDataSpec pins documents ASCII-only).
  */
case class WinnowFingerprints(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(text: Any, k: Any, w: Any): Any =
    WinnowFingerprints.composites(text.asInstanceOf[UTF8String].toString,
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k, w) =>
      s"graft.functions.WinnowFingerprints.composites($t.toString(), $k, $w)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WinnowFingerprints =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WinnowFingerprints {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def md5hex(s: String): String = {
    val md = mdLocal.get()
    md.reset()
    val b = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < 16) {
      sb.append(Character.forDigit((b(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(b(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Distinct winnowed fingerprints of `s`, position-ascending, as
    * `md5hex(gram) ++ ":" ++ lpad(pos, 10, '0')` with 1-based gram start
    * positions. Only FULL w-windows select (a stream with fewer than w
    * grams yields nothing — the `n_in = w` rule of the windowed form). */
  def composites(s: String, k: Int, w: Int): ArrayData = {
    val n = s.length
    val p = n - k + 1
    if (p < w) return new GenericArrayData(Array.empty[AnyRef])
    val hashes = new Array[String](p)
    var i = 0
    while (i < p) { hashes(i) = md5hex(s.substring(i, i + k)); i += 1 }
    val selected = new Array[Boolean](p)
    var j = 0
    while (j <= p - w) {
      var best = j
      var t = j + 1
      while (t < j + w) {
        if (hashes(t).compareTo(hashes(best)) < 0) best = t
        t += 1
      }
      selected(best) = true
      j += 1
    }
    val out = scala.collection.mutable.ArrayBuilder.make[AnyRef]
    i = 0
    while (i < p) {
      if (selected(i)) {
        val pos = (i + 1).toString
        val sb = new java.lang.StringBuilder(43)
        sb.append(hashes(i)).append(':')
        var z = pos.length
        while (z < 10) { sb.append('0'); z += 1 }
        sb.append(pos)
        out += UTF8String.fromString(sb.toString)
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprints",
      exprs => WinnowFingerprints(exprs(0), exprs(1), exprs(2)), "built-in")
}
