package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expressions for the per-document shingle / MinHash /
  * winnowing kernels (guide §1.2 step 2 / §4). The built-in formulations
  * these replace are higher-order-function chains — `zip_with` +
  * `concat_ws` + `array_distinct` for the gram set, k×`array_min(
  * transform(grams, xxhash64(concat(...))))` for the signature,
  * `transform` + `array_min(slice(...))` + `array_distinct` for the
  * fingerprint set — and higher-order functions are CodegenFallback: an
  * interpreted expression tree evaluated per ELEMENT with lambda-variable
  * rebinding and boxing. After round 6 removed all the shuffles from
  * these operators, that interpreted per-row work WAS the operator.
  *
  * Each kernel reproduces its built-in chain value-exactly:
  *  - tokenization is `text.split(" ", -1)` on the decoded string —
  *    literally the same call Spark's StringSplit makes (UTF8String.split
  *    round-trips through String), trailing empties kept;
  *  - gram i = tokens[i..i+n-1] joined with " " (what zip_with of the
  *    shifted slices + concat_ws built), deduped keeping FIRST occurrence
  *    (array_distinct order);
  *  - MinHash permutation i = xxhash64 (seed 42) of the bytes
  *    "i:" ++ gram — the exact bytes concat(lit(s"$i:"), gram) hashed;
  *  - fingerprint p = min over token-hash window [p, p+w) (short tails
  *    shrink, as slice() did), deduped keeping first occurrence.
  *
  * Null text → null result (the former chains propagated null the same
  * way); empty gram arrays → k null signature mins (array_min of an
  * empty array), preserved for callers that skip the size(g)>0 filter.
  */
object ShingleOps {

  private def tokens(text: UTF8String): Array[String] =
    text.toString.split(" ", -1)

  /** Distinct n-gram array of one document (called from generated code). */
  def grams(text: UTF8String, n: Int): ArrayData = {
    val toks = tokens(text)
    val seen = new java.util.LinkedHashSet[String]()
    if (n <= 1) {
      var i = 0
      while (i < toks.length) { seen.add(toks(i)); i += 1 }
    } else {
      val m = toks.length - (n - 1)
      var i = 0
      val sb = new java.lang.StringBuilder
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** k MinHash mins over a gram array (called from generated code). */
  def minhash(grams: ArrayData, prefixes: Array[Array[Byte]]): ArrayData = {
    val k = prefixes.length
    val g = grams.numElements()
    val out = new Array[Any](k)
    if (g == 0) return new GenericArrayData(out) // k nulls = array_min(empty)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var maxP = 0
    var i = 0
    while (i < k) { if (prefixes(i).length > maxP) maxP = prefixes(i).length; i += 1 }
    var j = 0
    while (j < g) {
      val gb = grams.getUTF8String(j).getBytes
      // one buffer per gram: gram bytes at a fixed tail, each permutation's
      // prefix written immediately before it, hash over [start, end)
      val buf = new Array[Byte](maxP + gb.length)
      System.arraycopy(gb, 0, buf, maxP, gb.length)
      i = 0
      while (i < k) {
        val p = prefixes(i)
        val start = maxP - p.length
        System.arraycopy(p, 0, buf, start, p.length)
        val h = XXH64.hashUnsafeBytes(buf,
          Platform.BYTE_ARRAY_OFFSET + start, p.length + gb.length, 42L)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    i = 0
    while (i < k) { out(i) = mins(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Distinct rolling-window min token hashes (called from generated code). */
  def fingerprints(text: UTF8String, window: Int): ArrayData = {
    val toks = tokens(text)
    val n = toks.length
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = XXH64.hashUTF8String(UTF8String.fromString(toks(i)), 42L)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < n) {
      var m = Long.MaxValue
      var j = i
      val end = math.min(i + window, n)
      while (j < end) { if (hs(j) < m) m = hs(j); j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  // ---- Column wrappers ----

  import org.apache.spark.sql.zenospark.Bridge

  def gramArray(text: Column, n: Int): Column =
    Bridge.column(GramArray(Bridge.expression(text), n))
  def minhashSig(grams: Column, k: Int): Column =
    Bridge.column(MinhashSig(Bridge.expression(grams), k))
  def fingerprintSet(text: Column, window: Int): Column =
    Bridge.column(FingerprintSet(Bridge.expression(text), window))
}

/** Distinct word n-grams of a text column — native twin of
  * array_distinct(zip_with-of-shifted-slices ∘ concat_ws ∘ split).
  */
case class GramArray(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.grams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.ShingleOps.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramArray =
    copy(child = newChild)
}

/** k-permutation MinHash signature over a gram-array column — native twin
  * of array(array_min(transform(g, xxhash64(concat(lit(s"$i:"), _)))) ×k).
  * Permutation prefixes ride the codegen references array.
  */
case class MinhashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(i => s"$i:".getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.minhash(input.asInstanceOf[ArrayData], prefixes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pref = ctx.addReferenceObj("prefixes", prefixes, "byte[][]")
    defineCodeGen(ctx, ev, c => s"graft.spark.ShingleOps.minhash($c, $pref)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** Winnowing fingerprint set of a text column — native twin of
  * array_distinct(transform(hs, (h, i) => array_min(slice(hs, i+1, w))))
  * over hs = transform(split(text, " "), xxhash64).
  */
case class FingerprintSet(child: Expression, window: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.fingerprints(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.spark.ShingleOps.fingerprints($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): FingerprintSet =
    copy(child = newChild)
}
