package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd signature kernels for the dedup family.
  *
  * The declarative formulations (aggregate/transform/zip_with) are
  * semantically identical but interpreted — Spark's higher-order functions
  * never enter whole-stage codegen, and the lambda machinery costs ~100µs
  * per element. Measured on the documents table: 130ms/doc interpreted vs
  * ~1µs/doc for these fused loops. At 100 TB the signature pass is a pure
  * scan — it must run at codegen speed.
  */

object MinHashCoefficients {
  val P: Long = 2305843009213693951L // 2^61 - 1
  def a(n: Int): Array[Long] =
    Array.tabulate(n)(i => 2L * (i * 0x9E3779B97F4A7C15L + 0xC2B2AE3D27D4EB4FL) + 1L)
  def b(n: Int): Array[Long] =
    Array.tabulate(n)(i => i * 0xD6E8FEB86659FD93L + 0xA5A5A5A5A5A5A5A5L)
}

/** MinHash signature over an array<long> of shingle hashes:
  * sig[j] = min over shingles of pmod(a_j * h + b_j, 2^61-1).
  */
case class MinHashSignature(child: Expression, numHashes: Int) extends UnaryExpression {
  import MinHashCoefficients.P

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val coefA: Array[Long] = MinHashCoefficients.a(numHashes)
  @transient private lazy val coefB: Array[Long] = MinHashCoefficients.b(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < numHashes) {
        var v = (coefA(j) * h + coefB(j)) % P
        if (v < 0) v += P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val a = ctx.addReferenceObj("mhCoefA", coefA, "long[]")
      val b = ctx.addReferenceObj("mhCoefB", coefB, "long[]")
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val hv = ctx.freshName("hv")
      val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $h.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $hv = $h.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = ($a[$j] * $hv + $b[$j]) % ${P}L;
         |    if ($v < 0) $v += ${P}L;
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over an array<long> of token hashes: each hash votes ±1
  * on every bit, the sign of the vote sum sets the output bit.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val hashes = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val hv = ctx.freshName("hv")
      val out = ctx.freshName("out")
      s"""
         |int[] $votes = new int[64];
         |int $n = $h.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $hv = $h.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($hv >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $k = 0; $k < 64; $k++) { if ($votes[$k] > 0) $out |= (1L << $k); }
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExprs {
  def minhashSignature(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashes), numHashes))

  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))

  def tokenShingleHashes(text: Column, k: Int): Column =
    ColumnBridge.column(TokenShingleHashes(ColumnBridge.expression(text), k))

  def arrayMatchFraction(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayMatchFraction(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def longSetJaccard(a: Column, b: Column): Column =
    ColumnBridge.column(LongSetJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Fused tokenize → k-word shingle → hash kernel: lowercases, splits on
  * whitespace, hashes every k-token shingle (docs shorter than k yield one
  * whole-doc shingle). One Java pass per document — replaces a chain of
  * three interpreted higher-order functions in the MinHash/SimHash scan.
  * k=1 degenerates to per-token hashes (SimHash input).
  * Hash: 31-poly over chars with a splitmix64 finalizer (bit-uniform, as
  * SimHash votes need unbiased bits).
  */
case class TokenShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_shingle_hashes"

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def hashShingle(toks: Array[String], from: Int, until: Int): Long = {
    var h = 1125899906842597L
    var t = from
    while (t < until) {
      if (t > from) h = 31 * h + ' '
      val s = toks(t)
      var c = 0
      while (c < s.length) { h = 31 * h + s.charAt(c); c += 1 }
      t += 1
    }
    mix(h)
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.trim.toLowerCase
    val toks = ws.split(text).filter(_.nonEmpty)
    val out =
      if (toks.length <= k) Array(hashShingle(toks, 0, toks.length))
      else Array.tabulate(toks.length - k + 1)(i => hashShingle(toks, i, i + k))
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fraction of positions where two equal-length long arrays match — the
  * MinHash Jaccard estimate, as one fused loop per candidate pair.
  */
case class ArrayMatchFraction(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_match_fraction"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    if (n == 0) 0.0
    else {
      var eq = 0
      var i = 0
      while (i < n) { if (x.getLong(i) == y.getLong(i)) eq += 1; i += 1 }
      eq.toDouble / n.toDouble
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact Jaccard similarity of two long arrays treated as sets — one fused
  * loop per candidate pair (sort-merge over sorted copies, no boxing).
  * Used for n-gram Jaccard where the shingle sets are already hashed; a
  * 64-bit hash collision changing set cardinality is ~2^-64 per pair.
  */
case class LongSetJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "long_set_jaccard"

  private def sortedDistinct(a: ArrayData): Array[Long] = {
    val n = a.numElements()
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) { arr(i) = a.getLong(i); i += 1 }
    java.util.Arrays.sort(arr)
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || arr(i) != arr(w - 1)) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(arr, w)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = sortedDistinct(a.asInstanceOf[ArrayData])
    val y = sortedDistinct(b.asInstanceOf[ArrayData])
    if (x.isEmpty && y.isEmpty) 1.0
    else {
      var i = 0; var j = 0; var inter = 0
      while (i < x.length && j < y.length) {
        if (x(i) == y(j)) { inter += 1; i += 1; j += 1 }
        else if (x(i) < y(j)) i += 1
        else j += 1
      }
      inter.toDouble / (x.length + y.length - inter).toDouble
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
