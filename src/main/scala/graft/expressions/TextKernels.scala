package graft.expressions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document text-analysis kernels.
  *
  * Same rationale as HashExprs: the declarative formulations
  * (explode + groupBy for marker counting, transform/slice/array_min for
  * winnowing) either shuffle or run through interpreted higher-order
  * functions. Each kernel here is one tight Java loop per document — the
  * whole pass stays a pure scan, which is the only shape that works when
  * the documents table is 100 TB. (CodegenFallback costs one boxed call
  * per ROW, not per element — negligible next to the per-char loop.)
  */
object TextKernels {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Tokenization shared by all kernels — must match
    * `filter(split(lower(trim(text)), "\\s+"), _ != "")`, which the DuckDB
    * oracles mirror with string_split_regex.
    */
  private[expressions] def tokenize(text: UTF8String): Array[String] =
    ws.split(text.toString.trim.toLowerCase(Locale.ROOT)).filter(_.nonEmpty)

  /** Per-language marker-word counts (with repeats) in one pass:
    * out[i] = number of tokens contained in markers(i)._2.
    */
  case class LangMarkerCounts(child: Expression, markers: Seq[Seq[String]])
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "lang_marker_counts"

    // token -> bitmask of languages it marks (marker lists are tiny)
    @transient private lazy val lookup: java.util.HashMap[String, Int] = {
      val m = new java.util.HashMap[String, Int]()
      markers.zipWithIndex.foreach { case (words, i) =>
        words.foreach { w =>
          val prev = m.get(w)
          m.put(w, (if (prev == null) 0 else prev.intValue()) | (1 << i))
        }
      }
      m
    }

    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String])
      val counts = new Array[Long](markers.size)
      var i = 0
      while (i < toks.length) {
        val mask = lookup.getOrDefault(toks(i), 0)
        if (mask != 0) {
          var j = 0
          while (j < counts.length) {
            if ((mask & (1 << j)) != 0) counts(j) += 1L
            j += 1
          }
        }
        i += 1
      }
      new GenericArrayData(counts)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Token statistics in one pass: [n_tokens, sum of token lengths,
    * stopword count] — the inputs of the quality score.
    */
  case class TokenStats(child: Expression, stopwords: Seq[String])
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "token_stats"

    @transient private lazy val stops: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      stopwords.foreach(s.add)
      s
    }

    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String])
      var lenSum = 0L
      var nStop = 0L
      var i = 0
      while (i < toks.length) {
        lenSum += toks(i).length
        if (stops.contains(toks(i))) nStop += 1
        i += 1
      }
      new GenericArrayData(Array(toks.length.toLong, lenSum, nStop))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Repetition statistics in one pass: [n_tokens, n_distinct, top_count]
    * — the Gopher duplicate-token inputs (t09). Every token of a document
    * originates in that document's own row, so the per-doc aggregation the
    * explode + groupBy(doc, tok) formulation SHUFFLES for (twice — once
    * per grouping — with the token strings as the shuffle key) is
    * computable where the document already is: one hash map per row, zero
    * exchanges, and a 100 TB documents scan stays a scan.
    */
  case class RepetitionStats(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "repetition_stats"

    override def nullSafeEval(input: Any): Any = {
      val toks = tokenize(input.asInstanceOf[UTF8String])
      val m = new java.util.HashMap[String, java.lang.Long]()
      var top = 0L
      var i = 0
      while (i < toks.length) {
        val prev = m.get(toks(i))
        val c = if (prev == null) 1L else prev.longValue() + 1L
        m.put(toks(i), c)
        if (c > top) top = c
        i += 1
      }
      new GenericArrayData(Array(toks.length.toLong, m.size.toLong, top))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03) in one pass:
    * hash all char k-grams of lower(trim(text)), slide a `window`-gram
    * window keeping each window's minimum, emit the distinct minima in
    * first-occurrence order. Texts shorter than k yield one whole-text
    * gram; gram counts <= window yield the single global minimum — the
    * exact semantics of the declarative version this replaces (which spent
    * ~100ms/doc in interpreted transform/slice/array_min).
    */
  case class WinnowFingerprint(child: Expression, k: Int, window: Int)
      extends UnaryExpression with CodegenFallback {
    require(k >= 1 && window >= 1)

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "winnow_fingerprint"

    private def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString.trim.toLowerCase(Locale.ROOT)
      val n = text.length
      val nGrams = math.max(n - k + 1, 1)
      // gram hashes: 31-poly over chars + splitmix finalizer (bit-uniform)
      val gh = new Array[Long](nGrams)
      var i = 0
      while (i < nGrams) {
        var h = 1125899906842597L
        var c = i
        val end = math.min(i + k, n)
        while (c < end) { h = 31 * h + text.charAt(c); c += 1 }
        gh(i) = mix(h)
        i += 1
      }
      if (nGrams <= window) {
        var mn = Long.MaxValue
        i = 0
        while (i < nGrams) { if (gh(i) < mn) mn = gh(i); i += 1 }
        new GenericArrayData(Array(mn))
      } else {
        val seen = new java.util.HashSet[Long]()
        val out = new java.util.ArrayList[java.lang.Long]()
        i = 0
        val last = nGrams - window
        while (i <= last) {
          var mn = Long.MaxValue
          var j = i
          while (j < i + window) { if (gh(j) < mn) mn = gh(j); j += 1 }
          if (seen.add(mn)) out.add(mn)
          i += 1
        }
        val arr = new Array[Long](out.size)
        var w = 0
        while (w < arr.length) { arr(w) = out.get(w); w += 1 }
        new GenericArrayData(arr)
      }
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // --- Column-facing constructors -------------------------------------------

  def langMarkerCounts(text: Column, markers: Seq[Seq[String]]): Column =
    ColumnBridge.column(LangMarkerCounts(ColumnBridge.expression(text), markers))

  def tokenStats(text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(TokenStats(ColumnBridge.expression(text), stopwords))

  def repetitionStats(text: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text)))

  def winnowFingerprint(text: Column, k: Int, window: Int): Column =
    ColumnBridge.column(WinnowFingerprint(ColumnBridge.expression(text), k, window))
}
