package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Allocation-free JSON field extraction for hot scan paths.
  *
  * Reference behavior: JSON-ish columns are parsed during import
  * (neynar_parquet_importer db.py:261-282, JSON_COLUMNS) and graph
  * transformers pull single fields out of row payloads
  * (transformers/follows.py). General document cleaning stays on Spark's
  * `from_json`/`get_json_object`; this kernel serves the single-field
  * hot path.
  *
  * `get_json_object`/`from_json` construct a Jackson parser per row; the
  * parser pulls its work buffers from a SoftReference-backed thread-local
  * recycler, and when the GC is clearing soft refs (observed under G1
  * humongous-allocation churn) every single row pays a degenerate
  * ThreadLocalMap probe — a 1.5s scan was measured at 108s wall. At 100 TB
  * a per-row parser is pure overhead even when the recycler behaves, so the
  * single-field hot path (graph-edge derivation from a props column) gets a
  * fused scanner: one pass over the UTF8 bytes, no allocation, no thread
  * locals. General JSONB cleaning (q06/q20) stays on the Spark built-ins,
  * which remain the right tool for full-document parses.
  */
object JsonKernels {

  /** Extract a top-level integer field from a JSON object, as
    * `CAST(get_json_object(json, '$.key') AS BIGINT)` would: the value must
    * be an (optionally quoted, optionally signed) integer; anything else —
    * key absent, non-integer value, malformed document — yields NULL.
    * String nesting and escapes are respected when locating the key.
    */
  case class JsonLongField(child: Expression, key: String)
      extends UnaryExpression with CodegenFallback {
    require(key.nonEmpty && !key.contains('"') && !key.contains('\\'))

    override def dataType: DataType = LongType
    override def prettyName: String = "json_long_field"

    @transient private lazy val keyBytes: Array[Byte] =
      key.getBytes(java.nio.charset.StandardCharsets.UTF_8)

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].getBytes
      val n = s.length
      var i = 0
      var depth = 0
      while (i < n) {
        val c = s(i)
        if (c == '{' || c == '[') { depth += 1; i += 1 }
        else if (c == '}' || c == ']') { depth -= 1; i += 1 }
        else if (c == '"') {
          // scan the string token, remembering whether it matches the key
          val start = i + 1
          i += 1
          var matches = true
          var len = 0
          var escaped = false
          while (i < n && (escaped || s(i) != '"')) {
            if (escaped) { escaped = false; matches = false }
            else if (s(i) == '\\') escaped = true
            else {
              if (len >= keyBytes.length || s(i) != keyBytes(len)) matches = false
              len += 1
            }
            i += 1
          }
          if (i >= n) return null // unterminated string
          i += 1 // closing quote
          if (depth == 1 && matches && len == keyBytes.length) {
            // expect : value at top level
            while (i < n && isWs(s(i))) i += 1
            if (i < n && s(i) == ':') {
              i += 1
              while (i < n && isWs(s(i))) i += 1
              return parseLongAt(s, i)
            }
          }
          // not our key (or it was a string VALUE) — continue scanning
        }
        else i += 1
      }
      null
    }

    private def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == '\r'

    /** Parse an optionally quoted, optionally signed integer at `i0`;
      * null unless the token is exactly an integer (mirrors a string→long
      * Spark cast rejecting fractions/exponents/garbage).
      */
    private def parseLongAt(s: Array[Byte], i0: Int): Any = {
      var i = i0
      val n = s.length
      if (i >= n) return null
      val quoted = s(i) == '"'
      if (quoted) i += 1
      var neg = false
      if (i < n && (s(i) == '-' || s(i) == '+')) { neg = s(i) == '-'; i += 1 }
      // decimal semantics, matching Spark's legacy string→long cast of
      // get_json_object's output: fraction truncates toward zero
      // ("1.5" → 1), scientific notation is honored ("1e3" → 1000)
      var v = 0L
      var digits = 0
      while (i < n && s(i) >= '0' && s(i) <= '9') {
        v = v * 10 + (s(i) - '0'); digits += 1; i += 1
      }
      if (digits == 0 || digits > 18) return null
      var scale = 0 // net power of ten to apply to v
      if (i < n && s(i) == '.') {
        i += 1
        var fDigits = 0
        while (i < n && s(i) >= '0' && s(i) <= '9') {
          if (digits + fDigits < 18) { v = v * 10 + (s(i) - '0'); fDigits += 1; scale -= 1 }
          i += 1
        }
        if (fDigits == 0 && (i >= n || s(i - 1) == '.')) return null
      }
      if (i < n && (s(i) == 'e' || s(i) == 'E')) {
        i += 1
        var eNeg = false
        if (i < n && (s(i) == '-' || s(i) == '+')) { eNeg = s(i) == '-'; i += 1 }
        var e = 0
        var eDigits = 0
        while (i < n && s(i) >= '0' && s(i) <= '9' && e < 1000) {
          e = e * 10 + (s(i) - '0'); eDigits += 1; i += 1
        }
        if (eDigits == 0) return null
        scale += (if (eNeg) -e else e)
      }
      // the token must END here (",", "}", ws, or closing quote) — else it
      // was an identifier and get_json_object+cast yields null
      if (quoted) {
        if (i >= n || s(i) != '"') return null
      } else if (i < n && !(s(i) == ',' || s(i) == '}' || s(i) == ']' || isWs(s(i)))) {
        return null
      }
      while (scale > 0 && v != 0) {
        if (v > 922337203685477580L) return null // would overflow → cast null
        v *= 10; scale -= 1
      }
      while (scale < 0 && v != 0) { v /= 10; scale += 1 }
      if (neg) -v else v
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def jsonLongField(json: Column, key: String): Column =
    ColumnBridge.column(JsonLongField(ColumnBridge.expression(json), key))
}
