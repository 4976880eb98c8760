package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Python-literal JSONB repair (reference db.py:261-281).
  *
  * Real exports carry JSON-ish columns whose payload is a *Python repr*
  * rather than strict JSON: `[{'type': 'v', 'addr': '0x…'}]`, `{'k': 1,
  * 'ok': True}`, sometimes wrapped in a stringified bytes repr
  * (`b"{'k': 1}"`). The reference routes those through `ast.literal_eval`
  * (triggered by a `[{'` / `{'` prefix) and everything else through a
  * strict JSON parser. Spark's `from_json` / `get_json_object` are strict,
  * so without this repair such rows silently become NULL — the one place
  * the engine would *lose data* a real export contains.
  *
  * [[PyJsonNormalize]] is the Spark-side mirror: a scan-stage expression
  * that rewrites Python-literal payloads into strict JSON ahead of
  * `from_json` / `get_json_object`:
  *
  *  - trigger is the reference's exact prefix test (`{'` or `[{'`,
  *    optionally inside a `b'…'` / `b"…"` bytes-repr wrapper);
  *  - non-triggering input (strict JSON, plain strings, garbage) passes
  *    through as the SAME UTF8String — zero copy, so the strict-JSON hot
  *    path pays one prefix check;
  *  - the rewrite handles both Python quote styles, `True/False/None`,
  *    tuples `()`→`[]`, Python escape forms (`\'`, `\xNN`, `\uNNNN`, …),
  *    and re-escapes for JSON (`"` inside single-quoted strings, control
  *    chars).
  *
  * Where the reference would *return the raw bytes object un-parsed*
  * (its bytes branch literal_evals `str(value)` back to `bytes` and stops),
  * this kernel goes one step further and recovers the structured payload —
  * semantics a downstream JSONB column actually wants.
  *
  * Codegen: the expression stays inside whole-stage codegen via a static
  * call (no virtual dispatch, no interpreted fallback); the converter
  * itself only allocates when a row actually triggers.
  */
object PyLiteralJson {

  /** Normalize a possibly-Python-literal payload to strict JSON; returns
    * the input instance untouched when the trigger prefix is absent.
    */
  def normalize(u: UTF8String): UTF8String = {
    if (u == null) return null
    // byte-level gate BEFORE any allocation: the strict-JSON hot path must
    // pay only this prefix inspection, never a per-row toString decode
    val nb = u.numBytes
    if (nb < 2) return u
    val b0 = u.getByte(0)
    val b1 = u.getByte(1)
    val mayTrigger =
      (b0 == '{'.toByte && b1 == '\''.toByte) ||
        (b0 == '['.toByte && b1 == '{'.toByte && nb >= 3 && u.getByte(2) == '\''.toByte) ||
        // stringified bytes repr: b'…' / b"…" (quote must close)
        (b0 == 'b'.toByte && (b1 == '\''.toByte || b1 == '"'.toByte) && nb >= 3 && u.getByte(nb - 1) == b1)
    if (!mayTrigger) return u
    val s = u.toString
    if (isTrigger(s)) {
      val c = convert(s)
      return if (c == null) u else UTF8String.fromString(c)
    }
    if (s.charAt(0) == 'b') {
      val inner = unescapePython(s.substring(2, s.length - 1))
      if (isTrigger(inner)) {
        // invalid literals (e.g. a hand-written repr whose unescaped quotes
        // turn ambiguous) fail convert → pass the ORIGINAL through unchanged;
        // the reference's bytes branch likewise keeps such payloads raw
        val c = convert(inner)
        return if (c == null) u else UTF8String.fromString(c)
      }
    }
    u
  }

  private def isTrigger(s: String): Boolean =
    s.startsWith("{'") || s.startsWith("[{'")

  /** Decode Python string-literal escapes into their actual characters
    * (the inverse of repr): `\\`, `\'`, `\"`, `\n`, `\t`, `\r`, `\b`,
    * `\f`, `\ooo` (1–3 octal digits, `\0` included), `\xNN`, `\uNNNN`.
    * Unknown escapes keep the backslash, exactly as Python literals do.
    */
  private[expressions] def unescapePython(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n) {
        s.charAt(i + 1) match {
          case '\\' => out.append('\\'); i += 2
          case '\'' => out.append('\''); i += 2
          case '"'  => out.append('"'); i += 2
          case 'n'  => out.append('\n'); i += 2
          case 't'  => out.append('\t'); i += 2
          case 'r'  => out.append('\r'); i += 2
          case 'b'  => out.append('\b'); i += 2
          case 'f'  => out.append('\f'); i += 2
          case o if o >= '0' && o <= '7' =>
            // Python octal escapes: \o, \oo, \ooo (1-3 octal digits)
            val end = octalEnd(s, i + 1)
            out.append(Integer.parseInt(s.substring(i + 1, end), 8).toChar)
            i = end
          case 'x' if i + 3 < n && isHex(s.charAt(i + 2)) && isHex(s.charAt(i + 3)) =>
            out.append(Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar); i += 4
          case 'u' if i + 5 < n && (2 to 5).forall(k => isHex(s.charAt(i + k))) =>
            out.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => out.append('\\').append(other); i += 2
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** End index (exclusive) of a Python octal escape's digit run: up to 3
    * octal digits starting at `start` (which is known to hold one).
    */
  private def octalEnd(s: String, start: Int): Int = {
    var end = start + 1
    while (end < s.length && end - start < 3 && s.charAt(end) >= '0' && s.charAt(end) <= '7') end += 1
    end
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Rewrite a Python-literal document into strict JSON. One pass; string
    * tokens (either quote style) are decoded from Python escaping and
    * re-encoded with JSON escaping; bare `True`/`False`/`None` map to
    * their JSON spellings; tuples become arrays.
    *
    * Returns `null` when a string token never closes — the signature of an
    * INVALID literal (e.g. a hand-assembled repr with ambiguous quotes,
    * where `ast.literal_eval` would throw too). The caller passes the
    * original payload through unchanged rather than emit corrupt JSON.
    */
  private[expressions] def convert(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n + 16)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"') {
        val q = c
        out.append('"')
        i += 1
        while (i < n && s.charAt(i) != q) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            s.charAt(i + 1) match {
              case '\'' => out.append('\''); i += 2
              case '"'  => out.append("\\\""); i += 2
              case '\\' => out.append("\\\\"); i += 2
              case 'n'  => out.append("\\n"); i += 2
              case 't'  => out.append("\\t"); i += 2
              case 'r'  => out.append("\\r"); i += 2
              case 'b'  => out.append("\\b"); i += 2
              case 'f'  => out.append("\\f"); i += 2
              case o if o >= '0' && o <= '7' =>
                val end = octalEnd(s, i + 1)
                appendJsonChar(out, Integer.parseInt(s.substring(i + 1, end), 8).toChar)
                i = end
              case 'x' if i + 3 < n && isHex(s.charAt(i + 2)) && isHex(s.charAt(i + 3)) =>
                out.append("\\u00").append(s.charAt(i + 2)).append(s.charAt(i + 3)); i += 4
              case 'u' if i + 5 < n && (2 to 5).forall(k => isHex(s.charAt(i + k))) =>
                out.append("\\u").append(s, i + 2, i + 6); i += 6
              case other =>
                // Python keeps the backslash on unknown escapes
                out.append("\\\\"); appendJsonChar(out, other); i += 2
            }
          } else { appendJsonChar(out, ch); i += 1 }
        }
        if (i >= n) return null // unterminated string token: invalid literal
        i += 1 // closing quote
        out.append('"')
      } else if (c == 'T' && s.startsWith("True", i) && bareAt(s, i, 4)) {
        out.append("true"); i += 4
      } else if (c == 'F' && s.startsWith("False", i) && bareAt(s, i, 5)) {
        out.append("false"); i += 5
      } else if (c == 'N' && s.startsWith("None", i) && bareAt(s, i, 4)) {
        out.append("null"); i += 4
      } else if (c == '(') { out.append('['); i += 1 }
      else if (c == ')') { out.append(']'); i += 1 }
      else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** The keyword at [i, i+len) is a bare token (not a prefix of a longer
    * identifier) — outside strings that is the only legal way these appear.
    */
  private def bareAt(s: String, i: Int, len: Int): Boolean =
    i + len >= s.length || !Character.isLetterOrDigit(s.charAt(i + len))

  private def appendJsonChar(out: java.lang.StringBuilder, c: Char): Unit = {
    if (c == '"') out.append("\\\"")
    else if (c == '\\') out.append("\\\\")
    else if (c == '\n') out.append("\\n")
    else if (c == '\t') out.append("\\t")
    else if (c == '\r') out.append("\\r")
    else if (c == '\b') out.append("\\b")
    else if (c == '\f') out.append("\\f")
    else if (c < ' ') out.append(f"\\u${c.toInt}%04x")
    else out.append(c)
  }

  def pyJsonNormalize(c: Column): Column =
    ColumnBridge.column(PyJsonNormalize(ColumnBridge.expression(c)))
}

/** `py_json_normalize(col)` — see [[PyLiteralJson]]. Sits ahead of
  * `from_json` / `get_json_object` on JSONB cleaning paths (q06/q20).
  */
case class PyJsonNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "py_json_normalize"

  override def nullSafeEval(input: Any): Any =
    PyLiteralJson.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.expressions.PyLiteralJson.normalize($in);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
