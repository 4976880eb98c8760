package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.expressions.PyLiteralJson
import graft.expressions.PyLiteralJson.pyJsonNormalize
import org.apache.spark.unsafe.types.UTF8String

/** Python-literal JSONB repair (reference db.py:261-281): the exact payload
  * shapes the reference routes through ast.literal_eval must survive the
  * normalize → strict-parse pipeline, and strict JSON must pass through
  * untouched (same instance — the hot path is a prefix check).
  */
class PyLiteralJsonSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String = {
    val in = UTF8String.fromString(s)
    val out = PyLiteralJson.normalize(in)
    if (out eq in) s else out.toString
  }

  test("reference literal forms normalize to strict JSON") {
    // db.py:268 — value.startswith("{'")
    assert(norm("{'k': 1}") == """{"k": 1}""")
    // db.py:268 — value.startswith("[{'") (embeds/mentions arrays)
    assert(norm("[{'type': 'verified', 'addr': '0xAbC'}]") ==
      """[{"type": "verified", "addr": "0xAbC"}]""")
    // Python spellings of scalars
    assert(norm("{'a': True, 'b': False, 'c': None}") ==
      """{"a": true, "b": false, "c": null}""")
    // nested structures and numbers ride through
    assert(norm("{'a': {'b': [1, 2.5, -3]}, 'c': 'x'}") ==
      """{"a": {"b": [1, 2.5, -3]}, "c": "x"}""")
  }

  test("quote styles and escapes") {
    // repr uses double quotes when the value contains an apostrophe
    assert(norm("{'text': \"it's\"}") == """{"text": "it's"}""")
    // inner double quote inside a single-quoted string must gain JSON escaping
    assert(norm("{'text': 'say \"hi\"'}") == """{"text": "say \"hi\""}""")
    // Python \' escape drops its backslash; \n stays escaped
    assert(norm("{'text': 'a\\'b\\nc'}") == """{"text": "a'b\nc"}""")
    // \xNN becomes the JSON \u00NN form (parses to the same char)
    assert(norm("{'text': 'caf\\xe9'}") == "{\"text\": \"caf\\u00e9\"}")
    // unknown escape keeps its backslash (Python literal semantics)
    assert(norm("{'text': 'a\\qb'}") == """{"text": "a\\qb"}""")
    // keywords inside strings are NOT rewritten
    assert(norm("{'text': 'True None'}") == """{"text": "True None"}""")
    // tuples serialize as arrays (ast.literal_eval accepts them)
    assert(norm("{'t': (1, 2)}") == """{"t": [1, 2]}""")
  }

  test("stringified bytes repr unwraps (reference's bytes branch)") {
    // str(b"{'k': 1}") == "b\"{'k': 1}\""
    assert(norm("b\"{'k': 1}\"") == """{"k": 1}""")
    // str(b'[{\'k\': 2}]') — single-quoted wrapper, escaped inner quotes
    assert(norm("b'[{\\'k\\': 2}]'") == """[{"k": 2}]""")
    // content-level \' escape INSIDE a bytes-wrapped single-quoted string:
    // true repr doubles the content backslash, so the two escape layers
    // decode independently — content b"{'k': 'it\'s'}" stores as
    // b'{\'k\': \'it\\\'s\'}' and must recover the apostrophe
    assert(norm("b'{\\'k\\': \\'it\\\\\\'s\\'}'") == """{"k": "it's"}""")
  }

  test("octal escapes decode with Python literal semantics") {
    // \12 (octal 10 = \n) and \101 (octal 65 = 'A'); \0 is the 1-digit case
    assert(norm("{'text': 'a\\12b'}") == """{"text": "a\nb"}""")
    assert(norm("{'text': 'a\\101b'}") == """{"text": "aAb"}""")
    assert(norm("{'text': 'a\\0b'}") == "{\"text\": \"a\\u0000b\"}")
    // octal digits stop at 3; the 4th is a literal character
    assert(norm("{'text': '\\1017'}") == """{"text": "A7"}""")
    // \8 is NOT octal: unknown escape keeps its backslash
    assert(norm("{'text': 'a\\8b'}") == """{"text": "a\\8b"}""")
    // bytes wrapper layer decodes octal too: b'{\'k\': \'\\101\'}'
    assert(norm("b'{\\'k\\': \\'\\\\101\\'}'") == """{"k": "A"}""")
  }

  test("invalid literals pass through unchanged instead of corrupt JSON") {
    // a hand-assembled repr whose unescaped apostrophe makes the literal
    // ambiguous (ast.literal_eval would throw): b"{'k': 'it\'s'}" decodes
    // to {'k': 'it's'} — unterminated token → original instance unchanged
    for (s <- Seq("b\"{'k': 'it\\'s'}\"", "b\"{'k': 'it's'}\"", "{'k': 'it's'}",
                  "{'unterminated", "[{'a': 'b")) {
      val in = UTF8String.fromString(s)
      assert(PyLiteralJson.normalize(in) eq in, s"input: $s")
    }
  }

  test("non-triggering input passes through as the same instance") {
    for (s <- Seq("""{"k": 1}""", """[{"a": 2}]""", "plain text", "", "[1, 2]",
                  "b'not json'", "{}")) {
      val in = UTF8String.fromString(s)
      assert(PyLiteralJson.normalize(in) eq in)
    }
    assert(PyLiteralJson.normalize(null) == null)
  }

  test("repaired payloads parse end-to-end through from_json/get_json_object") {
    val rows = Seq(
      (1L, """{"k": 7, "tag": "strict"}"""),          // strict JSON
      (2L, "{'k': 8, 'tag': 'python'}"),              // Python literal
      (3L, "[{'k': 9}]"),                             // Python list literal
      (4L, "b\"{'k': 10, 'ok': True}\""),             // stringified bytes repr
      (5L, "not json at all"),                        // garbage → NULL either way
      (6L, null.asInstanceOf[String]))
      .toDF("id", "props")

    val k = rows
      .select(col("id"), get_json_object(pyJsonNormalize(col("props")), "$.k").cast("long").as("k"))
      .as[(Long, Option[Long])].collect().toMap
    assert(k == Map(1L -> Some(7L), 2L -> Some(8L), 3L -> None, 4L -> Some(10L),
      5L -> None, 6L -> None))

    val ok = rows
      .select(col("id"),
        from_json(pyJsonNormalize(col("props")), StructType.fromDDL("k BIGINT, ok BOOLEAN")).as("p"))
      .select(col("id"), col("p.k"), col("p.ok"))
      .as[(Long, Option[Long], Option[Boolean])].collect()
      .map { case (i, a, b) => i -> ((a, b)) }.toMap
    assert(ok(4L) == ((Some(10L), Some(true))))
    assert(ok(2L) == ((Some(8L), None)))
  }

  test("differential fuzz: random value trees, Python repr vs expected JSON") {
    // build random nested values, render them exactly as Python's repr
    // would, and check the converter produces the JSON rendering of the
    // same tree. Spacing is identical on both sides by construction, so
    // the comparison is a plain string equality.
    val rnd = new scala.util.Random(20260812L)

    sealed trait V
    case class VStr(s: String) extends V
    case class VInt(i: Long) extends V
    case class VBool(b: Boolean) extends V
    case object VNone extends V
    case class VList(vs: List[V]) extends V
    case class VDict(kvs: List[(String, V)]) extends V

    val charPool = "abz09 _-!?.,:/#\\'\"\n\té世"
    def randStr(): String =
      (0 until rnd.nextInt(8)).map(_ => charPool(rnd.nextInt(charPool.length))).mkString
    def randV(depth: Int): V = rnd.nextInt(if (depth >= 3) 4 else 6) match {
      case 0 => VStr(randStr())
      case 1 => VInt(rnd.nextLong() % 100000)
      case 2 => VBool(rnd.nextBoolean())
      case 3 => VNone
      case 4 => VList(List.fill(rnd.nextInt(3))(randV(depth + 1)))
      case 5 => VDict(List.fill(rnd.nextInt(3) + 1)(randStr() -> randV(depth + 1)))
    }

    // Python repr: single quotes unless the string contains ' and not ";
    // escapes \\ \' (or \"), \n, \t; non-ASCII printables stay literal
    def pyStr(s: String): String = {
      val q = if (s.contains("'") && !s.contains("\"")) '"' else '\''
      val b = new StringBuilder; b += q
      s.foreach {
        case '\\' => b ++= "\\\\"
        case c if c == q => b += '\\' += q
        case '\n' => b ++= "\\n"
        case '\t' => b ++= "\\t"
        case c => b += c
      }
      (b += q).toString
    }
    def pyRepr(v: V): String = v match {
      case VStr(s) => pyStr(s)
      case VInt(i) => i.toString
      case VBool(b) => if (b) "True" else "False"
      case VNone => "None"
      case VList(vs) => vs.map(pyRepr).mkString("[", ", ", "]")
      case VDict(kvs) => kvs.map { case (k, x) => s"${pyStr(k)}: ${pyRepr(x)}" }.mkString("{", ", ", "}")
    }
    def jsonStr(s: String): String = {
      val b = new StringBuilder; b += '"'
      s.foreach {
        case '\\' => b ++= "\\\\"
        case '"' => b ++= "\\\""
        case '\n' => b ++= "\\n"
        case '\t' => b ++= "\\t"
        case c => b += c
      }
      (b += '"').toString
    }
    def json(v: V): String = v match {
      case VStr(s) => jsonStr(s)
      case VInt(i) => i.toString
      case VBool(b) => if (b) "true" else "false"
      case VNone => "null"
      case VList(vs) => vs.map(json).mkString("[", ", ", "]")
      case VDict(kvs) => kvs.map { case (k, x) => s"${jsonStr(k)}: ${json(x)}" }.mkString("{", ", ", "}")
    }

    // Python's str(bytes) repr: wrapper quote, backslash/quote/control
    // escaping per byte (non-printables become \xNN)
    def pyBytesRepr(content: String): String = {
      val q = if (content.contains("'") && !content.contains("\"")) '"' else '\''
      val b = new StringBuilder; b += 'b' += q
      content.foreach {
        case '\\' => b ++= "\\\\"
        case c if c == q => b += '\\' += q
        case '\n' => b ++= "\\n"
        case '\r' => b ++= "\\r"
        case '\t' => b ++= "\\t"
        case c if c < ' ' || c > '~' => b ++= f"\\x${c.toInt}%02x"
        case c => b += c
      }
      (b += q).toString
    }

    var checked = 0
    var checkedBytes = 0
    for (_ <- 0 until 500) {
      // force the reference's trigger shape: top level is a dict with a
      // single-quotable first key (or a list of such dicts)
      val dict = VDict(("k" + randStr().replace("'", "").replace("\"", "")) -> randV(1)
        :: List.fill(rnd.nextInt(3))(randStr() -> randV(1)))
      val v: V = if (rnd.nextBoolean()) dict else VList(dict :: Nil)
      val repr = pyRepr(v)
      if (repr.startsWith("{'") || repr.startsWith("[{'")) {
        checked += 1
        assert(norm(repr) == json(v), s"repr: $repr")
        // bytes-wrapped variant: str(repr.encode()) — exact for ASCII
        // content, where bytes↔chars is the identity
        if (repr.forall(c => c >= ' ' && c <= '~' || c == '\n' || c == '\t')) {
          checkedBytes += 1
          val wrapped = pyBytesRepr(repr)
          assert(norm(wrapped) == json(v), s"bytes repr: $wrapped")
        }
      }
    }
    assert(checked > 300, s"only $checked triggering samples — generator broken")
    assert(checkedBytes > 100, s"only $checkedBytes bytes-wrapped samples — generator broken")
  }

  test("SQL surface: py_json_normalize registered") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT get_json_object(py_json_normalize(\"{'k': 42}\"), '$.k') AS k")
      .as[String].head()
    assert(out == "42")
  }
}
