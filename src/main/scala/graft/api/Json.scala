package graft.api

/** Minimal JSON codec for the REST façade — the sandbox build carries
  * no HTTP/JSON dependencies, and the wire shapes here are small and
  * fixed, so a ~100-line recursive-descent parser + writer beats
  * dragging a library in.
  *
  * Writer values: `null`/`None` → null, `Some(x)` → x, String,
  * Boolean, Long/Int/Double, `Seq[Any]` → array, [[JObj]] → object
  * (field order preserved — serde serializes struct fields in
  * declaration order and the tests pin the reference's shapes).
  *
  * Parser results: `Map[String, Any]`, `List[Any]`, String, Boolean,
  * Long (integral numbers) or Double, or null. Throws
  * [[JsonParseException]] on malformed input (the REST layer's 400).
  */
final case class JObj(fields: (String, Any)*)

final class JsonParseException(msg: String) extends RuntimeException(msg)

object Json {

  def write(v: Any): String = {
    val sb = new StringBuilder
    writeTo(sb, v)
    sb.toString
  }

  private def writeTo(sb: StringBuilder, v: Any): Unit = v match {
    case null | None => sb.append("null")
    case Some(x) => writeTo(sb, x)
    case JObj(fields @ _*) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, fv) =>
        if (!first) sb.append(',')
        first = false
        writeString(sb, k); sb.append(':'); writeTo(sb, fv)
      }
      sb.append('}')
    case s: String => writeString(sb, s)
    case b: Boolean => sb.append(b)
    case n: Long => sb.append(n)
    case n: Int => sb.append(n)
    case d: Double => sb.append(d)
    case xs: Seq[_] =>
      sb.append('[')
      var first = true
      xs.foreach { x =>
        if (!first) sb.append(',')
        first = false
        writeTo(sb, x)
      }
      sb.append(']')
    case other =>
      throw new IllegalArgumentException(s"not JSON-writable: ${other.getClass}")
  }

  private def writeString(sb: StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  def parse(text: String): Any = {
    val p = new Parser(text)
    val v = p.value()
    p.skipWs()
    if (!p.atEnd) p.fail("trailing content")
    v
  }

  /** Nesting bound: recursive descent would otherwise let a hostile
    * request body (`[[[[...`) overflow the handler thread's stack — an
    * Error the HTTP layer's Exception handler cannot turn into a 400. */
  private val MaxDepth = 64

  private final class Parser(s: String) {
    private var i = 0
    private var depth = 0
    def atEnd: Boolean = i >= s.length
    def fail(msg: String): Nothing =
      throw new JsonParseException(s"$msg at offset $i")
    def skipWs(): Unit =
      while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    private def expect(c: Char): Unit = {
      if (atEnd || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    def value(): Any = {
      skipWs()
      if (atEnd) fail("unexpected end")
      depth += 1
      if (depth > MaxDepth) fail(s"nesting deeper than $MaxDepth")
      val v = s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => num()
      }
      depth -= 1
      v
    }

    private def lit(word: String, v: Any): Any =
      if (s.regionMatches(i, word, 0, word.length)) { i += word.length; v }
      else fail(s"expected $word")

    private def obj(): Map[String, Any] = {
      expect('{'); skipWs()
      val b = Map.newBuilder[String, Any]
      if (!atEnd && s.charAt(i) == '}') { i += 1; return b.result() }
      var done = false
      while (!done) {
        skipWs()
        val k = str()
        skipWs(); expect(':')
        b += k -> value()
        skipWs()
        if (atEnd) fail("unterminated object")
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; done = true
          case _ => fail("expected ',' or '}'")
        }
      }
      b.result()
    }

    private def arr(): List[Any] = {
      expect('['); skipWs()
      val b = List.newBuilder[Any]
      if (!atEnd && s.charAt(i) == ']') { i += 1; return b.result() }
      var done = false
      while (!done) {
        b += value()
        skipWs()
        if (atEnd) fail("unterminated array")
        s.charAt(i) match {
          case ',' => i += 1
          case ']' => i += 1; done = true
          case _ => fail("expected ',' or ']'")
        }
      }
      b.result()
    }

    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!atEnd && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (atEnd) fail("unterminated escape")
          s.charAt(i) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'u' =>
              if (i + 4 >= s.length) fail("bad \\u escape")
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case _ => fail("bad escape")
          }
        } else sb.append(c)
        i += 1
      }
      expect('"')
      sb.toString
    }

    private def num(): Any = {
      val start = i
      if (!atEnd && s.charAt(i) == '-') i += 1
      while (!atEnd && (s.charAt(i).isDigit || "+-.eE".contains(s.charAt(i)))) i += 1
      val t = s.substring(start, i)
      if (t.isEmpty) fail("expected value")
      if (t.exists(c => c == '.' || c == 'e' || c == 'E'))
        t.toDoubleOption.getOrElse(fail(s"bad number '$t'"))
      else t.toLongOption.getOrElse(fail(s"bad number '$t'"))
    }
  }
}
