package graft.serve

import scala.collection.immutable.ListMap

/** Minimal JSON reader/writer for the HTTP facade — the offline container
  * carries no JSON library beyond Spark's internals (private), and the
  * facade's payloads are small control-plane messages, so a ~100-line
  * recursive-descent parser + writer is the honest dependency-free choice.
  *
  * Writer input model (kept deliberately narrow):
  *   - [[Json.Obj]]    → object, field order preserved
  *   - Iterable[Any]   → array
  *   - String / Boolean / Int / Long / Double / BigDecimal → scalars
  *     (non-finite doubles serialize as null, like FastAPI's default)
  *   - null / None     → null;  Some(x) → x
  *   - anything else   → its toString, quoted (timestamps, enums)
  *
  * Parser output model: ListMap[String, Any] (order kept), List[Any],
  * String, Boolean, Long (integral) / Double (fractional), null.
  */
object Json {
  /** Ordered JSON object — field order is part of the API contract. */
  final case class Obj(fields: (String, Any)*)

  def write(v: Any): String = {
    val sb = new StringBuilder
    w(v, sb)
    sb.toString
  }

  private def w(v: Any, sb: StringBuilder): Unit = v match {
    case null | None => sb.append("null")
    case Some(x)     => w(x, sb)
    case Obj(fields @ _*) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, x) =>
        if (!first) sb.append(',')
        first = false
        quote(k, sb); sb.append(':'); w(x, sb)
      }
      sb.append('}')
    case s: String  => quote(s, sb)
    case b: Boolean => sb.append(b)
    case i: Int     => sb.append(i)
    case l: Long    => sb.append(l)
    case d: Double =>
      if (java.lang.Double.isFinite(d)) sb.append(d) else sb.append("null")
    case f: Float      => w(f.toDouble, sb)
    case d: BigDecimal => sb.append(d.bigDecimal.toPlainString)
    case it: Iterable[_] =>
      sb.append('[')
      var first = true
      it.foreach { x =>
        if (!first) sb.append(',')
        first = false
        w(x, sb)
      }
      sb.append(']')
    case other => quote(other.toString, sb)
  }

  private def quote(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c            => sb.append(c)
    }
    sb.append('"')
  }

  final class ParseError(msg: String) extends RuntimeException(msg)

  /** Parse a JSON document. Throws [[ParseError]] on malformed input —
    * the HTTP layer maps that to 400. */
  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    if (!p.eof) throw new ParseError(s"trailing characters at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!eof && Character.isWhitespace(s.charAt(pos))) pos += 1
    private def fail(msg: String) = throw new ParseError(s"$msg at $pos")
    private def expect(c: Char): Unit = {
      if (eof || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }

    def value(): Any = {
      skipWs()
      if (eof) fail("unexpected end of input")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _   => num()
      }
    }

    private def lit(word: String, v: Any): Any = {
      if (!s.startsWith(word, pos)) fail(s"expected $word")
      pos += word.length
      v
    }

    private def obj(): ListMap[String, Any] = {
      expect('{'); skipWs()
      var m = ListMap.empty[String, Any]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return m }
      var done = false
      while (!done) {
        skipWs()
        val k = str()
        skipWs(); expect(':')
        m = m.updated(k, value())
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      m
    }

    private def arr(): List[Any] = {
      expect('['); skipWs()
      val buf = List.newBuilder[Any]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return buf.result() }
      var done = false
      while (!done) {
        buf += value()
        skipWs()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      buf.result()
    }

    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (true) {
        if (eof) fail("unterminated string")
        s.charAt(pos) match {
          case '"' => pos += 1; return sb.toString
          case '\\' =>
            pos += 1
            if (eof) fail("unterminated escape")
            s.charAt(pos) match {
              case '"'  => sb.append('"'); pos += 1
              case '\\' => sb.append('\\'); pos += 1
              case '/'  => sb.append('/'); pos += 1
              case 'n'  => sb.append('\n'); pos += 1
              case 'r'  => sb.append('\r'); pos += 1
              case 't'  => sb.append('\t'); pos += 1
              case 'b'  => sb.append('\b'); pos += 1
              case 'f'  => sb.append('\f'); pos += 1
              case 'u' =>
                if (pos + 4 >= s.length) fail("bad unicode escape")
                sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
                pos += 5
              case c => fail(s"bad escape '\\$c'")
            }
          case c => sb.append(c); pos += 1
        }
      }
      sb.toString // unreachable
    }

    private def num(): Any = {
      val start = pos
      if (!eof && s.charAt(pos) == '-') pos += 1
      while (!eof && (Character.isDigit(s.charAt(pos)) || "+-.eE".indexOf(s.charAt(pos)) >= 0))
        pos += 1
      val t = s.substring(start, pos)
      if (t.isEmpty || t == "-") fail("expected a value")
      if (t.exists(c => c == '.' || c == 'e' || c == 'E')) t.toDouble
      else
        try t.toLong
        catch { case _: NumberFormatException => t.toDouble }
    }
  }
}
