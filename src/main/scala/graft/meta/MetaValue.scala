package graft.meta

/** Typed STAC property values — the JSON shapes real item metadata takes
  * (`eo:bands` lists of objects, `proj:transform` number tuples, nested
  * singleton lists), which the reference accumulates structurally
  * (`stackstac/accumulate_metadata.py:42-230`). Minimal immutable JSON
  * model + parser/renderer; no external libs (offline build).
  */
sealed trait MetaValue {
  /** Canonical JSON rendering (stable key order as parsed; numbers render
    * integral when exact). */
  def render: String = this match {
    case MNull       => "null"
    case MBool(b)    => b.toString
    case MNum(d)     =>
      if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case MStr(s)     => MetaValue.quote(s)
    case MArr(xs)    => xs.map(_.render).mkString("[", ",", "]")
    case MObj(fs)    => fs.map { case (k, v) => MetaValue.quote(k) + ":" + v.render }
                          .mkString("{", ",", "}")
  }
}
case object MNull                                   extends MetaValue
final case class MBool(b: Boolean)                  extends MetaValue
final case class MNum(d: Double)                    extends MetaValue
final case class MStr(s: String)                    extends MetaValue
final case class MArr(xs: Vector[MetaValue])        extends MetaValue
final case class MObj(fs: Vector[(String, MetaValue)]) extends MetaValue

object MetaValue {

  private[meta] def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Parse a JSON document; a non-JSON bare string (the legacy stringified
    * property form) falls back to [[MStr]] of the raw text. */
  def parse(s: String): MetaValue =
    try { val p = new P(s); val v = p.value(); p.ws(); require(p.eof); v }
    catch { case _: Exception => MStr(s) }

  private final class P(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def ch: Char = { require(i < s.length); s.charAt(i) }
    private def expect(c: Char): Unit = { require(ch == c); i += 1 }

    def value(): MetaValue = {
      ws()
      ch match {
        case '{' => obj()
        case '[' => arr()
        case '"' => MStr(str())
        case 't' => lit("true"); MBool(true)
        case 'f' => lit("false"); MBool(false)
        case 'n' => lit("null"); MNull
        case _   => num()
      }
    }
    private def lit(l: String): Unit = {
      require(s.regionMatches(i, l, 0, l.length)); i += l.length
    }
    private def num(): MNum = {
      val start = i
      if (!eof && (ch == '-' || ch == '+')) i += 1
      while (!eof && (ch.isDigit || ch == '.' || ch == 'e' || ch == 'E' ||
                      ch == '-' || ch == '+')) i += 1
      MNum(s.substring(start, i).toDouble)
    }
    private def str(): String = {
      expect('"')
      val b = new StringBuilder
      while (ch != '"') {
        if (ch == '\\') {
          i += 1
          ch match {
            case 'n' => b += '\n'; case 't' => b += '\t'; case 'r' => b += '\r'
            case 'b' => b += '\b'; case 'f' => b += '\f'
            case 'u' => b += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c   => b += c
          }
        } else b += ch
        i += 1
      }
      i += 1
      b.result()
    }
    private def arr(): MArr = {
      expect('['); ws()
      if (ch == ']') { i += 1; return MArr(Vector.empty) }
      val b = Vector.newBuilder[MetaValue]
      var done = false
      while (!done) {
        b += value(); ws()
        if (ch == ',') { i += 1 } else { expect(']'); done = true }
      }
      MArr(b.result())
    }
    private def obj(): MObj = {
      expect('{'); ws()
      if (ch == '}') { i += 1; return MObj(Vector.empty) }
      val b = Vector.newBuilder[(String, MetaValue)]
      var done = false
      while (!done) {
        ws(); val k = str(); ws(); expect(':')
        b += (k -> value()); ws()
        if (ch == ',') { i += 1 } else { expect('}'); done = true }
      }
      MObj(b.result())
    }
  }
}
