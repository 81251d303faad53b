package graft.rdf

import scala.collection.mutable

/** Minimal N-Triples reader/writer — test-oracle only, mirroring the role
  * RDF.ex's NTriples reader plays for the W3C suite
  * (/root/reference/test/acceptance/w3c_test.exs:56-58).
  */
object NTriples {

  def parse(content: String): Set[Triple] = {
    val out = mutable.Set.empty[Triple]
    content.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) out += parseLine(line)
    }
    out.toSet
  }

  private def parseLine(line: String): Triple = {
    val p = new LineParser(line)
    val s = p.term()
    p.ws()
    val pr = p.term()
    p.ws()
    val o = p.term()
    p.ws()
    p.expect('.')
    Triple(s, pr, o)
  }

  private final class LineParser(s: String) {
    private var i = 0
    def ws(): Unit = while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
    def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    private def fail(msg: String) = throw new IllegalArgumentException(s"NTriples: $msg at $i in: $s")

    def term(): Term = {
      ws()
      if (i >= s.length) fail("unexpected end of line")
      s.charAt(i) match {
        case '<' =>
          val end = s.indexOf('>', i)
          if (end < 0) fail("unterminated IRI")
          val v = s.substring(i + 1, end); i = end + 1
          Iri(unescape(v))
        case '_' =>
          expect('_'); expect(':')
          val start = i
          while (i < s.length && !Character.isWhitespace(s.charAt(i))) i += 1
          BNode(s.substring(start, i))
        case '"' =>
          i += 1
          val sb = new StringBuilder
          // bounds-checked: an unterminated quote or trailing backslash is
          // a malformed line (IllegalArgumentException), never an
          // StringIndexOutOfBounds that callers can't distinguish
          while (i < s.length && s.charAt(i) != '"') {
            if (s.charAt(i) == '\\') {
              sb.append(s.charAt(i)); i += 1
              if (i >= s.length) fail("trailing backslash in literal")
            }
            sb.append(s.charAt(i)); i += 1
          }
          if (i >= s.length) fail("unterminated literal")
          i += 1
          val lex = unescape(sb.toString)
          if (i < s.length && s.charAt(i) == '@') {
            i += 1
            val start = i
            while (i < s.length && !Character.isWhitespace(s.charAt(i)) && s.charAt(i) != '.') i += 1
            // trailing '.' only ends the statement if followed by nothing but ws
            var end = i
            Lit.lang(lex, s.substring(start, end))
          } else if (i + 1 < s.length && s.charAt(i) == '^' && s.charAt(i + 1) == '^') {
            i += 2
            expect('<')
            val end = s.indexOf('>', i)
            if (end < 0) fail("unterminated datatype IRI")
            val dt = s.substring(i, end); i = end + 1
            Lit.typed(lex, unescape(dt))
          } else Lit.plain(lex)
        case c => fail(s"unexpected '$c'"); null
      }
    }
  }

  def unescape(s: String): String = {
    if (!s.contains('\\')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\'' => sb.append('\''); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'U' =>
            sb.appendAll(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 10), 16))); i += 10
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"' => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c => sb.append(c)
    }
    sb.toString
  }

  def serializeTerm(t: Term): String = t match {
    case Iri(v) => s"<$v>"
    case BNode(l) => s"_:$l"
    case Lit(lex, dt, lang) =>
      if (lang.nonEmpty) s""""${escape(lex)}"@$lang"""
      else if (dt == Vocab.xsdString) s""""${escape(lex)}""""
      else s""""${escape(lex)}"^^<$dt>"""
  }

  def serialize(triples: Iterable[Triple]): String =
    triples.map(t => s"${serializeTerm(t.s)} ${serializeTerm(t.p)} ${serializeTerm(t.o)} .").mkString("\n")
}
