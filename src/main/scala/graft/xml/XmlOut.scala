package graft.xml

/** XML serialization that byte-matches the reference's Saxy encoding of
  * "simple form" trees (used for rdf:parseType="Literal" re-serialization,
  * /root/reference/lib/rdf/xml/decoder/grammar/rules.ex:446-467, and by the
  * encoder). Rules derived from the reference's golden tests:
  *   - attributes in document order, double-quoted
  *   - elements with no children self-close (`<name attrs/>`)
  *   - text and attribute values escape the five XML specials
  *     (& < > " ') as &amp; &lt; &gt; &quot; &apos;
  */
object XmlOut {

  sealed trait Node extends Product with Serializable
  final case class Elem(name: String, attrs: List[(String, String)], children: List[Node]) extends Node
  final case class Text(s: String) extends Node
  /** Unescaped passthrough — XMLLiteral lexical embeds (encoder.ex:300-306). */
  final case class Raw(s: String) extends Node

  def escape(s: String): String = {
    var needs = false
    var i = 0
    while (i < s.length && !needs) {
      val c = s.charAt(i)
      needs = c == '&' || c == '<' || c == '>' || c == '"' || c == '\''
      i += 1
    }
    if (!needs) return s
    val sb = new StringBuilder(s.length + 16)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case '\'' => sb.append("&apos;")
      case c => sb.append(c)
    }
    sb.toString
  }

  def write(node: Node, sb: StringBuilder): Unit = node match {
    case Text(s) => sb.append(escape(s))
    case Raw(s) => sb.append(s)
    case Elem(name, attrs, children) =>
      sb.append('<').append(name)
      attrs.foreach { case (k, v) => sb.append(' ').append(k).append("=\"").append(escape(v)).append('"') }
      if (children.isEmpty) sb.append("/>")
      else {
        sb.append('>')
        children.foreach(write(_, sb))
        sb.append("</").append(name).append('>')
      }
  }

  def write(node: Node): String = {
    val sb = new StringBuilder
    write(node, sb)
    sb.toString
  }

  /** Raw variant used by the XMLLiteral lexical form: TOP-LEVEL character
    * nodes are joined unescaped while captured elements are re-encoded —
    * exactly rules.ex:449-454 (`{_, characters} -> characters` vs
    * `Saxy.encode!(element)`).
    */
  def writeLiteralBody(nodes: List[Node]): String = {
    val sb = new StringBuilder
    nodes.foreach {
      case Text(s) => sb.append(s)
      case Raw(s) => sb.append(s)
      case e: Elem => write(e, sb)
    }
    sb.toString
  }
}
