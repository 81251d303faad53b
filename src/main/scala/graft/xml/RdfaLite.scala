package graft.xml

import graft.rdf._
import graft.rdf.Iris.ParseError
import org.xml.sax.{Attributes, InputSource}
import org.xml.sax.helpers.DefaultHandler
import java.io.ByteArrayInputStream
import scala.collection.mutable

/** Minimal RDFa-Lite extractor for XHTML-ish islands (the "RDFa-like
  * islands" of the north_star, complementing the RDF/XML codec).
  *
  * Supported subset (documented scope, deterministic):
  *   - `vocab` — default term vocabulary, inherited down the tree
  *   - `prefix="p: uri ..."` — CURIE prefix declarations, inherited
  *   - `about` — sets the current subject (IRI ref resolved vs base)
  *   - `typeof` — rdf:type triples for the current subject
  *   - `property` — predicate (CURIE / vocab term / absolute IRI);
  *     object = `resource`/`href`/`src` attribute (IRI) if present,
  *     else the element's text content as a (lang-tagged) literal
  *   - `resource` without `property` — sets the subject for descendants
  *   - `lang`/`xml:lang` — literal language, inherited
  *
  * Real-world HTML requires a lenient tokenizer; the island corpus here
  * is well-formed markup, so the same hardened SAX stack as the RDF/XML
  * decoder is used. Blank nodes are generated per document with the
  * same deterministic counter contract.
  */
object RdfaLite {

  def parseBytes(xml: Array[Byte], offset: Int, length: Int, base: Option[String]): Either[ParseError, Vector[Triple]] =
    try {
      val handler = new RdfaHandler(base.map(Iris.normalizeBase).orNull)
      SaxPool.parser().parse(new InputSource(new ByteArrayInputStream(xml, offset, length)), handler)
      Right(handler.triples.toVector)
    } catch {
      case e: ParseError => SaxPool.invalidate(); Left(e)
      case e: Exception => SaxPool.invalidate(); Left(ParseError(s"RDFa parse error: ${e.getMessage}"))
    }

  def parse(xml: String, base: Option[String]): Either[ParseError, Vector[Triple]] = {
    val b = xml.getBytes("UTF-8")
    parseBytes(b, 0, b.length, base)
  }

  private final class Scope(
      val subject: Term,
      val vocab: String, // null allowed
      val prefixes: Map[String, String],
      val lang: String // null allowed
  )

  private final class PendingLiteral(val subject: Term, val predicates: Seq[Iri], val lang: String) {
    val text = new StringBuilder
  }

  private final class RdfaHandler(base: String) extends DefaultHandler {
    val triples = mutable.LinkedHashSet.empty[Triple]
    private var bnodeCounter = 0
    private val stack = mutable.ArrayBuffer.empty[Scope]
    private val pending = mutable.ArrayBuffer.empty[PendingLiteral] // aligned with stack

    private def freshBNode(): BNode = { val b = BNode("ra" + bnodeCounter); bnodeCounter += 1; b }

    private def expand(term: String, scope: Scope): Option[String] = {
      if (term == null || term.isEmpty) None
      else {
        val i = term.indexOf(':')
        if (i > 0) {
          // a declared CURIE prefix wins over scheme interpretation
          scope.prefixes.get(term.substring(0, i)).map(_ + term.substring(i + 1))
            .orElse(if (Iris.isAbsolute(term)) Some(term) else None)
        } else if (scope.vocab != null) Some(scope.vocab + term)
        else None
      }
    }

    override def startElement(uri: String, localName: String, qName: String, attrs: Attributes): Unit = {
      val parent = if (stack.isEmpty) new Scope(null, null, Map.empty, null) else stack.last
      def attr(n: String): String = attrs.getValue(n)

      var prefixes = parent.prefixes
      val prefixDecl = attr("prefix")
      if (prefixDecl != null) {
        val toks = prefixDecl.trim.split("\\s+")
        var i = 0
        while (i + 1 < toks.length) {
          if (toks(i).endsWith(":")) prefixes = prefixes.updated(toks(i).dropRight(1), toks(i + 1))
          i += 2
        }
      }
      val vocab = if (attr("vocab") != null) attr("vocab") else parent.vocab
      val lang = {
        val l = if (attr("xml:lang") != null) attr("xml:lang") else attr("lang")
        if (l != null) l else parent.lang
      }
      val scope0 = new Scope(parent.subject, vocab, prefixes, lang)

      val about = attr("about")
      val resource = attr("resource")
      val href = attr("href")
      val src = attr("src")
      val propertyAttr = attr("property")
      val typeofAttr = attr("typeof")

      def emitTypes(s: Term): Unit =
        if (typeofAttr != null)
          typeofAttr.trim.split("\\s+").foreach { t =>
            expand(t, scope0).foreach(tv => triples += Triple(s, Iri(Vocab.rdfType), Iri(tv)))
          }
      def preds: Seq[Iri] =
        propertyAttr.trim.split("\\s+").flatMap(p => expand(p, scope0)).map(Iri).toSeq

      if (propertyAttr != null && typeofAttr != null && about == null) {
        // RDFa Lite inline object: <x property=p typeof=T> — the typed
        // thing is a fresh node linked from the parent subject
        val obj = freshBNode()
        emitTypes(obj)
        if (parent.subject != null) preds.foreach(p => triples += Triple(parent.subject, p, obj))
        stack += new Scope(obj, vocab, prefixes, lang)
        pending += null
        return
      }

      val subject: Term =
        if (about != null) Iri(Iris.uriReference(about, base))
        else if (propertyAttr == null && resource != null) Iri(Iris.uriReference(resource, base))
        else if (typeofAttr != null && propertyAttr == null) freshBNode()
        else parent.subject

      emitTypes(if (subject != null) subject else freshBNode())

      if (propertyAttr != null) {
        // property triples hang off the nearest established subject
        val s = if (about != null) subject else parent.subject
        val objRef = if (resource != null) resource else if (href != null) href else src
        if (objRef != null) {
          val obj = Iri(Iris.uriReference(objRef, base))
          if (s != null) preds.foreach(p => triples += Triple(s, p, obj))
          stack += new Scope(obj, vocab, prefixes, lang)
          pending += null
        } else {
          stack += new Scope(subject, vocab, prefixes, lang)
          pending += new PendingLiteral(s, preds, lang)
        }
      } else {
        stack += new Scope(subject, vocab, prefixes, lang)
        pending += null
      }
    }

    override def characters(ch: Array[Char], start: Int, length: Int): Unit = {
      var i = pending.length - 1
      while (i >= 0) {
        if (pending(i) != null) { pending(i).text.appendAll(ch, start, length); i = -1 }
        else i -= 1
      }
    }

    override def endElement(uri: String, localName: String, qName: String): Unit = {
      val p = pending.remove(pending.length - 1)
      stack.remove(stack.length - 1)
      if (p != null && p.subject != null) {
        val o =
          if (p.lang != null && p.lang.nonEmpty) Lit.lang(p.text.toString, p.lang)
          else Lit.plain(p.text.toString)
        p.predicates.foreach(pred => triples += Triple(p.subject, pred, o))
      }
    }
  }
}
