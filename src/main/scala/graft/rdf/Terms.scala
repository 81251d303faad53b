package graft.rdf

/** RDF term model.
  *
  * Mirrors the observable data model of the reference decoder
  * (rdf-xml-ex: /root/reference/lib/rdf/xml/decoder/grammar/rules.ex —
  * plain `{s, p, o}` 3-tuples over IRIs, blank nodes and literals), but
  * encoded as flat Scala case classes that map 1:1 onto the columnar
  * `Dataset[TripleRow]` layout used by the Spark pipeline.
  *
  * Canonical form conventions:
  *   - plain literals carry datatype [[Vocab.xsdString]] and lang "" —
  *     RDF 1.1 semantics, same equality the reference gets from RDF.ex.
  *   - language-tagged literals carry datatype [[Vocab.langString]] and a
  *     lower-cased language tag (RDF.ex downcases languages too).
  */
sealed trait Term extends Product with Serializable

final case class Iri(value: String) extends Term {
  override def toString: String = s"<$value>"
}

final case class BNode(label: String) extends Term {
  override def toString: String = s"_:$label"
}

final case class Lit(lexical: String, datatype: String, lang: String) extends Term {
  def isLangString: Boolean = lang.nonEmpty
  def isPlain: Boolean = datatype == Vocab.xsdString && lang.isEmpty
  override def toString: String =
    if (isLangString) s""""$lexical"@$lang"""
    else if (isPlain) s""""$lexical""""
    else s""""$lexical"^^<$datatype>"""
}

object Lit {
  def plain(lexical: String): Lit = Lit(lexical, Vocab.xsdString, "")
  def lang(lexical: String, language: String): Lit =
    Lit(lexical, Vocab.langString, language.toLowerCase)
  def typed(lexical: String, datatype: String): Lit =
    if (datatype == Vocab.xsdString) plain(lexical) else Lit(lexical, datatype, "")
}

final case class Triple(s: Term, p: Term, o: Term)

/** In-memory RDF graph: a SET of triples plus base IRI and prefix map,
  * matching the parts of RDF.ex's `RDF.Graph` the reference relies on
  * (set semantics via `Graph.add`, `base_iri`, `prefixes` — see
  * /root/reference/lib/rdf/xml/decoder/grammar/rules.ex:38-48).
  * Default namespace is stored under prefix "".
  */
final case class RdfGraph(
    triples: Set[Triple],
    base: Option[String] = None,
    prefixes: Map[String, String] = Map.empty
) {
  def size: Int = triples.size
  def add(t: Triple): RdfGraph = copy(triples = triples + t)
  def subjects: Set[Term] = triples.map(_.s)
}

object Vocab {
  val rdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val rdfType = rdfNs + "type"
  val rdfStatement = rdfNs + "Statement"
  val rdfSubject = rdfNs + "subject"
  val rdfPredicate = rdfNs + "predicate"
  val rdfObject = rdfNs + "object"
  val rdfFirst = rdfNs + "first"
  val rdfRest = rdfNs + "rest"
  val rdfNil = rdfNs + "nil"
  val rdfXmlLiteral = rdfNs + "XMLLiteral"
  val langString = rdfNs + "langString"
  val xsdNs = "http://www.w3.org/2001/XMLSchema#"
  val xsdString = xsdNs + "string"
}
