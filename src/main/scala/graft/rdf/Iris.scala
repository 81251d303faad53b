package graft.rdf

/** IRI reference handling with the exact semantics of the reference's
  * `RDF.XML.Decoder.ElementNode` (/root/reference/lib/rdf/xml/decoder/
  * element_node.ex:195-256):
  *
  *   - `isAbsolute`: scheme-prefix check (RDF.ex `IRI.absolute?`).
  *   - `resolve`: RFC 3986 §5 reference resolution over RAW strings —
  *     no percent-encoding, no validation — so non-ASCII IRIs pass
  *     through untouched (rdf-charmod-uris suite behavior).
  *   - `normalizeBase`: strips the `#fragment` from http(s) base URIs
  *     only, mirroring element_node.ex:63-69.
  *   - `ncName`: the reference's deliberately LAX NCName check
  *     (element_node.ex:245-256): first char ASCII letter or '_',
  *     no ':' or '/' anywhere.
  */
object Iris {

  final case class ParseError(message: String) extends Exception(message)

  /** Scheme-prefix check, allocation-free (hot: every rdf:about/resource/
    * datatype and property-attribute value goes through here).
    */
  def isAbsolute(ref: String): Boolean = {
    if (ref.isEmpty) return false
    val c0 = ref.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return false
    var i = 1
    while (i < ref.length) {
      val c = ref.charAt(i)
      if (c == ':') return true
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
        c == '+' || c == '.' || c == '-'
      if (!ok) return false
      i += 1
    }
    false
  }

  /** element_node.ex:63-74 — only bases starting with "http" get the
    * fragment stripped; a base with more than one '#' is an error.
    */
  def normalizeBase(base: String): String =
    if (base.startsWith("http")) {
      val parts = base.split("#", -1)
      if (parts.length > 2) throw ParseError(s"invalid base URI: $base")
      parts(0)
    } else base

  /** Components of an IRI per RFC 3986 appendix B, on raw strings. */
  private final case class Parts(
      scheme: String, // null if absent
      authority: String, // null if absent ("" is a present empty authority)
      path: String,
      query: String, // null if absent
      fragment: String // null if absent
  )

  private def parse(ref: String): Parts = {
    var rest = ref
    var fragment: String = null
    val hashIdx = rest.indexOf('#')
    if (hashIdx >= 0) { fragment = rest.substring(hashIdx + 1); rest = rest.substring(0, hashIdx) }
    var query: String = null
    val qIdx = rest.indexOf('?')
    if (qIdx >= 0) { query = rest.substring(qIdx + 1); rest = rest.substring(0, qIdx) }
    var scheme: String = null
    if (isAbsolute(rest)) {
      val i = rest.indexOf(':')
      scheme = rest.substring(0, i); rest = rest.substring(i + 1)
    }
    var authority: String = null
    if (rest.startsWith("//")) {
      rest = rest.substring(2)
      val end = rest.indexWhere(c => c == '/' || c == '?' || c == '#') match {
        case -1 => rest.length
        case i => i
      }
      authority = rest.substring(0, end)
      rest = rest.substring(end)
    }
    Parts(scheme, authority, rest, query, fragment)
  }

  private def recompose(p: Parts): String = {
    val sb = new StringBuilder
    if (p.scheme != null) { sb.append(p.scheme).append(':') }
    if (p.authority != null) { sb.append("//").append(p.authority) }
    sb.append(p.path)
    if (p.query != null) { sb.append('?').append(p.query) }
    if (p.fragment != null) { sb.append('#').append(p.fragment) }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private def removeDotSegments(path: String): String = {
    val out = new StringBuilder
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        val i = out.lastIndexOf("/")
        out.setLength(if (i >= 0) i else 0)
      } else if (in == "/..") {
        in = "/"
        val i = out.lastIndexOf("/")
        out.setLength(if (i >= 0) i else 0)
      } else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        val seg = if (next >= 0) in.substring(0, next) else in
        out.append(seg)
        in = if (next >= 0) in.substring(next) else ""
      }
    }
    out.toString
  }

  private def mergePaths(base: Parts, refPath: String): String =
    if (base.authority != null && base.path.isEmpty) "/" + refPath
    else {
      val i = base.path.lastIndexOf('/')
      if (i >= 0) base.path.substring(0, i + 1) + refPath else refPath
    }

  /** RFC 3986 §5.2.2 transform references (strict mode). */
  def resolve(ref: String, base: String): String = {
    val r = parse(ref)
    val b = parse(base)
    val t =
      if (r.scheme != null) r.copy(path = removeDotSegments(r.path))
      else if (r.authority != null)
        Parts(b.scheme, r.authority, removeDotSegments(r.path), r.query, r.fragment)
      else if (r.path.isEmpty)
        Parts(b.scheme, b.authority, b.path, if (r.query != null) r.query else b.query, r.fragment)
      else if (r.path.startsWith("/"))
        Parts(b.scheme, b.authority, removeDotSegments(r.path), r.query, r.fragment)
      else
        Parts(b.scheme, b.authority, removeDotSegments(mergePaths(b, r.path)), r.query, r.fragment)
    recompose(t)
  }

  /** element_node.ex:195-211 `uri_reference/3`: absolute refs pass
    * through as written; relative refs need a base or error out.
    */
  def uriReference(value: String, base: String): String =
    if (isAbsolute(value)) value
    else if (base == null)
      throw ParseError(s"use of a relative URI without providing a base URI: $value")
    else resolve(value, base)

  /** element_node.ex:246-256 — lax NCName: ASCII letter/underscore
    * first char, no ':' or '/' anywhere (deliberately laxer than the
    * XML Namespaces spec; the reference's tests encode this).
    */
  def ncName(name: String): String = {
    val ok = name.nonEmpty && {
      val c = name.charAt(0)
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_'
    } && !name.contains(':') && !name.contains('/')
    if (!ok) throw ParseError(s"invalid NCName $name")
    name
  }

  /** element_node.ex:213-226 — rdf:ID resolution: base + "#" + NCName. */
  def rdfId(value: String, base: String): String = {
    if (base == null) throw ParseError(s"use of rdf:ID without a base URI $value")
    base + "#" + ncName(value)
  }

  /** STRICT XML-Namespaces NCName check (ASCII production — sufficient
    * for our minted labels, which are `[a-z0-9]` + the mangled scope):
    * NCNameStartChar = [A-Za-z_], NCNameChar adds [0-9.-]. The
    * reference encoder always emits valid nodeIDs (encoder.ex:253-270);
    * [[ncSafeLabel]] + this check pin the same guarantee on our export
    * boundaries, while the DECODER keeps the lax bug-compat [[ncName]].
    */
  def isStrictNCName(name: String): Boolean =
    name.nonEmpty && {
      val c = name.charAt(0)
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_'
    } && name.forall { c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_' || c == '-' || c == '.'
    }

  /** NCName-safe mangling of internal bnode labels for EXPORT
    * boundaries only. Internal labels are `<label>@<32-hex-scope>` and
    * '@' is not a legal NCName / N-Triples label character — but the
    * lax bug-compat decoder ([[ncName]]) also admits labels with
    * spaces, '%', non-ASCII etc., so the mangle must cover EVERY label:
    *   - labels that are NCName-shaped apart from 'x'/'@' use the
    *     injective prefix-free escape coding 'x' → "xx", '@' → "xa"
    *     (`b0@<hex>` → `b0xa<hex>`), preserving readability;
    *   - anything else (bad start char, exotic characters) maps to
    *     `xh<md5-hex>` — a valid NCName that cannot collide with the
    *     escape branch (a raw leading 'x' always escapes to "xx...").
    * Injective modulo md5 (2^-128); mirrored in SQL by
    * [[graft.sources.RdfSources.nTriplesLineCol]]'s bnodeSafe column.
    */
  def ncSafeLabel(label: String): String = {
    // a trailing '.' is a legal NCName tail but illegal as the FINAL
    // char of an N-Triples BLANK_NODE_LABEL ('_:b0.' serializes as
    // '_:b0. .', an unparseable line) — route it to the md5 branch so
    // the one mangle is valid on BOTH export boundaries
    val simpleOk = label.nonEmpty && {
      val c0 = label.charAt(0)
      (c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z') || c0 == '_'
    } && label.charAt(label.length - 1) != '.' && label.forall { c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_' || c == '-' || c == '.' || c == '@'
    }
    if (simpleOk) {
      val sb = new java.lang.StringBuilder(label.length + 4)
      var i = 0
      while (i < label.length) {
        label.charAt(i) match {
          case 'x' => sb.append("xx")
          case '@' => sb.append("xa")
          case c => sb.append(c)
        }
        i += 1
      }
      sb.toString
    } else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(label.getBytes("UTF-8"))
      val sb = new java.lang.StringBuilder(34)
      sb.append("xh")
      d.foreach(b => sb.append(f"${b & 0xff}%02x"))
      sb.toString
    }
  }
}
