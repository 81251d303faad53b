package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The input_hint per-row invariant: extracted text must be
  * byte-identical to the page's canonical `text` for every synthetic
  * page (no Spark needed — pure row-level check over all fixtures).
  */
class TextIdentitySpec extends AnyFunSuite {

  test("extractText(html) == text, byte-identical, for all fixture pages and copies 0..3") {
    val fixtures = SyntheticPages.fixtureFiles()
    var checked = 0
    fixtures.foreach { case (rel, bytes) =>
      (0 until 4).foreach { copy =>
        val p = SyntheticPages.page(rel, bytes, copy, checked.toLong)
        val extracted = Extract.extractText(new String(p.html, "UTF-8"))
        assert(extracted == p.text,
          s"mismatch for $rel copy=$copy:\n  expected=${p.text.take(200)}\n  got     =${extracted.take(200)}")
        checked += 1
      }
    }
    assert(checked > 500)
  }

  test("microdata/JSON-LD byte-marker pre-filters are case-insensitive (ITEMSCOPE / LD+JSON pages extract)") {
    val md = """<div ITEMSCOPE itemtype="http://schema.org/Person" itemid="http://e/p1"><span itemprop="name">N</span></div>"""
    val mdRows = Extract.triplesOf("http://e/md", md.getBytes("UTF-8")).toOption.get
    assert(mdRows.exists(r => r.subj == "http://e/p1" && r.obj == "N"))
    val jl = """<script type="application/LD+JSON">{"@context":"https://schema.org","@id":"http://e/x","name":"J"}</script>"""
    val jlRows = Extract.triplesOf("http://e/jl", jl.getBytes("UTF-8")).toOption.get
    assert(jlRows.exists(r => r.subj == "http://e/x" && r.obj == "J"))
  }

  test("island detection finds RDF in both bare and wrapped pages") {
    val (rel, bytes) = SyntheticPages.fixtureFiles().head
    val bare = SyntheticPages.page(rel, bytes, 0, 0)
    val wrapped = SyntheticPages.page(rel, bytes, 1, 1)
    assert(Extract.detectIsland(new String(bare.html, "UTF-8")).isDefined)
    assert(Extract.detectIsland(new String(wrapped.html, "UTF-8")).isDefined)
  }

  test("wrapped and bare copies of a positive fixture extract the same triples modulo url") {
    val fixtures = SyntheticPages.fixtureFiles()
    val (rel, bytes) = fixtures.find(_._1 == "xmlbase/test001.rdf").get
    val bare = SyntheticPages.page(rel, bytes, 0, 0)
    val wrapped = SyntheticPages.page(rel, bytes, 1, 1)
    val t1 = Extract.triplesOf(bare.url, bare.html).toOption.get
    val t2 = Extract.triplesOf(wrapped.url, wrapped.html).toOption.get
    assert(t1.nonEmpty)
    def strip(ts: Vector[TripleRow]) =
      ts.map(t => (t.subj.replaceAll("@.*", "").replaceAll("\\?copy=\\d+", ""),
        t.pred, t.obj.replaceAll("@.*$", ""), t.objKind)).toSet
    assert(strip(t1) == strip(t2))
  }

  test("negative fixtures count as parse errors, not crashes") {
    val fixtures = SyntheticPages.fixtureFiles()
    val (rel, bytes) = fixtures.find(_._1.contains("abouteach/error001")).get
    val p = SyntheticPages.page(rel, bytes, 0, 0)
    assert(Extract.triplesOf(p.url, p.html).isLeft)
  }
}
