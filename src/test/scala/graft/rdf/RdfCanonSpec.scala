package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

/** The n-degree canonical-labeling contract: deterministic, dense
  * `_:c{i}` ids, and — the load-bearing property — the relabeled quad
  * SET is invariant under any bijective relabeling of the input
  * bnodes (isomorphism invariance), including on graphs whose bnodes
  * the first-degree hash cannot distinguish. Reference contract:
  * Graph.isomorphic? (rdf_core graph.ex) — canonicalQuads(a) ==
  * canonicalQuads(b) iff a ≅ b on these fixtures.
  */
class RdfCanonSpec extends AnyFunSuite {

  private type Q = (String, String, String)

  /** Deterministic label permutations: rename each bnode `_:x` to
    * `_:r{salt}{x}` (order-scrambling via reversed label). */
  private def relabel(quads: Seq[Q], salt: String): Seq[Q] = {
    def m(t: String) =
      if (t.startsWith("_:")) "_:r" + salt + t.drop(2).reverse else t
    quads.map { case (s, p, o) => (m(s), p, m(o)) }
  }

  private def canonSet(quads: Seq[Q]) = RdfCanon.canonicalQuads(quads).toSet

  test("clean graph: dense ids, ground terms untouched, invariance") {
    val g = Seq[Q](
      ("d1", "author", "_:p"), ("_:p", "name", "n1"),
      ("_:q", "name", "n2"), ("_:p", "knows", "_:q"),
      ("d1", "lang", "en"))
    val c = canonSet(g)
    assert(c.contains(("d1", "lang", "en")))
    val labels = c.flatMap { case (s, _, o) => Seq(s, o) }.filter(_.startsWith("_:"))
    assert(labels == Set("_:c0", "_:c1"), labels.toString)
    for (salt <- Seq("a", "bb", "zz9"))
      assert(canonSet(relabel(g, salt)) == c, salt)
  }

  test("automorphic twins resolve with an invariant quad set") {
    val g = Seq[Q](("_:u", "name", "n"), ("_:v", "name", "n"))
    val c = canonSet(g)
    assert(c == Set(("_:c0", "name", "n"), ("_:c1", "name", "n")), c.toString)
    assert(canonSet(relabel(g, "x")) == c)
  }

  test("automorphic 2-cycle (pure bnode-bnode structure)") {
    val g = Seq[Q](("_:x", "p", "_:y"), ("_:y", "p", "_:x"))
    val c = canonSet(g)
    assert(c == Set(("_:c0", "p", "_:c1"), ("_:c1", "p", "_:c0")), c.toString)
    for (salt <- Seq("m", "q")) assert(canonSet(relabel(g, salt)) == c, salt)
  }

  test("two disjoint automorphic 2-cycles: four-way collision resolves invariantly") {
    val g = Seq[Q](
      ("_:x", "p", "_:y"), ("_:y", "p", "_:x"),
      ("_:u", "p", "_:v"), ("_:v", "p", "_:u"))
    val c = canonSet(g)
    // dense ids and the 2+2 cycle structure survive
    val ids = c.flatMap { case (s, _, o) => Seq(s, o) }
    assert(ids == Set("_:c0", "_:c1", "_:c2", "_:c3"), ids.toString)
    val succ = c.map { case (s, _, o) => s -> o }.toMap
    assert(succ.forall { case (s, o) => succ(o) == s && s != o })
    for (salt <- Seq("k", "t7")) assert(canonSet(relabel(g, salt)) == c, salt)
  }

  test("n-degree distinguishes what first-degree cannot (distance-2 literals)") {
    // _:m and _:n have identical first-degree lines ("_:a e _:z"), but
    // their targets carry different literals — the n-degree pass must
    // order them THROUGH the already-canonical targets, stably
    val g = Seq[Q](
      ("_:m", "e", "_:a1"), ("_:a1", "f", "X"),
      ("_:n", "e", "_:a2"), ("_:a2", "f", "Y"))
    val c = canonSet(g)
    // the node reaching X via e∘f must get the same id every run and
    // under every relabeling
    val a1 = c.collect { case (s, "f", "X") => s }.head
    val m = c.collect { case (s, "e", o) if o == a1 => s }.head
    for (salt <- Seq("p", "qq", "z")) {
      val c2 = canonSet(relabel(g, salt))
      assert(c2 == c, salt)
      assert(c2.collect { case (s, "e", o) if o == a1 => s }.head == m)
    }
  }

  test("twins sharing a canonical neighbor recurse through it invariantly") {
    val g = Seq[Q](
      ("r", "tag", "_:u"), ("r", "tag", "_:v"),
      ("_:u", "knows", "_:w"), ("_:v", "knows", "_:w"),
      ("_:w", "name", "wroot"))
    val c = canonSet(g)
    val ids = c.flatMap { case (s, _, o) => Seq(s, o) }.filter(_.startsWith("_:"))
    assert(ids == Set("_:c0", "_:c1", "_:c2"), ids.toString)
    // _:w is first-degree unique -> _:c0; the twins take c1/c2 and both
    // point at w
    val w = c.collect { case (s, "name", "wroot") => s }.head
    assert(w == "_:c0", w)
    assert(c.count { case (_, "knows", o) => o == w; case _ => false } == 2)
    for (salt <- Seq("h", "jj")) assert(canonSet(relabel(g, salt)) == c, salt)
  }

  test("poison clique exhausts the budget and throws") {
    val n = 7
    val g = for {
      i <- 0 until n; j <- 0 until n if i != j
    } yield (s"_:b$i", "p", s"_:b$j"): Q
    val e = intercept[IllegalStateException] {
      RdfCanon.canonicalLabels(g, budgetOps = 2000L)
    }
    assert(e.getMessage.contains("budget"), e.getMessage)
  }

  test("non-isomorphic graphs canonicalize differently") {
    val cyc = Seq[Q](("_:x", "p", "_:y"), ("_:y", "p", "_:x"))
    val chain = Seq[Q](("_:x", "p", "_:y"), ("_:y", "p", "_:z2"))
    assert(canonSet(cyc) != canonSet(chain))
  }

  // ---- random-graph battery: RdfCanon cross-validated against the
  // independent Isomorphism implementation (hash-refine + search).
  // Two different algorithms must agree on every classification:
  //   canonSet(a) == canonSet(b)  <=>  Isomorphism.isomorphic(a, b)

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed * 2654435761L + 17)(s =>
      s * 6364136223846793005L + 1442695040888963407L).drop(1)

  /** Deterministic random bnode graph: n bnodes, ~n+3 bnode-bnode
    * edges over 2 predicates, a few literal decorations. */
  private def randomGraph(seed: Long): Seq[Q] = {
    val r = lcg(seed)
    val n = 3 + math.floorMod(r.next(), 4L).toInt
    val edges = (0 until n + 3).map { _ =>
      val a = math.floorMod(r.next(), n.toLong).toInt
      val b = math.floorMod(r.next(), n.toLong).toInt
      val p = if (math.floorMod(r.next(), 2L) == 0L) "p" else "q"
      (s"_:n$a", p, s"_:n$b"): Q
    }
    val lits = (0 until n).flatMap { i =>
      if (math.floorMod(r.next(), 3L) == 0L)
        Seq((s"_:n$i", "tag", s"t${math.floorMod(r.next(), 2L)}"): Q)
      else Nil
    }
    (edges ++ lits).distinct
  }

  private def toModel(quads: Seq[Q]): Set[Triple] = {
    def term(t: String): Term =
      if (t.startsWith("_:")) BNode(t.drop(2))
      else if (t.length == 1 || t == "tag") Iri("http://ex/" + t)
      else Lit.plain(t)
    quads.map { case (s, p, o) => Triple(term(s), Iri("http://ex/" + p), term(o)) }.toSet
  }

  test("random battery: canonical equality iff isomorphic (vs independent checker)") {
    var same = 0; var diff = 0
    for (seed <- 1L to 24L) {
      val g = randomGraph(seed)
      // relabeled copy: MUST be canonically equal and isomorphic
      val rl = relabel(g, s"s$seed")
      assert(canonSet(g) == canonSet(rl), s"seed $seed relabel")
      assert(Isomorphism.isomorphic(toModel(g), toModel(rl)), s"seed $seed iso")
      // cross-pair vs the next seed: the two classifiers must agree
      val h = randomGraph(seed + 100)
      val canonEq = canonSet(g) == canonSet(h)
      val isoEq = Isomorphism.isomorphic(toModel(g), toModel(h))
      assert(canonEq == isoEq, s"seed $seed cross: canon=$canonEq iso=$isoEq")
      if (isoEq) same += 1 else diff += 1
    }
    // the battery must actually exercise the negative lane
    assert(diff > 10, s"same=$same diff=$diff")
  }
}
