package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer + encoder contracts: the classic merge loop on a known
  * tiny corpus, deterministic tie-breaking, merge-order encoding (NOT
  * greedy), lossless reconstruction, and the shipped-resource
  * reproducibility pin.
  */
class BpeSpec extends AnyFunSuite {

  test("merge loop learns the most frequent pair first") {
    // "abab" x10 dominates: ('a','b') then ('ab','ab')
    val merges = Bpe.trainFromTypes(Seq(("abab", 10L), ("cd", 5L)), numMerges = 2)
    assert(merges.head == ("a", "b"))
    assert(merges(1) == ("ab", "ab"))
  }

  test("pair-count ties break on the lexicographically smallest pair") {
    // "xy" and "ab" both appear 5 times → ('a','b') wins the tie
    val merges = Bpe.trainFromTypes(Seq(("xy", 5L), ("ab", 5L)), numMerges = 1)
    assert(merges == Seq(("a", "b")))
  }

  test("training stops when no pairs remain") {
    val merges = Bpe.trainFromTypes(Seq(("ab", 1L)), numMerges = 100)
    assert(merges == Seq(("a", "b"))) // one merge, then every type is a single symbol
  }

  test("encode applies merges in RANK order, not greedy longest-match") {
    // merges: ('b','c') rank 0, ('a','b') rank 1. Merge-order encoding
    // of "abc" takes rank-0 first → [a, bc]; greedy longest-match over
    // the vocab {ab, bc} would instead take [ab, c].
    val rank = Map(("b", "c") -> 0, ("a", "b") -> 1)
    assert(Bpe.encodeWord("abc", rank).toSeq == Seq("a", "bc"))
  }

  test("encoding is lossless and cascades merges") {
    val merges = Bpe.trainFromTypes(Seq(("spark", 10L), ("spar", 5L)), numMerges = 4)
    val rank = merges.zipWithIndex.toMap
    val toks = Bpe.encodeWord("spark", rank)
    assert(toks.mkString == "spark")
    assert(toks.length < 5) // some merging happened
    assert(Bpe.encodeWord("", rank).isEmpty)
    // unseen symbols pass through untouched
    assert(Bpe.encodeWord("zzq", rank).toSeq == Seq("z", "z", "q"))
  }

  test("shipped merges resource loads and induces a well-formed vocab") {
    assert(Bpe.shippedMerges.size == 60)
    assert(Bpe.shippedMerges.forall { case (l, r) => l.nonEmpty && r.nonEmpty && (l + r).forall(c => c >= 'a' && c <= 'z') })
    // vocab must be longest-first for the greedy-alternation contract
    val lens = Bpe.trainedVocab.map(_.length)
    assert(lens == lens.sorted(Ordering[Int].reverse))
    // and the pattern must compile in java.util.regex (Spark side)
    java.util.regex.Pattern.compile(Bpe.trainedVocabPattern)
  }

  test("trainer is deterministic: retrain reproduces identical merges") {
    val a = Bpe.trainFromTypes(Seq(("spark", 9L), ("stream", 8L), ("merge", 7L), ("filter", 6L)), 20)
    val b = Bpe.trainFromTypes(Seq(("spark", 9L), ("stream", 8L), ("merge", 7L), ("filter", 6L)), 20)
    assert(a == b)
  }
}
