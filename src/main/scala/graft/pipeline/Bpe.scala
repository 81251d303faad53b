package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Byte-pair-encoding (Sennrich et al. 2016, ACL — public algorithm):
  * a distributed trainer and a real merge-order encoder, the tokenizer
  * stage of a training-data pipeline.
  *
  * Scale design: the ONLY corpus-sized pass is the word-frequency
  * aggregation — one map-side-combinable groupBy shuffle. The merge
  * loop itself runs on the top-`maxTypes` word types (a bounded table:
  * standard practice — BPE statistics saturate long before the type
  * tail), so driver memory and time are independent of corpus size.
  * Encoding is a pure per-row function over a broadcast merge-rank map
  * (small arrays, once per word — not a per-element hot-path lambda).
  *
  * Everything is deterministic: ties in pair counts break on the
  * lexicographically smallest (left, right), so the merges table is a
  * pure function of the corpus.
  */
object Bpe {

  /** Distributed word-type frequency table over `[a-z]+` runs of the
    * lowercased text. One shuffle, map-side combinable.
    */
  def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(filter(split(lower(col("text")), "[^a-z]+"), w => w =!= "")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Train `numMerges` BPE merges from a corpus. The word-type table is
    * capped at the `maxTypes` most frequent types (ties broken
    * lexicographically) before the driver-side merge loop — the cap is
    * what keeps this safe at 100 TB.
    */
  def train(docs: DataFrame, numMerges: Int, maxTypes: Int = 50000): Seq[(String, String)] = {
    val types = wordFreq(docs)
      .orderBy(col("freq").desc, col("word"))
      .limit(maxTypes)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    trainFromTypes(types, numMerges)
  }

  /** The classic merge loop over a (word type → frequency) table:
    * repeatedly merge the most frequent adjacent symbol pair.
    */
  def trainFromTypes(types: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      types.map { case (w, f) => (w.map(_.toString).toArray, f) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // deterministic argmax: max count, then smallest (left, right)
        val best = counts.foldLeft(null.asInstanceOf[((String, String), Long)]) {
          case (acc, kv) =>
            if (acc == null) kv
            else if (kv._2 > acc._2) kv
            else if (kv._2 == acc._2 &&
              (kv._1._1 < acc._1._1 || (kv._1._1 == acc._1._1 && kv._1._2 < acc._1._2))) kv
            else acc
        }
        merges += best._1
        words = words.map { case (syms, f) => (mergePair(syms, best._1._1, best._1._2), f) }
      }
    }
    merges.toSeq
  }

  private def mergePair(syms: Array[String], l: String, r: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Encode one word with the trained merges — the real BPE algorithm
    * (lowest-rank pair first), not greedy longest-match.
    */
  def encodeWord(word: String, rank: collection.Map[(String, String), Int]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms: Array[String] = word.map(_.toString).toArray
    var improved = true
    while (improved && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach { rk =>
          if (rk < bestRank) { bestRank = rk; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) improved = false
      else syms = mergePair(syms, syms(bestAt), syms(bestAt + 1))
    }
    syms
  }

  /** Per-document BPE token count with a broadcast merge-rank map:
    * `(doc_id, bpe_tokens)`. The encode is a pure function per word —
    * bounded work, no shuffle beyond the scan.
    */
  def tokenCounts(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rankB = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    docs.select(col("doc_id"), lower(col("text")).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rank = rankB.value
        val wordRe = "[a-z]+".r
        it.map { case (id, text) =>
          val n =
            if (text == null) 0L
            else wordRe.findAllIn(text).foldLeft(0L)((acc, w) => acc + encodeWord(w, rank).length)
          (id, n)
        }
      }
      .toDF("doc_id", "bpe_tokens")
  }

  /** The merges table as a DataFrame `(rank, left, right)` — the
    * trainer's registered-query surface.
    */
  def mergesTable(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex.map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "left", "right")
  }

  // -------------------------------------------- shipped merges resource

  /** Merges trained by [[graft.tools.BpeTrainCli]] on the sf0.1
    * documents corpus (60 merges — capped below the tiny synthetic
    * vocabulary's saturation point so encoding still subdivides words)
    * and checked in as `graft/bpe_merges.txt`. A pure function of the
    * corpus: retraining reproduces the file byte-for-byte.
    */
  lazy val shippedMerges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "bpe_merges.txt resource missing")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().map { line =>
      val t = line.split("\t", 2)
      (t(0), t(1))
    }.toVector
    finally in.close()
  }

  /** Subword vocabulary induced by [[shippedMerges]] (every merge
    * product), ordered longest-first then lexicographic — the ordering
    * that makes a leftmost-first regex alternation implement greedy
    * longest-match identically in java.util.regex (Spark) and RE2
    * (DuckDB), the same cross-engine contract as
    * [[TextOps.subwordVocab]].
    */
  lazy val trainedVocab: Seq[String] =
    shippedMerges.map { case (l, r) => l + r }.distinct.sortBy(p => (-p.length, p))

  /** Greedy longest-match alternation over the trained vocabulary with
    * a single-char fallback. Vocab tokens are `[a-z]+` only — no regex
    * metacharacters to escape.
    */
  lazy val trainedVocabPattern: String =
    "(" + (trainedVocab :+ "[a-z0-9]").mkString("|") + ")"

  /** Subword count against the TRAINED vocabulary: greedy longest-match
    * segmentation, codegen'd built-ins only — the oracle-checkable twin
    * of [[tokenCounts]] (true merge-order BPE is not SQL-expressible;
    * greedy segmentation over the same vocab is).
    */
  def trainedSubwordCount(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val words = filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")
    // NULL text counts 0, matching the oracle's coalesce(..., 0)
    coalesce(aggregate(words, lit(0L),
      (acc, w) => acc + size(regexp_extract_all(w, lit(trainedVocabPattern))).cast("bigint")), lit(0L))
  }

  /** Fixed multi-character unit inventory for [[wordpieceSegment]] —
    * shared verbatim with the q189 oracle's VALUES list (the q36
    * shared-constant rule: lowercase ASCII only, no quoting hazard).
    */
  val WordpieceUnits: Seq[String] = Seq(
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd", "ti",
    "es", "or", "te", "of", "ed", "is", "it", "al", "ar", "st", "to",
    "ng", "se", "ha", "as", "ou", "io", "le", "ve", "co", "me", "de",
    "hi", "ri", "ro", "ic", "ne", "ea", "ra", "ce", "li", "ch", "ll",
    "be", "ma", "si", "om", "ur", "ing", "ion", "tio", "ent", "ati")

  /** WordPiece-style greedy longest-match-first segmentation as a
    * relational plan — the INFERENCE tokenizer (BERT's rule: at each
    * position take the longest vocabulary unit that matches; every
    * single character is implicitly in the vocabulary, so the walk
    * always advances). Differs from [[trainedSubwordCount]]'s regex
    * alternation, which is leftmost-FIRST priority, not longest.
    *
    * Shape: the step table (word, i) → longest-match length is ONE
    * explode + broadcast-unit join + map-side-combinable max; the
    * token walk is then a FUNCTIONAL chain (unique successor per
    * position), composed by pair doubling — ⌈log₂ maxWordLen⌉ rounds
    * instead of O(word length) frontier steps (the q141 discipline;
    * on a functional acyclic chain the (i, j) pair determines the
    * token path, so the union-distinct dedups identical
    * compositions). Per-word work is independent of the corpus —
    * words are DISTINCT'd first (the production trick: tokenize each
    * type once, join back by occurrence when needed).
    *
    * Input: a (word) frame. Output: (word, tokens, ntok) with tokens
    * comma-joined in order (the q79 array-as-string rule).
    */
  def wordpieceSegment(wordsDf: DataFrame, units: Seq[String] = WordpieceUnits,
      maxWordLen: Int = 32): DataFrame = {
    require(units.nonEmpty && units.forall(_.length >= 2),
      "units must be multi-character (single chars are implicit)")
    require(maxWordLen >= 1 && maxWordLen <= 32, "maxWordLen in [1,32]")
    val spark = wordsDf.sparkSession
    import spark.implicits._
    val words = wordsDf.select(col("word").cast("string").as("word")).distinct()
      .where(length(col("word")).between(1, maxWordLen))
      .localCheckpoint(true) // consumed by the step build AND the final join
    val pos = words.select(col("word"),
      explode(sequence(lit(0), length(col("word")) - 1)).as("i"))
    // one broadcast EQUI-join per distinct unit length: the join key
    // substring(word, i+1, L) is constant-length per lane, so each
    // lane is a hash join — a single lane with a variable-length key
    // would reference both sides and degrade to a nested-loop compare
    val mt = units.map(_.length).distinct.sorted.map { l =>
      val us = broadcast(units.filter(_.length == l).toDF("unit"))
      pos.join(us, expr(s"substring(word, i + 1, $l)") === col("unit"))
        .select(col("word"), col("i"), lit(l).as("sl"))
    }.reduceLeft(_ unionByName _)
      .groupBy(col("word"), col("i")).agg(max(col("sl")).as("sl"))
    val step = pos.join(mt, Seq("word", "i"), "left")
      .withColumn("sl", coalesce(col("sl"), lit(1)))
      .select(col("word"), col("i"), (col("i") + col("sl")).as("j"),
        expr("substring(word, i + 1, sl)").as("toks"), lit(1L).as("ntok"))
    var d = step.localCheckpoint(true)
    for (_ <- 1 to 5) { // 2^5 = 32 composed steps ≥ maxWordLen tokens
      val l = d.select(col("word"), col("i"), col("j").as("k"),
        col("toks").as("lt"), col("ntok").as("ln"))
      val r = d.select(col("word").as("word2"), col("i").as("i2"),
        col("j").as("j2"), col("toks").as("rt"), col("ntok").as("rn"))
      val comp = l.join(r, col("word") === col("word2") && col("k") === col("i2"))
        .select(col("word"), col("i"), col("j2").as("j"),
          concat(col("lt"), lit(","), col("rt")).as("toks"),
          (col("ln") + col("rn")).as("ntok"))
      d = d.unionByName(comp).distinct().localCheckpoint(true)
    }
    words.join(d, Seq("word"))
      .where(col("i") === 0 && col("j") === length(col("word")))
      .select(col("word"), col("toks").as("tokens"), col("ntok"))
  }

  /** Integer unit costs for [[viterbiSegmentCensus]] — a pure
    * function of unit LENGTH (70·len + 10: bigrams 150, trigrams
    * 220) so the oracle needs no per-unit cost table, just the
    * shared [[WordpieceUnits]] VALUES list and literal per-length
    * costs; single characters (the implicit universal fallback) cost
    * [[ViterbiCharCost]]. Two singles (200) beat nothing a bigram
    * (150) covers, three singles (300) lose to any trigram (220) or
    * bigram+single (250) — real min-cost structure with reachable
    * ties (two unit tilings at equal cost), which is what `n_best`
    * counts.
    */
  val ViterbiCharCost = 100L
  def viterbiUnitCost(len: Int): Long = 70L * len + 10L

  /** Unigram-LM Viterbi segmentation census — the OPTIMAL min-cost
    * segmentation per word type under an additive unit-cost model
    * (what SentencePiece's unigram tokenizer computes at inference
    * with costs = −log p), completing the subword triad: q25 BPE
    * (merge replay), q189 WordPiece (greedy longest-match), q211
    * Viterbi (global optimum — greedy is suboptimal exactly where
    * these two reports disagree). Output per word type: (word, len,
    * min_cost, n_best) where n_best counts the distinct optimal
    * segmentations (the tie census — a training-data tokenizer wants
    * to know where its segmentation is non-unique).
    *
    * Relational DP, one round per position j = 1..maxLen (bounded by
    * the LONGEST word, not the corpus): layer j's candidates are the
    * single-char fallback from layer j−1 (pure projection, no join)
    * plus one broadcast EQUI-join per distinct unit length — the
    * substring key has CONSTANT start and length per (j, L) lane, so
    * every lane is a hash join (the q189 lesson: a variable-length
    * key degrades to a nested-loop compare). Then one min groupBy
    * and one argmin ways-sum per round, both map-side-combinable on
    * the word key; each layer is checkpointed (the q26 lineage
    * lesson) and later rounds touch only layers j−maxUnitLen..j−1.
    * Words are DISTINCT'd first (tokenize each type once — the
    * production trick); per-word work is corpus-independent.
    * Words longer than maxWordLen are excluded from the census on
    * BOTH engine sides (a documented filter, not a truncation); the
    * round count derives from the DATA's max length via one scalar
    * aggregate (the capped-reduce discipline, Bpe.scala BPE-merge
    * precedent).
    */
  def viterbiSegmentCensus(wordsDf: DataFrame, units: Seq[String] = WordpieceUnits,
      maxWordLen: Int = 16): DataFrame = {
    require(units.nonEmpty && units.forall(u => u.length >= 2 && u.length <= 8),
      "units must be multi-character (single chars are implicit), len <= 8")
    require(maxWordLen >= 1 && maxWordLen <= 32, "maxWordLen in [1,32]")
    val spark = wordsDf.sparkSession
    import spark.implicits._
    val words = wordsDf.select(col("word").cast("string").as("word")).distinct()
      .where(length(col("word")).between(1, maxWordLen))
      .localCheckpoint(true) // consumed every round + the final join
    val dataMax = words.agg(max(length(col("word"))).as("m")).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Int]))
      .getOrElse(0)
    val unitLens = units.map(_.length).distinct.sorted
    val unitsByLen = unitLens.map(l =>
      l -> broadcast(units.filter(_.length == l).toDF("unit"))).toMap
    // layers(j) = (word, cost, ways): min cost to cover positions
    // 1..j and the optimal-path count; layer 0 is the empty prefix
    var layers = Vector(words.select(col("word"),
      lit(0L).as("cost"), lit(1L).as("ways")))
    for (j <- 1 to dataMax) {
      val single = layers(j - 1).where(length(col("word")) >= j)
        .select(col("word"), (col("cost") + ViterbiCharCost).as("cost"),
          col("ways"))
      val lanes = unitLens.filter(_ <= j).map { l =>
        layers(j - l).where(length(col("word")) >= j)
          .join(unitsByLen(l),
            expr(s"substring(word, ${j - l + 1}, $l)") === col("unit"))
          .select(col("word"),
            (col("cost") + lit(viterbiUnitCost(l))).as("cost"), col("ways"))
      }
      val cand = (single +: lanes).reduceLeft(_ unionByName _)
      val best = cand.groupBy(col("word")).agg(min(col("cost")).as("cost"))
      layers = layers :+ cand.join(best, Seq("word", "cost"))
        .groupBy(col("word"), col("cost"))
        .agg(sum(col("ways")).cast("bigint").as("ways"))
        .localCheckpoint(true)
    }
    val finals = (1 to dataMax).map(j =>
      layers(j).where(length(col("word")) === j))
    if (finals.isEmpty)
      words.select(col("word"), length(col("word")).cast("bigint").as("len"),
        lit(0L).as("min_cost"), lit(0L).as("n_best")).where(lit(false))
    else finals.reduceLeft(_ unionByName _)
      .select(col("word"), length(col("word")).cast("bigint").as("len"),
        col("cost").as("min_cost"), col("ways").as("n_best"))
  }
}
