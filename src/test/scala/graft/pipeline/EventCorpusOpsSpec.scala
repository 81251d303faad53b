package graft.pipeline

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Contracts for the event-analytics operators (AS-OF join,
  * sessionization) and the retrieval/sketch corpus operators (BM25,
  * HLL): matching semantics on hand-built timelines, gap splitting,
  * relevance ordering, and sketch accuracy against the exact count.
  */
class EventCorpusOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test-eventops")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val epoch = LocalDateTime.of(1970, 1, 1, 0, 0, 0)

  /** events rows: (event_id, seconds-since-epoch, user_id, type, value) */
  private def events(rows: (Long, Long, Long, String, Double)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.map { case (id, sec, uid, ty, v) => (id, epoch.plusSeconds(sec), uid, ty, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.map { case (id, tx) => (id, tx, "src") }.toDF("doc_id", "text", "source")
  }

  test("asofJoin matches the latest view at-or-before each click, NULLs when none") {
    val e = events(
      (100L, 10L, 1L, "view", 1.5),
      (101L, 30L, 1L, "view", 2.5),
      (200L, 5L, 1L, "click", 0.0),  // before any view → NULL match
      (201L, 10L, 1L, "click", 0.0), // same instant as view 100 → inclusive match
      (202L, 40L, 1L, "click", 0.0), // latest prior is view 101
      (300L, 50L, 2L, "click", 0.0), // user 2 has no views → NULL (cross-user isolation)
      (400L, 1L, 2L, "purchase", 9.9)) // other types never match
    val got = EventOps.asofJoin(e).collect()
      .map(r => r.getAs[Long]("l_event_id") ->
        (Option(r.getAs[java.lang.Long]("r_event_id")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("lag_us")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("r_value")).map(_.toDouble))).toMap
    assert(got.keySet == Set(200L, 201L, 202L, 300L))
    assert(got(200L) == ((None, None, None)))
    assert(got(201L) == ((Some(100L), Some(0L), Some(1.5))))
    assert(got(202L) == ((Some(101L), Some(10L * 1000000L), Some(2.5))))
    assert(got(300L) == ((None, None, None)))
  }

  test("sessionize splits on gaps > threshold and rolls up per-type counts") {
    val gapSec = 240L * 60L
    val e = events(
      (1L, 0L, 1L, "click", 0.0),
      (2L, 600L, 1L, "purchase", 1.0),           // same session (10 min gap)
      (3L, 600L + gapSec + 1L, 1L, "view", 0.0), // gap just over threshold → new session
      (4L, 0L, 2L, "error", 0.0))                // separate user
    val got = EventOps.sessionize(e).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("duration_us"),
          r.getAs[Long]("n_clicks"), r.getAs[Long]("n_purchases"))).toMap
    assert(got.keySet == Set((1L, 1L), (1L, 2L), (2L, 1L)))
    assert(got((1L, 1L)) == ((2L, 600L * 1000000L, 1L, 1L)))
    assert(got((1L, 2L)) == ((1L, 0L, 0L, 0L)))
    assert(got((2L, 1L)) == ((1L, 0L, 0L, 0L)))
    // a gap exactly AT the threshold does NOT split
    val e2 = events((1L, 0L, 9L, "click", 0.0), (2L, gapSec, 9L, "click", 0.0))
    val one = EventOps.sessionize(e2).where(col("user_id") === 9L).collect()
    assert(one.length == 1 && one.head.getAs[Long]("n_events") == 2L)
  }

  test("asofJoin and sessionize plan exactly ONE shuffle each") {
    // the docstring claims: union + window = one user-key exchange, and
    // the sessionize rollup reuses the window's partitioning (groupBy
    // keys are a superset of the hash keys) — pin both plan shapes
    val e = events((1L, 0L, 1L, "click", 0.0), (2L, 5L, 1L, "view", 1.0))
    def exchanges(df: DataFrame): Int =
      "Exchange hashpartitioning".r.findAllIn(df.queryExecution.executedPlan.toString).length
    assert(exchanges(EventOps.asofJoin(e)) == 1)
    assert(exchanges(EventOps.sessionize(e)) == 1)
  }

  test("bm25TopK ranks docs sharing rare query terms above common-term matches") {
    // doc 0 (0 % 41 == 0) is the query: terms {rare, common}.
    // Every corpus doc contains "common"; only doc 1 contains "rare".
    val d = docs(
      (0L, "rare common"),
      (1L, "rare rare common filler1 filler2"),
      (2L, "common filler3 filler4 filler5"),
      (3L, "common filler6 filler7"),
      (4L, "common filler8 filler9"))
    val got = CorpusOps.bm25TopK(d, qModulus = 41, k = 3).collect()
    assert(got.forall(_.getAs[Long]("qid") == 0L))
    assert(got.length == 3) // 4 candidates, top-3 kept
    val byRank = got.sortBy(_.getAs[Long]("rank"))
    assert(byRank.head.getAs[Long]("doc_id") == 1L) // rare-term doc wins
    assert(byRank.head.getAs[Long]("n_terms") == 2L) // matched both query terms
    assert(byRank.head.getAs[Long]("score") > byRank(1).getAs[Long]("score"))
    assert(got.forall(_.getAs[Long]("score") > 0L))
    // ranks are 1..3 and deterministic ties break on doc_id
    assert(byRank.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
  }

  test("streaming funnel advances stages across micro-batches, ignores out-of-order regressions") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = s.sqlContext
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamingExtract.streamingFunnel(
      mem.toDF().toDF("event_id", "ts", "user_id", "event_type"))
      .toDF("user_id", "stage", "ts_us")
      .writeStream.format("memory").queryName("stream_funnel").outputMode("append").start()
    // batch 1: user 1 views (stage 1); a click BEFORE any view must not advance
    mem.addData(Seq((1L, t(5), 1L, "click"), (2L, t(10), 1L, "view")))
    q.processAllAvailable()
    // batch 2: click after the view advances to 2; purchase before the
    // click (t=15 < t=20, same batch replay order) is skipped; a later
    // purchase completes stage 3
    mem.addData(Seq((3L, t(20), 1L, "click"), (4L, t(15), 1L, "purchase"), (5L, t(30), 1L, "purchase")))
    q.processAllAvailable()
    q.stop()
    val out = s.sql("SELECT user_id, stage, ts_us FROM stream_funnel").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("stage"), r.getAs[Long]("ts_us"))).toSet
    assert(out == Set((1L, 1, 10L * 1000000L), (1L, 2, 20L * 1000000L), (1L, 3, 30L * 1000000L)), out.toString)
  }

  test("streaming sessionize merges within-gap events ACROSS micro-batches, emits on close") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = s.sqlContext
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val q = StreamingExtract.streamingSessionize(
      mem.toDF().toDF("event_id", "ts", "user_id", "event_type"),
      gapMinutes = 1)
      .writeStream.format("memory").queryName("stream_sess").outputMode("append").start()
    // batch 1: user 1 opens a session; batch 2 EXTENDS it across the
    // micro-batch boundary (40s gap < 1 min), then a far-future event
    // advances the watermark past the session close so it emits
    mem.addData(Seq((1L, t(0), 1L, "click"), (2L, t(20), 1L, "view")))
    q.processAllAvailable()
    mem.addData(Seq((3L, t(60), 1L, "purchase")))
    q.processAllAvailable()
    mem.addData(Seq((9L, t(100000), 2L, "view")))
    q.processAllAvailable()
    q.stop()
    val out = s.sql("SELECT * FROM stream_sess").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("duration_us"), r.getAs[Long]("n_clicks"), r.getAs[Long]("n_purchases")))
    // user 1's three events are ONE session (cross-batch merge), 60s span
    assert(out.toSet == Set((1L, 3L, 60L * 1000000L, 1L, 1L)), out.mkString(","))
  }

  test("streamingAttribution: stream-stream join matches the batch twin across micro-batches") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = s.sqlContext
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // base offset keeps event times off epoch 0 — a ts equal to the
    // initial watermark (0) is dropped as late by the join state store
    val B = 10000L
    val viewRows = Seq( // (event_id, ts, user_id)
      (1L, t(B), 1L), // matched by clicks at +60 and +900
      (2L, t(B + 100), 2L), // matched cross-micro-batch by click 14 at +200
      (3L, t(B), 3L)) // its only click (+3000 = 50 min later) is outside the 30-min window
    val clickRows = Seq(
      (10L, t(B + 60), 1L), (11L, t(B + 900), 1L),
      (12L, t(B + 30), 2L), // click BEFORE user 2's view → excluded
      (13L, t(B + 3000), 3L), // outside the attribution window → excluded
      (14L, t(B + 200), 2L)) // 100s after user 2's view → matched
    val vMem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val cMem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q = StreamingExtract.streamingAttribution(
        vMem.toDF().toDF("event_id", "ts", "user_id"),
        cMem.toDF().toDF("event_id", "ts", "user_id"))
      .writeStream.format("memory").queryName("stream_attr").outputMode("append").start()
    // batch 1: user 1 + user 3 views, user 1's first click, user 2's too-early click
    vMem.addData(Seq(viewRows(0), viewRows(2)))
    cMem.addData(Seq(clickRows(0), clickRows(2)))
    q.processAllAvailable()
    // batch 2: user 2's view; its matching click arrives only in batch 3
    // — the match must happen ACROSS micro-batches from buffered state
    vMem.addData(Seq(viewRows(1)))
    q.processAllAvailable()
    cMem.addData(Seq(clickRows(1), clickRows(3), clickRows(4)))
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("SELECT * FROM stream_attr").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("click_id"),
        r.getAs[Long]("view_id"), r.getAs[Long]("gap_us"))).toSet
    // the batch twin: the same operator over the full static frames
    val vb = viewRows.toDF("event_id", "ts", "user_id")
    val cb = clickRows.toDF("event_id", "ts", "user_id")
    val batch = StreamingExtract.streamingAttribution(vb, cb).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("click_id"),
        r.getAs[Long]("view_id"), r.getAs[Long]("gap_us"))).toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    val M = 1000000L
    assert(batch == Set(
      (1L, 10L, 1L, 60L * M), (1L, 11L, 1L, 900L * M), (2L, 14L, 2L, 100L * M)),
      batch.toString)
  }

  test("funnel: greedy ordered conversion; out-of-order steps do not count") {
    val e = events(
      // user 1 converts fully — but only via the ordered chain:
      // click@5 precedes the first view and must not count as stage 2
      (1L, 10L, 1L, "view", 0.0), (2L, 5L, 1L, "click", 0.0),
      (3L, 20L, 1L, "click", 0.0), (4L, 15L, 1L, "purchase", 0.0),
      (5L, 30L, 1L, "purchase", 0.0),
      // user 2: click only, never viewed → stage 0
      (6L, 5L, 2L, "click", 0.0),
      // user 3: view then purchase but no click between → stage 1
      (7L, 10L, 3L, "view", 0.0), (8L, 20L, 3L, "purchase", 0.0))
    val got = EventOps.funnel(e).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (Option(r.getAs[java.lang.Long]("t1_us")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t2_us")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t3_us")).map(_.toLong),
          r.getAs[Long]("stage"))).toMap
    val M = 1000000L
    assert(got(1L) == ((Some(10L * M), Some(20L * M), Some(30L * M), 3L)))
    assert(got(2L) == ((None, None, None, 0L)))
    assert(got(3L) == ((Some(10L * M), None, None, 1L)))
  }

  test("cohortRetention: min-day cohorts, whole-day offsets, same-day dedup") {
    val day = 86400L
    val e = events(
      (1L, 0L, 1L, "view", 0.0), (2L, 2 * day + 100L, 1L, "click", 0.0),
      (3L, 2 * day, 2L, "view", 0.0),
      (4L, 10L, 3L, "view", 0.0), (5L, 20L, 3L, "view", 0.0)) // same day twice → one row
    val got = EventOps.cohortRetention(e).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset")) -> r.getAs[Long]("n_users"))
      .toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 2L) -> 1L, (2L, 0L) -> 1L), got.toString)
  }

  test("chunkSliding: overlapping token windows, clamped tail, single-chunk and empty docs") {
    val d = docs(
      (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"), // 10 tokens → 3 chunks at 4/3
      (2L, "a b"),                            // fits one window
      (3L, ""))                               // no tokens → no rows
    val got = CorpusOps.chunkSliding(d, window = 4, stride = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx")) ->
        (r.getAs[Long]("start_tok"), r.getAs[Long]("end_tok"), r.getAs[String]("chunk_text")))
      .toMap
    assert(got.keySet == Set((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L)))
    assert(got((1L, 0L)) == ((0L, 4L, "w0 w1 w2 w3")))
    assert(got((1L, 1L)) == ((3L, 7L, "w3 w4 w5 w6"))) // 1-token overlap
    assert(got((1L, 2L)) == ((6L, 10L, "w6 w7 w8 w9"))) // clamped tail
    assert(got((2L, 0L)) == ((0L, 2L, "a b")))
  }

  test("pageRank: hand-computed integer fixpoint steps on a 3-node star") {
    val s = spark
    import s.implicits._
    // 0 <-> 1, 0 <-> 2: deg(0)=2, deg(1)=deg(2)=1
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 0L), (2L, 0L)).toDF("src", "dst")
    // r1(0) = 150000 + 85*(1e6 + 1e6) div 100          = 1850000
    // r1(1) = r1(2) = 150000 + 85*(1e6 div 2) div 100  = 575000
    // r2(0) = 150000 + 85*(575000+575000) div 100      = 1127500
    // r2(1) = 150000 + 85*(1850000 div 2) div 100      = 936250
    val got = GraphOps.pageRank(edges, iters = 2, k = 3).collect()
      .map(r => r.getAs[Long]("node") -> (r.getAs[Long]("r"), r.getAs[Long]("rank"))).toMap
    assert(got(0L) == ((1127500L, 1L)))
    assert(got(1L) == ((936250L, 2L))) // rank tie with node 2 breaks on node id
    assert(got(2L) == ((936250L, 3L)))
  }

  test("temperatureMix: sqrt weights compress source imbalance; shares sum to ~1e6") {
    val s = spark
    import s.implicits._
    // source a: 400 tokens, source b: 100 → weights 20/10 → shares 2:1
    // (natural mixing would be 4:1 — the sqrt compresses the ratio)
    val d = Seq(
      (1L, Array.fill(400)("w").mkString(" "), "a"),
      (2L, Array.fill(100)("w").mkString(" "), "b")).toDF("doc_id", "text", "source")
    val got = CorpusOps.temperatureMix(d).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("w"), r.getAs[Long]("share_ppm"))).toMap
    assert(got("a") == ((400L, 20L, 666666L)))
    assert(got("b") == ((100L, 10L, 333333L)))
  }

  test("countMinTopK: planted heavy hitter ranks first, estimate never undercounts") {
    val heavy = Array.fill(60)("alpha").mkString(" ")
    val d = docs(
      (1L, heavy), (2L, "beta beta gamma"), (3L, "gamma delta epsilon"),
      (4L, "zeta eta theta iota"), (5L, "beta kappa"))
    val got = CorpusOps.countMinTopK(d, k = 5).collect().sortBy(_.getAs[Long]("rank"))
    assert(got.head.getAs[String]("term") == "alpha")
    assert(got.head.getAs[Long]("exact") == 60L)
    // count-min is one-sided: estimates only ever overcount
    assert(got.forall(r => r.getAs[Long]("overestimate") >= 0L))
    assert(got.forall(r => r.getAs[Long]("cm_est") >= r.getAs[Long]("exact")))
    assert(got.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
  }

  test("hllTrigramCardinality: exact count is right, estimate lands near it") {
    // doc i contributes exactly 2 distinct trigrams (a_i b_i c_i d_i),
    // disjoint across docs → exact_distinct == 2 * nDocs
    val n = 400
    val d = docs((0L until n.toLong).map(i => (i, s"a$i b$i c$i d$i")): _*)
    val row = CorpusOps.hllTrigramCardinality(d).collect().head
    val exact = row.getAs[Long]("exact_distinct")
    assert(exact == 2L * n)
    val est = row.getAs[Long]("est_alpha")
    // m=256 → ~6.5% standard error; 35% is a 5-sigma cushion
    assert(est > exact * 0.65 && est < exact * 1.35, s"est=$est exact=$exact")
    assert(row.getAs[Long]("n_buckets") <= 256L)
    assert(row.getAs[Long]("denom_x2p40") > 0L)
    // degenerate corpus: no trigram reaches 3 words → empty sketch
    val empty = CorpusOps.hllTrigramCardinality(docs((1L, "one two"))).collect().head
    assert(empty.getAs[Long]("exact_distinct") == 0L)
    assert(empty.getAs[Long]("n_buckets") == 0L)
  }

  private def edges(rows: (Long, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("a", "b")
  }

  test("triangles: hand graph — K4 minus an edge, plus a pendant and an isolated edge") {
    // 1-2, 1-3, 2-3, 2-4, 3-4 (K4 minus 1-4): triangles {1,2,3} and
    // {2,3,4}; pendant 4-5 and edge 6-7 contribute none. Edge input
    // deliberately unnormalized: duplicates and both orientations.
    val e = edges((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 7L), (2L, 1L), (1L, 2L), (5L, 5L))
    val got = GraphOps.triangles(e).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("n_tri")).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangles: clique count is exact — C(k,3) per corner on K5") {
    val k = 5
    val e = edges((for (i <- 1 to k; j <- i + 1 to k) yield (i.toLong, j.toLong)): _*)
    val got = GraphOps.triangles(e).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("n_tri")).toMap
    // each vertex of K5 sits on C(4,2) = 6 triangles
    assert(got == (1 to k).map(i => i.toLong -> 6L).toMap)
  }

  test("kTruss: triangle ladder peels from the ends, K4 survives, pendant drops round 1") {
    // ladder on 0..7 (chain i-(i+1) for i<=6, chords i-(i+2) for
    // i<=5): the 6 triangles (i,i+1,i+2) give middle chain edges
    // support 2, chords and end edges 1 — at k=4 the chords drop round
    // 1, which kills every triangle, so the remaining chain peels
    // round 2 and the set empties; K4 on 10..13 keeps support 2 on all
    // 6 edges forever; pendant 20-21 has no triangle
    val ladder = (0L to 6L).map(i => (i, i + 1)) ++ (0L to 5L).map(i => (i, i + 2))
    val k4 = for (i <- 10L to 13L; j <- i + 1 to 13L) yield (i, j)
    val e = edges(ladder ++ k4 ++ Seq((20L, 21L)): _*)
    val got = GraphOps.kTruss(e, k = 4, maxRounds = 6).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v")) -> r.getAs[Long]("sup")).toMap
    assert(got == k4.map(p => p -> 2L).toMap, got.toString)
  }

  test("kTruss: k=3 keeps every triangle-bearing edge, non-convergence at a tight cap throws") {
    val ladder = (0L to 6L).map(i => (i, i + 1)) ++ (0L to 5L).map(i => (i, i + 2))
    val e = edges(ladder ++ Seq((20L, 21L)): _*)
    // k=3 (minSup 1): every ladder edge is on >= 1 triangle, only the
    // pendant drops — fixpoint after 2 rounds (drop + confirm)
    val got = GraphOps.kTruss(e, k = 3, maxRounds = 4).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"))).toSet
    assert(got == ladder.toSet, got.toString)
    // k=4 on the ladder needs 3 rounds (chords, chain, confirm-empty);
    // a 2-round cap must throw, never ship the half-peeled set
    assertThrows[IllegalStateException] {
      GraphOps.kTruss(edges(ladder: _*), k = 4, maxRounds = 2).collect()
    }
  }

  test("linkPrediction: wedge candidates with whole-bit AA weights, adjacency excluded, hub cap") {
    // square 1-2-3-4: diagonals (1,3) and (2,4) have cn=2 through
    // degree-2 neighbors -> aa = 2 * (1e6 div len(bin(2))=2) = 1e6;
    // path 5-6-7 gives (5,7) cn=1 aa=5e5; adjacent pairs never appear
    val sq = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (5L, 6L), (6L, 7L))
    val got = GraphOps.linkPrediction(sq).collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")) ->
        (r.getAs[Long]("cn"), r.getAs[Long]("aa_micro"))).toMap
    assert(got == Map((1L, 3L) -> (2L, 1000000L), (2L, 4L) -> (2L, 1000000L),
      (5L, 7L) -> (1L, 500000L)), got.toString)
    // a star center above the hub cap contributes no wedges: with the
    // cap at 2, center 0 (degree 3) is excluded and nothing predicts
    val star = edges((0L, 1L), (0L, 2L), (0L, 3L))
    assert(GraphOps.linkPrediction(star, maxHubDegree = 2).count() == 0L)
    // at cap 3 the same star predicts all C(3,2) leaf pairs with
    // aa = 1e6 div len(bin(3))=2 = 5e5
    val got2 = GraphOps.linkPrediction(star, maxHubDegree = 3).collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")) -> r.getAs[Long]("aa_micro")).toMap
    assert(got2 == Map((1L, 2L) -> 500000L, (1L, 3L) -> 500000L, (2L, 3L) -> 500000L), got2.toString)
  }

  test("hopDistance: BFS min over multiple seeds, hop cap truncates, isolated seed stays 0") {
    val s = spark
    import s.implicits._
    // path 1-2-3-4-5-6 plus a cycle 7-8-9-7 touching 4 (via 4-7);
    // seeds {1, 9}; isolated seed 100 has no edges at all
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (7L, 8L), (8L, 9L), (9L, 7L), (4L, 7L))
    val seeds = Seq(1L, 9L, 100L).toDF("node")
    val got = GraphOps.hopDistance(e, seeds, maxHops = 3).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
    // from 1: 2→1, 3→2, 4→3; from 9: 7→1, 8→1, 4→2, 3→3(via 4), 5→3;
    // min fold: 4 = min(3, 2) = 2; 3 = min(2, 3) = 2; node 6 is 4 hops
    // from either seed → truncated by the cap; 100 stays at 0
    assert(got == Map(
      1L -> 0L, 9L -> 0L, 100L -> 0L,
      2L -> 1L, 7L -> 1L, 8L -> 1L,
      3L -> 2L, 4L -> 2L,
      5L -> 3L), got.toString)
  }

  test("phraseSearch: 3-term chain, overlapping matches, punctuation-tokenized, 1-based positions") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick fox; the QUICK fox runs"), // 2 matches of "the quick fox", first at 1
      (2L, "quick the fox"),                     // words present, order wrong -> no match
      (3L, "a a a a"),                           // overlapping "a a a": positions 1 and 2
      (4L, "the quick")                          // prefix only -> no 3-term match
    ).toDF("doc_id", "text")
    val tri = CorpusOps.phraseSearch(docs, Seq("the", "quick", "fox")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos")))).toMap
    assert(tri == Map(1L -> ((2L, 1L))))
    val aaa = CorpusOps.phraseSearch(docs, Seq("a", "a", "a")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos")))).toMap
    assert(aaa == Map(3L -> ((2L, 1L))))
  }

  test("streamingHllBySource: registers merge across micro-batches, equal to the batch sketch") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = s.sqlContext
    val b1 = Seq((1L, "src0", "alpha beta gamma delta epsilon"),
      (2L, "src1", "one two three four"))
    val b2 = Seq((3L, "src0", "alpha beta gamma zeta eta"), // overlaps batch 1's trigrams
      (4L, "src1", "five six seven eight"))
    val mem = MemoryStream[(Long, String, String)]
    val q = StreamingExtract.streamingHllBySource(
      mem.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName("stream_hll").outputMode("complete").start()
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    q.stop()
    val gotMap = s.sql("SELECT * FROM stream_hll").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("bucket")) -> r.getAs[Integer]("max_rho").toInt).toMap
    val batch = CorpusOps.hllRhoStream((b1 ++ b2).toDF("doc_id", "source", "text"), Seq("source"))
      .groupBy(col("source"), col("bucket")).agg(max(col("rho")).as("max_rho"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("bucket")) -> r.getAs[Integer]("max_rho").toInt).toMap
    assert(gotMap == batch, s"stream=$gotMap batch=$batch")
    assert(gotMap.nonEmpty && gotMap.keys.map(_._1).toSet == Set("src0", "src1"))
  }

  test("streamingCountMin: registers sum across micro-batches, equal to the batch sketch") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = s.sqlContext
    val b1 = Seq((1L, "alpha beta alpha gamma"), (2L, "beta delta"))
    val b2 = Seq((3L, "alpha epsilon beta beta"))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingExtract.streamingCountMin(
      mem.toDF().toDF("doc_id", "text"), depth = 3, hexLen = 2)
      .writeStream.format("memory").queryName("stream_cm").outputMode("complete").start()
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    q.stop()
    val got = s.sql("SELECT * FROM stream_cm").collect()
      .map(r => (r.getAs[Int]("r"), r.getAs[String]("bucket")) -> r.getAs[Long]("bcnt")).toMap
    val batch = StreamingExtract.streamingCountMin(
      (b1 ++ b2).toDF("doc_id", "text"), depth = 3, hexLen = 2).collect()
      .map(r => (r.getAs[Int]("r"), r.getAs[String]("bucket")) -> r.getAs[Long]("bcnt")).toMap
    assert(got == batch, s"stream=$got batch=$batch")
    // the register estimate upper-bounds the exact count (alpha = 3)
    val est = got.collect { case ((r, b), c)
      if (0 until 3).exists(rr => rr == r &&
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$rr:alpha".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(2) == b) => c }
    assert(est.nonEmpty && est.min >= 3L, est.toString)
  }

  test("streamingBgpMaintain: per-batch emissions disjoint, union == batch bgp, re-assertions inert") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = s.sqlContext
    val pats = Seq(("?x", "worksFor", "?org"), ("?org", "label", "?lbl"))
    val b1 = Seq(("p1", "worksFor", "o1"), ("o1", "label", "L1"))
    val b2 = Seq(("p2", "worksFor", "o1"), // new edge joining batch-1's label
      ("p1", "worksFor", "o1"),            // re-assertion: must emit nothing
      ("o2", "label", "L2"))               // label with no edge yet
    val b3 = Seq(("p3", "worksFor", "o2")) // completes with batch-2's label
    val mem = MemoryStream[(String, String, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[Set[(String, String, String)]]
    val q = StreamingExtract.streamingBgpMaintain(
      mem.toDF().toDF("s", "p", "o"), pats,
      df => out += df.select("x", "org", "lbl").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet)
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    mem.addData(b3); q.processAllAvailable()
    q.stop()
    assert(out.toSeq == Seq(
      Set(("p1", "o1", "L1")),
      Set(("p2", "o1", "L1")),
      Set(("p3", "o2", "L2"))), out.toString)
    // union of emissions == the batch BGP over the whole stream
    val batch = TripleOps.bgp((b1 ++ b2 ++ b3).toDF("s", "p", "o"), pats)
      .select("x", "org", "lbl").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(out.flatten.toSet == batch)
  }

  test("streamingCcMaintain: emits only relabeled/new nodes; replayed emissions equal batch CC") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(String, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[Set[(String, String)]]
    val q = StreamingExtract.streamingCcMaintain(
      mem.toDF().toDF("a", "b"),
      df => out += df.collect().map(r => (r.getString(0), r.getString(1))).toSet)
    mem.addData(Seq(("a", "b"), ("c", "d"))); q.processAllAvailable()
    mem.addData(Seq(("b", "c"))); q.processAllAvailable()   // merges the two components
    mem.addData(Seq(("a", "b"))); q.processAllAvailable()   // re-assertion: nothing changes
    q.stop()
    assert(out.toSeq == Seq(
      Set(("a", "a"), ("b", "a"), ("c", "c"), ("d", "c")),
      Set(("c", "a"), ("d", "a")), // only the relabeled nodes emit
      Set.empty[(String, String)]), out.toString)
    // replaying the emissions as upserts == batch CC over the whole stream
    val replayed = out.flatten.groupBy(_._1)
      .map { case (n, rows) => n -> rows.last._2 } // later batches override
    val batch = KgPipeline.connectedComponents(
      Seq(("a", "b"), ("c", "d"), ("b", "c")).toDF("a", "b")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(replayed == batch, s"$replayed vs $batch")
  }

  test("pageRankKeyed: string-keyed directed flow matches the hand-computed recurrence") {
    val s = spark
    import s.implicits._
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("src", "dst")
    val got = GraphOps.pageRankKeyed(e, iters = 1, k = 20).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // deg a=2, b=1; inflow b = 1e6/2 -> 150000 + 85*500000/100 = 575000
    // inflow c = 1e6/2 + 1e6 -> 150000 + 85*1500000/100 = 1425000
    assert(got.toSeq == Seq(("c", 1425000L, 1L), ("b", 575000L, 2L)), got.toSeq.toString)
  }

  test("trustRank: teleport returns only to seeds; seed+inflow combine") {
    val s = spark
    import s.implicits._
    // a <-> b, seeds = {a}, 2 rounds:
    //   r1: b = 85*1e6 div 100 = 850000; a = 150000 (seed, no inflow)
    //   r2: a = 150000 + 85*850000 div 100 = 872500 (seed bonus + inflow)
    //       b = 0 + 85*150000 div 100 = 127500 (non-seed gets NO teleport)
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val got = GraphOps.trustRank(e, seeds, iters = 2, k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 872500L, 1L), ("b", 127500L, 2L)), got.toSeq.toString)
  }

  test("hits: alternating integer-rescaled hub/authority steps match hand computation; self-loops drop") {
    val s = spark
    import s.implicits._
    // bipartite h1->{x,y}, h2->y (+ a self-loop that must drop):
    //   r1: aRaw x=1e6 y=2e6, scale 2 -> a x=500000 y=1000000
    //       hRaw h1=1.5e6 h2=1e6, scale 1 -> h as-is
    //   r2: aRaw x=1.5e6 y=2.5e6, scale 2 -> a x=750000 y=1250000
    //       hRaw h1=2e6 h2=1.25e6, scale 2 -> h h1=1000000 h2=625000
    val e = Seq(("h1", "x"), ("h1", "y"), ("h2", "y"), ("x", "x")).toDF("src", "dst")
    val got = GraphOps.hits(e, iters = 2, k = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("y", 1250000L, 0L, 1L), ("x", 750000L, 0L, 2L),
      ("h1", 0L, 1000000L, 3L), ("h2", 0L, 625000L, 4L)), got.toSeq.toString)
  }

  test("labelPropagation: sync rounds with min tiebreak split the barbell into its two triangles") {
    val s = spark
    import s.implicits._
    // triangles {a,b,c} and {x,y,z} bridged by c-x; hand-run 4 sync
    // rounds: r1 a<-b b<-a c<-a x<-c y<-x z<-x; r2 a<-a b<-a c<-a
    // x<-x y<-c z<-c; r3 stabilizes the left triangle on 'a' and
    // flips the right to 'c'; r4 confirms the fixpoint
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c"),
      ("x", "y"), ("x", "z"), ("y", "z"), ("c", "x")).toDF("src", "dst")
    val got = GraphOps.labelPropagation(e, iters = 4).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "c", "y" -> "c", "z" -> "c"), got.toString)
  }

  test("scc: cycles are components, DAG cross edges never merge, acyclic nodes are singletons") {
    val s = spark
    import s.implicits._
    // two 3-cycles {a,b,c} / {d,e,f} with a DAG bridge f→a (must NOT
    // merge), a 2-cycle {g,h} fed by a→g, an acyclic chain i→j with a
    // self-loop on i (dropped), and an isolated node k
    val e = Seq(
      ("a", "b"), ("b", "c"), ("c", "a"),
      ("d", "e"), ("e", "f"), ("f", "d"),
      ("f", "a"),
      ("g", "h"), ("h", "g"), ("a", "g"),
      ("i", "j"), ("i", "i")).toDF("src", "dst")
    val nodes = Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k").toDF("node")
    val got = GraphOps.scc(nodes, e).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "a" -> "c", "b" -> "c", "c" -> "c",
      "d" -> "f", "e" -> "f", "f" -> "f",
      "g" -> "h", "h" -> "h",
      "i" -> "i", "j" -> "j", "k" -> "k"), got.toString)
    // outer-round cap throws rather than shipping a partial decomposition
    intercept[IllegalStateException] {
      GraphOps.scc(nodes, e, maxOuter = 1).count()
    }
  }

  test("coCitation: shared-source pairs, oriented a<b, threshold") {
    val s = spark
    import s.implicits._
    // s1 cites {a,b,c}; s2 cites {a,b}; s3 cites {b} and a DUPLICATE
    // (b) that must not double-count; pair (a,b) co-cited twice,
    // (a,c)/(b,c) once — only (a,b) survives minCommon=2
    val e = Seq(("s1", "a"), ("s1", "b"), ("s1", "c"),
      ("s2", "a"), ("s2", "b"), ("s3", "b"), ("s3", "b")).toDF("src", "dst")
    val got = GraphOps.coCitation(e, minCommon = 2L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("a", "b", 2L)), got.toString)
    val all = GraphOps.coCitation(e, minCommon = 1L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(all == Set(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L)), all.toString)
  }

  test("kCore: iterative peeling reaches the fixpoint, not just the degree filter") {
    // triangle {1,2,3} with tail 3-4-5: after round 1 node 5 drops
    // (deg 1), which EXPOSES 4 at deg 1 — only a second peel round
    // removes it. 2-core = the triangle, every corner at core_deg 2.
    val e = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = GraphOps.kCore(e, k = 2, maxRounds = 8).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: empty core and non-convergence cap") {
    val s = spark
    import s.implicits._
    // a pure path peels from both ends, one layer per round: length 8
    // empties in 4 rounds (converged, empty result)...
    val path = (1L to 8L).map(i => (i, i + 1)).toDF("a", "b")
    assert(GraphOps.kCore(path, k = 2, maxRounds = 8).count() == 0L)
    // ...but a length-24 path needs ~12 shrinking rounds — the cap of
    // 4 must THROW (the q26 rule), never ship a half-peeled set
    val long = (1L to 24L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      GraphOps.kCore(long, k = 2, maxRounds = 4).count()
    }
  }

  test("clusteringCoeff: ppm ratios on the hand graph; degree-1 and triangle-free nodes kept") {
    // K4 minus 1-4 plus pendant 4-5: deg = (1:2, 2:3, 3:3, 4:3, 5:1);
    // triangles {1,2,3} and {2,3,4}; lcc = 2·tri·1e6 div (d·(d−1))
    val e = edges((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val got = GraphOps.clusteringCoeff(e).collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("n_tri"), r.getAs[Long]("lcc_ppm")))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 1000000L)),
      2L -> ((3L, 2L, 666666L)),
      3L -> ((3L, 2L, 666666L)),
      4L -> ((3L, 1L, 333333L)),
      5L -> ((1L, 0L, 0L))))
  }

  test("bloomSemiJoinAudit: no false negatives, members all pass, FPs only overshoot") {
    val s = spark
    import s.implicits._
    val build = (1L to 40L).map(i => i * 7L).toDF("k")
    val probe = (1L to 500L).toDF("k")
    val got = BloomOps.semiJoinAudit(build, "k", probe, "k", k = 4, hexLen = 1).collect()
      .map(r => r.getAs[Long]("key") ->
        (r.getAs[Long]("bloom_pass"), r.getAs[Long]("is_member"))).toMap
    assert(got.size == 500)
    // every true member passes (the bloom guarantee)
    assert(got.filter(_._2._2 == 1L).forall(_._2._1 == 1L))
    val members = got.count(_._2._2 == 1L)
    assert(members == 40L) // 7,14,...,280 all within probe range
    // hexLen=1 → 4 slices of 16 bits each, 40 keys → high fill: false
    // positives must exist, but the filter still rejects something
    val fps = got.count(kv => kv._2._1 == 1L && kv._2._2 == 0L)
    val rejected = got.count(_._2._1 == 0L)
    assert(fps > 0, "expected observable false positives at hexLen=1")
    assert(rejected > 0, "filter rejected nothing — degenerate saturation")
  }

  test("pmiCooccur: hand-computed ratios, vocab cap gates pairs, minPair prunes") {
    // a+b co-occur in all 4 docs; a+c only in doc 1; N=4
    val d = docs((1L, "a b c"), (2L, "a b"), (3L, "a b"), (4L, "b a"))
    val got = CorpusOps.pmiCooccur(d, vocabTop = 64, minPair = 1).collect()
      .map(r => (r.getAs[String]("wa"), r.getAs[String]("wb")) ->
        (r.getAs[Long]("n_ab"), r.getAs[Long]("pmi_ratio_ppm"))).toMap
    // (a,b): 4*4*1e6/(4*4) = 1e6 (independence); (a,c): 1*4*1e6/(4*1)
    assert(got(("a", "b")) == ((4L, 1000000L)))
    assert(got(("a", "c")) == ((1L, 1000000L)))
    assert(got(("b", "c")) == ((1L, 1000000L)))
    // minPair prunes singletons
    val pruned = CorpusOps.pmiCooccur(d, vocabTop = 64, minPair = 2).collect()
    assert(pruned.map(r => (r.getAs[String]("wa"), r.getAs[String]("wb"))).toSet ==
      Set(("a", "b")))
    // vocab cap of 2 keeps only the top-2 words (a and b, 4 docs each)
    val capped = CorpusOps.pmiCooccur(d, vocabTop = 2, minPair = 1).collect()
    assert(capped.map(r => (r.getAs[String]("wa"), r.getAs[String]("wb"))).toSet ==
      Set(("a", "b")))
  }

  test("minhashLshMd5Incremental == full pair set filtered to cross-batch pairs") {
    // new batch = doc_id ≡ 0 mod 4: doc 4 is an exact recrawl of old
    // doc 1 (must surface); 8≡12 is a new-new dup and 2≡6 an old-old
    // dup (both settled elsewhere — must NOT surface)
    val d = docs(
      (1L, "alpha beta gamma delta"), (4L, "alpha beta gamma delta"),
      (8L, "zeta eta theta iota"), (12L, "zeta eta theta iota"),
      (2L, "omicron pi rho sigma"), (6L, "omicron pi rho sigma"),
      (3L, "unrelated words entirely"), (5L, "different content again"))
    val isNew = (id: org.apache.spark.sql.Column) => pmod(id, lit(4L)) === 0L
    def pairs(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Double]("jaccard"))).toSet
    val full = pairs(Dedup.minhashLshMd5(d, threshold = 0.5, shingleWidth = 1))
    val cross = full.filter(p => (p._1 % 4 == 0) != (p._2 % 4 == 0))
    val inc = pairs(Dedup.minhashLshMd5Incremental(d, isNew, threshold = 0.5, shingleWidth = 1))
    assert(inc == cross)
    assert(inc.contains((1L, 4L, 1.0)), "exact cross-batch recrawl must surface")
    assert(!inc.exists(p => Set(p._1, p._2) == Set(8L, 12L)), "new-new pair must not surface")
    assert(!inc.exists(p => Set(p._1, p._2) == Set(2L, 6L)), "old-old pair must not surface")
  }

  test("markovTransitions: lag pairs per user, row-normalized ppm") {
    val ev = events(
      (1L, 10L, 1L, "A", 0.0), (2L, 20L, 1L, "B", 0.0), (3L, 30L, 1L, "A", 0.0),
      (4L, 10L, 2L, "B", 0.0), (5L, 20L, 2L, "A", 0.0),
      (6L, 10L, 3L, "A", 0.0), (7L, 20L, 3L, "C", 0.0))
    val got = EventOps.markovTransitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // A->B 1, A->C 1 (tot A = 2), B->A 2 (tot B = 2)
    assert(got == Set(
      ("A", "B", 1L, 500000L), ("A", "C", 1L, 500000L),
      ("B", "A", 2L, 1000000L)), got.toString)
  }

  test("burstDays: value-RANGE trailing baseline, gaps shrink the mass, flag at 1.5x") {
    def atDay(d: Long, n: Int, idBase: Long) =
      (0 until n).map(i => (idBase + i, d * 86400 + i, 1L, "X", 0.0))
    // days 0..2 steady at 2/day, day 3 spikes to 9; day 5 (after a
    // gap) sees only day 3+4 mass in its window
    val ev = events(
      (atDay(0, 2, 100) ++ atDay(1, 2, 200) ++ atDay(2, 2, 300) ++
        atDay(3, 9, 400) ++ atDay(5, 2, 500)): _*)
    val byDay = EventOps.burstDays(ev).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // day 3: n=9, trail=6 -> 4.5x, burst; day 5: trail = day3(9)+day4(0)... window days 2..4 -> d2=2,d3=9 -> 11
    assert(byDay(3L) == ((9L, 6L, 4500000L, 1L)), byDay.toString)
    assert(byDay(5L) == ((2L, 11L, 545454L, 0L)), byDay.toString)
    assert(byDay(1L) == ((2L, 2L, 3000000L, 1L)), byDay.toString) // 1-day baseline: gap mass = 0
    assert(!byDay.contains(0L), byDay.toString) // no trailing frame
  }

  test("scoredPairsMd5: integer ic/uc, exact dups score 1:1, gate-free pairs surface") {
    val d = docs(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma zzz"), (4L, "unrelated words entirely"))
    val scored = Dedup.scoredPairsMd5(d, shingleWidth = 1).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("ic"), r.getAs[Long]("uc"))).toSet
    // exact dup: identical 4-word sets -> ic = uc = 4
    assert(scored.contains((1L, 2L, 4L, 4L)), scored.toString)
    // near pair (3 of 5 distinct words shared) surfaces WITHOUT any
    // jaccard gate when banding collides; if present its score is 3/5
    scored.filter(p => Set(p._1, p._2) == Set(1L, 3L)).foreach { p =>
      assert((p._3, p._4) == (3L, 5L), p.toString)
    }
    // scores agree with the gated operator's jaccard on shared pairs
    val gated = Dedup.minhashLshMd5(d, threshold = 0.5, shingleWidth = 1).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Double]("jaccard")))
    gated.foreach { case (a, b, j) =>
      val s = scored.find(p => p._1 == a && p._2 == b).get
      assert(math.abs(s._3.toDouble / s._4 - j) < 1e-3, s"($a,$b)")
    }
  }

  test("leakageSplit: cluster members never straddle the split; singletons self-cluster") {
    val d = docs(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma delta"),
      (10L, "totally different content one"), (11L, "second unrelated text here"),
      (12L, "third unique document body"), (13L, "fourth standalone thing"),
      (14L, "fifth loner paragraph"), (15L, "sixth loner text"), (16L, "seventh loner words"))
    val pairs = Dedup.minhashLshMd5(d, threshold = 0.5, shingleWidth = 1)
      .select(col("a"), col("b"))
    val split = CorpusOps.leakageSplit(d, KgPipeline.connectedComponents(pairs))
    val rows = split.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("cluster"), r.getAs[String]("split")))).toMap
    assert(rows.size == 10)
    // the exact-dup trio clusters under its min id and shares one split
    assert(Seq(1L, 2L, 3L).forall(i => rows(i)._1 == 1L))
    assert(Seq(1L, 2L, 3L).map(rows(_)._2).toSet.size == 1)
    // singletons cluster as themselves
    assert((10L to 16L).forall(i => rows(i)._1 == i))
    // the leakage audit: no near-dup pair crosses the split
    val p = pairs.collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(p.nonEmpty && p.forall { case (a, b) => rows(a)._2 == rows(b)._2 })
    // both splits populated on this corpus (8 clusters, md5-assigned)
    assert(rows.values.map(_._2).toSet == Set("train", "val"))
  }

  test("budgetSample: integer quotas honored, greedy prefix per source, deterministic") {
    val s = spark
    import s.implicits._
    // source a: 3×4 tokens (w=3), source b: 2×8 tokens (w=4) →
    // shares 428571/571428 ppm; budget 20 → quotas 8 and 11 tokens →
    // a admits 2 docs (cum 4, 8), b admits 1 (cum 8; 16 > 11)
    val d = Seq(
      (1L, "w w w w", "a"), (2L, "w w w w", "a"), (3L, "w w w w", "a"),
      (11L, "w w w w w w w w", "b"), (12L, "w w w w w w w w", "b"))
      .toDF("doc_id", "text", "source")
    def snap() = CorpusOps.budgetSample(d, 20L).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("cum_tokens"))).toSet
    val got = snap()
    assert(got.count(_._1 == "a") == 2 && got.count(_._1 == "b") == 1)
    assert(got.filter(_._1 == "a").map(_._4) == Set(4L, 8L))
    assert(got.filter(_._1 == "b").map(_._4) == Set(8L))
    assert(got.toSeq.map(_._3).sum <= 20L)
    assert(snap() == got) // md5 order ⇒ rerun-identical
  }

  test("saltedTypeStats: salt count never changes the result (associativity proof)") {
    val e = events(
      (1L, 0L, 1L, "click", 1.25), (2L, 10L, 1L, "click", 2.75),
      (3L, 20L, 2L, "click", -0.5), (4L, 30L, 2L, "view", 7.0),
      (5L, 40L, 3L, "view", 0.01))
    def snap(salts: Int) = EventOps.saltedTypeStats(e, salts).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("sum_value_c"),
          r.getAs[Long]("min_value_c"), r.getAs[Long]("max_value_c"))).toMap
    val one = snap(1) // salts=1 degenerates to the plain group-by
    assert(one("click") == ((3L, 350L, -50L, 275L)))
    assert(one("view") == ((2L, 701L, 1L, 700L)))
    assert(snap(16) == one && snap(7) == one)
  }

  test("growthAccounting: new/returning/resurrected partition the actives; churn lands the day after") {
    def d(day: Long) = day * 86400L
    val ev = events(
      (1L, d(0), 1L, "view", 0.0), (2L, d(1), 1L, "view", 0.0), (3L, d(3), 1L, "view", 0.0),
      (4L, d(1), 2L, "view", 0.0),
      (5L, d(0), 3L, "view", 0.0), (6L, d(2), 3L, "view", 0.0))
    val out = EventOps.growthAccounting(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      0L -> ((2L, 0L, 0L, 0L)), // u1, u3 new
      1L -> ((1L, 1L, 0L, 1L)), // u2 new, u1 returning; u3 churned
      2L -> ((0L, 0L, 1L, 2L)), // u3 resurrected; u1, u2 churned
      3L -> ((0L, 0L, 1L, 1L))  // u1 resurrected; u3 churned (day-4 churn trimmed)
    ), out.toString)
  }

  test("rollingActives: trailing-window distinct users, gap days filled, end trimmed") {
    def d(day: Long) = day * 86400L
    val ev = events(
      (1L, d(0), 1L, "view", 0.0), (2L, d(0) + 100, 1L, "click", 0.0), // user 1 twice on day 0
      (3L, d(0) + 5, 2L, "view", 0.0),
      (4L, d(1), 1L, "view", 0.0),
      (5L, d(4), 3L, "view", 0.0))
    val out = EventOps.rollingActives(ev, windowDays = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      0L -> ((2L, 2L)), // {1,2} that day and in-window
      1L -> ((1L, 2L)), // day-1 actives {1}; window {1,2}
      2L -> ((0L, 2L)), // gap day, window still sees day 0+1
      3L -> ((0L, 1L)), // only day 1 in window
      4L -> ((1L, 1L))  // day 5/6 trimmed past the data's end
    ), out.toString)
  }
  test("epochShuffle: permutation per shard, deterministic replay, seed changes order") {
    val s = spark
    import s.implicits._
    val d = (0L until 200L).map(i => (i, "t", "src")).toDF("doc_id", "text", "source")
    val a = CorpusOps.epochShuffle(d, seed = "ep0", hexLen = 1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // every doc exactly once
    assert(a.map(_._1).toSet == (0L until 200L).toSet && a.length == 200)
    // positions within each shard are contiguous 1..n
    a.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, sh)
    }
    // byte-for-byte replay
    val b = CorpusOps.epochShuffle(d, seed = "ep0", hexLen = 1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    // a different seed is a different permutation (shard or pos moves)
    val c = CorpusOps.epochShuffle(d, seed = "ep1", hexLen = 1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq != c.sortBy(_._1).toSeq)
    // hexLen 2 refines shards: 2-char shard prefixes extend 1-char ones
    val fine = CorpusOps.epochShuffle(d, seed = "ep0", hexLen = 2).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val coarse = a.map(r => (r._1, r._2)).toMap
    assert(fine.forall { case (id, sh2) => sh2.startsWith(coarse(id)) })
  }

  test("deterministicWalks: reproducible, edge-respecting, one row per (start, pos), sinks stop") {
    val s = spark
    import s.implicits._
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "a")).toDF("src", "dst")
    def run() = GraphOps.deterministicWalks(edges, 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val got = run()
    // starts = distinct srcs; d is never a source
    assert(got.filter(_._2 == 0L).map(_._1) == Set("a", "b", "c"), got.toString)
    // at most one row per (start, pos) - the frontier never multiplies
    assert(got.groupBy(r => (r._1, r._2)).forall(_._2.size == 1), got.toString)
    // every step follows a real edge from the previous position's node
    val eSet = Set(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "a"))
    val byKey = got.map(r => (r._1, r._2) -> r._3).toMap
    got.filter(_._2 > 0L).foreach { case (st, pos, node) =>
      val prev = byKey((st, pos - 1))
      assert(eSet((prev, node)), s"walk $st pos $pos: $prev -> $node not an edge")
    }
    // a walk that reaches the sink d has no later positions
    got.filter(_._3 == "d").foreach { case (st, pos, _) =>
      assert(!byKey.contains((st, pos + 1)), s"walk $st continued past sink at pos $pos")
    }
    // deterministic: a second build yields the identical set
    assert(run() == got)
  }

  test("intervalOverlapJoin: inclusive endpoints, bin-straddling pairs found once, equals naive join") {
    val s = spark
    import s.implicits._
    val a = Seq(("a1", 0L, 10L), ("a2", 100L, 200L), ("a3", 63L, 65L)).toDF("id", "lo", "hi")
    val b = Seq(("b1", 10L, 20L),   // touches a1 at 10 (inclusive)
                ("b2", 21L, 99L),   // gap to a1, touches nothing of a2
                ("b3", 64L, 300L)   // straddles bins; overlaps a3 and a2
               ).toDF("id", "lo", "hi")
    val got = EventOps.intervalOverlapJoin(a, b, binWidth = 64L).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val naive = a.toDF("ida", "alo", "ahi").crossJoin(b.toDF("idb", "blo", "bhi"))
      .where($"alo" <= $"bhi" && $"blo" <= $"ahi")
      .select("ida", "idb").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == naive, s"got $got naive $naive")
    assert(got == Set(("a1", "b1"), ("a3", "b2"), ("a3", "b3"), ("a2", "b3")), got.toString)
  }

  test("coalesceIntervals: overlap/adjacency merge per key, gap splits, counts and reversed rows handled") {
    val s = spark
    import s.implicits._
    val iv = Seq(
      // k1: [0,5] [5,8] overlap; [9,12] adjacent within gap=1; [20,25] separate
      ("k1", 0L, 5L), ("k1", 5L, 8L), ("k1", 9L, 12L), ("k1", 20L, 25L),
      // k1: containment folds in
      ("k1", 1L, 3L),
      // k2: duplicate rows collapse before ordering; single island
      ("k2", 4L, 6L), ("k2", 4L, 6L),
      // k3: reversed interval dropped entirely
      ("k3", 9L, 2L)).toDF("key", "lo", "hi")
    val got = EventOps.coalesceIntervals(iv, gap = 1L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("k1", 0L, 12L, 4L), ("k1", 20L, 25L, 1L),
      ("k2", 4L, 6L, 1L)), got.toString)
    // gap=0: strict-overlap-or-touch only; the [9,12] island detaches
    val g0 = EventOps.coalesceIntervals(iv, gap = 0L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(g0.contains(("k1", 9L, 12L, 1L)) && g0.contains(("k1", 0L, 8L, 3L)), g0.toString)
  }
}
