package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import java.nio.file.{Files, Paths}

/** The end-to-end KG-construction DAG (north_rule):
  *
  *   pages ─extract→ triples ─link→ links
  *                      │
  *                      ├─canonicalize→ canonical_map
  *                      └─materialize→ nodes / edges / adjacency
  *
  * Every stage writes its output to Parquet under `outRoot/<stage>` and
  * is **checkpoint-resumable**: a stage whose `_SUCCESS` marker exists
  * is read back instead of recomputed, so a restarted job skips all
  * completed stages. Lineage/metrics rows accumulate in
  * `outRoot/metrics` (append mode).
  *
  * Scale design:
  *   - extraction is a single pass over (url, html) with per-partition
  *     lineage; no second scan, no driver collect.
  *   - the alias dictionary is small by construction → broadcast join
  *     for entity linking; the mention side stays shuffle-free.
  *   - canonicalization blocks candidate pairs with MinHash-LSH built
  *     from codegen'd built-in expressions (xxhash64/transform/
  *     aggregate) — no UDFs in the hot path; verification and
  *     connected components only touch the (tiny) candidate set.
  *   - node degree counts use a salted two-phase aggregation so hub
  *     entities cannot skew a single reducer.
  *   - adjacency is materialized via repartitionByRange(subj) +
  *     sortWithinPartitions — range-partitioned, clusterable layout
  *     instead of giant collect_list arrays.
  */
object KgPipeline {

  final case class StageResult(name: String, df: DataFrame, resumed: Boolean)

  private def done(path: String): Boolean = Files.exists(Paths.get(path, "_SUCCESS"))

  /** Run (or resume) one stage: compute and write unless output exists. */
  def stage(spark: SparkSession, outRoot: String, name: String)(compute: => DataFrame): StageResult = {
    val path = s"$outRoot/$name"
    if (done(path)) StageResult(name, spark.read.parquet(path), resumed = true)
    else {
      compute.write.mode(SaveMode.Overwrite).parquet(path)
      StageResult(name, spark.read.parquet(path), resumed = false)
    }
  }

  def run(spark: SparkSession, pages: Dataset[Page], outRoot: String): Map[String, DataFrame] = {
    import spark.implicits._

    // ---- stage: extract (triples + lineage from ONE pass) --------------
    val triples =
      if (done(s"$outRoot/triples")) spark.read.parquet(s"$outRoot/triples")
      else {
        val env = Extract.run(pages).persist(StorageLevel.MEMORY_AND_DISK)
        env.flatMap(_.triple).write.mode(SaveMode.Overwrite).parquet(s"$outRoot/triples")
        env.flatMap(_.lineage).write.mode(SaveMode.Append).parquet(s"$outRoot/metrics")
        env.unpersist()
        spark.read.parquet(s"$outRoot/triples")
      }

    // ---- stage: alias dictionary (small, broadcastable) -----------------
    val aliasDict = stage(spark, outRoot, "alias_dict") {
      entityAliases(triples)
    }.df

    // ---- stage: entity linking (broadcast join, no big-side shuffle) ----
    val links = stage(spark, outRoot, "links") {
      linkMentions(pages.toDF(), aliasDict)
    }.df

    // ---- stage: canonicalization (MinHash-LSH blocking + CC) ------------
    val canonicalMap = stage(spark, outRoot, "canonical_map") {
      canonicalize(aliasDict)
    }.df

    // ---- stage: materialize graph tables --------------------------------
    val edges = stage(spark, outRoot, "edges") {
      materializeEdges(triples, canonicalMap)
    }.df
    val nodes = stage(spark, outRoot, "nodes") {
      materializeNodes(edges)
    }.df
    val adjacency = stage(spark, outRoot, "adjacency") {
      edges.repartitionByRange(col("subj")).sortWithinPartitions("subj", "pred", "obj")
    }.df

    Map(
      "triples" -> triples, "alias_dict" -> aliasDict, "links" -> links,
      "canonical_map" -> canonicalMap, "edges" -> edges, "nodes" -> nodes,
      "adjacency" -> adjacency,
      "metrics" -> spark.read.parquet(s"$outRoot/metrics")
    )
  }

  /** Snapshot-backed variant of [[run]] over a [[SnapTable]] warehouse
    * — the north_rule's Iceberg-shaped contract: every stage commits
    * an atomic snapshot, a restarted job resumes from the last
    * committed version of each table, the per-partition lineage rows
    * land in a `metrics` table via APPEND commits (each refresh chains
    * a new data dir, history queryable by version), and a `refresh`
    * run recomputes into NEW snapshots while the previous ones stay
    * readable (time travel / audit / rollback — [[SnapTable.rollback]]
    * is a metadata-only HEAD swing).
    */
  def runVersioned(spark: SparkSession, pages: Dataset[Page], warehouse: String,
                   refresh: Boolean = false): Map[String, DataFrame] = {
    import spark.implicits._
    def stageSnap(name: String)(compute: => DataFrame): DataFrame =
      if (!refresh && SnapTable.exists(warehouse, name)) SnapTable.read(spark, warehouse, name)
      else { SnapTable.commit(spark, warehouse, name, compute); SnapTable.read(spark, warehouse, name) }

    // extract: triples (overwrite) + lineage metrics (append) from ONE pass
    val triples =
      if (!refresh && SnapTable.exists(warehouse, "triples")) SnapTable.read(spark, warehouse, "triples")
      else {
        val env = Extract.run(pages).persist(StorageLevel.MEMORY_AND_DISK)
        SnapTable.commit(spark, warehouse, "triples", env.flatMap(_.triple).toDF())
        SnapTable.commit(spark, warehouse, "metrics", env.flatMap(_.lineage).toDF(), op = "append")
        env.unpersist()
        SnapTable.read(spark, warehouse, "triples")
      }
    val aliasDict = stageSnap("alias_dict")(entityAliases(triples))
    val links = stageSnap("links")(linkMentions(pages.toDF(), aliasDict))
    val canonicalMap = stageSnap("canonical_map")(canonicalize(aliasDict))
    val edges = stageSnap("edges")(materializeEdges(triples, canonicalMap))
    val nodes = stageSnap("nodes")(materializeNodes(edges))
    val adjacency = stageSnap("adjacency")(
      edges.repartitionByRange(col("subj")).sortWithinPartitions("subj", "pred", "obj"))
    Map(
      "triples" -> triples, "alias_dict" -> aliasDict, "links" -> links,
      "canonical_map" -> canonicalMap, "edges" -> edges, "nodes" -> nodes,
      "adjacency" -> adjacency,
      "metrics" -> SnapTable.read(spark, warehouse, "metrics"))
  }

  /** Alias dictionary: every IRI entity mentioned as a subject, keyed by
    * its lower-cased local name. Distinct + small → broadcast side of
    * the linking join.
    */
  def entityAliases(triples: DataFrame): DataFrame =
    triples
      .where(col("objKind") === "iri" || !col("subj").startsWith("_:"))
      .select(col("subj").as("entity"))
      .where(!col("entity").startsWith("_:"))
      .distinct()
      .withColumn("alias", lower(element_at(split(regexp_replace(col("entity"), "#", "/"), "/"), -1)))
      .where(length(col("alias")) > 2)

  /** Mention detection + entity-link scoring: tokenize page text with
    * built-in functions (posexplode over split — codegen, no UDF), join
    * the broadcast alias dictionary, keep the best-scoring entity per
    * mention (deterministic tiebreak on entity).
    */
  def linkMentions(pages: DataFrame, aliasDict: DataFrame): DataFrame = {
    val mentions = pages
      .select(col("url"), posexplode(split(lower(col("text")), "[^a-z0-9]+")).as(Seq("pos", "token")))
      .where(length(col("token")) > 2)
    val scored = mentions
      .join(broadcast(aliasDict), mentions("token") === aliasDict("alias"))
      .withColumn("score", length(col("alias")).cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("url", "pos")
      .orderBy(col("score").desc, col("entity"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") === 1)
      .select("url", "pos", "token", "entity", "score")
  }

  /** Self-contained entity-linking twin over the documents table, fully
    * ANSI-SQL-expressible for the DuckDB oracle: the alias dictionary is
    * the distinct long tokens (length >= minLen) of the corpus itself,
    * mentions are all token occurrences, and each document keeps its
    * top-k linked entities by mention count (deterministic tiebreak on
    * token). Same plan shape as [[linkMentions]]: explode → broadcast
    * alias join → count → window top-k.
    */
  def linkDocumentTokens(documents: DataFrame, minLen: Int = 8, k: Int = 3): DataFrame = {
    val toks = documents.select(
      col("doc_id"),
      explode(filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "")).as("token"))
    val aliases = toks.select(col("token")).where(length(col("token")) >= minLen).distinct()
    val links = toks.join(broadcast(aliases), Seq("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("n").desc, col("token"))
    links.withColumn("rank", row_number().over(w).cast("bigint"))
      .where(col("rank") <= k)
      .select(col("doc_id"), concat(lit("http://ex/"), col("token")).as("entity"), col("n"), col("rank"))
  }

  /** MinHash-LSH blocking over entity local names + exact-Jaccard
    * verification + iterative min-id connected components → canonical
    * entity map. All candidate generation is built-in expressions.
    */
  def canonicalize(aliasDict: DataFrame): DataFrame = {
    val spark = aliasDict.sparkSession
    val entities = aliasDict.select("entity", "alias").distinct()

    // char-3-gram shingles of the alias (array_distinct keeps it a set)
    val shingled = entities.withColumn(
      "shingles",
      array_distinct(
        filter(
          transform(
            sequence(lit(1), greatest(length(col("alias")) - 2, lit(1))),
            i => col("alias").substr(i, lit(3))
          ),
          s => length(s) === 3
        )
      )
    ).where(size(col("shingles")) > 0)

    // MinHash signature: 12 permutations via seeded xxhash64; banded 4x3
    val nHashes = 12
    val sig = shingled.withColumn(
      "sig",
      array((0 until nHashes).map(i => array_min(transform(col("shingles"), s => xxhash64(s, lit(i))))): _*)
    )
    val banded = sig.select(
      col("entity"), col("shingles"),
      posexplode(array((0 until 4).map(b => hash(slice(col("sig"), b * 3 + 1, 3))): _*)).as(Seq("band", "bucket"))
    )

    // candidate pairs from shared (band, bucket); verified by exact Jaccard
    val left = banded.select(col("band"), col("bucket"), col("entity").as("e1"), col("shingles").as("s1"))
    val right = banded.select(col("band"), col("bucket"), col("entity").as("e2"), col("shingles").as("s2"))
    val pairs = left.join(right, Seq("band", "bucket"))
      .where(col("e1") < col("e2"))
      .select(col("e1"), col("e2"),
        (size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2")))).as("jaccard"))
      .where(col("jaccard") >= 0.9)
      .select("e1", "e2").distinct()

    // connected components over the verified pair graph; isolated
    // entities (no pair) stay their own canonical via the left join
    val cc = connectedComponents(pairs.select(col("e1").as("a"), col("e2").as("b")))
      .withColumnRenamed("node", "entity").withColumnRenamed("component", "canon")
    entities.select(col("entity"))
      .join(cc, Seq("entity"), "left")
      .select(col("entity"), coalesce(col("canon"), col("entity")).as("canon"))
  }

  /** Connected components over an undirected edge list (columns a, b):
    * returns (node, component) for every node appearing in an edge,
    * component = the minimum node id of the component. Deterministic —
    * and, per component, exactly what a transitive-closure min would
    * compute, which is how the DuckDB oracle (q26, WITH RECURSIVE)
    * replays it.
    *
    * Algorithm: alternating large-star / small-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — converges in O(log n) rounds to disjoint stars centered
    * on each component's minimum node, unlike plain min-label
    * propagation whose O(diameter) rounds blow up on chain-shaped
    * near-dup graphs at scale. Per round:
    *
    *   large-star: every node u links each STRICTLY LARGER neighbor to
    *     min(N(u) ∪ {u});
    *   small-star: every node u links each neighbor ≤ u (and itself) to
    *     min(N≤(u) ∪ {u}).
    *
    * Both preserve connectivity and never raise the component minimum,
    * so the fixpoint labels equal the transitive-closure min (q26's
    * oracle semantics). The edge set after small-star is canonically
    * directed (child > parent), so convergence = set equality of
    * consecutive rounds, checked by count + two independent order-
    * insensitive 64-bit hash sums (and the cap throws rather than
    * shipping unstable labels into an oracle-gated result).
    *
    * Scale notes: the input edge set is materialized ONCE up front
    * (persist) so an expensive upstream lineage — e.g. the full
    * MinHash-LSH pipeline feeding q26 — is not recomputed per round;
    * each round persists its output, checks convergence on that same
    * materialization, then releases the previous round's cache.
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 50): DataFrame =
    // stage-cached: labels are a deterministic pure function of the
    // edge set, and several registered consumers (q26's labels, q32's
    // representatives, q66's split) ask for the same component table —
    // one iterative computation per session serves them all (verdict-r4
    // #3). The result below ends checkpointed (its last `cur` is a
    // checkpoint leaf), so a hit replays nothing.
    StageCache.getOrCompute("connectedComponents", s"it=$maxIters", edges) {
      connectedComponentsUncached(edges, maxIters)
    }

  /** Incremental connected-components maintenance: fold a batch of
    * NEW edges into an existing component labeling without
    * re-clustering the corpus — the canonicalization-upkeep step of a
    * continuously ingesting KG (new sameAs links arrive; entity
    * groups must merge in delta time). Work is proportional to the
    * DELTA, never the base: delta endpoints look up their base label
    * (one join against the label table), the induced LABEL-graph
    * (one node per touched component, one edge per cross-component
    * delta edge) is delta-sized, and [[connectedComponents]] runs on
    * THAT — so the expensive iteration never sees corpus-scale input.
    * Untouched components pass through a left-join coalesce.
    *
    * Value-identical to recomputing CC over (base-label graph ∪
    * delta): base labels are component MINIMA (the [[connectedComponents]]
    * contract), so the min over a merged group of labels equals the
    * min node of the merged component — the same argument that makes
    * label-graph contraction sound in the alternating-star algorithm.
    * Delta-only nodes (never seen by the base) label as themselves
    * before merging, exactly as a fresh CC would. Edges between two
    * members of one existing component contract to self-loops and
    * cost nothing.
    */
  def connectedComponentsDelta(baseLabels: DataFrame, deltaEdges: DataFrame,
      maxIters: Int = 50): DataFrame = {
    val lab = baseLabels.select(col("node").cast("string").as("node"),
      col("component").cast("string").as("component"))
    val de = deltaEdges.select(col("a").cast("string").as("a"),
      col("b").cast("string").as("b")).where(col("a") =!= col("b")).distinct()
    val nd = de.select(col("a").as("node")).union(de.select(col("b").as("node"))).distinct()
    val ndLab = nd.join(lab, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("lab0"))
    val la = ndLab.select(col("node").as("a"), col("lab0").as("labA"))
    val lb = ndLab.select(col("node").as("b"), col("lab0").as("labB"))
    val labelEdges = de.join(la, Seq("a")).join(lb, Seq("b"))
      .select(col("labA").as("a"), col("labB").as("b"))
      .where(col("a") =!= col("b")).distinct()
    val merged = connectedComponents(labelEdges, maxIters)
      .select(col("node").as("oldLab"), col("component").as("newLab"))
    val updatedBase = lab.join(merged, lab("component") === merged("oldLab"), "left")
      .select(col("node"), coalesce(col("newLab"), col("component")).as("component"))
    val fresh = ndLab.join(lab.select(col("node")), Seq("node"), "left_anti")
    val freshLab = fresh.join(merged, fresh("lab0") === merged("oldLab"), "left")
      .select(fresh("node"), coalesce(col("newLab"), fresh("lab0")).as("component"))
    updatedBase.unionByName(freshLab).distinct()
  }

  private def connectedComponentsUncached(edges: DataFrame, maxIters: Int): DataFrame = {
    // canonical direction child > parent, self-loops dropped. Eager
    // localCheckpoint (NOT persist): it both materializes the upstream
    // lineage exactly once AND truncates the logical plan — without
    // truncation each round's plan nests the previous round's
    // (large-star + small-star reference `cur` three times), growing
    // the tree exponentially until analysis itself OOMs around round 6.
    // Blocks are reference-tracked and reclaimed by the ContextCleaner
    // when a round's frame goes out of scope.
    var cur = edges
      .where(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(true)

    def largeStar(e: DataFrame): DataFrame = {
      val both = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val m = both.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      both.join(m, Seq("u"))
        .where(col("v") > col("u"))
        // v > u >= m, so no self-loops; direction child > parent holds.
        // NO distinct here (r6): largeStar is only ever composed into
        // smallStar, whose final distinct restores set semantics —
        // smallStar's min-groupBy and join are duplicate-insensitive,
        // so dropping the intermediate dedup removes one exchange per
        // round without changing the per-round edge SET (the signature
        // is computed on the distinct'd composed output).
        .select(col("v").as("u"), col("m").as("v"))
    }

    def smallStar(e: DataFrame): DataFrame = {
      // input is already directed child > parent (large-star output)
      val m = e.groupBy(col("u")).agg(min(col("v")).as("m"))
      e.join(m, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(m.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    // order-insensitive signature of the (canonically directed) edge
    // set: row count + two independent 64-bit hash sums (summed as
    // decimal — a long sum overflows under ANSI mode) — one action per
    // round, no join
    def signature(e: DataFrame): (Long, BigDecimal, BigDecimal) = {
      val r = e.agg(
        count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(27,0)")),
        sum(xxhash64(lit("g2"), col("v"), col("u")).cast("decimal(27,0)"))).head()
      def bd(i: Int): BigDecimal =
        if (r.isNullAt(i)) BigDecimal(0) else BigDecimal(r.getDecimal(i))
      (r.getLong(0), bd(1), bd(2))
    }

    var sig = signature(cur)
    var i = 0
    var converged = false
    while (i < maxIters && !converged) {
      // eager checkpoint per round: one materialization the signature
      // action then reads from blocks, plan reset to a leaf
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      val nsig = signature(next)
      cur = next
      converged = nsig == sig
      sig = nsig
      i += 1
    }
    if (!converged)
      // q26 is a value-exact oracle query: shipping unstable labels
      // would compare silently-wrong — fail loudly instead
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters large-star/small-star rounds " +
          "(O(log n) expected — this indicates a bug or an adversarial input)")
    // at the fixpoint every edge is (child, center) with center = the
    // component minimum; centers label themselves
    cur.select(col("u").as("node"), col("v").as("component"))
      .union(cur.select(col("v").as("node"), col("v").as("component")))
      .distinct()
  }

  /** Coherence-reranked entity disambiguation — the collective step
    * of entity linking (the TagMe/AIDA idea in its deterministic
    * integer form): a mention's candidate entity scores its alias
    * PRIOR plus a VOTE for every distinct (other mention, candidate)
    * pair in the same document related to it, and the per-mention
    * winner is the argmax under a total (score DESC, ent ASC) order
    * (the q103 tiebreak rule). Votes reward interpretations that
    * hang together — "Paris" next to "France" outvotes the Texas
    * prior — without any FP similarity.
    *
    * Scale shape: the alias dictionary and the entity-relatedness
    * pair set are schema-sized and BROADCAST (the x_entity_link
    * discipline); the only corpus-sized shuffles key on (doc) for
    * the within-document vote join and on (doc, mention) for the
    * argmax window. Per-document candidate counts are bounded by
    * |mentions/doc| × |candidates/mention|, so the within-doc join
    * is quadratic only in that small constant, never in the corpus.
    */
  def coherenceRank(mentions: DataFrame, candidates: DataFrame,
      related: DataFrame, priorWeight: Long = 10L,
      voteWeight: Long = 25L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = mentions.select(col("doc").cast("bigint").as("doc"),
      col("mention").cast("string").as("mention")).distinct()
    val dict = broadcast(candidates.select(
      col("mention").cast("string").as("mention"),
      col("ent").cast("string").as("ent"),
      col("prior").cast("bigint").as("prior")))
    val cand = m.join(dict, Seq("mention"))
    val rel = broadcast(related.select(col("a").cast("string").as("ca"),
      col("b").cast("string").as("cb")))
    val other = cand.select(col("doc").as("doc2"),
      col("mention").as("mention2"), col("ent").as("ent2"))
    val votes = cand.join(rel, col("ent") === col("ca"))
      .join(other, col("doc") === col("doc2") && col("cb") === col("ent2") &&
        col("mention") =!= col("mention2"))
      .groupBy(col("doc"), col("mention"), col("ent"))
      .agg(countDistinct(col("mention2"), col("ent2")).as("votes"))
    val scored = cand.join(votes, Seq("doc", "mention", "ent"), "left")
      .withColumn("score",
        col("prior") * priorWeight + coalesce(col("votes"), lit(0L)) * voteWeight)
    val w = Window.partitionBy(col("doc"), col("mention"))
      .orderBy(col("score").desc, col("ent").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("doc"), col("mention"), col("ent"), col("score"))
  }

  /** Rewrite edges onto canonical entities and dedup. Both rewrite joins
    * key on the canonical map; Spark/AQE picks broadcast automatically
    * when the map is small, sort-merge otherwise.
    */
  def materializeEdges(triples: DataFrame, canonicalMap: DataFrame): DataFrame = {
    val cm = canonicalMap.select(col("entity"), col("canon"))
    triples
      .join(cm.withColumnRenamed("entity", "subj").withColumnRenamed("canon", "subjCanon"), Seq("subj"), "left")
      .join(
        cm.withColumnRenamed("entity", "obj").withColumnRenamed("canon", "objCanon"),
        Seq("obj"), "left")
      .select(
        col("url"),
        coalesce(col("subjCanon"), col("subj")).as("subj"),
        col("pred"),
        when(col("objKind") === "iri", coalesce(col("objCanon"), col("obj"))).otherwise(col("obj")).as("obj"),
        col("objKind"), col("lang"), col("datatype"))
      .dropDuplicates("url", "subj", "pred", "obj", "objKind", "lang", "datatype")
  }

  /** Namespace split of an IRI: everything up to and including the last
    * '#' or '/'; separator-less IRIs (urn:, mailto:, …) fall back to the
    * last ':' so such predicates still get a namespace instead of
    * silently failing to qname downstream (round-2 ADVICE — the old ""
    * namespace was filtered out and the whole chunk vanished).
    */
  def iriNamespace(iri: String): String = {
    val c = math.max(iri.lastIndexOf('#'), iri.lastIndexOf('/'))
    if (c >= 0) iri.substring(0, c + 1)
    else {
      val k = iri.lastIndexOf(':')
      if (k >= 0) iri.substring(0, k + 1) else ""
    }
  }

  private val wellKnownPrefixes = Map(
    graft.rdf.Vocab.rdfNs -> "rdf",
    "http://www.w3.org/2000/01/rdf-schema#" -> "rdfs",
    graft.rdf.Vocab.xsdNs -> "xsd",
    "http://www.w3.org/2002/07/owl#" -> "owl",
    "http://xmlns.com/foaf/0.1/" -> "foaf",
    "http://purl.org/dc/elements/1.1/" -> "dc",
    "http://purl.org/dc/terms/" -> "dcterms",
    "http://schema.org/" -> "schema"
  )

  /** Deterministic prefix for a namespace: well-known name, else
    * "n" + 8 hex chars of md5(ns) — a PURE FUNCTION of the namespace,
    * so independently-serialized chunks across all executors agree on
    * prefixes with zero driver-side coordination (no collect anywhere).
    */
  def nsPrefix(ns: String): String =
    wellKnownPrefixes.getOrElse(ns, "n" + Extract.urlScope(ns).substring(0, 8))

  /** Export the edge table as RDF/XML description lines — the
    * distributed face of the reference encoder's lazy per-description
    * stream (encoder.ex:94-123). Wrap with `<rdf:RDF ...>` header/footer
    * at write time to get a full document per output partition.
    *
    * Scale contract:
    *   - NO driver collect: each chunk derives its prefix map from its
    *     own predicate namespaces via [[nsPrefix]] (pure function →
    *     globally consistent).
    *   - bounded memory per task: rows arrive sorted by subject and a
    *     hub subject is serialized as MULTIPLE `rdf:Description`
    *     elements of ≤ `maxChunk` triples each — graph-equivalent under
    *     RDF set semantics (repeated descriptions of one subject merge),
    *     so no truncation and no per-subject materialization.
    */
  def exportRdfXml(edges: DataFrame, maxChunk: Int = 1000, selfContained: Boolean = false): Dataset[String] = {
    val spark = edges.sparkSession
    import spark.implicits._
    import graft.rdf.{BNode, Iri, Lit, RdfGraph, Triple, Vocab}
    import graft.xml.RdfXmlEncoder
    def term(v: String, kind: String, lang: String, dt: String): graft.rdf.Term = kind match {
      case "iri" => Iri(v)
      // internal scoped labels (`b0@<hex>`) are NOT NCNames; mangle
      // bijectively at this export boundary so rdf:nodeID stays valid
      // for strict parsers (reference always emits valid nodeIDs,
      // encoder.ex:253-270)
      case "bnode" => BNode(graft.rdf.Iris.ncSafeLabel(v.stripPrefix("_:")))
      case _ =>
        if (lang != null && lang.nonEmpty) Lit.lang(v, lang)
        else if (dt != null && dt.nonEmpty) Lit.typed(v, dt) else Lit.plain(v)
    }
    def encodeChunk(rows: Seq[(String, String, String, String, String, String)]): String = {
      val triples = rows.iterator.map { case (s, p, o, k, l, d) =>
        Triple(term(s, if (s.startsWith("_:")) "bnode" else "iri", null, null), Iri(p), term(o, k, l, d))
      }.toSet
      val prefixes = Map("rdf" -> Vocab.rdfNs) ++
        triples.iterator.flatMap { t =>
          val pNs = iriNamespace(t.p.asInstanceOf[Iri].value)
          // type-object namespaces too, so the encoder's short form works
          val tyNs = t.o match {
            case Iri(v) if t.p == Iri(Vocab.rdfType) => Some(iriNamespace(v))
            case _ => None
          }
          (Iterator(pNs) ++ tyNs.iterator).filter(_.nonEmpty)
        }.map(ns => nsPrefix(ns) -> ns).toMap
      try {
        val line = RdfXmlEncoder.stream(RdfGraph(triples, prefixes = prefixes))
          .drop(2) // per-chunk: skip prolog + open tag, keep description lines
          .takeWhile(_ != "</rdf:RDF>")
          .mkString
        // selfContained: declare the chunk's namespaces ON the element
        // itself (legal on any XML element), so lines can be wrapped by
        // a bare <rdf:RDF xmlns:rdf=...> root with no coordination
        if (!selfContained || line.isEmpty || line.startsWith("<!--")) line
        else {
          val decls = (prefixes - "rdf").toSeq.sorted
            .map { case (p, ns) => s"""xmlns:$p="${graft.xml.XmlOut.escape(ns)}"""" }
            .mkString(" ")
          if (decls.isEmpty) line
          else {
            val i = line.indexOf(' ') // right after the element name
            line.substring(0, i) + " " + decls + line.substring(i)
          }
        }
      } catch {
        case e: RdfXmlEncoder.EncodeError =>
          // a predicate whose local part is not an NCName cannot be
          // expressed in RDF/XML at all — make the loss OBSERVABLE
          // (round-2 ADVICE: "" made the export silently lossy): an XML
          // comment in the output stream (parse-safe, greppable) plus an
          // executor-log warning with the count
          org.slf4j.LoggerFactory.getLogger(KgPipeline.getClass).warn(
            s"exportRdfXml: dropped chunk of ${rows.size} triples (subject ${rows.head._1}): ${e.getMessage}")
          // "--" is illegal inside XML comments; mask it in the subject
          val subj = graft.xml.XmlOut.escape(rows.head._1).replace("--", "~~")
          s"<!-- graft:skipped ${rows.size} triples subject=$subj: not expressible in RDF/XML -->"
      }
    }
    edges
      .select("subj", "pred", "obj", "objKind", "lang", "datatype")
      .repartition(col("subj"))
      .sortWithinPartitions("subj", "pred", "obj", "objKind", "lang", "datatype")
      .as[(String, String, String, String, String, String)]
      .mapPartitions { (it: Iterator[(String, String, String, String, String, String)]) =>
        val rows = it.buffered
        new Iterator[String] {
          def hasNext: Boolean = rows.hasNext
          def next(): String = {
            val subj = rows.head._1
            val chunk = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String, String, String)]
            while (rows.hasNext && rows.head._1 == subj && chunk.size < maxChunk)
              chunk += rows.next()
            encodeChunk(chunk.toSeq)
          }
        }
      }
  }

  /** Write the edge table as VALID standalone RDF/XML documents, one
    * per output partition: self-contained description elements (each
    * declares its own namespaces) streamed between a bare
    * `<rdf:RDF xmlns:rdf=...>` root and its close tag. No coordination,
    * no driver collect, memory bounded by [[exportRdfXml]]'s chunking;
    * every output file re-parses with [[graft.xml.RdfXmlParser]].
    */
  def writeRdfXml(edges: DataFrame, outDir: String, maxChunk: Int = 1000): Unit = {
    val spark = edges.sparkSession
    import spark.implicits._
    exportRdfXml(edges, maxChunk, selfContained = true)
      .mapPartitions { lines =>
        val nonEmpty = lines.filter(_.nonEmpty)
        if (!nonEmpty.hasNext) Iterator.empty
        else
          Iterator.single(
            s"""<?xml version="1.0" encoding="utf-8"?>\n<rdf:RDF xmlns:rdf="${graft.rdf.Vocab.rdfNs}">""") ++
            nonEmpty ++ Iterator.single("</rdf:RDF>")
      }
      .write.mode(SaveMode.Overwrite).text(outDir)
  }

  /** Bucket-materialize a graph table for co-located joins: hash-
    * bucketed AND sorted by subject, so subject-keyed joins between two
    * such tables (edges ⋈ nodes, edges ⋈ edges for 2-hop) read
    * bucket-aligned files and skip the shuffle entirely — at 100 TB the
    * shuffle IS the cost of iterative graph queries, and bucketing
    * amortizes it into the single materialize write. (The Iceberg-style
    * layout from SURVEY §1.2, realized as a bucketed parquet catalog
    * table.)
    */
  def materializeBucketed(df: DataFrame, table: String, buckets: Int = 16): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "subj")
      .sortBy("subj")
      .format("parquet")
      .saveAsTable(table)

  /** Node table with degree counts — salted two-phase aggregation so hub
    * subjects (rdf:type objects, popular entities) cannot skew one
    * reducer at 100 TB.
    */
  def materializeNodes(edges: DataFrame): DataFrame = {
    val salted = edges
      .withColumn("salt", pmod(xxhash64(col("pred"), col("obj")), lit(16)))
      .groupBy(col("subj"), col("salt"))
      .agg(count(lit(1)).as("partialDeg"))
    salted.groupBy(col("subj"))
      .agg(sum(col("partialDeg")).as("outDegree"))
      .withColumn("isBlank", col("subj").startsWith("_:"))
  }
}
