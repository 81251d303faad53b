package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit over every registered query: flags plan shapes
  * that must not appear unintentionally at 100 TB — cartesian products,
  * non-broadcast nested-loop joins — and audits every parquet scan's
  * column pruning + filter pushdown: each query prints its scans as
  * `table(readCols/tableCols, pushed=N)`, and the `mustPrune` contract
  * pins the filter-heavy queries' scans to a maximum read width and a
  * minimum pushed-filter count (exit 1 on violation, same discipline
  * as the join-shape flags).
  * Usage: PlanAudit <sfDir>
  */
object PlanAudit {
  // non-equi joins that are INTENTIONALLY nested-loop with a broadcast
  // side (bounded query sets): brute-force ANN and the IVF centroid
  // probe (bounded queries x tiny broadcast centroid table)
  // q27 joins a 40-row broadcast slice against itself on a<b — an
  // intentional bounded nested loop, same class as the ANN query sides
  private val allowNestedLoop = Set("x_ann_brute", "q18_ann_brute_int", "x_ann_ivf", "q27_embedding_dot_norms",
    "q44_semdedup", // corpus × k broadcast medoids, the IVF-centroid shape
    "q47_bm25_topk", // tf table × ONE-row broadcast corpus-scalar frame
                     // (N, total tokens) — the scale-correct way to
                     // attach global constants (an unpartitioned window
                     // would funnel the tf table through one partition)
    "q62_pmi_cooccur", // same 1-row scalar-frame shape: the bounded
                       // pair table × broadcast(n_docs)
    "q70_surprisal_bits", // vocab-sized freq table × 1-row broadcast
                          // corpus-total frame (the q47/q62 shape)
    "q68_kmeans_int",  // corpus × k broadcast centroids per Lloyd
                       // round — the IVF-centroid bounded probe shape
    "q80_rolling_actives", // window-day counts × ONE-row broadcast
                           // day-bounds frame (the q47/q62 scalar shape)
    "q93_nb_classify", // vocab-grid × 1-row broadcast V frame and
                       // per-doc scores × 1-row broadcast prior frame
                       // — both the sanctioned q47/q62/q70 scalar
                       // shape (global constants attached map-side)
    "q101_bigram_lm", // scored bigrams × 1-row broadcast vocab-size
                      // frame — the q47/q62/q70 scalar shape
    "q133_kg_negatives", // positives × 1-row broadcast entity-count
                         // frame (the q47/q62 scalar shape) feeding
                         // the corruption-index modulus
    "q104_hits", // per-half-step 1-row broadcast max-rescale frame —
                 // the same sanctioned scalar shape, twice per round
    "q150_bgp_having", // grouped aggregate × ONE-row broadcast total
                       // frame — the q47/q62 scalar shape carrying the
                       // data-derived HAVING threshold
    "q169_exists_unbound", // IS-NULL-or-equal compatibility semi/anti
                           // (unbound vars are FREE in EXISTS groups) —
                           // inherently non-equi, the group side is the
                           // distinct bound-value set (broadcast), the
                           // q153 class
    "q173_er_metrics", // three ONE-row aggregate frames cross-joined
                       // into the single metrics row — the q47/q62
                       // scalar-frame shape
    "q198_blocking_quality", // four ONE-row census frames (n, gold,
                             // cand, covered pair sums) cross-joined
                             // into the single metrics row — the
                             // q173 scalar-frame shape
    "q199_mix_drift", // per-source counts × ONE-row broadcast
                      // corpus-total frame (the q47/q62 scalar
                      // shape) feeding the ppm share
    "q201_cluster_census", // total × clustered ONE-row frames cross-
                           // joined into the singleton row (q173
                           // scalar shape)
    "q203_rater_kappa", // three ONE-row aggregate frames (N, diag,
                        // pe-numerator) cross-joined into the single
                        // kappa row — the q173 scalar shape
    "q204_threshold_sweep", // scored pairs × the 5-row broadcast
                            // threshold table under a >= condition
                            // (bounded explode, the q153 class) plus
                            // the gold-total scalar frame
    "q205_triplet_mining", // corpus × bounded broadcast anchor slice
                           // under a <> condition — the q18
                           // sanctioned bounded nested-loop shape
    "q210_modularity", // per-community census × ONE-row broadcast
                       // edge-count frame (the q47/q62 scalar shape)
                       // feeding the modularity numerator
    "q153_values_undef", // solutions × broadcast inline VALUES rows
                         // under the IS-NULL-or-equal compatibility
                         // condition — inherently non-equi (UNDEF is a
                         // wildcard), bounded by the VALUES row count,
                         // never data-sized
    "q91_rdfs_closure") // the FIXTURE's domain map is one row with a
                        // constant prop key — Catalyst folds the
                        // equi-condition away, leaving the bounded
                        // 1-row broadcast shape (q47/q62 class); a
                        // real many-property domain map hash-joins

  /** Full column counts of the test tables (for the `a/b` pruning
    * report; unknown tables print b=0 and are never flagged).
    */
  private val tableCols = Map(
    "documents" -> 5, "lineitem" -> 11, "orders" -> 6, "events" -> 6,
    "embeddings" -> 3, "part" -> 6, "customer" -> 0, "supplier" -> 0,
    "nation" -> 0, "region" -> 0)

  /** The pruning CONTRACT: query -> required scan shapes, each
    * (table, maxReadCols, minPushedFilters). Every listed scan of that
    * table in the query's plan must read at most maxReadCols columns
    * and push at least minPushedFilters filters to the parquet reader —
    * the canonical filter-heavy shapes whose regression would silently
    * multiply 100-TB scan volume.
    */
  private val mustPrune: Map[String, Seq[(String, Int, Int)]] = Map(
    // full-table aggregate reads only the 5 grouped/summed of 11 cols
    "q1_pricing_summary" -> Seq(("lineitem", 5, 0)),
    // events queries never read props; the asof right leg adds value
    "q6_events_latest" -> Seq(("events", 4, 0)),
    "q49_asof_join" -> Seq(("events", 5, 1)),
    // stratified sampling: id + source only, no text; quota filter pushed
    "q30_stratified_sample" -> Seq(("documents", 3, 1)),
    // brute ANN slices push the vec_id range filter
    "q18_ann_brute_int" -> Seq(("embeddings", 2, 1)),
    // BGP path closure: predicate-lane filters reach the reader
    "q110_path_seq" -> Seq(("documents", 1, 1)),
    "q116_bgp_incremental" -> Seq(("documents", 1, 1)))
  // NOTE the LSH/CC family (q17/q26/q32/...) is deliberately absent:
  // those pipelines eagerly checkpoint their first stage, so their
  // final plans scan checkpoint RDD leaves, not parquet — their
  // documents-scan pruning is pinned by the PipelineSparkSpec plan
  // tests instead.

  private val scanRe = "FileScan parquet".r
  private val pathRe = "([A-Za-z0-9_]+)\\.parquet".r
  private val readSchemaRe = "ReadSchema: struct<(.*)$".r
  private val pushedRe = "PushedFilters: \\[([^\\]]*)\\]".r

  final case class ScanInfo(table: String, readCols: Int, pushed: Int)

  /** Parse every parquet scan of a (string-rendered) physical plan.
    * String-level on purpose: AQE wrappers and subquery plans all
    * render their scans into the same tree text, so this sees scans a
    * structural collect over `executedPlan` would miss.
    */
  def parseScans(plan: String): Seq[ScanInfo] =
    plan.linesIterator.filter(l => scanRe.findFirstIn(l).isDefined).map { l =>
      val table = pathRe.findAllMatchIn(l).map(_.group(1)).toSeq.lastOption.getOrElse("?")
      val readCols = readSchemaRe.findFirstMatchIn(l).map(_.group(1)) match {
        case Some(s) if s.trim.nonEmpty => s.split(",").count(_.contains(":"))
        case _ => 0
      }
      val pushed = pushedRe.findFirstMatchIn(l).map(_.group(1)) match {
        case Some(s) if s.trim.nonEmpty => s.split(",").length
        case _ => 0
      }
      ScanInfo(table, readCols, pushed)
    }.toSeq

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      // never truncate plan text: the scan audit parses ReadSchema /
      // PushedFilters out of it
      .config("spark.sql.debug.maxToStringFields", 2000)
      .config("spark.sql.maxMetadataStringLength", 10000)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        // audit each query SELF-CONTAINED: a stage-cache hit would
        // replace the upstream pipeline with a checkpoint-RDD leaf and
        // hide exactly the scans this audit exists to check
        graft.pipeline.StageCache.clear()
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val nestedLoop = plan.contains("BroadcastNestedLoopJoin") && !allowNestedLoop(name)
        val scans = parseScans(plan)
        val scanReport = scans.map(s =>
          s"${s.table}(${s.readCols}/${tableCols.getOrElse(s.table, 0)},pushed=${s.pushed})").mkString(" ")
        val pruneViolations = mustPrune.getOrElse(name, Nil).flatMap { case (table, maxCols, minPushed) =>
          val ts = scans.filter(_.table == table)
          if (ts.isEmpty) Seq(s"NO_SCAN:$table")
          else ts.flatMap { s =>
            (if (s.readCols > maxCols) Seq(s"UNPRUNED:$table(${s.readCols}>$maxCols)") else Nil) ++
              (if (s.pushed < minPushed) Seq(s"NO_PUSHDOWN:$table(${s.pushed}<$minPushed)") else Nil)
          }
        }
        val flags = Seq(
          if (cartesian) Some("CARTESIAN") else None,
          if (nestedLoop) Some("NESTED_LOOP") else None
        ).flatten ++ pruneViolations
        if (flags.nonEmpty) { bad += 1; println(s"AUDIT $name: ${flags.mkString(",")} scans: $scanReport") }
        else println(s"AUDIT $name: ok scans: $scanReport")
      } catch { case e: Throwable => bad += 1; println(s"AUDIT $name: PLAN_ERROR ${e.getMessage}") }
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
