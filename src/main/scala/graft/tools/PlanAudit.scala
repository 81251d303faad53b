package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit over every registered query: flags plan shapes
  * that must not appear unintentionally at 100 TB — cartesian products,
  * non-broadcast nested-loop joins, missing parquet column pruning.
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

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val nestedLoop = plan.contains("BroadcastNestedLoopJoin") && !allowNestedLoop(name)
        val flags = Seq(
          if (cartesian) Some("CARTESIAN") else None,
          if (nestedLoop) Some("NESTED_LOOP") else None
        ).flatten
        if (flags.nonEmpty) { bad += 1; println(s"AUDIT $name: ${flags.mkString(",")}") }
        else println(s"AUDIT $name: ok")
      } catch { case e: Throwable => bad += 1; println(s"AUDIT $name: PLAN_ERROR ${e.getMessage}") }
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
