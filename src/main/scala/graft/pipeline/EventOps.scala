package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics operators Spark lacks as built-ins: the
  * temporal AS-OF join and gap-based sessionization. Both are
  * single-shuffle window formulations over the user-key partition —
  * the scale-correct shape (a naive range join explodes into an
  * O(clicks × views) inequality join; the window form sorts each
  * user's timeline once).
  *
  * Cross-engine exactness: timestamps are carried as epoch
  * microseconds (NTZ-epoch `timestampdiff` here, `epoch_us` in DuckDB
  * — both the parquet INT64 micros value, no FP), and every column is
  * integer arithmetic, so the DuckDB oracles replay value-for-value.
  * The q49 oracle is deliberately NOT a replay of this window
  * formulation: it uses DuckDB's native `ASOF JOIN` — an independent
  * implementation of the same semantics — which the driver's
  * (user_id, ts)-uniqueness of the synthetic events keeps
  * deterministic.
  */
object EventOps {

  /** Epoch micros of the parquet TIMESTAMP_NTZ `ts` column —
    * timestampdiff from the NTZ epoch, so the value is the stored
    * INT64 micros regardless of the session time zone (a
    * `cast("timestamp")` would re-interpret NTZ in session-local time).
    */
  private def tsUs: Column =
    expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")

  /** AS-OF join: for every `leftType` event, the most recent
    * `rightType` event of the same user at-or-before its timestamp
    * (inclusive, the DuckDB/kdb+ convention), NULL columns when no
    * prior match exists.
    *
    * Implementation: union the two sides into one stream tagged
    * `is_l`, sort each user partition once by (ts, is_l, event_id) —
    * right rows first at an equal timestamp so the match is inclusive
    * — and carry the last non-null right-side attributes forward with
    * `last(..., ignoreNulls)` over the running frame. ONE shuffle on
    * user_id, no inequality join, no per-row probe.
    *
    * Scale shape: state per partition is one row of carried
    * attributes; skewed users are bounded by their own event count
    * (an ordered scan, never a cross product). At 100 TB this is the
    * same plan — the union reads both inputs once and the sort is
    * the single user-key exchange.
    */
  def asofJoin(events: DataFrame, leftType: String = "click",
               rightType: String = "view"): DataFrame = {
    val usec: Column = tsUs
    val l = events.where(col("event_type") === leftType)
      .select(col("user_id"), usec.as("ts_us"), col("event_id"), lit(1).as("is_l"),
        lit(null).cast("bigint").as("r_id"), lit(null).cast("bigint").as("r_ts"),
        lit(null).cast("double").as("r_val"))
    val r = events.where(col("event_type") === rightType)
      .select(col("user_id"), usec.as("ts_us"), col("event_id"), lit(0).as("is_l"),
        col("event_id").as("r_id"), usec.as("r_ts"), col("value").as("r_val"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("is_l").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("m_id", last(col("r_id"), ignoreNulls = true).over(w))
      .withColumn("m_ts", last(col("r_ts"), ignoreNulls = true).over(w))
      .withColumn("m_val", last(col("r_val"), ignoreNulls = true).over(w))
      .where(col("is_l") === 1)
      .select(
        col("event_id").as("l_event_id"),
        col("user_id"),
        col("ts_us").as("l_ts_us"),
        col("m_id").as("r_event_id"),
        (col("ts_us") - col("m_ts")).as("lag_us"),
        col("m_val").as("r_value"))
  }

  /** Funnel analysis: per user, the GREEDY ordered conversion through
    * view → click → purchase — earliest view, then earliest click
    * strictly after it, then earliest purchase strictly after that —
    * plus the stage reached (0-3). The greedy chain is the standard
    * funnel semantics: if any ordered subsequence exists, the greedy
    * one does (earliest-first never forfeits a later match).
    *
    * Scale shape: each stage is a per-(user,type) MIN aggregate —
    * map-side combinable, user-keyed — chained by two user-key joins
    * over the already-reduced per-user frames. No ordered scan of raw
    * timelines, no window over the full event stream; AQE handles
    * user-count skew. At 100 TB the three filtered aggregates are the
    * only corpus-sized passes.
    */
  def funnel(events: DataFrame, steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.size == 3, "funnel expects exactly three step types")
    val base = events.select(col("user_id"), col("event_type"), tsUs.as("ts_us"))
    def stageMin(ty: String, after: DataFrame, afterCol: String, out: String): DataFrame = {
      val s = base.where(col("event_type") === ty)
      (if (after == null) s else
        s.join(after.select(col("user_id"), col(afterCol)), Seq("user_id"))
          .where(col("ts_us") > col(afterCol)))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as(out))
    }
    val t1 = stageMin(steps(0), null, null, "t1_us")
    val t2 = stageMin(steps(1), t1, "t1_us", "t2_us")
    val t3 = stageMin(steps(2), t2, "t2_us", "t3_us")
    events.select(col("user_id")).distinct()
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(col("user_id"), col("t1_us"), col("t2_us"), col("t3_us"),
        (when(col("t3_us").isNotNull, 3)
          .when(col("t2_us").isNotNull, 2)
          .when(col("t1_us").isNotNull, 1)
          .otherwise(0)).cast("bigint").as("stage"))
  }

  /** Cohort retention: users grouped by their first-activity day (the
    * cohort), counted per whole-day offset of later activity — the
    * classic retention triangle, in exact integer epoch-day
    * arithmetic. Emits (cohort_day, day_offset, n_users) with
    * offset 0 = the cohort's own size.
    *
    * Scale shape: first-activity day is one user-keyed MIN aggregate;
    * the activity join is user-keyed over (user, day)-distinct rows
    * (map-side-combinable distinct first, so the join never sees raw
    * events); the final rollup keys on (cohort, offset) — bounded by
    * days², tiny. Three shuffles, none over raw occurrences twice.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    // integer div, not Column./ (which is FP division)
    val day = expr(
      "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000 AS BIGINT)")
    val activity = events.select(col("user_id"), day.as("day")).distinct()
    val first = activity.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    activity.join(first, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("cohort_day"), col("day_offset"), col("n_users"))
  }

  /** Gap-based sessionization: a user's events split into sessions
    * wherever the inter-event gap exceeds `gapMinutes`; emits one row
    * per session with its span and per-type counts. The classic
    * gaps-and-islands form: lag → break flag → running sum, all over
    * ONE user-key window (the q34 lesson: the flag's CASE is an
    * explicit IS NULL / ELSE 0, so NULL-lag semantics agree across
    * engines), then a map-side-combinable groupBy on the derived
    * (user, session) key.
    *
    * Scale shape: one shuffle total — the rollup reuses the window's
    * user-hash partitioning, so Catalyst plans the groupBy without a
    * second exchange. Session state never materializes; only the
    * per-session aggregate rows survive.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 240): DataFrame = {
    require(gapMinutes >= 1, "session gap must be >= 1 minute")
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us").asc, col("event_id").asc)
    val flagged = events
      .select(col("user_id"), col("event_id"), col("event_type"), tsUs.as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_clicks"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"),
        col("n_clicks"), col("n_purchases"))
  }

  /** Salted two-phase aggregation — the heavy-hitter skew guard for
    * low-cardinality group keys: pre-aggregate on (key, salt) so a
    * celebrity key's rows land on `salts` reducers instead of one,
    * then fold the salted partials on the key alone. Salting is
    * semantically invisible (sums/counts are associative-commutative;
    * the salt column cancels), so the oracle is the PLAIN group-by —
    * the value-exact proof that the skew-proof plan computes the same
    * result.
    *
    * The events table's 5 event types over ~60k rows are exactly the
    * shape that melts a naive groupBy at 100 TB: five reducers, each
    * eating 20 TB. Phase 1 is map-side combinable on (key, salt);
    * phase 2 touches `keys × salts` rows. Values quantized to integer
    * cents per row before ANY sum (the q1 rule: FP summation order is
    * partition-dependent).
    */
  def saltedTypeStats(events: DataFrame, salts: Int = 16): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val cents = round(col("value") * 100).cast("bigint")
    events
      .select(col("event_type"), cents.as("v"),
        pmod(xxhash64(col("event_id")), lit(salts.toLong)).as("salt"))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).cast("bigint").as("n_events"),
        sum(col("sv")).cast("bigint").as("sum_value_c"),
        min(col("mn")).cast("bigint").as("min_value_c"),
        max(col("mx")).cast("bigint").as("max_value_c"))
  }

  /** Rolling `windowDays`-day distinct active users — the retention
    * dashboard primitive Spark has no built-in for (COUNT DISTINCT
    * over a sliding event-time window): for every calendar day inside
    * the data's span, the distinct users active in the trailing
    * window, beside the same-day actives.
    *
    * Scale shape: raw events collapse FIRST to the distinct
    * (day, user) grid — one map-side-combinable shuffle, and the grid
    * is at worst |users|·|days|, orders smaller than the event
    * stream. The trailing window is that grid exploded to the
    * ≤windowDays target days each activity row contributes to
    * (explode-then-distinct — never a per-day self-join over raw
    * events, and never a O(span) window sort), then one more
    * distinct+count. Days past the data's end are trimmed by the
    * broadcast 1-row bounds frame (the q47 scalar pattern). The grid
    * is materialized once for its three consumers (bounds, daily,
    * window — the LSH census rule).
    */
  /** Daily growth accounting — the standard active-user decomposition
    * (every active user is exactly one of): `new` (first-ever day),
    * `returning` (also active the previous day), `resurrected` (seen
    * before, but not yesterday); plus `churned` attributed to the day
    * AFTER the last consecutive active day (active yesterday, absent
    * today). Calendar gap days inside the span emit rows too (all
    * zeros except possibly churned — the day after a busy day).
    *
    * Scale shape: everything derives from the same distinct
    * (user, day) grid as [[rollingActives]] (one map-side-combinable
    * shuffle, materialized once for its four consumers); `returning`
    * is a self equi-join of the grid against its day+1 shift (never
    * an inequality join), `churned` the anti-join of the same shift;
    * the day spine is an explode of one broadcast bounds row. All
    * joins are user+day equi-joins over the grid — event volume never
    * crosses a shuffle twice.
    */
  def growthAccounting(events: DataFrame): DataFrame = {
    val dayE = expr(
      "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000 AS BIGINT)")
    val du = events.select(col("user_id"), dayE.as("day")).distinct()
      .localCheckpoint(true)
    val first = du.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    val shifted = du.select(col("user_id"), (col("day") + 1).as("day"), lit(1).as("was_active"))
    val classified = du
      .join(first, Seq("user_id"))
      .join(shifted, Seq("user_id", "day"), "left")
      .groupBy(col("day"))
      .agg(
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("day") =!= col("first_day") && col("was_active").isNotNull, 1L).otherwise(0L)).as("n_returning"),
        sum(when(col("day") =!= col("first_day") && col("was_active").isNull, 1L).otherwise(0L)).as("n_resurrected"))
    val churned = shifted.join(du, Seq("user_id", "day"), "left_anti")
      .groupBy(col("day")).agg(count(lit(1)).as("n_churned"))
    val spine = du.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    spine
      .join(classified, Seq("day"), "left")
      .join(churned, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_new"), lit(0L)).cast("bigint").as("n_new"),
        coalesce(col("n_returning"), lit(0L)).cast("bigint").as("n_returning"),
        coalesce(col("n_resurrected"), lit(0L)).cast("bigint").as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).cast("bigint").as("n_churned"))
  }

  /** First-order Markov transition census over per-user event
    * sequences — the behavioral-model input (next-action prediction,
    * anomalous-flow detection): per (prev, next) event-type pair the
    * transition count and the row-normalized probability in
    * truncating ppm (q62 rule). Ordering is (user, ts) with ts unique
    * per user in the synthetic table (the q49 determinism note); the
    * lag window and the count aggregation both shuffle on user/pair
    * keys only.
    */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val pairs = events.select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
    pairs.groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("tot", sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("next_type"), col("n").cast("bigint").as("n"),
        expr("n * 1000000 div tot").cast("bigint").as("p_ppm"))
  }

  /** Burst detection over daily per-type event volumes: each day's
    * count against the trailing `trailDays`-day TOTAL via a RANGE
    * window (value-based, so calendar gaps shorten the trailing mass
    * instead of silently widening the frame — the reason this is not
    * ROWS). burst_ppm is the ratio to the trailing MEAN in truncating
    * ppm (`n · trailDays · 1e6 div trail`); days with an empty
    * trailing frame are dropped (no defined baseline). All integer;
    * day derivation is the q80 NTZ-epoch discipline.
    */
  def burstDays(events: DataFrame, trailDays: Int = 3,
                burstThresholdPpm: Long = 1500000L): DataFrame = {
    require(trailDays >= 1, "trailing window must be >= 1 day")
    val dayE = expr(
      "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000 AS BIGINT)")
    val daily = events.select(col("event_type"), dayE.as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-trailDays, -1)
    daily.withColumn("trail", sum(col("n")).over(w))
      .where(col("trail").isNotNull && col("trail") > 0)
      .select(col("event_type"), col("day").cast("bigint").as("day"),
        col("n").cast("bigint").as("n"), col("trail").cast("bigint").as("trail"),
        expr(s"n * $trailDays * 1000000 div trail").cast("bigint").as("burst_ppm"))
      .withColumn("is_burst",
        (col("burst_ppm") >= burstThresholdPpm).cast("long"))
  }

  def rollingActives(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "window must be >= 1 day")
    // integer div, not Column./ (which is FP division)
    val dayE = expr(
      "CAST(timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) div 86400000000 AS BIGINT)")
    val du = events.select(col("user_id"), dayE.as("day")).distinct()
      .localCheckpoint(true)
    val bounds = du.agg(max(col("day")).as("hi"))
    val daily = du.groupBy(col("day")).agg(count(lit(1)).as("n_active_1d"))
    du
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + (windowDays - 1))).as("wday"))
      .distinct()
      .groupBy(col("wday")).agg(count(lit(1)).as("n_active_win"))
      .crossJoin(broadcast(bounds))
      .where(col("wday") <= col("hi"))
      .join(daily, col("wday") === daily("day"), "left")
      .select(
        col("wday").as("day"),
        coalesce(col("n_active_1d"), lit(0L)).cast("bigint").as("n_active_1d"),
        col("n_active_win").cast("bigint").as("n_active_win"))
  }

  /** Interval-overlap join at scale — the range-join problem (validity
    * intervals, sessions × campaigns, temporal KG edges) that a naive
    * `a.lo <= b.hi AND b.lo <= a.hi` predicate turns into a cartesian
    * nested loop. The scale form BINS the timeline: each interval
    * expands to its covered bins of width `binWidth` (fan-out bounded
    * by interval-length/binWidth + 1), the sides EQUI-join on the bin,
    * the exact overlap predicate filters the candidates, and a pair
    * distinct removes multi-bin duplicates. Every join is a hash join
    * on the bin key; skew = a bin with many intervals, handled by AQE
    * like any hot key.
    *
    * Inputs: (id, lo, hi) each side, inclusive NON-NEGATIVE integer
    * endpoints (epoch units are; `div`-binning truncates toward zero,
    * which is floor only there), lo <= hi. Output: (ida, idb)
    * distinct overlapping pairs.
    * Pick binWidth near the typical interval length: much smaller
    * multiplies fan-out, much larger multiplies per-bin candidates.
    */
  /** Validity-interval coalescing — the temporal-KG compaction step:
    * per key, merge every set of intervals that overlap or sit within
    * `gap` of each other into one covering interval (assertion
    * validity windows, crawl coverage spans, session ranges). The
    * classic gaps-and-islands: order each key's intervals by the
    * UNIQUE (lo, hi) pair (input is distinct'd first — the q73
    * duplicate-ordering-key rule), a new island starts where lo
    * exceeds the running max of prior hi by more than `gap`
    * (NULL-first-row CASE, the q34 discipline), islands number by a
    * running sum over the same unique order (RANGE == ROWS by
    * uniqueness, the q67 rule), then one min/max/count per island.
    *
    * One shuffle on the key partition, two window passes, one
    * map-side-combinable groupBy — no self-join. The oracle is the
    * INDEPENDENT endpoint formulation: island starts are the los no
    * earlier interval reaches within gap, island ends the his no
    * later-reaching interval extends, paired start→min(end ≥ start).
    *
    * Input: (key, lo, hi) integer intervals, hi ≥ lo (reversed rows
    * dropped). Output: (key, lo, hi, n_merged).
    */
  def coalesceIntervals(intervals: DataFrame, gap: Long = 1L): DataFrame = {
    require(gap >= 0L, "gap must be non-negative")
    val iv = intervals.select(col("key").cast("string").as("key"),
      col("lo").cast("bigint").as("lo"), col("hi").cast("bigint").as("hi"))
      .where(col("hi") >= col("lo")).distinct()
    val wOrd = Window.partitionBy(col("key")).orderBy(col("lo"), col("hi"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val flagged = iv.withColumn("pmax", max(col("hi")).over(wRun))
      .withColumn("brk",
        when(col("pmax").isNull || col("lo") > col("pmax") + gap, 1).otherwise(0))
    flagged.withColumn("grp", sum(col("brk")).over(wOrd))
      .groupBy(col("key"), col("grp"))
      .agg(min(col("lo")).as("lo"), max(col("hi")).as("hi"),
        count(lit(1)).cast("bigint").as("n_merged"))
      .select(col("key"), col("lo"), col("hi"), col("n_merged"))
  }

  def intervalOverlapJoin(a: DataFrame, b: DataFrame, binWidth: Long): DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    def binned(df: DataFrame, id: String) = df.select(
        col(df.columns(0)).cast("string").as(id),
        col(df.columns(1)).cast("long").as(s"${id}_lo"),
        col(df.columns(2)).cast("long").as(s"${id}_hi"))
      .withColumn("bin", explode(sequence(
        expr(s"${id}_lo div $binWidth"), expr(s"${id}_hi div $binWidth"))))
    binned(a, "ida").join(binned(b, "idb"), Seq("bin"))
      .where(col("ida_lo") <= col("idb_hi") && col("idb_lo") <= col("ida_hi"))
      .select(col("ida"), col("idb"))
      .distinct()
  }
}
