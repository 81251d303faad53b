package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom-filter semi-join pruning — the classic 100 TB
  * join primitive: build a tiny bit set from the small side's keys,
  * broadcast it, and drop the fact table's non-matching rows at the
  * scan, long before the real join's shuffle. Spark's own
  * bloomFilter/might_contain is runtime-nondeterministic across
  * engines, so this one is built from md5 prefixes: every bit
  * assignment replays bit-for-bit in ANSI SQL (the q45/q48/q51
  * md5-prefix discipline — hex prefixes stay STRINGS; engines disagree
  * on hex→int conversion).
  */
object BloomOps {

  /** The k partitioned "bits" of a key: bit identity is the string
    * `"<i>:<first hexLen md5 hex chars of "<i>|key">"` — a partitioned
    * Bloom filter with k independent slices of 16^hexLen bits each
    * (Kirsch-Mitzenmacher partitioning; FP rate = Π fill_i, identical
    * in expectation to the classic form).
    */
  def bits(key: Column, k: Int, hexLen: Int): Column =
    array((0 until k).map(i =>
      concat(lit(s"$i:"),
        substring(md5(concat(lit(s"$i|"), key.cast("string"))), 1, hexLen))): _*)

  /** Audit form of the Bloom semi-join: classify every distinct probe
    * key by (bloom_pass, is_member). The production form keeps only
    * `bloom_pass` rows and never joins the member set — here the exact
    * membership rides along so false positives are observable (and the
    * no-false-negative guarantee is checkable: the pass=false,
    * member=true cell must be empty).
    *
    * Scale shape: the set-bit table is bounded by k·16^hexLen rows
    * regardless of build size — broadcast by construction; probe keys
    * are distinct-reduced before the k-way bit explode (map-side
    * combinable), and the bit probe is a broadcast equi-join + a
    * count-per-key rollup. The build side is scanned with its filter
    * pushed down; the probe side's raw rows never shuffle.
    */
  def semiJoinAudit(build: DataFrame, buildKey: String,
                    probe: DataFrame, probeKey: String,
                    k: Int = 4, hexLen: Int = 2): DataFrame = {
    require(k >= 1 && k <= 8 && hexLen >= 1 && hexLen <= 8, "k in [1,8], hexLen in [1,8]")
    val bkey = build.select(col(buildKey).cast("bigint").as("key")).distinct()
    val setBits = bkey.select(explode(bits(col("key"), k, hexLen)).as("bit")).distinct()
    val probeKeys = probe.select(col(probeKey).cast("bigint").as("key")).distinct()
    val probeBits = probeKeys.select(col("key"), explode(bits(col("key"), k, hexLen)).as("bit"))
    // the k bits of one key are distinct by their "<i>:" prefix, so
    // hit-count == k ⟺ every slice matched
    val hits = probeBits.join(broadcast(setBits), Seq("bit"))
      .groupBy(col("key")).agg(count(lit(1)).as("nb"))
    probeKeys
      .join(hits, Seq("key"), "left")
      .join(bkey.withColumn("mem", lit(1)), Seq("key"), "left")
      .select(col("key"),
        when(coalesce(col("nb"), lit(0L)) === k, 1L).otherwise(0L).as("bloom_pass"),
        when(col("mem").isNotNull, 1L).otherwise(0L).as("is_member"))
  }
}
