package graft.tools

import graft.pipeline.{Extract, SyntheticPages}
import java.util.concurrent.{Executors, TimeUnit}

/** Pure-JVM parse throughput probe (no Spark): parses the synthetic page
  * mix on N threads. Usage: PureParseProbe <copies> <threads>
  */
object PureParseProbe {
  def main(args: Array[String]): Unit = {
    val copies = args(0).toInt
    val threads = args(1).toInt
    val fixtures = SyntheticPages.fixtureFiles().toVector
    // warmup
    (0 until 2).foreach { c => fixtures.foreach { case (rel, b) =>
      val p = SyntheticPages.page(rel, b, c, 0); Extract.triplesOf(p.url, p.html) } }
    val pool = Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    var total = new java.util.concurrent.atomic.AtomicLong()
    (0 until copies).foreach { c =>
      pool.submit(new Runnable { def run(): Unit = {
        var n = 0L
        fixtures.foreach { case (rel, b) =>
          val p = SyntheticPages.page(rel, b, c, 0)
          Extract.triplesOf(p.url, p.html).foreach(ts => n += ts.size)
        }
        total.addAndGet(n)
      }})
    }
    pool.shutdown(); pool.awaitTermination(600, TimeUnit.SECONDS)
    val sec = (System.nanoTime() - t0) / 1e9
    val pages = copies.toLong * fixtures.size
    println(f"PURE threads=$threads pages=$pages triples=${total.get} sec=$sec%.2f pages_per_sec=${pages / sec}%.0f triples_per_sec=${total.get / sec}%.0f")
  }
}
