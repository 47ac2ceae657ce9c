package graft

/** Calibration main: the extraction kernel on bare threads — no Spark, no
  * scan, no shuffle, no codec. Running this at two pinned core counts
  * isolates how the KERNEL ITSELF scales on this host (allocation rate,
  * shared L3) from Spark machinery; `tools/scaling_bench.sh` quotes it
  * alongside the spin (pure CPU) and stream (DRAM bandwidth) kernels.
  *
  * Usage: graft.KernelCal <threads> <docsPerThread> [seed]
  * Prints one JSON line with docs/sec.
  */
object KernelCal {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val perT    = args(1).toLong
    val seed    = if (args.length > 2) args(2).toLong else 42L

    // pre-generate inputs (untimed) — same generator the job scans
    val inputs: Array[Array[Document]] = Array.tabulate(threads) { t =>
      Array.tabulate(perT.toInt)(i => corpus.Corpus.input(t * perT + i, seed))
    }
    // warm-up: one pass over a slice so JIT compiles the kernel (untimed)
    inputs.head.take(math.min(2000, perT.toInt)).foreach(extract.Extract.document)

    val spans = new java.util.concurrent.atomic.AtomicLong()
    val t0    = System.nanoTime()
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        var s = 0L
        inputs(t).foreach(d => s += extract.Extract.document(d).spans.size)
        spans.addAndGet(s): Unit
      })
    }
    ts.foreach(_.start())
    ts.foreach(_.join())
    val wall = (System.nanoTime() - t0) / 1e9
    val docs = threads * perT
    println(f"""{"threads":$threads,"docs":$docs,"spans":${spans.get()},"wallSec":$wall%.3f,"docsPerSec":${docs / wall}%.1f}""")
  }
}
