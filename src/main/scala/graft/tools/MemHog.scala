package graft.tools

/** The reproducible memory-pressure generator behind [[ContentionHarness]]
  * and [[StageBracket]] — one definition so every contention experiment
  * applies the IDENTICAL load. Two parts (tmpfs pages are unswappable on a
  * swapless box, so they remove memory from the reclaimable pool for real):
  *
  *  - a HOLDER writes `hogGb` GiB to tmpfs once and sits on it, so
  *    MemAvailable actually drops for the whole loaded phase;
  *  - `workers` CHURNERS loop (write hogGb/4 GiB, delete), keeping
  *    allocation + page-cache reclaim + compaction continuously active in
  *    the shrunken pool — the kswapd/kcompactd/kdamond storm signature
  *    that amplified the round-9 driver bench's mining family (SURVEY
  *    §8d), reproduced on demand.
  *
  * [[stop]] kills by command-line marker (pkill -f graft_hog): the dd
  * children outlive a destroyed parent bash, so destroying the Process
  * alone leaves a writer running for minutes. A crashed run leaves at most
  * one cycle's file, bounded by `hogGb`. */
object MemHog {

  final class Handle private[MemHog] (procs: Seq[Process]) {
    def stop(): Unit = {
      procs.foreach(_.destroyForcibly())
      try {
        // the [h] bracket keeps the killer's own command line from
        // matching its own pattern (classic pgrep idiom); the rm runs in
        // a second shell so the glob text can't self-match either
        new ProcessBuilder("bash", "-c",
          "pkill -9 -f graft_[h]og || true").start().waitFor()
        new ProcessBuilder("bash", "-c",
          "rm -f /dev/shm/graft_hog_hold /dev/shm/graft_hog_[0-9]*")
          .start().waitFor()
      } catch { case _: Throwable => () }
    }
  }

  /** Start the holder + churners and block until the holder actually
    * occupies its pages (up to 120 s; a large hold takes tens of seconds
    * at memory bandwidth). */
  def start(hogGb: Int, workers: Int): Handle = {
    val churnGb = math.max(hogGb / 4, 4)
    val holder = new ProcessBuilder("bash", "-c",
      s"dd if=/dev/zero of=/dev/shm/graft_hog_hold bs=1M count=${hogGb * 1024} " +
        "2>/dev/null; sleep 100000").redirectErrorStream(true).start()
    val churners = (0 until workers).map { i =>
      new ProcessBuilder("bash", "-c",
        s"sleep ${i * 3}; while true; do " +
          s"dd if=/dev/zero of=/dev/shm/graft_hog_$i bs=1M count=${churnGb * 1024} " +
          "2>/dev/null; rm -f /dev/shm/graft_hog_" + i + "; done")
        .redirectErrorStream(true).start()
    }
    val handle = new Handle(holder +: churners)
    // the ramp wait runs AFTER the Handle exists and inside a guard: an
    // interrupt (or any throwable) during the up-to-120 s wait must not
    // orphan detached dd writers that no caller can ever stop
    try {
      val holdPath = java.nio.file.Paths.get("/dev/shm/graft_hog_hold")
      val target = hogGb.toLong * 1024 * 1024 * 1024 * 9 / 10
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline &&
          (!java.nio.file.Files.exists(holdPath) ||
            java.nio.file.Files.size(holdPath) < target))
        Thread.sleep(2000)
    } catch {
      case t: Throwable => handle.stop(); throw t
    }
    handle
  }
}
