package graft

/** Overlap INDEPENDENT eager subchains of a composition entry (optimization
  * guide §2.6 "overlap independent jobs"): DataFrame *builds* in this
  * codebase can run eager jobs (localCheckpoint snaps, metadata collects,
  * the ts02 union-find's edge collect), which serialize on the entry's
  * build thread even though Spark would happily back-fill executor slack
  * with the other subchain's tasks. Each extra thunk runs on its own thread;
  * the default FIFO scheduler gives the earlier job the resources and later
  * jobs the remainder — exactly the back-fill the guide describes. Results
  * are the identical DataFrames the sequential builds produce; only wall
  * time changes.
  *
  * Used ONLY where the subchains are provably independent (no shared
  * mutable session conf, separate source tables or independent derivations)
  * — the composition entries dd11 (three detectors), sp02 (cluster map ∥
  * contamination verdicts), pp03 (cluster map ∥ the redact→select chain),
  * dd13 (exact-truth edge build ∥ minhash signature build).
  */
object Concurrently {
  private def unwrap[T](f: java.util.concurrent.CompletableFuture[T]): T =
    try f.join()
    catch {
      // keep original exception types visible to callers (Bench's
      // exact-baseline skip matches on IllegalArgumentException content)
      case e: java.util.concurrent.CompletionException if e.getCause != null =>
        throw e.getCause
    }

  /** Run `a` on a pool thread while `b` runs on the caller's. */
  def apply[A, B](a: => A, b: => B): (A, B) = {
    val fa = java.util.concurrent.CompletableFuture.supplyAsync(() => a)
    val rb = b
    (unwrap(fa), rb)
  }

  /** Run `a` and `b` on pool threads while `c` runs on the caller's. */
  def apply[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val fa = java.util.concurrent.CompletableFuture.supplyAsync(() => a)
    val fb = java.util.concurrent.CompletableFuture.supplyAsync(() => b)
    val rc = c
    (unwrap(fa), unwrap(fb), rc)
  }
}
