package graft.ext

/** Fingerprint-keyed MATERIALIZED-artifact memo — the shared machinery
  * behind every train-once on-disk index (the substring-span index,
  * r13 the incremental-ANN assignment index): an artifact is derived
  * ONCE per corpus snapshot into a temp parquet dir and served many
  * times, surviving the bench harness's persistent-RDD sweeps because
  * it is a session-agnostic file, not cached blocks.
  *
  * Contract (extracted verbatim from the r11/r12-hardened
  * Dedup.spanIndexPath):
  *
  *  - keys MUST start with `<canonical corpus dir>#` — the
  *    [[graft.Tables.onInvalidate]] hook drops every entry of a
  *    rewritten corpus by that prefix and EAGERLY deletes completed
  *    dirs (orphaned /tmp dirs accumulated multi-MB until reboot in
  *    the r11 cut). In-flight derivations are not deleted (their
  *    creator owns the dir); the shutdown hook sweeps whatever remains
  *    on normal exit; a kill -9 leaks only until /tmp clears.
  *  - the derivation (a full distributed Spark job) runs OUTSIDE any
  *    map bin lock: putIfAbsent publishes a cheap incomplete future,
  *    exactly one caller derives and completes it, everyone else
  *    awaits (r11 advice: computeIfAbsent held the bin lock for the
  *    whole multi-minute job, blocking same-bin keys).
  *  - a failed derivation removes its mapping, deletes its partial
  *    dir, and rethrows the ORIGINAL exception; EVERY caller retries
  *    (r12 advice: the first cut only retried callers arriving after
  *    the remove — concurrent waiters got a CompletionException and
  *    never retried; now waiters loop back to putIfAbsent, so one of
  *    them becomes the next deriver). The deriver itself never loops:
  *    its failure may be deterministic and spinning would hang.
  */
private[graft] final class PathMemo(tmpPrefix: String) {
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[String]]()
  /** Every dir ever created (append-only); the shutdown hook deletes
    * whatever invalidation has not already removed. */
  private val registry =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    registry.forEach(p => PathMemo.deleteRecursively(new java.io.File(p)))))
  graft.Tables.onInvalidate { c =>
    val it = memo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(c + "#")) {
        it.remove()
        val f = e.getValue
        if (f.isDone && !f.isCompletedExceptionally)
          PathMemo.deleteRecursively(new java.io.File(f.join()))
      }
    }
  }

  /** Path of the artifact for `key`, running `build(dir)` at most once
    * per (key, success). See class doc for the concurrency contract. */
  def getOrDerive(key: String)(build: String => Unit): String = {
    while (true) {
      val fresh = new java.util.concurrent.CompletableFuture[String]()
      Option(memo.putIfAbsent(key, fresh)) match {
        case None => // this caller won the put: derive, complete, publish
          val out = java.nio.file.Files
            .createTempDirectory(tmpPrefix).toString
          registry.add(out)
          try {
            build(out)
            fresh.complete(out)
            return out
          } catch { case t: Throwable =>
            fresh.completeExceptionally(t)
            memo.remove(key, fresh) // unblock retries
            PathMemo.deleteRecursively(new java.io.File(out))
            throw t
          }
        case Some(inflight) =>
          try return inflight.join()
          catch { case _: java.util.concurrent.CompletionException
                     | _: java.util.concurrent.CancellationException =>
            // the in-flight derivation failed. The deriver removes the
            // mapping AFTER completing exceptionally, so a waiter can
            // unblock before that remove lands — remove it here too
            // (value-guarded: cannot evict a newer future) and loop
            // back to putIfAbsent to retry.
            memo.remove(key, inflight)
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

private[graft] object PathMemo {
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
