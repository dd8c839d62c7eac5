package graft.ops

/** Registry of the library's frozen per-corpus artifacts — trained ANN
  * models (IVF centroids, PQ codebooks), sketch/census bytes (CMS, eval
  * bloom, fluency census), the materialized dup-cluster manifest, and the
  * scan-widen decisions.
  *
  * All of these key on the corpus PATH, not its content — the same
  * contract as Spark's own catalog/file-index caches (cleared via
  * `spark.catalog.refreshByPath`). A caller that regenerates or swaps the
  * data under a previously-read path within one JVM MUST call [[clearAll]]
  * or the frozen artifacts keep describing the old data. Fresh JVMs (the
  * driver's per-round Verify/Bench runs) start empty and need nothing.
  *
  * Each hosting object registers its clear hook at class-init; hooks also
  * best-effort delete any temp-dir artifacts they own (the dup-cluster
  * manifest parquet), so [[clearAll]] doubles as cleanup for long-lived
  * sessions. */
object FrozenCaches {
  private val hooks = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  def register(hook: () => Unit): Unit = hooks.add(hook)

  def clearAll(): Unit = hooks.forEach(h => h())

  /** A path-keyed artifact memo that self-registers with [[clearAll]] —
    * the one shape every frozen model/sketch/census/manifest cache shares.
    * `beforeClear` runs over the cached values before they are dropped
    * (for artifacts that own on-disk state, e.g. the dup-cluster
    * manifest's temp dirs). */
  final class Memo[K, V](beforeClear: java.util.Collection[V] => Unit = null) {
    private val m = new java.util.concurrent.ConcurrentHashMap[K, V]()
    register { () =>
      if (beforeClear != null) beforeClear(m.values)
      m.clear()
    }
    def get(k: K)(build: => V): V = m.computeIfAbsent(k, _ => build)
  }

  /** Recursive best-effort delete for temp artifacts; never throws. */
  def deleteTree(path: String): Unit =
    try {
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(p)) {
        val walk = java.nio.file.Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walk.close()
      }
    } catch { case _: Throwable => () }
}
