package graft.util

/** Lock-free session-keyed memoization (one shared implementation for
  * SparkEntry's dataset caches and Classify's dictionary broadcast — the
  * idiom is concurrency-subtle enough that two hand-rolled copies
  * drifted; r4 review).
  *
  * Rules the idiom encodes:
  *  - ConcurrentHashMap mapping functions must not mutate the map and
  *    must not run long work under a bin lock, so values are built
  *    OUTSIDE the map (get → build → putIfAbsent); the loser of a
  *    putIfAbsent race releases its duplicate via `discard`.
  *  - Entries whose SparkContext has stopped are pruned on every access
  *    (the maps are process-global; a long-lived JVM cycling sessions —
  *    test suites, notebooks — would otherwise pin dead sessions and
  *    their persisted Datasets forever). A stopped session's entries in
  *    a memo that is never accessed again linger as plain references —
  *    harmless, their Spark resources died with the context.
  */
final class SessionMemo[K, V <: AnyRef](
    sessionOf: K => org.apache.spark.sql.SparkSession)(discard: V => Unit) {

  private val m = new java.util.concurrent.ConcurrentHashMap[K, V]()

  /** Drop entries whose SparkContext has stopped. */
  def prune(): Unit = m.keySet.removeIf { k =>
    try sessionOf(k).sparkContext.isStopped catch { case _: Throwable => true }
  }

  def getOrBuild(key: K)(build: => V): V = {
    prune()
    val existing = m.get(key)
    if (existing != null) existing
    else {
      val built = build
      val prev = m.putIfAbsent(key, built)
      if (prev != null) { discard(built); prev } else built
    }
  }
}
