package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for driver-side artifacts (resolved drift label
  * expressions, Avro header scans): one value per (live session, key),
  * recomputed whenever the caller-supplied `sig` changes.
  *
  * Weak-keyed on the session itself — NOT identityHashCode (a hash
  * collision between a GC'd and a new session could serve stale
  * values) and NOT a string key (which would pin entries for the
  * process lifetime); a dead session's entries are collected with it.
  * Keying the inner map by a STABLE name (a directory path, a fixture
  * id) with the volatile state in `sig` keeps the map bounded at one
  * entry per key — a monitoring session re-reading a growing directory
  * every cycle replaces its entry instead of accumulating one per
  * observed file-list. Computes are per-key atomic (ConcurrentHashMap
  * compute): concurrent callers of the same (session, key) never run
  * the thunk twice for one sig, so a racing duplicate can neither
  * double-persist nor see its value released under it. The thunk must
  * not re-enter the cache for the same key (per-key lock).
  */
final class SessionCache[V] {
  private val m = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, (String, V)]]())

  /** `onReplace` runs on a superseded value when a changed `sig` evicts
    * it — the release hook for values holding external resources (a
    * persisted Dataset must be unpersisted, or the old cache entry
    * leaks executor memory for the session's lifetime). Not called for
    * entries dropped by session GC: the session's block manager died
    * with it, so there is nothing left to release. */
  def getOrCompute(s: SparkSession, key: String, sig: String = "",
                   onReplace: V => Unit = (_: V) => ())(compute: => V): V = {
    val per = m.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap[String, (String, V)]())
    val cur = per.get(key)
    if (cur != null && cur._1 == sig) cur._2
    else {
      // per-key atomic refresh: a thread that loses the race finds the
      // winner's same-sig entry inside compute() and keeps it — the old
      // get-then-put here let a duplicate compute fire onReplace on a
      // value the other thread had just been handed
      var replaced: Option[V] = None
      val entry = per.compute(key, (_, prev) =>
        if (prev != null && prev._1 == sig) prev
        else {
          val v = compute
          if (prev != null &&
              !prev._2.asInstanceOf[AnyRef].eq(v.asInstanceOf[AnyRef]))
            replaced = Some(prev._2)
          (sig, v)
        })
      // release outside the bin lock: unpersist can block on executors
      replaced.foreach(onReplace)
      entry._2
    }
  }
}
