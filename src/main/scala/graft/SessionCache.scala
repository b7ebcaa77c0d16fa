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
  * observed file-list. Concurrent first computes may race; the compute
  * must be idempotent (last write wins).
  */
final class SessionCache[V] {
  private val m = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, (String, V)]]())

  def getOrCompute(s: SparkSession, key: String, sig: String = "")(compute: => V): V = {
    val per = m.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap[String, (String, V)]())
    val cur = per.get(key)
    if (cur != null && cur._1 == sig) cur._2
    else {
      val v = compute
      per.put(key, (sig, v))
      v
    }
  }
}
