package graft

import org.apache.spark.sql.SparkSession

/** Session-keyed materialization cache backing the engine's shared
  * artifacts (synth snapshot, shingle table, vector indexes, co-purchase
  * edges): built once per (session, key), shared by every consumer query.
  *
  * Entries of a STOPPED session are purged on the next access to any
  * cache — a stopped session's frames (localCheckpoint blocks) are
  * unusable, and retaining them would pin the session and its blocks for
  * the JVM lifetime (multi-session harnesses: Verify then Bench in one
  * JVM, or suites that cycle sessions).
  *
  * Contract: the contents under a cached key's `dir` are assumed
  * IMMUTABLE for the session's lifetime (testdata and production
  * snapshot dirs are write-once); a mutated dir needs a new session (or
  * a new dir) to be re-read.
  */
final class SessionCache[K, V] {
  private val m = new java.util.concurrent.ConcurrentHashMap[(SparkSession, K), V]

  def getOrBuild(s: SparkSession, key: K)(build: => V): V = {
    m.keySet.removeIf(_._1.sparkContext.isStopped)
    m.computeIfAbsent((s, key), _ => build)
  }
}
