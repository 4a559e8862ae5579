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
  * a new dir) to be re-read. Entries DERIVED FROM A VERSIONED STORE are
  * the exception — the store is session-mutable (incremental
  * maintenance, retraction), so those callers use [[getOrBuildIf]] with
  * a store-version validity check instead: a maintenance commit bumps
  * the version, the stale entry fails validation on its next access,
  * and the consumer rebuilds from the new head (the GDPR-serving
  * contract — a retracted vector/document must not outlive its
  * retraction in session caches).
  */
final class SessionCache[K, V] {
  private val m = new java.util.concurrent.ConcurrentHashMap[(SparkSession, K), V]

  def getOrBuild(s: SparkSession, key: K)(build: => V): V = {
    m.keySet.removeIf(_._1.sparkContext.isStopped)
    m.computeIfAbsent((s, key), _ => build)
  }

  /** [[getOrBuild]] with revalidation: a cached entry failing `valid` is
    * rebuilt in place (atomically per key, like computeIfAbsent).
    */
  def getOrBuildIf(s: SparkSession, key: K)(valid: V => Boolean)(build: => V): V = {
    m.keySet.removeIf(_._1.sparkContext.isStopped)
    m.compute((s, key), (_, cur) => if (cur != null && valid(cur)) cur else build)
  }
}
