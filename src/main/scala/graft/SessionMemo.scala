package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Session-scoped memo for expensive derived artifacts — trained IVF
  * centroids, connected-component labels, the chained stable-hash
  * frame. Build once per (live session, key); every later consumer in
  * the session reuses the artifact, which is the production layout
  * (train/build once, query many).
  *
  * Semantics the hand-rolled TrieMap idiom got wrong:
  *   - entries of STOPPED sessions are evicted on access, so a JVM
  *     cycling sessions cannot pin dead plans/persisted lineage;
  *   - builds are single-flight (coarse lock — builds are rare and
  *     expensive; two racing callers must not both run a training loop
  *     whose loser would leak persisted RDDs);
  *   - `invalidate` is the escape hatch when a key's underlying data
  *     changes mid-session (memoized artifacts are otherwise as stale
  *     as any cached plan).
  */
final class SessionMemo[V] {
  private val map = TrieMap.empty[(SparkSession, String), V]

  def getOrBuild(s: SparkSession, key: String)(build: => V): V = {
    map.keysIterator.filter(_._1.sparkContext.isStopped).foreach(map.remove)
    map.synchronized(map.getOrElseUpdate((s, key), build))
  }

  def invalidate(s: SparkSession, key: String): Unit = map.remove((s, key))
}
