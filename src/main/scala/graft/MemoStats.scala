package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLongArray

/** Hit/miss counters for every session-scoped memo in the library (the
  * shingle pair table, BPE/unigram vocabularies, IVF centroids, PQ
  * codebooks, the inverted-index probe, the zone-map manifest).
  *
  * Why: the round-9 bench showed a 0.4–0.8 s drift concentrated in the
  * pair-memo consumer family with NO code change — diagnosed as host
  * contention, but only by argument. With these counters in the bench
  * artifact, a future drift self-diagnoses: unchanged hit counts ⇒
  * contention; a miss where a hit belongs ⇒ the memo stopped carrying
  * its family and every consumer is re-mining (the real regression this
  * would catch at 100 TB, where "re-mine the pair graph per query" is
  * the difference between one shuffle and seven).
  *
  * Counters are process-global and monotone; Bench emits one snapshot
  * into target/bench.json. The overhead is one ConcurrentHashMap lookup
  * per memoized TRAINING lookup — never on the per-row path.
  */
object MemoStats {

  private val counters = new ConcurrentHashMap[String, AtomicLongArray]()

  /** Record one lookup against the named memo. */
  def record(name: String, hit: Boolean): Unit = {
    val c = counters.computeIfAbsent(name, _ => new AtomicLongArray(2))
    c.incrementAndGet(if (hit) 0 else 1)
    ()
  }

  /** Every memo map that ever passed through [[memoized]], so context
    * teardown can drop all entries at once (see [[hookEviction]]). */
  private val maps = ConcurrentHashMap.newKeySet[
    scala.collection.concurrent.TrieMap[_, _]]()
  private val hookedApps = ConcurrentHashMap.newKeySet[String]()

  /** Session-UUID memo keys are never re-hit by a later session, so a
    * stopped session's entries are pure leak — and for DATAFRAME-valued
    * memos (the pair table, the Kneser-Ney score table) each leaked
    * entry pins its localCheckpoint's RDD blocks for process lifetime
    * (ADVICE r10). In classic (non-Connect) Spark a session cannot stop
    * without stopping its SparkContext — SparkSession.stop IS
    * sparkContext.stop — so the context's ApplicationEnd event is the
    * session-end hook: clear every registered memo map, releasing the
    * DataFrame references (their blocks die with the context; the map
    * clear releases the driver-side plans for GC). One listener per
    * application, registered lazily on the first memo use. */
  private def hookEviction(): Unit =
    for {
      s <- org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      sc = s.sparkContext
      if hookedApps.add(sc.applicationId)
    } sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onApplicationEnd(
          e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
        maps.forEach(m => m.clear())
        hookedApps.clear()
      }
    })

  /** Register a map that is NOT populated through [[memoized]] for the
    * same ApplicationEnd eviction — e.g. EventStreams.lastPlans, whose
    * SparkPlan values pin broadcast relations (the cluster gate's
    * doc-array broadcast) for as long as they stay reachable. Idempotent
    * and cheap (a set add + a hooked-app check), so callers may invoke
    * it on every write. */
  def registerForEviction(
      m: scala.collection.concurrent.TrieMap[_, _]): Unit = {
    maps.add(m)
    hookEviction()
  }

  /** Instrumented TrieMap.getOrElseUpdate — the one-liner every memo
    * site wraps. `contains` then `getOrElseUpdate` can double-count a
    * miss under a race, which is fine for a diagnostic counter (the
    * TrieMap still computes `v` once per key at most twice, exactly as
    * un-instrumented getOrElseUpdate would under the same race). */
  def memoized[K, V](name: String,
      m: scala.collection.concurrent.TrieMap[K, V], k: K)(v: => V): V = {
    record(name, m.contains(k))
    maps.add(m)
    hookEviction()
    m.getOrElseUpdate(k, v)
  }

  /** Snapshot as a JSON object, names sorted. */
  def json(): String = {
    import scala.jdk.CollectionConverters._
    counters.asScala.toSeq.sortBy(_._1).map { case (n, c) =>
      s""""$n":{"hits":${c.get(0)},"misses":${c.get(1)}}"""
    }.mkString("{", ",", "}")
  }
}
