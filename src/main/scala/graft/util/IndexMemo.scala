package graft.util

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Bounded memo for per-(session, dataset) cached index structures
  * (the shingle inverted index, the IVF cell assignment). Two leaks the
  * naive process-lifetime map has, both fixed here:
  *
  *  - entries belonging to a stopped SparkContext were retained forever
  *    (cached-plan + session references): every access purges them;
  *  - within one long-lived session, unbounded datasets ⇒ unbounded
  *    cached blocks: the map is LRU-bounded and evicted values get
  *    their cache released via `release`.
  *
  * The memo assumes the dataset under `dir` is immutable for the
  * lifetime of the entry — the contract of the parquet fixtures and of
  * an immutable-snapshot warehouse. Callers that rewrite a dataset
  * in place must call [[invalidate]] first.
  */
final class IndexMemo[V](maxEntries: Int)(release: V => Unit) {

  private case class Entry(session: SparkSession, value: V)

  private val entries = mutable.LinkedHashMap.empty[(SparkSession, String), Entry]

  def getOrElseUpdate(spark: SparkSession, dir: String)(build: => V): V = synchronized {
    purgeStopped()
    val key = (spark, dir)
    entries.remove(key) match {
      case Some(e) =>
        entries.put(key, e) // refresh LRU position
        e.value
      case None =>
        val v = build
        entries.put(key, Entry(spark, v))
        while (entries.size > maxEntries) {
          val (k, oldest) = entries.head
          entries.remove(k)
          releaseQuietly(oldest)
        }
        v
    }
  }

  /** Hit-only lookup (refreshes LRU position, never builds) — lets a
    * caller keep an expensive build OUTSIDE this memo's monitor so a
    * miss never blocks concurrent hits on other keys.
    */
  def peek(spark: SparkSession, dir: String): Option[V] = synchronized {
    purgeStopped()
    val key = (spark, dir)
    entries.remove(key).map { e => entries.put(key, e); e.value }
  }

  /** Drop (and release) the entry for a dataset whose files changed. */
  def invalidate(spark: SparkSession, dir: String): Unit = synchronized {
    entries.remove((spark, dir)).foreach(releaseQuietly)
  }

  /** Visible for tests. */
  private[graft] def size: Int = synchronized { purgeStopped(); entries.size }

  private def purgeStopped(): Unit =
    entries.filterInPlace((_, e) => !e.session.sparkContext.isStopped)

  private def releaseQuietly(e: Entry): Unit =
    if (!e.session.sparkContext.isStopped)
      try release(e.value)
      catch { case _: Exception => () } // release is best-effort cleanup
}
