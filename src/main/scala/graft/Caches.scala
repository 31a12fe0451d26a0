package graft

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.DataFrame

/** Lifecycle registry for the engine's persisted intermediate state
  * (dedup shingle index, MinHash signatures, IVF centroids).
  *
  * Operators persist derived state so that multi-consumer plans (self-joins,
  * verify passes) don't recompute the dominant upstream work; without a
  * release path those caches pin executor memory/disk for the life of the
  * session. Every `persist` in the engine goes through [[register]], and
  * callers (or a session-level janitor) call [[releaseAll]] once results are
  * materialized. The 100 TB equivalent is checkpointing the index to parquet
  * between stages — see `DedupOps.writeShingleIndex` — where release is
  * simply deleting the directory.
  */
object Caches {
  private val entries = ListBuffer.empty[DataFrame]

  /** Track a persisted DataFrame for later release. Returns it unchanged. */
  def register(df: DataFrame): DataFrame = synchronized {
    entries += df
    df
  }

  /** Unpersist everything registered so far (non-blocking). Safe to call at
    * any point: downstream re-use after release just recomputes.
    */
  def releaseAll(): Unit = synchronized {
    entries.foreach(_.unpersist(false))
    entries.clear()
  }

  /** Number of live registered caches (for specs/monitoring). */
  def size: Int = synchronized(entries.size)

  private val memo = scala.collection.mutable.Map.empty[String, DataFrame]

  /** Session-scoped memo for expensive materialized state shared across
    * operators (e.g. the connected-components fixpoint feeding both the
    * cluster and survivor queries). The memo only serves entries that
    * are STILL PERSISTED — after [[releaseAll]] (or any unpersist) the
    * next call recomputes, so the release path stays authoritative.
    */
  def memoize(key: String)(f: => DataFrame): DataFrame = {
    // f can run eager multi-job Spark work (the CC fixpoint loops with a
    // count per round) — computing it INSIDE the lock would block every
    // register/releaseAll caller for its whole duration; check-compute-
    // install instead (a racing duplicate compute is wasted work, never
    // wrong: last install wins and both frames are identical)
    val cached = synchronized {
      memo.get(key).filter(
        _.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    }
    cached.getOrElse {
      val df = f
      synchronized { memo(key) = df }
      df
    }
  }
}
