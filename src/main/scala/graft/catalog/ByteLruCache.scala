package graft.catalog

/** Byte-bounded LRU memo for the driver-side per-file fold caches
  * (round-18 fix of the round-17 eviction hazard, guide §5 driver
  * memory).
  *
  * The round-17 memos capped by ENTRY COUNT (4096) with a wholesale
  * `clear()`: (a) a table whose live delta chain exceeded the cap
  * cleared the whole cache mid-fold and degraded to re-reading every
  * file on every subsequent resolution — exactly when delta pressure
  * is highest; (b) entries for compacted-away files stayed resident
  * until the wholesale clear; (c) a count bound is not a memory bound
  * (4096 parsed delta files can be many GB of driver heap at
  * production file sizes).
  *
  * This cache bounds by ESTIMATED BYTES and evicts least-recently-used
  * entries one at a time, so (a) a long chain of small files — the
  * compaction-pressure case — fits and folds with exactly one read per
  * file per JVM (FoldCacheSpec pins this via the fileOpens counter);
  * (b) entries for retired files age out instead of pinning heap, and
  * [[GraftCatalog.expireOrphanFiles]] invalidates them eagerly; (c)
  * the driver-heap hold is bounded by `maxBytes` regardless of entry
  * count or per-file size.
  *
  * Values must be immutable — they are handed out shared. `compute`
  * runs OUTSIDE the lock: fold results are pure functions of the key
  * (immutable UUID-named files), so a racing duplicate compute is
  * harmless and parquet reads never serialize behind the cache lock.
  */
private[catalog] final class ByteLruCache[K <: AnyRef, V <: AnyRef](
    maxBytes: () => Long, weigh: V => Long) {
  // accessOrder = true: iteration starts at the least-recently-USED entry
  private[this] val map =
    new java.util.LinkedHashMap[K, (V, Long)](64, 0.75f, true)
  private[this] var bytes = 0L

  def getOrCompute(k: K)(compute: => V): V = {
    val hit = synchronized {
      val e = map.get(k) // updates access order
      if (e == null) null.asInstanceOf[V] else e._1
    }
    if (hit != null) hit
    else {
      val v = compute
      val w = math.max(0L, weigh(v))
      synchronized {
        val prev = map.put(k, (v, w))
        bytes += w - (if (prev == null) 0L else prev._2)
        val budget = maxBytes() // read per insert: specs tune it live
        val it = map.entrySet().iterator()
        // never evict the entry just inserted, even when it alone
        // exceeds the budget (it is in use right now)
        while (bytes > budget && it.hasNext) {
          val e = it.next()
          if (!e.getKey.equals(k)) { bytes -= e.getValue._2; it.remove() }
        }
      }
      v
    }
  }

  /** Eager invalidation for files known to have left the live set
    * (orphan sweep / VACUUM); LRU aging covers everything else. */
  def invalidateIf(p: K => Boolean): Unit = synchronized {
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (p(e.getKey)) { bytes -= e.getValue._2; it.remove() }
    }
  }

  def currentBytes: Long = synchronized(bytes)
  def entryCount: Int = synchronized(map.size)
  def clear(): Unit = synchronized { map.clear(); bytes = 0L }
}

private[catalog] object ByteLruCache {
  /** Per-cache budget (three fold caches exist: delta parses, DV
    * vectors, eq-delete keys — worst-case driver hold 3 × this).
    * Overridable for constrained drivers / specs; read per insert so
    * a running JVM honors changes. */
  def budgetBytes(): Long =
    try sys.props.get("graft.fold.cache.bytes").map(_.toLong)
      .getOrElse(256L << 20)
    catch { case _: NumberFormatException => 256L << 20 }

  /** Rough JVM-heap weight of one cached key value (fold sets hold
    * canonical Long/Integer/String/Vector ids). */
  def idWeight(v: AnyRef): Long = v match {
    case s: String => 48L + 2L * s.length
    case vec: Vector[_] =>
      48L + vec.iterator.map(x => idWeight(x.asInstanceOf[AnyRef])).sum
    case _ => 32L // boxed Long / Integer
  }
}

/** Bounded parallel map for the driver-side per-file fold parses
  * (round-18, guide §1/§5): after a DML wave every fresh DV/delta file
  * is parsed ONCE (memo miss) on the driver — serially, that was
  * ~5-10 ms × dozens of files on q275's profile. The parses are
  * independent pure functions of immutable files, so a small fixed
  * pool folds them concurrently; callers still APPLY results in commit
  * order. Daemon threads; never more than 8 wide (driver-side metadata
  * work must not compete with executor threads for the host). */
private[catalog] object FoldPar {
  private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(
    8,
    (r: Runnable) => {
      val t = new Thread(r, "graft-fold")
      t.setDaemon(true)
      t
    })

  /** Order-preserving map; serial below 3 elements (pool handoff costs
    * more than it saves on one or two files) and when already ON a
    * fold thread (nested use must not deadlock the fixed pool). */
  def map[A, B](in: Vector[A])(f: A => B): Vector[B] =
    if (in.size < 3 ||
        Thread.currentThread().getName.startsWith("graft-fold")) in.map(f)
    else {
      import scala.jdk.CollectionConverters._
      val tasks: java.util.List[java.util.concurrent.Callable[B]] =
        in.map(a => (() => f(a)): java.util.concurrent.Callable[B]).asJava
      pool.invokeAll(tasks).asScala.map { fut =>
        try fut.get()
        catch { // keep the fold's own failure loud, not the wrapper
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }.toVector
    }
}
