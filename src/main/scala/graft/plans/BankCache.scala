package graft.plans

/** Bounded keep-alive cache for the broadcast banks ([[DistBank]],
  * [[CentroidBank]], [[SignBank]]): same key → same `Broadcast`, so a
  * plan rebuilt over an unchanged matrix reuses the executor-resident
  * copy instead of re-registering a new broadcast.
  *
  * Bounded LRU (access order), NOT an unbounded map: Lloyd produces a
  * NEW centroid matrix every iteration, so a long-lived session running
  * many clusterings would otherwise pin every generation's broadcast for
  * the SparkContext lifetime. Eviction just drops this cache's strong
  * reference — Spark's `ContextCleaner` destroys a broadcast's blocks
  * (driver and executors) once the `Broadcast` object is unreachable,
  * and any still-unexecuted plan that references the bank keeps it
  * reachable, so eviction can never yank a broadcast out from under a
  * live plan the way an eager `destroy()` could.
  */
final class BankCache[K <: AnyRef, V <: AnyRef](maxEntries: Int) {

  private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > maxEntries
  }

  def getOrCreate(key: K)(create: => V): V = map.synchronized {
    val hit = map.get(key)
    if (hit != null) hit
    else {
      val v = create
      map.put(key, v)
      v
    }
  }

  /** Drop entries whose key matches (stopped contexts). */
  def evictWhere(p: K => Boolean): Unit = map.synchronized {
    map.keySet.removeIf(k => p(k))
  }

  private[graft] def size: Int = map.synchronized(map.size())
}
