package graft.operators

/** Session-memo accounting: every memoized operator family routes its
  * lookup through [[cached]], which counts WARM hits (the key was
  * already present, so the caller's wall time excludes the derivation
  * cost another consumer already paid). [[graft.Bench]] snapshots the
  * counter around each timed query and tags the ones whose number is
  * not self-contained — without the tag, per-query regression triage
  * chases ghosts (the producer's time absorbs the shared computation,
  * every later consumer reads near-zero).
  */
object MemoStats {
  private val warm = new java.util.concurrent.atomic.AtomicLong

  def warmHits: Long = warm.get()

  /** Get-or-compute that counts a warm hit when the entry already
    * exists. Concurrency contract is the caller's map's (TrieMap:
    * compute may race, first insert wins; synchronized-guarded plain
    * maps: the caller holds the lock). */
  def cached[K, V](map: scala.collection.mutable.Map[K, V], key: K)(
      compute: => V): V =
    map.get(key) match {
      case Some(v) => warm.incrementAndGet(); v
      case None => map.getOrElseUpdate(key, compute)
    }
}
