package graft.operators

/** Per-split partial-result cache — `LeafSearchCache`
  * (quickwit-search/src/leaf_cache.rs:28-115): memoizes a leaf (split)
  * search result under the key (split_id, request-without-time-bounds,
  * MERGED time range), where the merged range is the intersection of the
  * request's [start, end) window with the split's INCLUSIVE
  * [ts_start, ts_end] range widened to half-open (leaf_cache.rs:96-114,
  * 126-149). The merge is what makes the cache effective: two requests
  * with different windows that both fully cover a split normalize to the
  * SAME key for that split, so a sliding dashboard window keeps hitting
  * for every split except the two edge ones.
  *
  * Entries are opaque bytes (the reference stores the protobuf-encoded
  * LeafSearchResponse); eviction is a byte-budget LRU — the
  * MemorySizedCache analog. In the Spark build a "leaf" is a split file
  * group (e.g. one `TranscriptTable.topKByTs` leaf job), and the cache
  * fronts per-split jobs on the driver the way the reference fronts
  * `leaf_search_single_split`. */
final class LeafSearchCache(capacityBytes: Long) {
  import LeafSearchCache._

  private final case class Key(splitId: String, requestFp: String, merged: TimeRange)

  private val entries = new java.util.LinkedHashMap[Key, Array[Byte]](16, 0.75f, true)
  private var usedBytes = 0L
  private var hitCount = 0L
  private var missCount = 0L

  private def key(splitId: String, splitTsStart: Option[Long], splitTsEnd: Option[Long],
                  requestFp: String, reqStart: Option[Long], reqEnd: Option[Long]): Key = {
    // split range is INCLUSIVE both ends → end+1 half-open (an inclusive
    // i64::MAX end is boundless, leaf_cache.rs:143-145); request end is
    // already exclusive (leaf_cache.rs:96-99 via time_range())
    val splitEndHalfOpen = splitTsEnd match {
      case Some(e) if e == Long.MaxValue => None
      case Some(e)                       => Some(e + 1)
      case None                          => None
    }
    val splitRange = TimeRange(splitTsStart.getOrElse(Long.MinValue), splitEndHalfOpen)
    val reqRange = TimeRange(reqStart.getOrElse(Long.MinValue), reqEnd)
    Key(splitId, requestFp, reqRange.intersect(splitRange))
  }

  def get(splitId: String, splitTsStart: Option[Long], splitTsEnd: Option[Long],
          requestFp: String, reqStart: Option[Long], reqEnd: Option[Long]): Option[Array[Byte]] =
    synchronized {
      // defensive copy: entries must stay immutable even if a caller mutates
      // the returned buffer (entries are small — bounded by the byte budget)
      val got =
        Option(entries.get(key(splitId, splitTsStart, splitTsEnd, requestFp, reqStart, reqEnd)))
          .map(_.clone())
      if (got.isDefined) hitCount += 1 else missCount += 1
      got
    }

  def put(splitId: String, splitTsStart: Option[Long], splitTsEnd: Option[Long],
          requestFp: String, reqStart: Option[Long], reqEnd: Option[Long],
          value: Array[Byte]): Unit = synchronized {
    val k = key(splitId, splitTsStart, splitTsEnd, requestFp, reqStart, reqEnd)
    val prev = entries.put(k, value.clone()) // own the bytes — see get()
    usedBytes += value.length - (if (prev == null) 0 else prev.length)
    // LRU eviction to the byte budget (MemorySizedCache analog)
    val it = entries.entrySet().iterator()
    while (usedBytes > capacityBytes && it.hasNext) {
      val e = it.next()
      usedBytes -= e.getValue.length
      it.remove()
    }
  }

  def sizeBytes: Long = synchronized(usedBytes)
  def numEntries: Int = synchronized(entries.size())
  def hits: Long = synchronized(hitCount)
  def misses: Long = synchronized(missCount)
}

object LeafSearchCache {

  /** Half-open [start, end) range; end None = unbounded
    * (leaf_cache.rs:117-180). Empty ranges normalize to 0..0 so every
    * provably-empty intersection shares one key. */
  final case class TimeRange(start: Long, end: Option[Long]) {
    def normalize: TimeRange = end match {
      case Some(e) if start >= e => TimeRange(0L, Some(0L))
      case _                     => this
    }
    def intersect(other: TimeRange): TimeRange = {
      val s = math.max(start, other.start)
      val e = (end, other.end) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case (Some(a), None)    => Some(a)
        case (None, b)          => b
      }
      TimeRange(s, e).normalize
    }
  }
}
