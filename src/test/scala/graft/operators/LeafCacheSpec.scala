package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Ported one-for-one from the reference's own leaf-cache tests
  * (leaf_cache.rs:199-364): key isolation by split and by request, and the
  * merged-time-range hit/miss matrix. */
class LeafCacheSpec extends AnyFunSuite {

  private val r = "result".getBytes

  test("no-timestamp splits: keyed by (split, request)") {
    // test_leaf_search_cache_no_timestamp
    val c = new LeafSearchCache(64_000_000L)
    def get(split: String, q: String) = c.get(split, None, None, q, None, None)
    assert(get("split_1", "test").isEmpty)
    c.put("split_1", None, None, "test", None, None, r)
    assert(get("split_1", "test").map(_.toSeq).contains(r.toSeq))
    assert(get("split_2", "test").isEmpty)  // other split
    assert(get("split_1", "test2").isEmpty) // other request
  }

  test("merged time range: requests covering a split normalize to one key") {
    // test_leaf_search_cache_timestamp: split_1 [100..=199], split_2/3
    // [150..=249]; q1 [100,250), q1bis [150,300), q2 unbounded, q2bis [50,200)
    val c = new LeafSearchCache(64_000_000L)
    val s1 = (Some(100L), Some(199L)); val s23 = (Some(150L), Some(249L))
    def put(sp: String, sr: (Option[Long], Option[Long]), q: String,
            w: (Option[Long], Option[Long])): Unit =
      c.put(sp, sr._1, sr._2, q, w._1, w._2, r)
    def hit(sp: String, sr: (Option[Long], Option[Long]), q: String,
            w: (Option[Long], Option[Long])): Boolean =
      c.get(sp, sr._1, sr._2, q, w._1, w._2).isDefined
    val q1 = (Some(100L), Some(250L)); val q1bis = (Some(150L), Some(300L))
    val q2 = (None: Option[Long], None: Option[Long]); val q2bis = (Some(50L), Some(200L))

    // split_1: q1 and q1bis merge to DIFFERENT subranges → miss
    put("split_1", s1, "test", q1)
    assert(hit("split_1", s1, "test", q1))
    assert(!hit("split_1", s1, "test", q1bis))

    // split_2: both windows fully cover it → same merged range → hit
    put("split_2", s23, "test", q1)
    assert(hit("split_2", s23, "test", q1))
    assert(hit("split_2", s23, "test", q1bis))

    // split_1: q2 and q2bis both cover it fully → hit
    put("split_1", s1, "test2", q2)
    assert(hit("split_1", s1, "test2", q2))
    assert(hit("split_1", s1, "test2", q2bis))

    // split_2: q2bis only covers a subrange → miss
    put("split_2", s23, "test2", q2)
    assert(hit("split_2", s23, "test2", q2))
    assert(!hit("split_2", s23, "test2", q2bis))

    // split_3: cached under the bounded window, probed with the unbounded
    put("split_3", s23, "test2", q2bis)
    assert(!hit("split_3", s23, "test2", q2))
    assert(hit("split_3", s23, "test2", q2bis))
  }

  test("byte-budget LRU eviction (MemorySizedCache analog)") {
    val c = new LeafSearchCache(25L) // fits two 10-byte entries
    val v = Array.fill[Byte](10)(1)
    c.put("s1", None, None, "a", None, None, v)
    c.put("s1", None, None, "b", None, None, v)
    assert(c.numEntries === 2 && c.sizeBytes === 20L)
    // touch "a" so "b" is the LRU victim
    assert(c.get("s1", None, None, "a", None, None).isDefined)
    c.put("s1", None, None, "c", None, None, v)
    assert(c.numEntries === 2)
    assert(c.get("s1", None, None, "a", None, None).isDefined)
    assert(c.get("s1", None, None, "b", None, None).isEmpty)
    // re-putting the same key replaces, not double-counts
    c.put("s1", None, None, "c", None, None, Array.fill[Byte](5)(2))
    assert(c.sizeBytes === 15L)
  }

  test("entries are immutable: caller mutation of put/get buffers never corrupts") {
    val c = new LeafSearchCache(100L)
    val v = Array[Byte](1, 2, 3)
    c.put("s1", None, None, "a", None, None, v)
    v(0) = 99 // mutate AFTER put
    val got = c.get("s1", None, None, "a", None, None).get
    assert(got.toSeq === Seq[Byte](1, 2, 3))
    got(1) = 42 // mutate the returned buffer
    assert(c.get("s1", None, None, "a", None, None).get.toSeq === Seq[Byte](1, 2, 3))
  }
}
