package org.apache.datasketches.hll

/** Package-scoped accessor for the (slot, value) pairs inside a
  * serialized Datasketches HLL sketch — `BaseHllSketch.iterator()` is
  * package-private. Read-only, used to hash-oracle the cardinality
  * store's MERGE (`graft.rel.CardinalityStore`): with each per-batch
  * sketch's register pairs dumped as data, the union's register array
  * is a pure per-slot integer `max` that DuckDB can re-run exactly —
  * the estimator tail (harmonic mean + bias corrections) stays
  * spec-pinned on the Scala side.
  *
  * Mode-safe: in HLL mode `getSlot` is the register index and
  * `getValue` the register value (aux-resolved for HLL_4); in
  * LIST/SET (coupon) mode `getSlot` is the coupon key folded to
  * lgConfigK bits (datasketches-java `IntArrayPairIterator` applies
  * `key & (2^lgConfigK - 1)`) and `getValue` the coupon's rho, which
  * is independent of lgK — so per-slot max over these pairs equals
  * the register array the union would promote to. Public format, same
  * jar Spark's `hll_*` functions use (datasketches-java 6.2).
  */
object GraftHllAccess {

  /** Non-empty (slot, value) register pairs of a serialized sketch,
    * folded to `lgConfigK` bits and max-deduped, slot-ascending. */
  def registerPairs(bytes: Array[Byte]): Array[(Int, Int)] = {
    val sk = HllSketch.heapify(bytes)
    val it = sk.iterator()
    val m = new java.util.TreeMap[Integer, Integer]()
    while (it.nextValid()) {
      val slot = it.getSlot
      val v = it.getValue
      val prev = m.get(slot)
      if (prev == null || v > prev.intValue()) m.put(slot, v)
    }
    val out = new Array[(Int, Int)](m.size())
    var i = 0
    val e = m.entrySet().iterator()
    while (e.hasNext) {
      val kv = e.next()
      out(i) = (kv.getKey.intValue(), kv.getValue.intValue())
      i += 1
    }
    out
  }
}
