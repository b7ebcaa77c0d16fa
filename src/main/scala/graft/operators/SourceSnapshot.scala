package graft.operators

import scala.util.hashing.MurmurHash3

/** Order-insensitive 64-bit fingerprint of a plan's input part-file set.
  *
  * Used as the generation component of the memoized-persist cache keys in
  * [[Components]] and [[Sampling]]: file-source plans canonicalize by root
  * path, so the plan alone cannot distinguish a directory overwrite; the
  * part-file names can (Spark writers emit fresh random names per write).
  *
  * A sum (not a sort) keeps this O(files) with no ordering assumption — a
  * 100 TB relation can span 10^5+ part files and the snapshot runs on
  * every compose. Each file contributes a 64-bit MurmurHash3 double-hash
  * rather than `String.hashCode` (32-bit, weak avalanche): with the full
  * 64 bits kept in the key, distinct part-file sets colliding — which
  * would silently serve a stale persisted corpus, the exact bug class the
  * key exists to prevent — needs a birthday collision over 2^64, not 2^32.
  */
private[graft] object SourceSnapshot {
  def of(files: Array[String]): Long = {
    var snap = 0L
    var i = 0
    while (i < files.length) {
      val lo = MurmurHash3.stringHash(files(i))
      val hi = MurmurHash3.stringHash(files(i), lo)
      snap += (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
      i += 1
    }
    snap
  }
}
