package graft

/** Content-coupled keys for persisted sidecar/index stores.
  *
  * Every engine-built artifact that outlives one query run (IVF/PQ/SQ
  * stores, LSH bands, KLL sketch state, classifier weights, …) lives
  * under `java.io.tmpdir/graft_<tag>_v<N>_<key>`. Through r12 the key
  * was `Integer.toHexString(sfDir.hashCode)` — a PATH hash, so a
  * fixture regenerated IN PLACE silently served stale sketch/weight/
  * band state to both engines (ADVICE r12: the oracle gate still
  * "passes" because both sides read the stale sidecar). The key now
  * folds a fingerprint of the fixture's actual files — (relative
  * path, length, mtime) of every data file, one driver-side directory
  * listing — so regenerating a fixture at the same path changes the
  * key and every dependent store rebuilds.
  *
  * mtime+length is the parquet-catalog staleness contract (the same
  * signal Spark's own FileIndex uses for cache invalidation): cheap,
  * and a regeneration that rewrites identical bytes bit-for-bit with
  * a preserved mtime is indistinguishable from no change — which is
  * exactly the case where stale ≡ fresh. */
object Sidecar {

  /** Store key for the fixture rooted at `d`: path hash ⊕ content
    * fingerprint, hex-encoded. Deterministic within a fixture
    * generation; changes whenever any data file is added, removed,
    * resized, or re-written. */
  def key(d: String): String = {
    val root = new java.io.File(d)
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.iterator.flatMap(walk)).getOrElse(Iterator.empty)
      else Iterator.single(f)
    var fp = 0L
    walk(root)
      .filter { f =>
        val n = f.getName
        !n.startsWith(".") && !n.startsWith("_") // skip markers/CRCs
      }
      .map(f => (f.getPath.stripPrefix(root.getPath), f.length, f.lastModified))
      .toArray.sortBy(_._1)
      .foreach { case (p, len, mt) =>
        fp = fp * 1000003L + p.hashCode
        fp = fp * 1000003L + len
        fp = fp * 1000003L + mt
      }
    java.lang.Long.toHexString((d.hashCode.toLong << 32) ^ fp)
  }
}
