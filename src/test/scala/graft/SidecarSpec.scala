package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sidecar keys must be stable for an unchanged fixture and move when
  * the fixture's data files change — the ADVICE r12 staleness fix:
  * a fixture regenerated in place must NOT serve stale persisted
  * sketch/weight/band state through a path-hash-only store key. */
class SidecarSpec extends AnyFunSuite {

  private def fixture(): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("sidecar_fix").toFile
    val sub = new java.io.File(dir, "t.parquet"); sub.mkdirs()
    val f = new java.io.File(sub, "part-0.parquet")
    java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3))
    // marker files must NOT affect the key (rewrites touch _SUCCESS
    // mtimes even when data is byte-identical... but data rewrites
    // always move data-file mtime too, which is the signal)
    java.nio.file.Files.write(new java.io.File(sub, "_SUCCESS").toPath, Array[Byte]())
    dir
  }

  test("key is deterministic for an unchanged fixture") {
    val d = fixture()
    assert(Sidecar.key(d.toString) == Sidecar.key(d.toString))
  }

  test("key moves when a data file is rewritten (mtime/length), added, or removed") {
    val d = fixture()
    val k0 = Sidecar.key(d.toString)
    val f = new java.io.File(new java.io.File(d, "t.parquet"), "part-0.parquet")
    // rewrite with different length
    java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3, 4))
    val k1 = Sidecar.key(d.toString)
    assert(k1 != k0, "regenerated data file did not change the key")
    // same length, bumped mtime
    f.setLastModified(f.lastModified() + 12345L)
    val k2 = Sidecar.key(d.toString)
    assert(k2 != k1, "mtime bump did not change the key")
    // added file
    val g = new java.io.File(new java.io.File(d, "t.parquet"), "part-1.parquet")
    java.nio.file.Files.write(g.toPath, Array[Byte](9))
    assert(Sidecar.key(d.toString) != k2, "added file did not change the key")
  }

  test("distinct fixture paths with identical contents get distinct keys") {
    val a = fixture(); val b = fixture()
    // path hash is folded in: two fixtures never share a store
    assert(Sidecar.key(a.toString) != Sidecar.key(b.toString))
  }
}
