package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Build-once root directory for a durable on-disk artifact keyed by an
  * identity string — the corpus-version-index model the decontamination
  * gram index and the annotation [[KeyedStore]] established: at 100 TB a
  * corpus-derived index (gram table, Bloom sketch, signature store) is
  * built ONCE per corpus version and read by every later job, not
  * recomputed per session. The root lives under the JVM temp dir keyed
  * by MD5(ident); concurrent builders race safely (each builds into its
  * own temp dir, ATOMIC_MOVEs into place, the loser deletes its build
  * and uses the winner's).
  */
object DurableIndex {

  /** The root for `ident` under `<tmp>/<family>/`, running `build` into
    * a private temp dir on first use. `build` must fully populate the
    * directory it is given; the move into place is atomic.
    */
  def once(family: String, ident: String)(build: Path => Unit): Path = {
    val hash = java.security.MessageDigest.getInstance("MD5")
      .digest(ident.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val base = Paths.get(System.getProperty("java.io.tmpdir"), family)
    Files.createDirectories(base)
    val root = base.resolve(hash)
    if (!Files.exists(root)) {
      val tmp = Files.createTempDirectory(base, s"build-$hash-")
      build(tmp)
      try { Files.move(tmp, root, StandardCopyOption.ATOMIC_MOVE); () }
      catch { case e: java.nio.file.FileSystemException
                   if Files.exists(root) || e.isInstanceOf[java.nio.file.FileAlreadyExistsException] =>
        // another builder won the race — use its index; drop ours. On
        // Linux the lost race onto a non-empty dir surfaces as
        // DirectoryNotEmptyException (a FileSystemException), not
        // FileAlreadyExistsException; catch the family, but only when
        // the winner's index is actually there.
        def del(p: Path): Unit = {
          if (Files.isDirectory(p)) {
            val s0 = Files.list(p)
            try s0.forEach(c => del(c)) finally s0.close()
          }
          Files.deleteIfExists(p); ()
        }
        del(tmp)
      }
    }
    root
  }
}
