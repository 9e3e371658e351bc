package graft.sources

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Content identity of a dataset directory (or single file): the sorted
  * list of contained regular files' (relative path, size, mtime),
  * digested to one hex string.
  *
  * Durable on-disk artifacts that are keyed by their input's identity —
  * the [[KeyedStore]] behind `j5_live_annotate` and the decontamination
  * gram index ([[graft.queries.TextQueries]]) — previously used the
  * DIRECTORY's own size+mtime as that key. Directory metadata is a weak
  * content proxy: an in-place rewrite that reuses the same file names
  * may change neither, silently reusing a stale artifact across data
  * regenerations. Hashing the contained files' names+sizes+mtimes makes
  * any part-file addition, removal, or rewrite a new identity, while
  * still never reading data bytes (O(#files) metadata stats, not O(TB)).
  */
object ContentIdent {

  def of(p: Path): String = {
    val entries: Seq[String] =
      if (Files.isDirectory(p)) {
        val s = Files.walk(p)
        try s.iterator().asScala
          .filter(f => Files.isRegularFile(f))
          .map(f => s"${p.relativize(f)}:${Files.size(f)}:" +
            s"${Files.getLastModifiedTime(f).toMillis}")
          .toSeq.sorted
        finally s.close()
      } else {
        Seq(s"${p.getFileName}:${Files.size(p)}:" +
          s"${Files.getLastModifiedTime(p).toMillis}")
      }
    val md = java.security.MessageDigest.getInstance("MD5")
    entries.foreach(e => md.update((e + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }
}
