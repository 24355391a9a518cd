package graft.sources

import java.nio.file._

/** Atomic, idempotent materialization of derived layout/fixture directories
  * under target/ (text fixtures, the streaming landing dir, bucketed-table
  * data, the IVF index).
  *
  * Why not check-then-write-in-place: every ensure* used to test for a
  * completion marker and, if absent, write straight into the target path
  * with mode("overwrite"). Two JVMs sharing target/ — a Bench and a Verify
  * run — can interleave that check and write, one deleting files the other
  * is mid-read (round-7 verdict #7). Here writers stage into a unique temp
  * sibling and publish with an atomic rename: a reader only ever observes a
  * complete directory, and a writer that loses the publish race discards
  * its own temp copy. All staged content is a deterministic function of the
  * fixture data, so "someone else's copy" is bit-identical to ours.
  */
object Staging {

  /** Ensure `dir` holds a complete staged copy, building it with `write`
    * (invoked with a TEMP path to populate) if absent. `marker` is a
    * dir-relative path whose existence certifies completeness — the atomic
    * rename only publishes finished directories, but a partial dir written
    * in place by a pre-protocol run that died mid-write could linger, so
    * existence of the dir alone is not trusted. Returns `dir`. */
  def ensureDir(dir: String, marker: String = "_SUCCESS")(
      write: String => Unit): String = {
    val target = Paths.get(dir).toAbsolutePath
    if (!Files.exists(target.resolve(marker))) {
      // pre-protocol partial dir (exists, no marker): clear it so the
      // rename can land. Under this protocol nobody writes into `target`
      // directly, so this can only be stale garbage; tolerate a concurrent
      // ensure deleting the same garbage first.
      if (Files.exists(target)) deleteRecursively(target)
      Files.createDirectories(target.getParent)
      val tmp = Files.createTempDirectory(
        target.getParent, target.getFileName.toString + ".tmp-")
      try {
        write(tmp.toString)
        try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
        catch {
          // lost the publish race — a complete copy is already in place
          case _: FileAlreadyExistsException | _: DirectoryNotEmptyException =>
            deleteRecursively(tmp)
          case _: FileSystemException if Files.exists(target) =>
            deleteRecursively(tmp)
        }
      } catch {
        case e: Throwable => deleteRecursively(tmp); throw e
      }
    }
    dir
  }

  private[graft] def deleteRecursively(p: Path): Unit = {
    import scala.util.control.NonFatal
    try {
      if (Files.isDirectory(p, LinkOption.NOFOLLOW_LINKS)) {
        val entries = Files.list(p)
        try entries.forEach(deleteRecursively(_))
        finally entries.close()
      }
      Files.deleteIfExists(p)
    } catch { case NonFatal(_) => () } // concurrent delete won; nothing owed
  }
}
