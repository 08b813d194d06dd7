package graft

/** Ephemeral scratch space for streaming checkpoints, delta-log state,
  * and staged inputs. These are BY DEFINITION transient (each query
  * creates, drains, and deletes its own), and their cost profile is
  * dominated by many tiny file operations — offset logs, state-store
  * commits, parquet footers — so they belong on the fastest local
  * medium available: tmpfs (/dev/shm) when present, else the JVM temp
  * dir. This mirrors production practice (checkpoint volumes on local
  * NVMe/memory-backed storage, never the data lake) and changes no
  * semantics: every byte written here is re-derivable from the inputs. */
object Scratch {

  private val base: Option[java.nio.file.Path] = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm))
      Some(shm)
    else None
  }

  /** A fresh scratch directory; caller owns deletion. */
  def dir(prefix: String): String = base match {
    case Some(b) => java.nio.file.Files.createTempDirectory(b, prefix).toString
    case None => java.nio.file.Files.createTempDirectory(prefix).toString
  }
}
