package graft.util

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Serializes suite-data generation across JVMs sharing one tmp dataDir.
  *
  * `sbt test` and a concurrently launched `graft.Verify` both lazily build
  * the same version-keyed parquet under java.io.tmpdir; without cross-process
  * exclusion one JVM's overwrite clobbers the other's in-flight write
  * (observed: FileNotFoundException on `_temporary/0` mid-read, which then
  * poisoned the session's view registration for the whole suite). An OS file
  * lock around [marker-check, generate, marker-create] makes exactly one
  * process generate while the rest block, then observe the completed marker
  * and just read.
  */
object GenLock {
  def withFileLock[A](path: String)(body: => A): A = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val ch = FileChannel.open(p, StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val l = ch.lock()
      try body finally l.release()
    } finally ch.close()
  }
}
