package graft

import java.io.File
import java.nio.channels.FileChannel
import java.nio.file.{Files, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap

/** Cross-process build-once guard for the self-building fixtures under
  * `target/qscratch/` (bucketed tables, stream splits, media files, the
  * soak corpus). The historical shape — `if (!marker.exists()) { build;
  * touch(marker) }` — is correct warm but RACES cold: two JVMs (Bench ∥
  * Verify on a fresh checkout) both see no marker and write the same
  * directory concurrently, and one reads the other's half-written files.
  *
  * Two layers, both required:
  *  - an intra-JVM monitor per canonical path (`FileChannel.lock` throws
  *    `OverlappingFileLockException` if the SAME JVM re-enters, so threads
  *    must serialize before touching the file lock);
  *  - an OS advisory file lock serializing across JVMs, with the marker
  *    re-checked after acquisition (double-checked: the loser of the race
  *    finds the winner's marker and skips the build).
  *
  * The lock file is a SIBLING (`<dir>.lock`), never inside `dir`: builders
  * that overwrite the directory (`saveAsTable(Overwrite)` deletes it
  * wholesale) would delete an in-dir lock file's inode MID-BUILD, and the
  * next JVM's open(CREATE) would lock a fresh inode with no conflict —
  * mutual exclusion silently gone (observed: a cold concurrent pair
  * double-built a bucketed table into one directory). A sibling survives
  * any rewrite of the directory it guards.
  */
object BuildOnce {
  private val inJvm = new ConcurrentHashMap[String, Object]()

  /** Serialize `body` on `dir` against other threads AND other JVMs.
    * For builders with their own staleness logic (fingerprint markers):
    * the caller re-checks its condition inside `body`. */
  def locked[T](dir: File)(body: => T): T = {
    val parent = dir.getAbsoluteFile.getParentFile
    parent.mkdirs()
    val lockFile = new File(parent, dir.getName + ".lock")
    val mon = inJvm.computeIfAbsent(lockFile.getCanonicalPath, _ => new Object)
    mon.synchronized {
      val ch = FileChannel.open(lockFile.toPath,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lk = ch.lock()
        try { dir.mkdirs(); body } finally lk.release()
      } finally ch.close()
    }
  }

  /** Run `build` at most once per `dir` across threads and JVMs: fast-path
    * on the `marker` sentinel, lock, re-check, build, touch the marker. */
  def apply(dir: File, marker: String = "_done")(build: => Unit): Unit = {
    val done = new File(dir, marker)
    if (done.exists()) return
    locked(dir) {
      if (!done.exists()) {
        build
        Files.write(done.toPath, Array.emptyByteArray)
      }
    }
  }
}
