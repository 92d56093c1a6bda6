package graft

/** Local-filesystem helpers shared by the streaming sinks and the scale
  * soak (r9 review: three private copies of the same recursive delete had
  * accumulated — a fix applied to one would silently miss the others). */
object Fs {
  /** Delete `f` and everything under it. Symlinks are deleted, never
    * followed (`listFiles` on a dangling link returns null, and deleting
    * the link itself is the right behavior for scratch trees). */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }
}
