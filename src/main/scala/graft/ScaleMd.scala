package graft

/** SCALE.md section splicing shared by the measured-evidence mains: replace
  * the section starting at `header` — bounded at the NEXT "\n## " header
  * (ADVICE r11: truncating to end-of-file silently deleted later sections)
  * — or append if absent; the fresh section lands at the end. */
object ScaleMd {
  def upsert(out: String, header: String, md: String): Unit = {
    val p = java.nio.file.Paths.get(out)
    val existing =
      if (java.nio.file.Files.exists(p)) java.nio.file.Files.readString(p)
      else ""
    val i = existing.indexOf(header)
    val base = if (i >= 0) {
      val next = existing.indexOf("\n## ", i + 1)
      existing.substring(0, i) +
        (if (next >= 0) existing.substring(next) else "")
    } else existing
    java.nio.file.Files.writeString(p, base + md)
  }
}
