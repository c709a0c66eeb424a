package graft

/** Local-filesystem helpers shared by the scratch-path management and
  * tests. Deletion is symlink-safe: a symbolic link is removed as a LINK
  * (never traversed), so a planted link inside a world-writable tmpdir
  * cannot redirect the recursion at files outside it.
  */
object LocalFs {

  def deleteRecursively(f: java.io.File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath)) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteRecursively)
    }
    f.delete()
    ()
  }
}
