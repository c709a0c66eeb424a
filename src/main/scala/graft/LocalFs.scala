package graft

/** Local-filesystem helpers shared by the scratch-path management and
  * tests. Deletion is symlink-safe: the walk NEVER follows links
  * (walkFileTree's default — link resolution happens at visit time, not
  * via a separate check-then-list that a concurrent attacker could race),
  * so a planted link inside a world-writable tmpdir cannot redirect the
  * deletion at files outside it; the link itself is removed as a link.
  */
object LocalFs {

  import java.nio.file.{FileVisitResult, Files, Path, SimpleFileVisitor}
  import java.nio.file.attribute.BasicFileAttributes

  /** BEST-EFFORT: an undeletable entry (foreign file under a sticky-bit
    * /tmp, a dir left non-empty by one) is skipped, never thrown — a
    * cleanup failure must not fail the query or test that triggered it.
    */
  def deleteRecursively(f: java.io.File): Unit = {
    def quietly(p: Path): Unit =
      try { Files.deleteIfExists(p); () }
      catch { case _: java.io.IOException => () }
    if (!f.exists() && !Files.isSymbolicLink(f.toPath)) return
    try {
      Files.walkFileTree(f.toPath, new SimpleFileVisitor[Path] {
        override def visitFile(p: Path, a: BasicFileAttributes)
            : FileVisitResult = {
          quietly(p); FileVisitResult.CONTINUE
        }
        override def visitFileFailed(p: Path, e: java.io.IOException)
            : FileVisitResult = FileVisitResult.CONTINUE
        override def postVisitDirectory(p: Path, e: java.io.IOException)
            : FileVisitResult = {
          quietly(p); FileVisitResult.CONTINUE
        }
      })
      ()
    } catch { case _: java.io.IOException => () }
  }
}
