package graft.tools

import java.nio.file.{Files, Path, Paths, FileVisitResult, SimpleFileVisitor}
import java.nio.file.attribute.BasicFileAttributes
import java.io.IOException

/** Small filesystem helpers shared by the bench mains. */
object FsUtil {

  /** Recursive delete that does NOT follow symlinks: walkFileTree visits a
    * directory symlink as a file (deleting the link, never its target's
    * contents) — a plain isDirectory-recursion would descend through it.
    * Best-effort: errors are swallowed (temp-dir cleanup must never fail
    * the campaign).
    */
  def deleteRecursively(dir: String): Unit = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return
    try Files.walkFileTree(root, new SimpleFileVisitor[Path] {
      override def visitFile(f: Path, a: BasicFileAttributes): FileVisitResult = {
        Files.deleteIfExists(f); FileVisitResult.CONTINUE
      }
      override def visitFileFailed(f: Path, e: IOException): FileVisitResult =
        FileVisitResult.CONTINUE
      override def postVisitDirectory(d: Path, e: IOException): FileVisitResult = {
        Files.deleteIfExists(d); FileVisitResult.CONTINUE
      }
    })
    catch { case _: Exception => () }
  }
}
