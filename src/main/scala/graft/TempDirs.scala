package graft

import java.nio.file.{Files, Path}

/** JVM-scoped temp directories with shutdown cleanup. Entries that stage
  * data (format round-trips, streaming sinks, replay checkpoints) run up to
  * 4× per Bench pass — unmanaged `Files.createTempDirectory` calls would
  * accumulate full table copies in /tmp across rounds until the box fills
  * (code review r6). All scoped dirs live under one root that a single
  * shutdown hook deletes recursively.
  */
object TempDirs {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-run-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh directory under the managed root. */
  def scoped(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  private def deleteRecursively(p: Path): Unit = {
    import java.nio.file.{FileVisitResult, SimpleFileVisitor}
    import java.nio.file.attribute.BasicFileAttributes
    try Files.walkFileTree(p, new SimpleFileVisitor[Path] {
      override def visitFile(f: Path, a: BasicFileAttributes): FileVisitResult = {
        Files.deleteIfExists(f); FileVisitResult.CONTINUE
      }
      override def postVisitDirectory(d: Path, e: java.io.IOException): FileVisitResult = {
        Files.deleteIfExists(d); FileVisitResult.CONTINUE
      }
    })
    catch { case _: java.io.IOException => () } // best-effort at JVM exit
  }
}
