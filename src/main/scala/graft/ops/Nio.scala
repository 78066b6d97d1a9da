package graft.ops

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Closed-stream NIO directory listings. `Files.list`/`Files.walk` return
  * lazy streams backed by an open directory fd that is released only on
  * `close()` — dropping the stream leaks the fd until GC, and this repo
  * has already hit the 'Too many open files' failure mode (q196). Every
  * driver-side listing goes through these strict, stream-closing forms
  * (ADVICE r14: Retention/LayoutCache/Compaction all shared the leak).
  */
object Nio {

  /** Strict one-level listing of `dir`, stream closed before return. */
  def list(dir: Path): List[Path] = {
    val st = Files.list(dir)
    try st.iterator.asScala.toList finally st.close()
  }

  /** Strict recursive walk of `root` (root first), stream closed before
    * return.
    */
  def walk(root: Path): List[Path] = {
    val st = Files.walk(root)
    try st.iterator.asScala.toList finally st.close()
  }

  /** Delete `p` and everything under it (children before parents). */
  def deleteTree(p: Path): Unit =
    if (Files.exists(p)) walk(p).reverse.foreach(Files.deleteIfExists(_))
}
