package graft.util

import java.nio.file.{Files, Path}

/** Tiny NIO helpers for the streaming working dirs.
  *
  * `Files.list` returns a Stream backed by an open directory descriptor;
  * dropping it without `close()` leaks one fd per directory visited until
  * GC happens to run the cleaner — under a long test session with many
  * checkpoint sweeps that is an fd-exhaustion path. Every directory
  * listing in the repo goes through [[children]], which materializes the
  * (always tiny) listing and closes the stream deterministically.
  */
object Fs {

  /** Immediate children of `p`, stream closed before returning. */
  def children(p: Path): Seq[Path] = {
    val st = Files.list(p)
    try {
      val b = Seq.newBuilder[Path]
      val it = st.iterator()
      while (it.hasNext) b += it.next()
      b.result()
    } finally st.close()
  }

  /** Recursive delete (dirs and files; no-op if absent). */
  def rmTree(p: Path): Unit =
    if (Files.exists(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS))
        children(p).foreach(rmTree)
      Files.delete(p)
    }
}
