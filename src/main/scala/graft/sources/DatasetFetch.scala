package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

/** Dataset acquisition (reference S2: `kagglehub.dataset_download` —
  * network fetch into a local cache, `prepare_data.py:10-14`). The
  * TRANSPORT is out of scope in a zero-egress environment, but the
  * acquisition contract the pipeline actually depends on is engine-side
  * and implemented here:
  *
  *  - stage a dataset from any readable source directory into an
  *    immutable local cache slot (kagglehub's ~/.cache layout analog);
  *  - content integrity: every file md5-summed on stage, recorded in a
  *    manifest, re-verifiable later (kagglehub trusts TLS; a 100 TB
  *    ingest verifies checksums because object stores corrupt rarely but
  *    not never);
  *  - idempotence: a second fetch with a matching manifest is a no-op
  *    (the cache-hit path that makes orchestrated re-runs cheap).
  *
  * DatasetFetchSpec covers staging, cache-hit skip, and corruption
  * detection.
  */
object DatasetFetch {

  final case class Staged(dir: String, files: Map[String, String], cacheHit: Boolean)

  private def md5Of(p: Path): String = {
    val md = MessageDigest.getInstance("MD5")
    val in = Files.newInputStream(p)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  private def listFiles(dir: Path): Seq[Path] =
    graft.util.Fs.children(dir).filter(Files.isRegularFile(_))
      .sortBy(_.getFileName.toString)

  private def manifestPath(slot: Path): Path = slot.resolve("_MANIFEST")

  private def writeManifest(slot: Path, sums: Map[String, String]): Unit =
    Files.write(manifestPath(slot),
      sums.toSeq.sorted.map { case (f, h) => s"$h  $f" }.mkString("\n")
        .getBytes(StandardCharsets.UTF_8))

  private def readManifest(slot: Path): Option[Map[String, String]] =
    if (!Files.exists(manifestPath(slot))) None
    else Some(Files.readAllLines(manifestPath(slot)).asScala.filter(_.nonEmpty)
      .map { l => val Array(h, f) = l.split("  ", 2); f -> h }.toMap)

  /** Stages `srcDir` into `<cacheRoot>/<dataset>`; returns the cache slot.
    * A matching manifest short-circuits (cacheHit = true). */
  def fetch(srcDir: String, cacheRoot: String, dataset: String): Staged = {
    val src = Paths.get(srcDir)
    require(Files.isDirectory(src), s"source dir missing: $srcDir")
    val slot = Paths.get(cacheRoot, dataset)
    val srcSums = listFiles(src).map(p => p.getFileName.toString -> md5Of(p)).toMap
    readManifest(slot) match {
      // cache hit = manifest matches the source AND the staged bytes still
      // verify — integrity-first: re-summing the local slot is cheap next
      // to re-acquiring, and silent local corruption must force a re-stage
      case Some(m) if m == srcSums && verify(slot.toString).isEmpty =>
        Staged(slot.toString, srcSums, cacheHit = true)
      case _ =>
        Files.createDirectories(slot)
        listFiles(src).foreach(p => Files.copy(p,
          slot.resolve(p.getFileName.toString), StandardCopyOption.REPLACE_EXISTING))
        // verify the copies before publishing the manifest (the manifest
        // is the commit point — a crash mid-copy leaves no manifest and
        // the next fetch re-stages)
        val copied = listFiles(slot).filterNot(_.getFileName.toString == "_MANIFEST")
          .map(p => p.getFileName.toString -> md5Of(p)).toMap
        require(copied == srcSums, "staging corruption: checksum mismatch after copy")
        writeManifest(slot, srcSums)
        Staged(slot.toString, srcSums, cacheHit = false)
    }
  }

  /** Re-verifies a staged slot against its manifest; names of corrupt or
    * missing files (empty = intact). */
  def verify(slotDir: String): Seq[String] = {
    val slot = Paths.get(slotDir)
    readManifest(slot) match {
      case None => Seq("_MANIFEST")
      case Some(m) =>
        m.toSeq.sorted.collect {
          case (f, h) if !Files.exists(slot.resolve(f)) => f
          case (f, h) if md5Of(slot.resolve(f)) != h => f
        }
    }
  }
}
