package graft.index

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Incremental index replication — the re-expression of the reference's
  * replicator module (`/root/reference/lucene/replicator/src/java/org/apache/
  * lucene/replicator/ReplicationClient.java:63-117` update cycle +
  * `IndexRevision.java:38-55`: a revision is a commit point's file list; the
  * client copies only the files it does not already have, then publishes the
  * revision so readers flip atomically; old revisions are cleaned up after).
  *
  * Here a revision is a snapshot-pinned `segments_N` generation. Segment
  * files are immutable once written — deletes and DV updates only ADD
  * generation files/dirs inside a live segment dir — so "exists at the
  * destination with the same length" means "already replicated"; there is
  * nothing to diff byte-wise. One sync is:
  *
  *  1. pin the source's current generation ([[LiveSet.snapshot]]) — writers
  *     keep committing during the copy, the pin keeps the copied files alive;
  *  2. walk the revision's segment dirs, copy every file the destination
  *     lacks via tmp + atomic rename — a crashed sync never leaves a
  *     truncated file under its final name, and a re-run resumes: already
  *     copied files are skipped (the reference's resumable-copy contract);
  *  3. atomically commit the replicated segment set at the destination
  *     ([[LiveSet.commit]]) — the publish step: destination readers see the
  *     old revision until this one rename;
  *  4. release the pin and GC destination segment dirs that fell out of the
  *     live set (the reference's old-revision cleanup thread).
  *
  * Pull-based and driver-side-only by design: segment payloads are Parquet
  * on a shared/hadoop-compatible FS, so at cluster scale the "copy" is a
  * metadata-sized file listing + distcp-shaped transfer per NEW segment —
  * never a re-read of the whole index.
  */
object Replicator {

  /** What one [[sync]] did: the published generation's segment set and the
    * copy ledger (copied vs skipped-as-already-present), plus any
    * destination segment dirs collected because the new revision no longer
    * references them.
    */
  final case class SyncReport(
      sourceGeneration: Long,
      segments: Seq[String],
      filesCopied: Long,
      bytesCopied: Long,
      filesSkipped: Long,
      orphansRemoved: Seq[String])

  private def walkFiles(root: Path): Seq[Path] = {
    val out = Seq.newBuilder[Path]
    def go(p: Path): Unit = {
      val listing = Files.list(p)
      try {
        val it = listing.iterator()
        while (it.hasNext) {
          val c = it.next()
          if (Files.isDirectory(c)) go(c)
          else out += c
        }
      } finally listing.close()
    }
    go(root)
    out.result().sortBy(_.toString)
  }

  /** One replication cycle from `srcDir` to `dstDir` (both index roots).
    * Idempotent and resumable: re-running after a crash or a no-op source
    * copies nothing new and commits the same segment set again. The
    * destination becomes a self-contained openable index at the source's
    * pinned revision.
    */
  def sync(srcDir: String, dstDir: String): SyncReport = {
    val gen = LiveSet.snapshot(srcDir).getOrElse(
      throw new IllegalStateException(
        s"no committed generation at $srcDir — commit a live set first"))
    try {
      val segs = LiveSet.readGen(srcDir, gen).getOrElse(Seq.empty).sorted
      Files.createDirectories(Paths.get(dstDir))
      var copied = 0L
      var bytes = 0L
      var skipped = 0L
      segs.foreach { name =>
        val srcSeg = Paths.get(srcDir, name)
        walkFiles(srcSeg).foreach { f =>
          val rel = srcSeg.relativize(f)
          val dst = Paths.get(dstDir, name).resolve(rel)
          val len = Files.size(f)
          if (Files.exists(dst) && Files.size(dst) == len) skipped += 1
          else {
            Files.createDirectories(dst.getParent)
            val tmp = dst.resolveSibling("." + dst.getFileName + ".repltmp")
            Files.copy(f, tmp, StandardCopyOption.REPLACE_EXISTING)
            Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE,
              StandardCopyOption.REPLACE_EXISTING)
            copied += 1
            bytes += len
          }
        }
      }
      LiveSet.commit(dstDir, segs)
      val gone = LiveSet.gcOrphans(dstDir)
      SyncReport(gen, segs, copied, bytes, skipped, gone)
    } finally LiveSet.release(srcDir, gen)
  }
}
