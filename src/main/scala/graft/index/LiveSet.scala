package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Generation-stamped live segment set — the re-expression of the
  * reference's `segments_N` commit point
  * (`/root/reference/lucene/core/src/java/org/apache/lucene/index/SegmentInfos.java`:
  * readers see exactly the segment set of the latest commit, swapped
  * atomically).
  *
  * A directory listing is NOT a safe live set: a crash between a merge's
  * commit and the deletion of its inputs would leave both the merged
  * segment and its inputs visible (docs double-counted; a replanned merge
  * could fuse a segment with its own merge output). Instead the index root
  * holds `segments_N.json` files (atomic-rename committed); readers use the
  * highest parseable generation, and the ingest/merge protocol is:
  *
  *  1. commit the new/merged segment's own manifest (resume-safe);
  *  2. atomically commit `segments_{N+1}` = live − mergedInputs + merged;
  *  3. only then delete the input directories.
  *
  * Any crash leaves either the old or the new live set fully intact.
  * Indexes without a `segments_N` file (single-build layouts) fall back to
  * the directory listing.
  *
  * Single-writer assumption (the reference's `IndexWriter` lock): one
  * ingest/merge driver owns an index at a time — concurrent committers
  * could both claim generation N+1 and the later rename would win.
  * Readers are unrestricted (they only ever read committed generations).
  */
object LiveSet {

  private val Prefix = "segments_"

  private def genFiles(indexDir: String): Seq[(Long, java.io.File)] = {
    val root = new java.io.File(indexDir)
    if (!root.isDirectory) Seq.empty
    else root.listFiles()
      .filter(f => f.isFile && f.getName.startsWith(Prefix) && f.getName.endsWith(".json"))
      .flatMap { f =>
        val digits = f.getName.stripPrefix(Prefix).stripSuffix(".json")
        digits.toLongOption.map(_ -> f)
      }.sortBy(_._1).toSeq
  }

  private def parseGenFile(f: java.io.File): Seq[String] = {
    val json = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
    "\"([^\"]+)\"".r.findAllMatchIn(
      json.substring(json.indexOf('['), json.lastIndexOf(']') + 1))
      .map(_.group(1)).toSeq
  }

  /** Latest committed (generation, segment dir names), if any commit exists. */
  def read(indexDir: String): Option[(Long, Seq[String])] =
    genFiles(indexDir).reverse.iterator.flatMap { case (gen, f) =>
      Some((gen, parseGenFile(f)))
    }.nextOption()

  /** Segment names of one specific committed generation, if its
    * `segments_N` file still exists (recent or snapshot-pinned).
    */
  def readGen(indexDir: String, gen: Long): Option[Seq[String]] =
    genFiles(indexDir).find(_._1 == gen).map(g => parseGenFile(g._2))

  /** Atomically commit a new generation holding exactly `segNames` (relative
    * dir names under `indexDir`). Keeps the last few generations for
    * debugging, prunes the rest.
    */
  def commit(indexDir: String, segNames: Seq[String]): Long = {
    Files.createDirectories(Paths.get(indexDir))
    val gen = read(indexDir).map(_._1).getOrElse(0L) + 1
    val json = segNames.sorted.map(s => "\"" + s + "\"").mkString(
      s"""{"generation":$gen,"segments":[""", ",", "]}")
    val tmp = Paths.get(indexDir, s".segments.$gen.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(indexDir, f"$Prefix$gen%012d.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // prune old generation files, but never a snapshotted one (the
    // SnapshotDeletionPolicy contract: a snapshotted commit point survives
    // until released)
    val pinned = snapshots(indexDir).toSet
    genFiles(indexDir).dropRight(5)
      .filterNot { case (g, _) => pinned.contains(g) }
      .foreach(_._2.delete())
    gen
  }

  // ---------------------------------------------------------- snapshots

  private val SnapFile = "snapshots.json"

  /** Snapshotted generations, ascending (ref
    * `index/SnapshotDeletionPolicy.java`: commit points a writer must not
    * delete — here: `segments_N` files [[commit]] must not prune and
    * segment dirs [[gcOrphans]] must not collect).
    */
  def snapshots(indexDir: String): Seq[Long] = {
    val p = Paths.get(indexDir, SnapFile)
    if (!Files.exists(p)) Seq.empty
    else {
      val json = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      "\\d+".r.findAllIn(json).map(_.toLong).toSeq.distinct.sorted
    }
  }

  private def writeSnapshots(indexDir: String, gens: Seq[Long]): Unit = {
    val json = gens.distinct.sorted.mkString("[", ",", "]")
    val tmp = Paths.get(indexDir, s".$SnapFile.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(indexDir, SnapFile),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** Pin the current generation (`SnapshotDeletionPolicy#snapshot`): its
    * `segments_N` file and every segment dir it references survive pruning
    * and orphan GC until [[release]]d. Returns the pinned generation; None
    * when no generation was ever committed (legacy layout — commit first).
    */
  def snapshot(indexDir: String): Option[Long] =
    read(indexDir).map { case (gen, _) =>
      writeSnapshots(indexDir, snapshots(indexDir) :+ gen)
      gen
    }

  /** Unpin a snapshotted generation (`SnapshotDeletionPolicy#release`); its
    * file and non-live segments become collectable again.
    */
  def release(indexDir: String, gen: Long): Unit =
    writeSnapshots(indexDir, snapshots(indexDir).filterNot(_ == gen))

  /** Segment names referenced by any snapshotted generation. */
  def snapshotSegments(indexDir: String): Set[String] =
    snapshots(indexDir).flatMap(g => readGen(indexDir, g).getOrElse(Seq.empty)).toSet

  /** Restore a snapshotted (or still-retained) generation by committing a
    * NEW generation with exactly its segment set — the rollback-to-commit
    * shape (`IndexWriter#rollback` / restoring a snapshot): every segment
    * added or merged since the snapshot drops out of the live set (and is
    * collected by the next [[gcOrphans]] unless another snapshot pins it).
    * Per-segment delete generations are NOT versioned by snapshots: deletes
    * written inside a still-live segment dir after the snapshot remain
    * visible (documented divergence from the reference's per-commit
    * delGen).
    */
  def rollback(indexDir: String, gen: Long): Long = {
    val segs = readGen(indexDir, gen).getOrElse(
      throw new IllegalArgumentException(
        s"generation $gen is not retained at $indexDir (snapshot it before overwriting)"))
    commit(indexDir, segs)
  }

  /** Current live names; on a legacy layout (committed segment dirs, no
    * `segments_N`) falls back to the directory listing — the same fallback
    * [[manifests]] uses — so the FIRST generational commit over a legacy
    * index carries the pre-existing segments instead of hiding them (and
    * exposing them to [[gcOrphans]]).
    */
  private def currentOrLegacy(indexDir: String): Seq[String] =
    read(indexDir).map(_._2).getOrElse {
      val root = new java.io.File(indexDir)
      if (!root.isDirectory) Seq.empty
      else root.listFiles()
        .filter(f => f.isDirectory && Manifest.read(f.getPath).isDefined)
        .map(_.getName).sorted.toSeq
    }

  /** Add segments to the live set (no-op for already-live names). */
  def add(indexDir: String, segNames: Seq[String]): Long =
    commit(indexDir, (currentOrLegacy(indexDir) ++ segNames).distinct)

  /** Swap: live − removed + added, in one atomic generation. */
  def swap(indexDir: String, removed: Seq[String], added: Seq[String]): Long = {
    val cur = currentOrLegacy(indexDir)
    commit(indexDir, ((cur.toSet -- removed) ++ added).toSeq)
  }

  /** The live segment manifests (live-set order). Falls back to the legacy
    * directory listing when no generation was ever committed.
    */
  def manifests(indexDir: String): Seq[SegmentManifest] =
    read(indexDir) match {
      case Some((_, names)) =>
        names.sorted.flatMap(n => Manifest.read(s"$indexDir/$n"))
      case None =>
        val root = new java.io.File(indexDir)
        if (!root.isDirectory) Seq.empty
        else root.listFiles().filter(_.isDirectory).sortBy(_.getName)
          .flatMap(f => Manifest.read(f.getPath)).toSeq
    }

  /** Hot backup (the replicator-module use of a snapshot, ref
    * `lucene/replicator` + `SnapshotDeletionPolicy` javadoc): pin the
    * current generation, copy its segment dirs (postings/terms/docs
    * Parquet, manifest, tombstones) to `destDir`, commit a fresh
    * `segments_1` there, release the pin. Writers keep committing during
    * the copy — the snapshot guarantees the copied files are immutable.
    * The destination is a self-contained openable index.
    */
  def backup(indexDir: String, destDir: String): Seq[String] = {
    val gen = snapshot(indexDir).getOrElse(
      throw new IllegalStateException(
        s"no committed generation at $indexDir — commit a live set first"))
    try {
      val segs = readGen(indexDir, gen).getOrElse(Seq.empty)
      Files.createDirectories(Paths.get(destDir))
      def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
        Files.createDirectories(dst)
        val listing = Files.list(src)
        try listing.forEach { p =>
          val t = dst.resolve(p.getFileName)
          if (Files.isDirectory(p)) copyTree(p, t)
          else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING): Unit
        } finally listing.close()
      }
      segs.foreach(n => copyTree(Paths.get(indexDir, n), Paths.get(destDir, n)))
      commit(destDir, segs)
      segs
    } finally release(indexDir, gen)
  }

  /** Remove committed segment dirs that are NOT in the live set (crash
    * leftovers: merge inputs whose deletion was interrupted, or a built
    * segment whose live-set add never happened — a streaming replay
    * rebuilds the latter deterministically). No-op without a live set.
    */
  def gcOrphans(indexDir: String): Seq[String] =
    read(indexDir) match {
      case None => Seq.empty
      case Some((_, live)) =>
        // snapshot-pinned segments are protected like live ones
        val liveSet = live.toSet ++ snapshotSegments(indexDir)
        val root = new java.io.File(indexDir)
        if (!root.isDirectory) Seq.empty
        else root.listFiles()
          .filter(f => f.isDirectory && !liveSet.contains(f.getName) &&
            Manifest.read(f.getPath).isDefined)
          .map { f =>
            def rm(x: java.io.File): Unit = {
              if (x.isDirectory) x.listFiles().foreach(rm)
              x.delete(): Unit
            }
            rm(f)
            f.getName
          }.toSeq
    }
}
