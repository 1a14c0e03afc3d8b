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

  /** Latest committed (generation, segment dir names), if any commit exists. */
  def read(indexDir: String): Option[(Long, Seq[String])] =
    genFiles(indexDir).reverse.iterator.flatMap { case (gen, f) =>
      val json = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
      val segs = "\"([^\"]+)\"".r.findAllMatchIn(
        json.substring(json.indexOf('['), json.lastIndexOf(']') + 1))
        .map(_.group(1)).toSeq
      Some((gen, segs))
    }.nextOption()

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
    genFiles(indexDir).dropRight(5).foreach(_._2.delete())
    gen
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

  /** Remove committed segment dirs that are NOT in the live set (crash
    * leftovers: merge inputs whose deletion was interrupted, or a built
    * segment whose live-set add never happened — a streaming replay
    * rebuilds the latter deterministically). No-op without a live set.
    */
  def gcOrphans(indexDir: String): Seq[String] =
    read(indexDir) match {
      case None => Seq.empty
      case Some((_, live)) =>
        val liveSet = live.toSet
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
