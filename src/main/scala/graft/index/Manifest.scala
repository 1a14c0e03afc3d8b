package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Per-input-partition lineage + metrics row (north rule: "resumable from
  * checkpoint with per-partition lineage + metrics").
  */
final case class PartitionLineage(partition: Int, rows: Long, tokens: Long)

/** Immutable segment metadata, committed atomically (write-temp-then-rename —
  * the re-expression of the reference's two-phase `segments_N` commit,
  * `/root/reference/lucene/core/src/java/org/apache/lucene/index/SegmentInfos.java`).
  */
final case class SegmentManifest(
    segmentId: String,
    dir: String,
    docCount: Long,
    maxDocId: Long,
    sumTotalTermFreq: Long,
    termCount: Long,
    blockCount: Long,
    bucketShift: Int,
    buildWallSec: Double,
    lineage: Seq[PartitionLineage],
    hasPositions: Boolean = false,
    // per-field BM25 stats for multi-field segments (empty = single default
    // field; readers fall back to the segment-global stats)
    fieldStats: Seq[Schema.FieldStat] = Seq.empty,
    hasOffsets: Boolean = false,
    hasPayloads: Boolean = false
) {
  def sizeScore: Long = blockCount // merge-policy size proxy
}

/** Tiny dependency-free JSON (de)serialization for manifests. */
object Manifest {

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def toJson(m: SegmentManifest): String = {
    val lineage = m.lineage
      .map(l => s"""{"partition":${l.partition},"rows":${l.rows},"tokens":${l.tokens}}""")
      .mkString("[", ",", "]")
    val fieldStats = m.fieldStats
      .map(f => s"""{"field":"${esc(f.field)}","docCount":${f.docCount},"sumTotalTermFreq":${f.sumTotalTermFreq}}""")
      .mkString("[", ",", "]")
    s"""{
       |  "segmentId": "${esc(m.segmentId)}",
       |  "dir": "${esc(m.dir)}",
       |  "docCount": ${m.docCount},
       |  "maxDocId": ${m.maxDocId},
       |  "sumTotalTermFreq": ${m.sumTotalTermFreq},
       |  "termCount": ${m.termCount},
       |  "blockCount": ${m.blockCount},
       |  "bucketShift": ${m.bucketShift},
       |  "buildWallSec": ${m.buildWallSec},
       |  "hasPositions": ${m.hasPositions},
       |  "hasOffsets": ${m.hasOffsets},
       |  "hasPayloads": ${m.hasPayloads},
       |  "lineage": $lineage,
       |  "fieldStats": $fieldStats
       |}""".stripMargin
  }

  /** Minimal field extractor — manifests are machine-written, flat, and
    * schema-known, so a targeted scan suffices (no JSON lib on the classpath).
    */
  private def field(json: String, name: String): Option[String] = {
    val k = "\"" + name + "\":"
    val i = json.indexOf(k)
    if (i < 0) None
    else {
      var j = i + k.length
      while (j < json.length && json.charAt(j).isWhitespace) j += 1
      if (json.charAt(j) == '"') {
        val end = json.indexOf('"', j + 1)
        Some(json.substring(j + 1, end))
      } else if (json.charAt(j) == '[') {
        var depth = 0
        var e = j
        while ({ val c = json.charAt(e); if (c == '[') depth += 1; if (c == ']') depth -= 1; depth > 0 }) e += 1
        Some(json.substring(j, e + 1))
      } else {
        var e = j
        while (e < json.length && !",}\n".contains(json.charAt(e))) e += 1
        Some(json.substring(j, e).trim)
      }
    }
  }

  def fromJson(json: String): SegmentManifest = {
    def s(n: String) = field(json, n).getOrElse("")
    def l(n: String) = field(json, n).map(_.toLong).getOrElse(0L)
    val lineage = field(json, "lineage").toSeq.flatMap { arr =>
      """\{"partition":(\d+),"rows":(\d+),"tokens":(\d+)\}""".r
        .findAllMatchIn(arr)
        .map(m => PartitionLineage(m.group(1).toInt, m.group(2).toLong, m.group(3).toLong))
    }
    val fieldStats = field(json, "fieldStats").toSeq.flatMap { arr =>
      """\{"field":"([^"]*)","docCount":(\d+),"sumTotalTermFreq":(\d+)\}""".r
        .findAllMatchIn(arr)
        .map(m => Schema.FieldStat(m.group(1), m.group(2).toLong, m.group(3).toLong))
    }
    SegmentManifest(
      segmentId = s("segmentId"), dir = s("dir"), docCount = l("docCount"),
      maxDocId = l("maxDocId"), sumTotalTermFreq = l("sumTotalTermFreq"),
      termCount = l("termCount"), blockCount = l("blockCount"),
      bucketShift = l("bucketShift").toInt,
      buildWallSec = field(json, "buildWallSec").map(_.toDouble).getOrElse(0.0),
      lineage = lineage,
      hasPositions = field(json, "hasPositions").contains("true"),
      fieldStats = fieldStats,
      hasOffsets = field(json, "hasOffsets").contains("true"),
      hasPayloads = field(json, "hasPayloads").contains("true")
    )
  }

  def manifestPath(dir: String): Path = Paths.get(dir, "manifest.json")

  /** Atomic commit: temp file + atomic rename. */
  def commit(dir: String, m: SegmentManifest): Unit = {
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, s".manifest.${System.nanoTime()}.tmp")
    Files.write(tmp, toJson(m).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def read(dir: String): Option[SegmentManifest] = {
    val p = manifestPath(dir)
    if (Files.exists(p)) Some(fromJson(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
    else None
  }
}
