package graft.index

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

import graft.codec.{ByteReader, ByteWriter}

/** Index-level snapshot: the committed segment set + global stats.
  *
  * Commit model mirrors the reference's lockless two-phase `segments_N`
  * (/root/reference/src/core/index/SegmentInfos.cpp:29-31,226-289):
  *  - each segment directory is published by atomic rename (task-level
  *    commit — the per-partition lineage row of the north rule);
  *  - the driver then writes `commits/commit_<gen>.json` naming the full
  *    segment set (snapshot). Readers use the highest complete generation;
  *    a half-written commit file is ignored because generation files are
  *    write-once + atomic-renamed.
  * Resume = planned segments MINUS segments already on disk with valid
  * meta (anti-join on segId). */
final case class IndexMeta(
    analyzer: String,
    numDocs: Long,
    sumDocLength: Long,
    hasPositions: Boolean,
    segments: Seq[SegmentMeta]) {
  def avgDocLength: Double = if (numDocs == 0) 0.0 else sumDocLength.toDouble / numDocs
}

object IndexMetaIO {

  def encodeSegment(m: SegmentMeta): Array[Byte] = {
    val w = new ByteWriter(128)
    w.writeVInt(m.segId)
    w.writeVLong(m.docBase)
    w.writeVInt(m.docCount)
    w.writeVLong(m.sumDocLength)
    w.writeVInt(m.termCount)
    w.writeVLong(m.postingCount)
    w.writeVLong(m.bytes)
    w.writeString(m.analyzer)
    w.writeByte(if (m.hasPositions) 1 else 0)
    w.toArray
  }

  def decodeSegment(bytes: Array[Byte]): SegmentMeta = {
    val r = new ByteReader(bytes)
    SegmentMeta(r.readVInt(), r.readVLong(), r.readVInt(), r.readVLong(),
      r.readVInt(), r.readVLong(), r.readVLong(), r.readString(), r.readByte() == 1)
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def segmentJson(m: SegmentMeta): String =
    s"""{"segId":${m.segId},"docBase":${m.docBase},"docCount":${m.docCount},""" +
      s""""sumDocLength":${m.sumDocLength},"termCount":${m.termCount},""" +
      s""""postingCount":${m.postingCount},"bytes":${m.bytes},""" +
      s""""analyzer":${jsonStr(m.analyzer)},"hasPositions":${m.hasPositions}}"""

  /** Write the driver-side commit snapshot (human-readable lineage). */
  def writeCommit(indexDir: String, meta: IndexMeta): Unit = {
    val commitsDir = new File(indexDir, "commits")
    commitsDir.mkdirs()
    val gen = 1 + listCommitGens(commitsDir).foldLeft(-1)(math.max)
    val body = new StringBuilder
    body ++= s"""{"analyzer":${jsonStr(meta.analyzer)},"numDocs":${meta.numDocs},"""
    body ++= s""""sumDocLength":${meta.sumDocLength},"hasPositions":${meta.hasPositions},"segments":["""
    body ++= meta.segments.sortBy(_.segId).map(segmentJson).mkString(",")
    body ++= "]}"
    val tmp = new File(commitsDir, s".commit_$gen.tmp")
    Files.writeString(tmp.toPath, body.toString)
    Files.move(tmp.toPath, new File(commitsDir, s"commit_$gen.json").toPath,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def listCommitGens(commitsDir: File): Seq[Int] = {
    val fs = Option(commitsDir.listFiles()).getOrElse(Array.empty)
    fs.toSeq.map(_.getName).collect {
      case n if n.startsWith("commit_") && n.endsWith(".json") =>
        n.stripPrefix("commit_").stripSuffix(".json").toInt
    }
  }

  /** Segments already committed on disk (task-level lineage), independent of
    * a driver snapshot — the resume source of truth. */
  def committedSegments(indexDir: String): Seq[SegmentMeta] = {
    val dir = new File(indexDir)
    val fs = Option(dir.listFiles()).getOrElse(Array.empty)
    fs.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("seg-") && !f.getName.endsWith(".tmp"))
      .flatMap { segDir =>
        val metaFile = new File(segDir, "meta.bin")
        if (metaFile.exists()) Some(decodeSegment(Files.readAllBytes(metaFile.toPath)))
        else None
      }
      .sortBy(_.segId)
  }

  /** Read the latest committed snapshot. */
  def readLatest(indexDir: String): Option[IndexMeta] = {
    val commitsDir = new File(indexDir, "commits")
    val gens = listCommitGens(commitsDir)
    if (gens.isEmpty) None
    else {
      // segment set from the binary metas (authoritative); snapshot carries stats
      val segs = committedSegments(indexDir)
      val json = Files.readString(new File(commitsDir, s"commit_${gens.max}.json").toPath)
      // minimal field extraction (we wrote this JSON; no nested strings with braces)
      def longField(name: String): Long = {
        val i = json.indexOf(s""""$name":""")
        java.lang.Long.parseLong(json.drop(i + name.length + 3).takeWhile(c => c.isDigit || c == '-'))
      }
      val analyzer = {
        val i = json.indexOf("\"analyzer\":\"")
        json.drop(i + 12).takeWhile(_ != '"')
      }
      Some(IndexMeta(analyzer, longField("numDocs"), longField("sumDocLength"),
        json.contains("\"hasPositions\":true"), segs))
    }
  }
}
