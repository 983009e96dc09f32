package graft.sources.arrow

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.{DataType, StructType}

/** Write-time footer-stats manifest for Arrow directories.
  *
  * Planning an Arrow directory wants three things from every file's IPC
  * footer: the schema (inference + consistency verification), the
  * per-batch block sizes (split planning), and the custom-metadata
  * stats (zone maps, row/null counts, bucket stamp, Blooms, sort
  * order, codec). Without an index that is O(files) driver-side footer
  * opens at FIRST planning of every session — the one 100×-scale soft
  * spot of a flat 100k-file directory (the table log bounds listing,
  * not footer reads).
  *
  * This sidecar (`_graft_footer_index` at the directory root) persists
  * exactly [[ArrowDataSource.FooterInfo]] per file, captured by the
  * WRITING task right after it seals the footer (page-cache hot,
  * executor-side, shipped to the driver in the commit message), so
  * planning becomes ONE metadata-file read. The parquet analogue is
  * `_metadata`/summary files; Delta/Iceberg fold the same stats into
  * their commit logs.
  *
  * The index is strictly an optimization with a sweep fallback:
  *  - files present on disk but absent from the index are footer-read
  *    as before (maintenance rewrites, foreign writers);
  *  - entries whose file vanished (vacuum, truncate by a non-updating
  *    writer) are simply never looked up — readers key by the VISIBLE
  *    file list;
  *  - a corrupt or truncated index decodes to None and planning sweeps.
  *  - files are immutable once visible (every mutation is copy-on-
  *    write), so a stale index entry cannot describe wrong stats —
  *    staleness only ever means MISSING entries, never wrong ones.
  *
  * Format (line-oriented, atomically replaced via temp + ATOMIC_MOVE):
  * {{{
  *   v1
  *   S<TAB>0<TAB><StructType json>          schema generations
  *   F<TAB><b64 relpath><TAB><genId><TAB><entry fields...>
  * }}}
  * Entry fields (TAB-separated): sizes (comma list), zone map (b64 of
  * the footer string, "" = none), row stats (b64, "" = none), bucket
  * (`b64col,n,id` or ""), sort column (b64 or ""), codec (plain or
  * ""), blooms (`b64name:b64bits;...` or ""). Base64 confines every
  * user-controlled string (column names, partition-dir relpaths) to a
  * tab-free alphabet.
  */
object FooterIndexFile {
  val FileName = "_graft_footer_index"

  final case class Index(schemas: IndexedSeq[StructType],
      entries: Map[String, (Int, ArrowDataSource.FooterInfo)]) {
    def schemaOf(rel: String): Option[StructType] =
      entries.get(rel).map { case (g, _) => schemas(g) }
    def infoOf(rel: String): Option[ArrowDataSource.FooterInfo] =
      entries.get(rel).map(_._2)
  }

  private def b64(s: String): String =
    java.util.Base64.getEncoder
      .encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  /** One [[ArrowDataSource.FooterInfo]] as the TAB-separated tail of an
    * `F` line (everything after the genId). */
  def encodeInfo(info: ArrowDataSource.FooterInfo): String = {
    val zm = info.zoneMap
      .map(z => b64(ZoneMaps.encode(z.cols.toSeq,
        z.batches.toSeq.map(_.toSeq)))).getOrElse("")
    val rs = info.rowStats
      .map(r => b64(ZoneMaps.RowStats.encode(r.cols.toSeq,
        r.batches.toSeq.map { case (n, nulls) => (n, nulls.toSeq) })))
      .getOrElse("")
    val bk = info.bucket
      .map { case (c, n, i) => s"${b64(c)},$n,$i" }.getOrElse("")
    val st = info.sort.map(b64).getOrElse("")
    val cd = info.codec.getOrElse("")
    val bl = info.blooms.toSeq.sortBy(_._1)
      .map { case (n, bits) => s"${b64(n)}:${ArrowBloom.encode(bits)}" }
      .mkString(";")
    Seq(info.sizes.mkString(","), zm, rs, bk, st, cd, bl).mkString("\t")
  }

  /** Inverse of [[encodeInfo]]; None on any malformed field. */
  def decodeInfo(fields: Seq[String]): Option[ArrowDataSource.FooterInfo] =
    try {
      val Seq(sz, zm, rs, bk, st, cd, bl) = fields: @unchecked
      val sizes =
        if (sz.isEmpty) Seq.empty[Long] else sz.split(",").toSeq.map(_.toLong)
      val zoneMap = if (zm.isEmpty) None else ZoneMaps.decode(unb64(zm))
      val rowStats =
        if (rs.isEmpty) None else ZoneMaps.RowStats.decode(unb64(rs))
      val bucket =
        if (bk.isEmpty) None
        else bk.split(",") match {
          case Array(c, n, i) => Some((unb64(c), n.toInt, i.toInt))
          case _ => return None
        }
      val sort = if (st.isEmpty) None else Some(unb64(st))
      val codec = if (cd.isEmpty) None else Some(cd)
      val blooms =
        if (bl.isEmpty) Map.empty[String, Array[Long]]
        else bl.split(";").toSeq.map { cell =>
          val i = cell.indexOf(':')
          if (i <= 0) return None
          val bits = ArrowBloom.decode(cell.substring(i + 1))
            .getOrElse(return None)
          unb64(cell.substring(0, i)) -> bits
        }.toMap
      Some(ArrowDataSource.FooterInfo(sizes, zoneMap, rowStats, bucket,
        blooms, sort, codec))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def sidecar(root: Path): Path = root.resolve(FileName)

  // (sidecar path, size, mtime-millis) → parsed index. Immutable once
  // written (updates ATOMIC_MOVE a fresh file, changing size/mtime), so
  // the key is a content fingerprint and the cache never goes stale.
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(String, Long, Long), Option[Index]]

  /** Parse the directory's sidecar, one file read, process-cached.
    * None = absent or unreadable (planning falls back to the sweep). */
  def load(root: Path): Option[Index] = {
    val f = sidecar(root)
    try {
      if (!Files.isRegularFile(f)) return None
      val (size, mtime) =
        (Files.size(f), Files.getLastModifiedTime(f).toMillis)
      cache.getOrElseUpdate((f.toString, size, mtime), parse(f))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def parse(f: Path): Option[Index] =
    try {
      val lines = Files.readAllLines(f, StandardCharsets.UTF_8).asScala
      if (lines.isEmpty || lines.head != "v1") return None
      val schemas = scala.collection.mutable.ArrayBuffer.empty[StructType]
      val entries =
        scala.collection.mutable.Map.empty[String,
          (Int, ArrowDataSource.FooterInfo)]
      lines.tail.foreach { line =>
        val parts = line.split("\t", -1).toSeq
        parts.head match {
          case "S" =>
            val id = parts(1).toInt
            if (id != schemas.length) return None // ids are positional
            schemas += DataType.fromJson(parts(2)).asInstanceOf[StructType]
          case "F" =>
            val rel = unb64(parts(1))
            val gen = parts(2).toInt
            if (gen < 0 || gen >= schemas.length) return None
            val info = decodeInfo(parts.drop(3)).getOrElse(return None)
            entries(rel) = (gen, info)
          case _ => () // unknown record kinds from future versions: skip
        }
      }
      Some(Index(schemas.toIndexedSeq, entries.toMap))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def render(idx: Index): String = {
    val sb = new StringBuilder("v1\n")
    idx.schemas.zipWithIndex.foreach { case (s, i) =>
      sb.append(s"S\t$i\t${s.json}\n")
    }
    idx.entries.toSeq.sortBy(_._1).foreach { case (rel, (gen, info)) =>
      sb.append(s"F\t${b64(rel)}\t$gen\t${encodeInfo(info)}\n")
    }
    sb.result()
  }

  private def writeAtomic(root: Path, idx: Index): Unit = {
    val tmp = root.resolve(s"$FileName.inprogress")
    Files.write(tmp, render(idx).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, sidecar(root),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def sig(s: StructType): Seq[(String, DataType)] =
    s.fields.toSeq.map(f => (f.name, f.dataType))

  /** Driver-side commit hook: fold this write's `(absolute file path,
    * encoded FooterInfo)` pairs into the sidecar under their root-
    * relative keys. `schema` is the canonical FOOTER schema of the new
    * files (what [[ArrowDataSource.readFooterSchema]] would surface);
    * it joins an existing generation when signatures match, else opens
    * a new one (append-with-evolution). `replace` drops prior state
    * (the truncate path — the files the old entries described are
    * gone). Single-writer per commit by Spark's own protocol; a lost
    * sidecar update only costs the sweep fallback, never correctness. */
  def update(rootDir: String, schema: StructType,
      added: Seq[(String, String)], replace: Boolean): Unit =
    try {
      if (added.isEmpty && !replace) return
      val root = Paths.get(rootDir).toAbsolutePath.normalize
      val prior =
        if (replace) None
        else load(root)
      val (schemas, genId) = prior match {
        case Some(ix) => ix.schemas.indexWhere(s => sig(s) == sig(schema)) match {
          case -1 => (ix.schemas :+ schema, ix.schemas.length)
          case i => (ix.schemas, i)
        }
        case None => (IndexedSeq(schema), 0)
      }
      val fresh = added.flatMap { case (abs, enc) =>
        val rel = root.relativize(
          Paths.get(abs).toAbsolutePath.normalize).toString
        decodeInfo(enc.split("\t", -1).toSeq).map(rel -> (genId, _))
      }.toMap
      writeAtomic(root,
        Index(schemas, prior.map(_.entries).getOrElse(Map.empty) ++ fresh))
    } catch {
      // best-effort: never fail a commit over its stats sidecar
      case scala.util.control.NonFatal(_) => ()
    }

  /** Vacuum hook: forget entries for physically reclaimed files so the
    * sidecar stays bounded by the LIVE file set. Best-effort. */
  def prune(root: Path, removed: Seq[Path]): Unit =
    try {
      val norm = root.toAbsolutePath.normalize
      load(norm).foreach { ix =>
        val gone = removed.flatMap(p => scala.util.Try(
          norm.relativize(p.toAbsolutePath.normalize).toString).toOption)
          .toSet
        if (gone.exists(ix.entries.contains))
          writeAtomic(norm, ix.copy(entries = ix.entries.view
            .filterKeys(!gone(_)).toMap))
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Truncate path with nothing written (or an unusable schema):
    * drop the sidecar so no entry outlives the files it described. */
  def drop(rootDir: String): Unit = {
    Files.deleteIfExists(
      Paths.get(rootDir).toAbsolutePath.normalize.resolve(FileName))
    ()
  }
}
