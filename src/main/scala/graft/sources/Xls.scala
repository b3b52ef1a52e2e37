package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Minimal legacy Excel (.xls / BIFF8) source and sink (SURVEY §2.1 S9).
  *
  * The reference ingests headerless 5-minute-bar workbooks via
  * `pd.read_excel` (/root/reference/tasks/wind/handle_csv/merge_2_n_bar.py:28-36).
  * Spark has no built-in xls source and the container has no POI-style
  * dependency, so this is a self-contained implementation of the two
  * public Microsoft formats involved — just enough of each for data
  * interchange, not a general Office suite:
  *
  *  - '''MS-CFB''' (Compound File Binary): 512-byte sectors, FAT chains,
  *    DIFAT overflow sectors, the 64-byte mini-stream for streams under
  *    4096 bytes, and the directory tree. Both read and write sides.
  *  - '''MS-XLS''' (BIFF8) `Workbook` stream: BOF/EOF substreams,
  *    BOUNDSHEET, DIMENSION, and the cell records NUMBER, RK, MULRK,
  *    LABELSST (+ SST with CONTINUE splits), LABEL, BOOLERR and FORMULA
  *    (cached numeric/boolean/string results). The writer emits only
  *    NUMBER/LABELSST — always-valid encodings — while the reader
  *    accepts everything above, since real vendor exports lean on the
  *    compact RK/MULRK forms.
  *
  * Scale shape: one .xls sheet is capped at 65536 rows by the format, so
  * a corpus of workbooks is inherently file-granular — `read` lists the
  * glob on the driver (paths only) and parses each file inside an
  * executor task, which is exactly file-level parallelism; no byte ever
  * moves through the driver. The writer runs in `foreachPartition` after
  * a hash repartition on the file key, so export is executor-side too,
  * mirroring the per-key CSV export (K5). Cells come back in long form
  * `(path, sheet, row, col, kind, num, str)`; `headerless` pivots a
  * fixed-width numeric grid into `_c0.._cN` columns like a headerless
  * CSV read — a single partial-aggregable groupBy, not N self-joins.
  */
object Xls {

  // ---------------------------------------------------------------- model

  /** One parsed cell. `kind`: n=numeric, s=string, b=boolean (num=0/1),
    * e=error (num=error code). Dates are numeric by design in BIFF —
    * Excel-epoch day floats; see the F11 helpers for conversion.
    */
  final case class Cell(sheet: String, row: Int, col: Int, kind: String,
      num: java.lang.Double, str: String)

  /** Writer-side cell values. */
  sealed trait XVal
  final case class XNum(v: Double) extends XVal
  final case class XStr(v: String) extends XVal

  val cellSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("sheet", StringType, nullable = false),
    StructField("row", IntegerType, nullable = false),
    StructField("col", IntegerType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("num", DoubleType, nullable = true),
    StructField("str", StringType, nullable = true)))

  // ------------------------------------------------------------ constants

  private val SecMagic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
  private val FREESECT = 0xFFFFFFFF
  private val ENDOFCHAIN = 0xFFFFFFFE
  private val FATSECT = 0xFFFFFFFD
  private val DIFSECT = 0xFFFFFFFC
  private val MiniCutoff = 4096
  private val MaxRecData = 8224 // BIFF8 record payload cap before CONTINUE
  val MaxSheetRows = 65536 // BIFF8 hard row cap per sheet

  // ======================================================== CFB container

  private def le(n: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()

  /** Wrap `stream` as the single "Workbook" stream of a new compound
    * file. Streams under 4096 bytes go through the mini-stream (as the
    * spec requires of writers); larger ones get FAT chains with DIFAT
    * overflow when the FAT itself outgrows the 109 header slots.
    */
  def cfbWrap(stream: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val header = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    header.put(SecMagic).position(24)
    header.putShort(0x003E.toShort).putShort(0x0003.toShort) // minor, major (v3)
    header.putShort(0xFFFE.toShort) // little-endian marker
    header.putShort(9.toShort).putShort(6.toShort) // 512-byte sectors, 64-byte minis
    header.position(56); header.putInt(MiniCutoff)

    def dirSector(wbStart: Int, wbSize: Int, rootStart: Int, rootSize: Int): Array[Byte] = {
      val d = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      def entry(idx: Int, name: String, typ: Byte, child: Int, start: Int, size: Int): Unit = {
        d.position(idx * 128)
        val nm = name.getBytes("UTF-16LE")
        d.put(nm)
        d.position(idx * 128 + 64)
        d.putShort((nm.length + 2).toShort).put(typ).put(1.toByte) // black
        d.putInt(FREESECT).putInt(FREESECT).putInt(child) // siblings, child
        d.position(idx * 128 + 116)
        d.putInt(start).putInt(size).putInt(0)
      }
      entry(0, "Root Entry", 5, child = 1, start = rootStart, size = rootSize)
      entry(1, "Workbook", 2, child = FREESECT, start = wbStart, size = wbSize)
      d.array()
    }

    def pad(b: Array[Byte], unit: Int): Array[Byte] = {
      val n = ((b.length + unit - 1) / unit) * unit
      java.util.Arrays.copyOf(b, n)
    }

    if (stream.length < MiniCutoff) {
      // sectors: 0 FAT | 1 dir | 2 miniFAT | 3.. mini-stream carrier
      val mini = pad(stream, 64)
      val nMiniSec = mini.length / 64
      val carrier = pad(mini, 512)
      val nCarrier = carrier.length / 512
      val fat = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      fat.putInt(FATSECT).putInt(ENDOFCHAIN).putInt(ENDOFCHAIN)
      for (i <- 0 until nCarrier)
        fat.putInt(if (i == nCarrier - 1) ENDOFCHAIN else 3 + i + 1)
      while (fat.remaining() >= 4) fat.putInt(FREESECT)
      val miniFat = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
      for (i <- 0 until nMiniSec)
        miniFat.putInt(if (i == nMiniSec - 1) ENDOFCHAIN else i + 1)
      while (miniFat.remaining() >= 4) miniFat.putInt(FREESECT)
      header.position(44); header.putInt(1) // one FAT sector
      header.putInt(1) // first dir sector
      header.position(60); header.putInt(2).putInt(1) // miniFAT at sector 2, ×1
      header.position(68); header.putInt(ENDOFCHAIN).putInt(0)
      header.position(76); header.putInt(0) // DIFAT[0] = FAT sector 0
      while (header.remaining() >= 4) header.putInt(FREESECT)
      out.write(header.array()); out.write(fat.array())
      out.write(dirSector(wbStart = 0, wbSize = stream.length, rootStart = 3, rootSize = mini.length))
      out.write(miniFat.array()); out.write(carrier)
    } else {
      // sectors: 0..d-1 DIFAT | d..d+f-1 FAT | dir | data...
      val data = pad(stream, 512)
      val nData = data.length / 512
      var nFat = 1; var nDifat = 0
      var settled = false
      while (!settled) {
        val total = nDifat + nFat + 1 + nData
        val needFat = (total + 127) / 128
        val needDifat = if (needFat <= 109) 0 else (needFat - 109 + 126) / 127
        if (needFat == nFat && needDifat == nDifat) settled = true
        else { nFat = needFat; nDifat = needDifat }
      }
      val firstFat = nDifat; val dirSec = nDifat + nFat; val firstData = dirSec + 1
      val total = firstData + nData
      val fat = ByteBuffer.allocate(nFat * 512).order(ByteOrder.LITTLE_ENDIAN)
      for (_ <- 0 until nDifat) fat.putInt(DIFSECT)
      for (_ <- 0 until nFat) fat.putInt(FATSECT)
      fat.putInt(ENDOFCHAIN) // directory
      for (i <- 0 until nData)
        fat.putInt(if (i == nData - 1) ENDOFCHAIN else firstData + i + 1)
      while (fat.remaining() >= 4) fat.putInt(FREESECT)
      header.position(44); header.putInt(nFat)
      header.putInt(dirSec)
      header.position(60); header.putInt(ENDOFCHAIN).putInt(0) // no miniFAT
      header.position(68)
      header.putInt(if (nDifat == 0) ENDOFCHAIN else 0).putInt(nDifat)
      header.position(76)
      for (i <- 0 until math.min(nFat, 109)) header.putInt(firstFat + i)
      while (header.remaining() >= 4) header.putInt(FREESECT)
      val difat = ByteBuffer.allocate(nDifat * 512).order(ByteOrder.LITTLE_ENDIAN)
      for (s <- 0 until nDifat) {
        val base = 109 + s * 127
        for (j <- 0 until 127) {
          val k = base + j
          difat.putInt(if (k < nFat) firstFat + k else FREESECT)
        }
        difat.putInt(if (s == nDifat - 1) ENDOFCHAIN else s + 1)
      }
      require(total == firstData + nData)
      out.write(header.array()); out.write(difat.array()); out.write(fat.array())
      out.write(dirSector(wbStart = firstData, wbSize = stream.length,
        rootStart = ENDOFCHAIN, rootSize = 0))
      out.write(data)
    }
    out.toByteArray
  }

  /** Extract the "Workbook" (or BIFF5 "Book") stream from a compound file. */
  def cfbWorkbook(file: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.wrap(file).order(ByteOrder.LITTLE_ENDIAN)
    require(file.length >= 512 &&
      SecMagic.indices.forall(i => file(i) == SecMagic(i)), "not an OLE2 compound file")
    val secShift = buf.getShort(30).toInt
    val secSize = 1 << secShift
    val miniShift = buf.getShort(32).toInt
    val nFat = buf.getInt(44)
    val firstDir = buf.getInt(48)
    val miniCutoff = buf.getInt(56)
    val firstMiniFat = buf.getInt(60)
    val firstDifat = buf.getInt(68)
    val nDifat = buf.getInt(72)
    def sector(id: Int): Int = 512 + id * secSize // header is 512 even for 4k sectors

    // FAT sector ids: 109 header slots, then the DIFAT chain
    val fatSecs = ArrayBuffer[Int]()
    for (i <- 0 until math.min(nFat, 109)) {
      val s = buf.getInt(76 + 4 * i)
      if (s >= 0) fatSecs += s
    }
    var dif = firstDifat; var difSeen = 0
    while (dif != ENDOFCHAIN && dif != FREESECT && difSeen <= nDifat + 1) {
      val base = sector(dif)
      for (j <- 0 until secSize / 4 - 1) {
        val s = buf.getInt(base + 4 * j)
        if (s >= 0 && fatSecs.length < nFat) fatSecs += s
      }
      dif = buf.getInt(base + secSize - 4); difSeen += 1
    }
    val perSec = secSize / 4
    def fatAt(id: Int): Int = buf.getInt(sector(fatSecs(id / perSec)) + 4 * (id % perSec))

    def chain(start: Int, sizeHint: Long): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      var s = start; var guard = 0
      val maxSecs = file.length / secSize + 2
      while (s != ENDOFCHAIN && s >= 0 && guard < maxSecs) {
        o.write(file, sector(s), math.min(secSize, file.length - sector(s)))
        s = fatAt(s); guard += 1
      }
      val b = o.toByteArray
      if (sizeHint >= 0 && sizeHint < b.length) java.util.Arrays.copyOf(b, sizeHint.toInt) else b
    }

    // directory entries: (name, type, startSector, size)
    val dir = chain(firstDir, -1)
    val dbuf = ByteBuffer.wrap(dir).order(ByteOrder.LITTLE_ENDIAN)
    case class Entry(name: String, typ: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { i =>
      val nameLen = dbuf.getShort(i * 128 + 64).toInt
      val name = if (nameLen >= 2)
        new String(dir, i * 128, nameLen - 2, "UTF-16LE") else ""
      Entry(name, dir(i * 128 + 66).toInt, dbuf.getInt(i * 128 + 116),
        dbuf.getInt(i * 128 + 120).toLong & 0xFFFFFFFFL)
    }
    val root = entries.find(_.typ == 5).getOrElse(sys.error("no CFB root entry"))
    val wb = entries.find(e => e.typ == 2 && (e.name == "Workbook" || e.name == "Book"))
      .getOrElse(sys.error("no Workbook stream"))

    if (wb.size >= miniCutoff) chain(wb.start, wb.size)
    else {
      val miniStream = chain(root.start, root.size)
      val miniSize = 1 << miniShift
      val miniFat = chain(firstMiniFat, -1)
      val mbuf = ByteBuffer.wrap(miniFat).order(ByteOrder.LITTLE_ENDIAN)
      val o = new ByteArrayOutputStream()
      var s = wb.start; var guard = 0
      while (s != ENDOFCHAIN && s >= 0 && guard < miniFat.length / 4 + 1) {
        o.write(miniStream, s * miniSize, math.min(miniSize, miniStream.length - s * miniSize))
        s = mbuf.getInt(4 * s); guard += 1
      }
      java.util.Arrays.copyOf(o.toByteArray, wb.size.toInt)
    }
  }

  // ====================================================== BIFF8 workbook

  /** Serialize sheets of cell rows into a complete .xls byte image.
    * Strings are pooled in a shared SST (with CONTINUE splits past the
    * 8224-byte record cap); numbers are 8-byte NUMBER records. Throws if
    * any sheet exceeds the format's 65536-row cap — splitting policy
    * belongs to the caller (see `writeKeyed`).
    */
  def workbookBytes(sheets: Seq[(String, Seq[Seq[XVal]])]): Array[Byte] = {
    sheets.foreach { case (n, rows) =>
      require(rows.length <= MaxSheetRows, s"sheet $n: ${rows.length} rows > $MaxSheetRows")
    }
    // string pool in first-use order
    val sstIndex = scala.collection.mutable.LinkedHashMap[String, Int]()
    var refs = 0
    sheets.foreach(_._2.foreach(_.foreach {
      case XStr(v) => refs += 1; if (!sstIndex.contains(v)) sstIndex(v) = sstIndex.size
      case _ =>
    }))

    def record(id: Int, data: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(4 + data.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(id.toShort).putShort(data.length.toShort).put(data)
      b.array()
    }

    def bofData(dt: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(0x0600.toShort).putShort(dt.toShort)
      b.putShort(0x0DBB.toShort).putShort(0x07CC.toShort)
      b.putInt(0).putInt(0)
      b.array()
    }

    /** SST payload as a list of records (SST + CONTINUEs). A string that
      * crosses a record boundary restarts with a fresh grbit byte in the
      * continuation, per spec.
      */
    def sstRecords(): Seq[Array[Byte]] = {
      val recs = ArrayBuffer[Array[Byte]]()
      var cur = new ByteArrayOutputStream()
      val head = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      head.putInt(refs).putInt(sstIndex.size)
      cur.write(head.array())
      var first = true
      def flush(): Unit = {
        recs += record(if (first) 0x00FC else 0x003C, cur.toByteArray)
        first = false; cur = new ByteArrayOutputStream()
      }
      for (s <- sstIndex.keys) {
        val wide = s.exists(_ > 0xFF)
        val charBytes = if (wide) s.getBytes("UTF-16LE") else s.map(_.toByte).toArray
        val unit = if (wide) 2 else 1
        // header must not be split from its first character
        if (cur.size() + 3 + unit > MaxRecData) flush()
        val hdr = ByteBuffer.allocate(3).order(ByteOrder.LITTLE_ENDIAN)
        hdr.putShort(s.length.toShort).put(if (wide) 1.toByte else 0.toByte)
        cur.write(hdr.array())
        var off = 0
        while (off < charBytes.length) {
          var room = MaxRecData - cur.size()
          if (room < unit) {
            flush()
            cur.write(if (wide) 1 else 0) // continuation grbit
            room = MaxRecData - cur.size()
          }
          val take = math.min(charBytes.length - off, (room / unit) * unit)
          cur.write(charBytes, off, take)
          off += take
        }
      }
      flush()
      recs.toSeq
    }

    def sheetBytes(rows: Seq[Seq[XVal]]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(record(0x0809, bofData(0x0010)))
      val maxCols = if (rows.isEmpty) 0 else rows.map(_.length).max
      val dim = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
      dim.putInt(0).putInt(rows.length).putShort(0.toShort)
        .putShort(maxCols.toShort).putShort(0.toShort)
      o.write(record(0x0200, dim.array()))
      for ((r, ri) <- rows.zipWithIndex; (v, ci) <- r.zipWithIndex) v match {
        case XNum(d) =>
          val b = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
          b.putShort(ri.toShort).putShort(ci.toShort).putShort(0.toShort).putDouble(d)
          o.write(record(0x0203, b.array()))
        case XStr(s) =>
          val b = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
          b.putShort(ri.toShort).putShort(ci.toShort).putShort(0.toShort)
            .putInt(sstIndex(s))
          o.write(record(0x00FD, b.array()))
      }
      o.write(record(0x000A, Array.emptyByteArray))
      o.toByteArray
    }

    // globals with BOUNDSHEET offsets patched after layout is known
    val sheetImgs = sheets.map { case (_, rows) => sheetBytes(rows) }
    def globals(positions: Seq[Int]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(record(0x0809, bofData(0x0005)))
      for (((name, _), pos) <- sheets.zip(positions)) {
        val nm = name.map(_.toByte).toArray // sheet names kept ASCII
        val b = ByteBuffer.allocate(8 + nm.length).order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(pos).putShort(0.toShort).put(nm.length.toByte).put(0.toByte).put(nm)
        o.write(record(0x0085, b.array()))
      }
      if (sstIndex.nonEmpty) sstRecords().foreach(o.write)
      o.write(record(0x000A, Array.emptyByteArray))
      o.toByteArray
    }
    // globals length is position-independent (offsets are fixed-width)
    val gLen = globals(sheets.map(_ => 0)).length
    val positions = sheetImgs.scanLeft(gLen)(_ + _.length).init
    val o = new ByteArrayOutputStream()
    o.write(globals(positions))
    sheetImgs.foreach(o.write)
    cfbWrap(o.toByteArray)
  }

  // ------------------------------------------------------------- reading

  /** Cursor over SST/CONTINUE payload chunks: byte reads cross chunk
    * boundaries transparently; character reads re-read the per-chunk
    * grbit when a string's character run straddles a boundary.
    */
  private final class SstCursor(chunks: IndexedSeq[Array[Byte]]) {
    private var ci = 0; private var off = 8 // skip cstTotal/cstUnique
    private def ensure(): Unit =
      while (ci < chunks.length && off >= chunks(ci).length) { ci += 1; off = 0 }
    def hasMore: Boolean = { ensure(); ci < chunks.length }
    def u8(): Int = { ensure(); val v = chunks(ci)(off) & 0xFF; off += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Long = u16().toLong | (u16().toLong << 16)
    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        ensure()
        val take = math.min(left, (chunks(ci).length - off).toLong)
        off += take.toInt; left -= take
      }
    }
    def chars(cch: Int, grbit0: Int): String = {
      val sb = new java.lang.StringBuilder(cch)
      var wide = (grbit0 & 1) != 0
      var left = cch
      while (left > 0) {
        // character data that crosses into the next CONTINUE restarts
        // with a fresh grbit byte (strings split at char boundaries)
        if (ci >= chunks.length) sys.error("SST truncated")
        if (off >= chunks(ci).length || (wide && chunks(ci).length - off < 2)) {
          ci += 1; off = 0
          wide = (u8() & 1) != 0
        } else {
          val unit = if (wide) 2 else 1
          val take = math.min(left, (chunks(ci).length - off) / unit)
          if (wide) sb.append(new String(chunks(ci), off, take * 2, "UTF-16LE"))
          else (0 until take).foreach(i => sb.append((chunks(ci)(off + i) & 0xFF).toChar))
          off += take * unit; left -= take
        }
      }
      sb.toString
    }
  }

  private def parseSst(chunks: IndexedSeq[Array[Byte]]): IndexedSeq[String] = {
    val first = chunks.head
    val unique = ByteBuffer.wrap(first).order(ByteOrder.LITTLE_ENDIAN).getInt(4)
    val cur = new SstCursor(chunks)
    val out = ArrayBuffer[String]()
    var i = 0
    while (i < unique && cur.hasMore) {
      val cch = cur.u16()
      val grbit = cur.u8()
      val cRun = if ((grbit & 0x08) != 0) cur.u16() else 0
      val cbExt = if ((grbit & 0x04) != 0) cur.u32() else 0L
      out += cur.chars(cch, grbit)
      cur.skip(4L * cRun + cbExt)
      i += 1
    }
    out.toIndexedSeq
  }

  /** Decode an RK-encoded number: bit0 = ÷100, bit1 = 30-bit int vs
    * truncated IEEE double (high 32 bits, low 2 masked).
    */
  def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble(((rk & 0xFFFFFFFC).toLong & 0xFFFFFFFFL) << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  /** Parse every cell of a complete .xls file image. */
  def parseXls(file: Array[Byte]): Seq[Cell] = {
    val wb = cfbWorkbook(file)
    val buf = ByteBuffer.wrap(wb).order(ByteOrder.LITTLE_ENDIAN)
    // pass 1: BOUNDSHEET names by substream offset, SST chunks
    val sheetsByPos = scala.collection.mutable.TreeMap[Int, String]()
    val sstChunks = ArrayBuffer[Array[Byte]]()
    var off = 0
    var inSst = false
    while (off + 4 <= wb.length) {
      val id = buf.getShort(off) & 0xFFFF
      val len = buf.getShort(off + 2) & 0xFFFF
      val data = off + 4
      id match {
        case 0x0085 =>
          val pos = buf.getInt(data)
          val cch = wb(data + 6) & 0xFF
          val wide = (wb(data + 7) & 1) != 0
          val name = if (wide) new String(wb, data + 8, cch * 2, "UTF-16LE")
            else new String(wb, data + 8, cch, "ISO-8859-1")
          sheetsByPos(pos) = name
          inSst = false
        case 0x00FC =>
          sstChunks += java.util.Arrays.copyOfRange(wb, data, data + len); inSst = true
        case 0x003C if inSst =>
          sstChunks += java.util.Arrays.copyOfRange(wb, data, data + len)
        case _ => inSst = false
      }
      off += 4 + len
    }
    val sst: IndexedSeq[String] =
      if (sstChunks.nonEmpty) parseSst(sstChunks.toIndexedSeq) else IndexedSeq.empty

    // pass 2: cells, attributed to the enclosing sheet substream
    val cells = ArrayBuffer[Cell]()
    var sheet = ""
    var sheetIdx = 0
    var pendingFormulaStr: Option[(Int, Int)] = None
    off = 0
    while (off + 4 <= wb.length) {
      val id = buf.getShort(off) & 0xFFFF
      val len = buf.getShort(off + 2) & 0xFFFF
      val d = off + 4
      id match {
        case 0x0809 if len >= 4 && (buf.getShort(d + 2) & 0xFFFF) == 0x0010 =>
          sheet = sheetsByPos.get(off).orElse(sheetsByPos.values.toSeq.lift(sheetIdx))
            .getOrElse(s"sheet$sheetIdx")
          sheetIdx += 1
        case 0x0203 => // NUMBER
          cells += Cell(sheet, buf.getShort(d) & 0xFFFF, buf.getShort(d + 2) & 0xFFFF,
            "n", buf.getDouble(d + 6), null)
        case 0x027E => // RK
          cells += Cell(sheet, buf.getShort(d) & 0xFFFF, buf.getShort(d + 2) & 0xFFFF,
            "n", rkValue(buf.getInt(d + 6)), null)
        case 0x00BD => // MULRK: row, colFirst, (xf,rk)*, colLast
          val row = buf.getShort(d) & 0xFFFF
          val colFirst = buf.getShort(d + 2) & 0xFFFF
          val n = (len - 6) / 6
          for (i <- 0 until n)
            cells += Cell(sheet, row, colFirst + i, "n",
              rkValue(buf.getInt(d + 4 + 6 * i + 2)), null)
        case 0x00FD => // LABELSST
          val idx = buf.getInt(d + 6)
          cells += Cell(sheet, buf.getShort(d) & 0xFFFF, buf.getShort(d + 2) & 0xFFFF,
            "s", null, if (idx >= 0 && idx < sst.length) sst(idx) else null)
        case 0x0204 => // LABEL (inline, pre-SST form)
          val cch = buf.getShort(d + 6) & 0xFFFF
          val wide = (wb(d + 8) & 1) != 0
          val s = if (wide) new String(wb, d + 9, cch * 2, "UTF-16LE")
            else new String(wb, d + 9, cch, "ISO-8859-1")
          cells += Cell(sheet, buf.getShort(d) & 0xFFFF, buf.getShort(d + 2) & 0xFFFF,
            "s", null, s)
        case 0x0205 => // BOOLERR
          val isErr = wb(d + 7) != 0
          cells += Cell(sheet, buf.getShort(d) & 0xFFFF, buf.getShort(d + 2) & 0xFFFF,
            if (isErr) "e" else "b", (wb(d + 6) & 0xFF).toDouble, null)
        case 0x0006 => // FORMULA: cached result
          val row = buf.getShort(d) & 0xFFFF
          val col = buf.getShort(d + 2) & 0xFFFF
          if ((buf.getShort(d + 12) & 0xFFFF) == 0xFFFF) (wb(d + 6) & 0xFF) match {
            case 0 => pendingFormulaStr = Some((row, col)) // STRING record follows
            case 1 => cells += Cell(sheet, row, col, "b", (wb(d + 8) & 0xFF).toDouble, null)
            case 2 => cells += Cell(sheet, row, col, "e", (wb(d + 8) & 0xFF).toDouble, null)
            case _ => cells += Cell(sheet, row, col, "s", null, "")
          }
          else cells += Cell(sheet, row, col, "n", buf.getDouble(d + 6), null)
        case 0x0207 => // STRING: cached string formula result
          pendingFormulaStr.foreach { case (row, col) =>
            val cch = buf.getShort(d) & 0xFFFF
            val wide = (wb(d + 2) & 1) != 0
            val s = if (wide) new String(wb, d + 3, cch * 2, "UTF-16LE")
              else new String(wb, d + 3, cch, "ISO-8859-1")
            cells += Cell(sheet, row, col, "s", null, s)
          }
          pendingFormulaStr = None
        case _ => ()
      }
      off += 4 + len
    }
    cells.toSeq
  }

  // ==================================================== Spark data plane

  private def hadoopConfMap(spark: SparkSession): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    spark.sparkContext.hadoopConfiguration.asScala.map(e => e.getKey -> e.getValue).toMap
  }

  private def restoreConf(m: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    m.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Read every cell of every .xls matching `pattern` into long form
    * `(path, sheet, row, col, kind, num, str)`. The driver only lists
    * paths; each file is fetched and parsed inside one executor task
    * (file-level parallelism — an xls is ≤65536 rows by format, so the
    * file is the natural split unit).
    */
  def read(spark: SparkSession, pattern: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(pattern)
    val fs = p.getFileSystem(hconf)
    val statuses = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    val paths = statuses.filter(_.isFile).map(_.getPath.toString).sorted
    val confMap = hadoopConfMap(spark)
    val parallelism = math.max(1, math.min(paths.length, spark.sparkContext.defaultParallelism))
    val rows = spark.sparkContext.parallelize(paths, math.max(parallelism, 1))
      .flatMap { pathStr =>
        val conf = restoreConf(confMap)
        val path = new org.apache.hadoop.fs.Path(pathStr)
        val pfs = path.getFileSystem(conf)
        val in = pfs.open(path)
        val bytes =
          try {
            val b = new Array[Byte](pfs.getFileStatus(path).getLen.toInt)
            in.readFully(0, b)
            b
          } finally in.close()
        parseXls(bytes).map(c =>
          Row(pathStr, c.sheet, c.row, c.col, c.kind, c.num, c.str))
      }
    spark.createDataFrame(rows, cellSchema)
  }

  /** Pivot numeric long-form cells into a headerless fixed-width grid:
    * one row per `(path, sheet, row)` with columns `_c0.._c{n-1}` — the
    * shape `pd.read_excel(header=None)` hands the reference. One
    * partial-aggregable groupBy (max of at most one value per slot), no
    * joins.
    */
  def headerless(cells: DataFrame, nCols: Int): DataFrame =
    cells.filter(col("kind") === "n" && col("col") < nCols)
      .groupBy(col("path"), col("sheet"), col("row"))
      .agg(max(when(col("col") === 0, col("num"))).as("_c0"),
        (1 until nCols).map(i =>
          max(when(col("col") === i, col("num"))).as(s"_c$i")): _*)

  /** Export `df` as one workbook per distinct value of `keyCol`, written
    * at `dir/<key>.xls` — the vendor-export shape (K5/S9). Executor-side
    * end to end: hash-repartition on the key, sort within partitions,
    * then each task streams its keys' rows into workbook images (sheets
    * split as `p0, p1, …` past the 65536-row format cap). Only numeric
    * payload columns are allowed; the driver never sees a row.
    */
  def writeKeyed(df: DataFrame, dir: String, keyCol: String,
      orderCols: Seq[String], valueCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val confMap = hadoopConfMap(spark)
    val sel = df.select(col(keyCol).cast("string").as(keyCol) +:
        orderCols.filterNot(valueCols.contains).map(col) ++:
        valueCols.map(c => col(c).cast("double").as(c)): _*)
      .repartition(col(keyCol))
      .sortWithinPartitions((keyCol +: orderCols).map(col): _*)
      .select((keyCol +: valueCols).map(col): _*)
    val nVals = valueCols.length
    sel.foreachPartition { (it: Iterator[Row]) =>
      val conf = restoreConf(confMap)
      def flush(key: String, rows: ArrayBuffer[Seq[XVal]]): Unit = if (rows.nonEmpty) {
        val sheets = rows.grouped(MaxSheetRows).zipWithIndex
          .map { case (g, i) => (s"p$i", g.toSeq) }.toSeq
        val bytes = workbookBytes(sheets)
        val out = new org.apache.hadoop.fs.Path(s"$dir/$key.xls")
        val fs = out.getFileSystem(conf)
        val os = fs.create(out, true)
        try os.write(bytes) finally os.close()
        rows.clear()
      }
      var curKey: String = null
      val buf = ArrayBuffer[Seq[XVal]]()
      for (r <- it) {
        val k = String.valueOf(r.get(0))
        if (k != curKey) { if (curKey != null) flush(curKey, buf); curKey = k }
        buf += (1 to nVals).map(i => XNum(r.getDouble(i)))
      }
      if (curKey != null) flush(curKey, buf)
    }
  }
}
