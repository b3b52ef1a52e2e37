package graft

import graft.sources.Xls
import graft.sources.Xls.{XNum, XStr}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.{ByteBuffer, ByteOrder}

/** BIFF8 .xls reader/writer (SURVEY §2.1 S9). Roundtrips cover both CFB
  * placements (mini-stream under 4096 bytes, FAT + DIFAT chains above),
  * SST CONTINUE splits, and the compact cell encodings (RK/MULRK/
  * FORMULA) that the writer never emits but vendor files use — those are
  * exercised against hand-built record images from the public MS-XLS
  * layout, so reader correctness never depends on writer symmetry.
  */
class XlsSpec extends AnyFunSuite with SharedSpark {

  test("small workbook roundtrips through the mini-stream path") {
    val rows = Seq(
      Seq[Xls.XVal](XNum(1.5), XStr("alpha"), XNum(-3.25)),
      Seq[Xls.XVal](XStr("führung 中文"), XNum(42060.0)))
    val bytes = Xls.workbookBytes(Seq("bars" -> rows))
    assert(bytes.length < 4096 + 512 * 4, "tiny workbook should use the mini-stream")
    val cells = Xls.parseXls(bytes)
    assert(cells.map(c => (c.sheet, c.row, c.col, c.kind)) === Seq(
      ("bars", 0, 0, "n"), ("bars", 0, 1, "s"), ("bars", 0, 2, "n"),
      ("bars", 1, 0, "s"), ("bars", 1, 1, "n")))
    assert(cells.filter(_.kind == "n").map(_.num.doubleValue) === Seq(1.5, -3.25, 42060.0))
    assert(cells.filter(_.kind == "s").map(_.str) === Seq("alpha", "führung 中文"))
  }

  test("large multi-sheet workbook roundtrips through FAT sectors, exact doubles") {
    val rnd = new scala.util.Random(7)
    val sheets = (0 until 2).map { s =>
      s"p$s" -> (0 until 3000).map(r =>
        Seq[Xls.XVal](XNum(r + s * 3000.0), XNum(rnd.nextDouble() * 1e9 - 5e8)))
    }
    val bytes = Xls.workbookBytes(sheets)
    assert(bytes.length > 4096, "must exercise the FAT path")
    val cells = Xls.parseXls(bytes)
    assert(cells.length === 12000)
    val bySheet = cells.groupBy(_.sheet)
    assert(bySheet.keySet === Set("p0", "p1"))
    // doubles are written as raw IEEE bytes: roundtrip must be bit-exact
    val expect = sheets.flatMap { case (n, rows) =>
      rows.zipWithIndex.flatMap { case (r, ri) =>
        r.zipWithIndex.map { case (XNum(v), ci) => (n, ri, ci, v); case _ => fail() } }
    }.toSet
    assert(cells.map(c => (c.sheet, c.row, c.col, c.num.doubleValue)).toSet === expect)
  }

  test("SST splits into CONTINUE records past 8224 bytes and reparses") {
    // >8224 bytes of pooled strings, mixing narrow + wide, plus one
    // string long enough to straddle a record boundary mid-characters
    val longStr = "x" * 9000
    val many = (0 until 300).map(i => s"str_${i}_${"y" * 40}")
    val wide = (0 until 50).map(i => s"宽字符_$i")
    val all = (longStr +: (many ++ wide)).map(s => Seq[Xls.XVal](XStr(s)))
    val cells = Xls.parseXls(Xls.workbookBytes(Seq("s" -> all)))
    assert(cells.map(_.str) === (longStr +: (many ++ wide)))
  }

  test("reader decodes RK, MULRK, BOOLERR and FORMULA records from raw BIFF") {
    def rec(id: Int, data: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(4 + data.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(id.toShort).putShort(data.length.toShort).put(data); b.array()
    }
    def bof(dt: Int) = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(0x0600.toShort).putShort(dt.toShort); b.array()
    }
    // RK encodings: int (1234 << 2 | 0b10), int/100, double (bits of 2.5)
    def rkInt(v: Int, div100: Boolean) = (v << 2) | 2 | (if (div100) 1 else 0)
    val rkDouble25 = { // high 32 bits of IEEE 2.5, low 2 bits cleared
      val bits = java.lang.Double.doubleToLongBits(2.5)
      ((bits >>> 32) & 0xFFFFFFFCL).toInt
    }
    val sheet = new java.io.ByteArrayOutputStream()
    sheet.write(rec(0x0809, bof(0x0010)))
    val rk = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
    rk.putShort(0.toShort).putShort(0.toShort).putShort(0.toShort).putInt(rkInt(1234, div100 = false))
    sheet.write(rec(0x027E, rk.array()))
    val mulrk = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
    mulrk.putShort(1.toShort).putShort(3.toShort) // row 1, cols 3..4
    mulrk.putShort(0.toShort).putInt(rkInt(-777, div100 = true))
    mulrk.putShort(0.toShort).putInt(rkDouble25)
    mulrk.putShort(4.toShort)
    sheet.write(rec(0x00BD, mulrk.array()))
    val be = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    be.putShort(2.toShort).putShort(0.toShort).putShort(0.toShort).put(1.toByte).put(0.toByte)
    sheet.write(rec(0x0205, be.array()))
    val fm = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    fm.putShort(3.toShort).putShort(0.toShort).putShort(0.toShort).putDouble(99.5)
    sheet.write(rec(0x0006, fm.array()))
    sheet.write(rec(0x000A, Array.emptyByteArray))

    val globals = new java.io.ByteArrayOutputStream()
    globals.write(rec(0x0809, bof(0x0005)))
    val bs = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
    // lbPlyPos = globals length: BOF(20) + BOUNDSHEET(14) + EOF(4)
    bs.putInt(38).putShort(0.toShort).put(2.toByte).put(0.toByte).put('r'.toByte).put('k'.toByte)
    globals.write(rec(0x0085, bs.array()))
    globals.write(rec(0x000A, Array.emptyByteArray))
    assert(globals.size() === 38)
    globals.write(sheet.toByteArray)

    val cells = Xls.parseXls(Xls.cfbWrap(globals.toByteArray))
    val byPos = cells.map(c => (c.row, c.col) -> c).toMap
    assert(byPos((0, 0)).num.doubleValue === 1234.0)
    assert(byPos((1, 3)).num.doubleValue === -7.77)
    assert(byPos((1, 4)).num.doubleValue === 2.5)
    assert(byPos((2, 0)).kind === "b" && byPos((2, 0)).num.doubleValue === 1.0)
    assert(byPos((3, 0)).kind === "n" && byPos((3, 0)).num.doubleValue === 99.5)
    assert(cells.forall(_.sheet === "rk"))
  }

  test("Spark read parses files in executors; writeKeyed exports per key") {
    val s = spark
    import org.apache.spark.sql.functions._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_xls_spec_${ProcessHandle.current().pid()}"
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)

    val df = s.range(0, 200)
      .select((col("id") % 3).cast("string").as("k"),
        col("id").cast("double").as("ord"),
        (col("id") * 2.5).as("v1"), (col("id") * -1.0).as("v2"))
    Xls.writeKeyed(df, dir, "k", Seq("ord"), Seq("ord", "v1", "v2"))

    val back = Xls.read(s, s"$dir/*.xls")
    assert(back.select("path").distinct().count() === 3)
    val grid = Xls.headerless(back, 3)
      .withColumn("k", regexp_extract(col("path"), "([^/]+)\\.xls$", 1))
    val rows = grid.select("k", "_c0", "_c1", "_c2").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    val expect = (0L until 200L).map(i => ((i % 3).toString, i.toDouble, i * 2.5, i * -1.0)).toSet
    assert(rows === expect)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
  }

  test("writeKeyed splits a sheet past the 65536-row format cap") {
    val s = spark
    import org.apache.spark.sql.functions._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_xls_cap_${ProcessHandle.current().pid()}"
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    val n = Xls.MaxSheetRows + 1000
    val df = s.range(0, n).select(lit("only").as("k"),
      col("id").cast("double").as("ord"), (col("id") * 1.0).as("v"))
    Xls.writeKeyed(df, dir, "k", Seq("ord"), Seq("ord", "v"))
    val back = Xls.read(s, s"$dir/*.xls")
    assert(back.select("sheet").distinct().count() === 2)
    val total = Xls.headerless(back, 2).count()
    assert(total === n)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
  }
}
