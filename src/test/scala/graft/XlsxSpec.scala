package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.sources.XlsxCodec

/** The XLSX chain: codec round-trip (read(write(x)) == x), the
  * committed corpus (written by the independent Python generator)
  * against its source-derived sidecar, and the ingest operator's
  * failure contract.
  */
class XlsxSpec extends SparkTestBase {

  test("round trip: strings, numbers, XML specials, unicode, shared-string dedup") {
    val rows = Seq(
      Seq("产品名称：创新成长", "38394.88", "a&b<c>d\"e"),
      Seq("确认日期：2024-01-15", "-12.5", "产品名称：创新成长"), // repeats → dedups
      Seq("", "7", ""))
    val bytes = XlsxCodec.writeSheet(rows)
    val back = XlsxCodec.readSheet(bytes)
    assert(back.map(_.toSeq).toSeq == rows)
    // the repeated string really went through sharedStrings once
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    var sst = ""
    var e = zin.getNextEntry
    while (e != null) {
      if (e.getName == "xl/sharedStrings.xml")
        sst = new String(zin.readAllBytes(), "UTF-8")
      e = zin.getNextEntry
    }
    assert("创新成长".r.findAllIn(sst).size == 1)
    assert(sst.contains("a&amp;b&lt;c&gt;d"))
  }

  test("CR survives the round trip as a charref; XML-illegal controls go to U+FFFD") {
    // a raw \r in character data is normalized to \n by conforming
    // parsers — the writer must emit &#xD; for read(write(x)) == x
    val back = XlsxCodec.readSheet(XlsxCodec.writeSheet(Seq(Seq("a\rb", "c\r\nd"))))
    assert(back(0)(0) == "a\rb" && back(0)(1) == "c\r\nd")
    // U+0001 has no XML 1.0 representation at all: the writer stays
    // total (U+FFFD) instead of producing a workbook its own reader
    // must reject
    val ctl = XlsxCodec.readSheet(XlsxCodec.writeSheet(Seq(Seq("x\u0001y"))))
    assert(ctl(0)(0) == "x\ufffdy")
  }

  test("sparse rows fill gaps via cell references; bare sheets read empty") {
    // hand-built sheet with a missing A cell and an out-of-order ref
    val grid = XlsxCodec.readSheet(XlsxCodec.writeSheet(Seq(Seq("x"))))
    assert(grid.map(_.toSeq).toSeq == Seq(Seq("x")))
    assert(XlsxCodec.readSheet("junk".getBytes("UTF-8")) == null)
    assert(XlsxCodec.sheetText("junk".getBytes("UTF-8")) == null)
  }

  test("rich-text inlineStr runs concatenate into one cell value") {
    // what Excel writes for mixed formatting: one <t> per run inside
    // <is> — the cell value is their concatenation, not the last run
    val sheet =
      """<?xml version="1.0" encoding="UTF-8"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><r><t>Hello </t></r>
        |<r><t>Wor</t></r><r><t>ld</t></r></is></c>
        |<c r="B1"><v>42</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    z.write(sheet.getBytes("UTF-8")); z.closeEntry(); z.close()
    val grid = XlsxCodec.readSheet(bos.toByteArray)
    assert(grid.map(_.toSeq).toSeq == Seq(Seq("Hello World", "42")),
      s"got: ${grid.map(_.toSeq).toSeq}")
  }

  test("committed corpus: every workbook decodes to the sidecar text") {
    val expected = spark.read
      .parquet(operators.FundEtl.statementsXlsxDir + "/expected.parquet")
      .collect()
      .map(r => (r.getString(0), (r.getString(1), r.getString(2), r.getBoolean(3))))
      .toMap
    assert(expected.size >= 50)
    expected.foreach { case (name, (date, text, ok)) =>
      val bytes = Files.readAllBytes(
        Paths.get(operators.FundEtl.statementsXlsxDir, date, name))
      val got = XlsxCodec.sheetText(bytes)
      if (!ok) assert(got == null, s"$name should fail the container check")
      else assert(got == text, s"$name decode mismatch")
      // the numeric column-B cells decode as raw numerals
      if (ok) {
        val grid = XlsxCodec.readSheet(bytes)
        assert(grid.forall(r => r.length == 2 && r(1).forall(_.isDigit)))
      }
    }
  }

  test("etl_xlsx_ingest: defects surface as flags, never as dropped rows") {
    val out = operators.FundEtl.etlXlsxIngest(spark, sfDir)
      .select(col("file_name"), col("xlsx_ok"), col("valid")).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    assert(out.length >= 51)
    val bad = out.find(_._1.startsWith("notzip_")).get
    assert(bad._2 == false && bad._3 == false)
    assert(out.count(_._3) >= 40, "the bulk of the corpus extracts cleanly")
  }

  test("Xlsx.rows: distributed cell grid with per-file failure rows") {
    val rows = graft.sources.Xlsx.rows(spark, operators.FundEtl.statementsXlsxDir)
    val bad = rows.filter(col("row_num") === -1).collect()
    assert(bad.length == 1 && bad.head.getString(0).startsWith("notzip_"))
    val one = rows.filter(col("file_name") === "changliang_fenhong_20240115.xlsx")
      .orderBy(col("row_num")).collect()
    assert(one.nonEmpty && one.head.getSeq[String](3).length == 2)
  }
}
