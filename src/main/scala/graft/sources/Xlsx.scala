package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal XLSX I/O — JDK-only (`java.util.zip` + StAX), against the
  * public OOXML spreadsheet structure (ECMA-376: a ZIP of XML parts).
  * The reference both writes spreadsheets (`dividend_extractor.py:1451`
  * `pd.ExcelWriter`) and ingests statement workbooks; the pinned
  * environment has no spark-excel jar, but none is needed for the
  * text/number subset a statement uses: sharedStrings.xml + the sheet
  * part cover it.
  *
  * Reader: sheet1 cell grid as rows of strings — shared strings
  * (`t="s"`, including rich-text `<r>` runs), inline strings
  * (`t="inlineStr"`), formula-cached strings (`t="str"`), booleans and
  * raw numeric `<v>` text (numeric fidelity is the caller's cast —
  * "57.59" stays "57.59"). Sparse cells fill as "" via the `r="B3"`
  * reference; a malformed container returns null rather than throwing
  * (the per-file failed-workbook tracking every other decoder here
  * follows).
  *
  * Writer: the six mandatory parts, shared-string deduplication,
  * numeric cells written as native numbers, XML-escaped text. The
  * round-trip spec pins read(write(x)) == x.
  *
  * The StAX factory disables DTDs and external entities — workbook
  * XML is untrusted input.
  */
object XlsxCodec {

  // one factory per executor thread, not per parse call: newInstance()
  // is a ServiceLoader provider lookup, and the decode loop calls two
  // parses per workbook over many-small-files corpora. ThreadLocal
  // because XMLInputFactory makes no thread-safety promise.
  private val staxFactory =
    new ThreadLocal[javax.xml.stream.XMLInputFactory] {
      override def initialValue(): javax.xml.stream.XMLInputFactory = {
        val f = javax.xml.stream.XMLInputFactory.newInstance()
        f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
        f.setProperty("javax.xml.stream.isSupportingExternalEntities", false)
        f
      }
    }

  /** Sheet1 as a dense row-major grid, or null if the bytes are not a
    * readable workbook.
    */
  def readSheet(bytes: Array[Byte]): Array[Array[String]] = {
    try {
      var shared: Array[String] = Array.empty
      var sheet: Array[Byte] = null
      var sharedRaw: Array[Byte] = null
      val zin = new java.util.zip.ZipInputStream(new ByteArrayInputStream(bytes))
      try {
        var e = zin.getNextEntry
        var firstSheet: (String, Array[Byte]) = null
        while (e != null) {
          val name = e.getName
          if (name == "xl/sharedStrings.xml") sharedRaw = readAll(zin)
          else if (name == "xl/worksheets/sheet1.xml") sheet = readAll(zin)
          else if (sheet == null && // fallback candidates are moot once sheet1 is seen
              name.startsWith("xl/worksheets/") && name.endsWith(".xml") &&
              (firstSheet == null ||
                Ordering[(Int, String)].lt(sheetOrder(name), sheetOrder(firstSheet._1))))
            firstSheet = (name, readAll(zin))
          e = zin.getNextEntry
        }
        if (sheet == null && firstSheet != null) sheet = firstSheet._2
      } finally zin.close()
      if (sheet == null) return null
      if (sharedRaw != null) shared = parseSharedStrings(sharedRaw)
      parseSheet(sheet, shared)
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** Concatenation of the first column, one line per sheet row — the
    * "document text" view an ingest pipeline wants of a one-column
    * statement workbook.
    */
  def sheetText(bytes: Array[Byte]): String = {
    val grid = readSheet(bytes)
    if (grid == null) null
    else {
      val sb = new java.lang.StringBuilder()
      grid.foreach { row =>
        sb.append(if (row.length > 0) row(0) else "").append('\n')
      }
      sb.toString
    }
  }

  /** Numeric-suffix ordering for the no-sheet1 fallback: sheet2.xml
    * must beat sheet10.xml (lexicographic order would not).
    */
  private def sheetOrder(name: String): (Int, String) = {
    val m = "sheet(\\d+)\\.xml$".r.findFirstMatchIn(name)
    (m.map(_.group(1).toInt).getOrElse(Int.MaxValue), name)
  }

  private def readAll(in: java.io.InputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def parseSharedStrings(xml: Array[Byte]): Array[String] = {
    val out = ArrayBuffer.empty[String]
    val r = staxFactory.get().createXMLStreamReader(new ByteArrayInputStream(xml), "UTF-8")
    var cur: java.lang.StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new java.lang.StringBuilder()
            case "t" => inT = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT && cur != null =>
          cur.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => out += cur.toString; cur = null
            case "t" => inT = false
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.toArray
  }

  private def colIndex(ref: String): Int = {
    var i = 0
    var v = 0
    while (i < ref.length && ref.charAt(i) >= 'A' && ref.charAt(i) <= 'Z') {
      v = v * 26 + (ref.charAt(i) - 'A' + 1)
      i += 1
    }
    v - 1
  }

  private def parseSheet(xml: Array[Byte], shared: Array[String]): Array[Array[String]] = {
    val rows = ArrayBuffer.empty[Array[String]]
    val r = staxFactory.get().createXMLStreamReader(new ByteArrayInputStream(xml), "UTF-8")
    var cells: ArrayBuffer[(Int, String)] = null
    var nextCol = 0
    var cellCol = 0
    var cellType = ""
    // accumulated across EVERY <v>/<t> in the cell: a rich-text
    // inlineStr carries one <t> per formatting run and the cell value
    // is their concatenation — one entry per run would make flushRow's
    // last-write-wins keep only the final run
    var cellBuf: java.lang.StringBuilder = null
    var text: java.lang.StringBuilder = null
    var collecting = false
    def flushRow(): Unit = if (cells != null) {
      val width = if (cells.isEmpty) 0 else cells.map(_._1).max + 1
      val arr = Array.fill(width)("")
      cells.foreach { case (c, v) => arr(c) = v }
      rows += arr
      cells = null
    }
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => cells = ArrayBuffer.empty; nextCol = 0
            case "c" if cells != null =>
              val ref = r.getAttributeValue(null, "r")
              cellCol = if (ref != null) colIndex(ref) else nextCol
              val t = r.getAttributeValue(null, "t")
              cellType = if (t == null) "" else t
              cellBuf = null
            case "v" | "t" if cells != null =>
              text = new java.lang.StringBuilder(); collecting = true
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if collecting =>
          text.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "row" => flushRow()
            case "c" if cells != null =>
              if (cellBuf != null) cells += ((cellCol, cellBuf.toString))
              cellBuf = null
              nextCol = cellCol + 1
            case "v" | "t" if collecting =>
              collecting = false
              val raw = text.toString
              val value = cellType match {
                case "s" =>
                  val i = raw.trim.toInt
                  if (i >= 0 && i < shared.length) shared(i) else ""
                case "b" => if (raw.trim == "1") "TRUE" else "FALSE"
                case _ => raw // inlineStr/str `t` bodies and numeric `v` text
              }
              if (cellBuf == null) cellBuf = new java.lang.StringBuilder()
              cellBuf.append(value)
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    flushRow()
    rows.toArray
  }

  private val NumericCell = "^-?\\d+(\\.\\d+)?$".r

  private def xmlEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      // a literal CR is normalized to LF by every conforming XML
      // parser (XML 1.0 §2.11) — the character reference survives, so
      // read(write(x)) == x holds for CR-bearing cells
      case '\r' => sb.append("&#xD;")
      case c if c < 0x20 && c != '\t' && c != '\n' =>
        // not representable in XML 1.0 at all (even as a charref);
        // U+FFFD keeps the writer total rather than emitting a
        // workbook its own reader must reject
        sb.append('�')
      case c => sb.append(c)
    }
    sb.toString
  }

  private def colRef(c: Int): String = {
    var v = c + 1
    val sb = new java.lang.StringBuilder()
    while (v > 0) {
      val rem = (v - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      v = (v - 1) / 26
    }
    sb.toString
  }

  /** A one-sheet workbook. Cells matching a plain number serialize as
    * native numeric cells; everything else deduplicates through
    * sharedStrings.
    */
  def writeSheet(rows: Seq[Seq[String]]): Array[Byte] = {
    val sharedIdx = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sidOf(s: String): Int =
      sharedIdx.getOrElseUpdate(s, sharedIdx.size)

    val sheetXml = new java.lang.StringBuilder()
    sheetXml.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      .append("\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
    rows.zipWithIndex.foreach { case (row, ri) =>
      sheetXml.append(s"""<row r="${ri + 1}">""")
      row.zipWithIndex.foreach { case (cell, ci) =>
        val ref = s"${colRef(ci)}${ri + 1}"
        if (NumericCell.findFirstIn(cell).isDefined)
          sheetXml.append(s"""<c r="$ref"><v>$cell</v></c>""")
        else
          sheetXml.append(s"""<c r="$ref" t="s"><v>${sidOf(cell)}</v></c>""")
      }
      sheetXml.append("</row>")
    }
    sheetXml.append("</sheetData></worksheet>\n")

    val sstXml = new java.lang.StringBuilder()
    sstXml.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      .append(s"""\n<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sharedIdx.size}" uniqueCount="${sharedIdx.size}">""")
    sharedIdx.keys.foreach(s => sstXml.append(s"<si><t>${xmlEscape(s)}</t></si>"))
    sstXml.append("</sst>\n")

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/><Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>
        |""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>
        |""".stripMargin
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/></Relationships>
        |""".stripMargin
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>
        |""".stripMargin

    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    // setTimeLocal writes the DOS timestamp field directly from the
    // LocalDateTime — setTime(epochMillis) would route through the
    // machine's zone and make the emitted bytes timezone-dependent
    val fixedTime = java.time.LocalDateTime.of(1980, 1, 1, 0, 0)
    def put(name: String, body: String): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      e.setTimeLocal(fixedTime)
      z.putNextEntry(e)
      z.write(body.getBytes(UTF_8))
      z.closeEntry()
    }
    put("[Content_Types].xml", contentTypes)
    put("_rels/.rels", rootRels)
    put("xl/workbook.xml", workbook)
    put("xl/_rels/workbook.xml.rels", wbRels)
    put("xl/worksheets/sheet1.xml", sheetXml.toString)
    put("xl/sharedStrings.xml", sstXml.toString)
    z.close()
    out.toByteArray
  }
}

/** The Spark-side workbook source: a binaryFile scan (the distributed
  * object-store listing at 100 TB — statement workbooks are many small
  * files, the pathological-listing shape the scan handles, not the
  * pathological-shuffle one), per-partition decode, one output row per
  * sheet row. Nothing is per-file on the driver.
  */
object Xlsx {
  /** (file_name, batch_date, row_num, cells) — sheet1 of every .xlsx
    * under the dated dirs. Unreadable workbooks surface as one row
    * with row_num = -1 and empty cells (per-file failure tracking),
    * never as a thrown scan.
    */
  def rows(s: SparkSession, dirs: String*): DataFrame = {
    import s.implicits._
    BinaryFiles.scan(s, "*.xlsx", dirs: _*)
      .select(col("file_name"), col("batch_date"), col("content"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (name, date, bytes) =>
          val grid = XlsxCodec.readSheet(bytes)
          if (grid == null) Iterator((name, date, -1L, Array.empty[String]))
          else grid.iterator.zipWithIndex.map { case (r, i) =>
            (name, date, i.toLong, r)
          }
        }
      }
      .toDF("file_name", "batch_date", "row_num", "cells")
  }

  /** (file_name, batch_date, content) — the first-column text view,
    * decoded in the same per-partition batch; null content for an
    * unreadable workbook.
    */
  def text(s: SparkSession, dirs: String*): DataFrame = {
    import s.implicits._
    BinaryFiles.scan(s, "*.xlsx", dirs: _*)
      .select(col("file_name"), col("batch_date"), col("content"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (name, date, bytes) =>
          (name, date, Option(XlsxCodec.sheetText(bytes)))
        }
      }
      .toDF("file_name", "batch_date", "content")
  }
}
