package graft

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.functions.PdfCodec

/** The real-PDF decode chain: the codec against hand-built documents
  * covering every structural path, then the whole committed corpus
  * against the expected-text sidecar — which tools/gen_pdfs.py derives
  * from the SOURCE statements, never from this codec, so the
  * comparison is two independent routes to the same text.
  */
class PdfCodecSpec extends SparkTestBase {

  private def decode(bytes: Array[Byte]): String = {
    val r = PdfCodec.extractText(bytes)
    if (r == null) null else r.toString
  }

  private def wrap(body: Array[Byte], filter: String = ""): Array[Byte] = {
    val head = s"%PDF-1.4\n1 0 obj\n<< $filter/Length ${body.length} >>\nstream\n"
      .getBytes(ISO_8859_1)
    val tail = "\nendstream\nendobj\ntrailer\n%%EOF\n".getBytes(ISO_8859_1)
    head ++ body ++ tail
  }

  private def deflate(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](65536)
    val n = d.deflate(buf); d.end()
    java.util.Arrays.copyOf(buf, n)
  }

  test("literal strings: escapes, octal, nesting, continuation") {
    val content = "BT (a\\(b\\)c) Tj (nest (ed) ok) Tj (oct\\101l) Tj " +
      "(tab\\there) Tj (sp\\\nlit) Tj ET"
    assert(decode(wrap(content.getBytes("UTF-8"))) ==
      "a(b)c\nnest (ed) ok\noctAl\ntab\there\nsplit\n")
  }

  test("hex strings decode, odd final digit pads low nibble") {
    // 48656C6C6F = Hello; odd <41 2> -> 'A' then 0x20
    val content = "BT <48656C6C6F> Tj <41 2> Tj ET"
    assert(decode(wrap(content.getBytes("UTF-8"))) == "Hello\nA \n")
  }

  test("TJ concatenates kerned segments into one line; ' and \" show too") {
    val content = "BT [(Fu) -40 (nd)] TJ (x) ' (y) \" ET"
    assert(decode(wrap(content.getBytes("UTF-8"))) == "Fund\nx\ny\n")
  }

  test("FlateDecode streams inflate; UTF-8 text survives byte-exact") {
    val text = "BT (基金代码：000162) Tj ET"
    assert(decode(wrap(deflate(text), filter = "/Filter /FlateDecode ")) ==
      "基金代码：000162\n")
  }

  test("nested sub-dictionary keeps the outer dict's /Filter (balanced scan)") {
    // /DecodeParms carries its own << >>; lastIndexOf-style dict
    // discovery would land on the INNER '<<' and lose /FlateDecode,
    // feeding deflate bytes to the text scanner as if they were ops
    val text = "BT (nested ok) Tj ET"
    val got = decode(wrap(deflate(text),
      filter = "/Filter /FlateDecode /DecodeParms << /Predictor 1 /Columns 4 >> "))
    assert(got == "nested ok\n", s"got: $got")
  }

  test("non-content streams (XMP-shaped XML) emit nothing: BT-gated showing") {
    // an uncompressed metadata stream full of XML: '<'+hex runs, and
    // attribute quotes followed by whitespace look like ' / " showing
    // ops — outside BT...ET nothing may emit
    val xmp = """<?xpacket begin="" id="ab"?> <x:xmpmeta xmlns:x="adobe">
      |<rdf:Description dc:format="application/pdf" xml:lang="x" />
      |</x:xmpmeta> <?xpacket end="w"?>""".stripMargin
    val doc = (s"%PDF-1.4\n1 0 obj\n<< /Type /Metadata /Length ${xmp.getBytes("UTF-8").length} >>\nstream\n"
      .getBytes(ISO_8859_1) ++ xmp.getBytes("UTF-8")
      ++ "\nendstream\nendobj\n".getBytes(ISO_8859_1)
      ++ wrap("BT (real page) Tj ET".getBytes("UTF-8")).drop("%PDF-1.4\n".length))
    assert(decode(doc) == "real page\n")
  }

  test("the word 'stream' inside a string object cannot derail extraction") {
    // an Info-style object whose /Title contains the bare word: the
    // match has no following EOL, so it is not the stream keyword —
    // pairing it with the wrong dict would skip the real page stream
    val title = "1 0 obj\n<< /Title (Quarterly income stream) >>\nendobj\n"
      .getBytes(ISO_8859_1)
    val doc = "%PDF-1.4\n".getBytes(ISO_8859_1) ++ title ++
      wrap(deflate("BT (page text) Tj ET"), filter = "/Filter /FlateDecode ")
        .drop("%PDF-1.4\n".length)
    assert(decode(doc) == "page text\n")
  }

  test("operators need a leading boundary: /TJ names and glued runs don't show") {
    // /TJ here is a NAME (font resource) — the '/' introducer means the
    // TJ token is not an operator and must not emit a spurious line
    val named = "BT (keep) Tj /TJ 12 Tf (more) Tj ET"
    assert(decode(wrap(named.getBytes("UTF-8"))) == "keep\nmore\n")
    // a glued run must not toggle the BT gate…
    assert(decode(wrap("SUBT (noise) Tj".getBytes("UTF-8"))) == "")
    // …while delimiter-separated operators (no whitespace) still work
    assert(decode(wrap("BT (x)Tj ET".getBytes("UTF-8"))) == "x\n")
  }

  test("failure contract: bad magic null, corrupt flate empty, lying Length recovers") {
    assert(decode("GIF89a nope".getBytes(ISO_8859_1)) == null)
    assert(decode(Array[Byte]()) == null)
    // corrupt deflate payload: stream skipped, file decodes to ""
    val corrupt = wrap(Array[Byte](-1, -2, -3, -4), filter = "/Filter /FlateDecode ")
    assert(decode(corrupt) == "")
    // /Length lies (too small): endstream-scan fallback still finds the text
    val body = "BT (recovered) Tj ET".getBytes("UTF-8")
    val lying = (s"%PDF-1.4\n1 0 obj\n<< /Length 2 >>\nstream\n".getBytes(ISO_8859_1)
      ++ body ++ "\nendstream\nendobj\n%%EOF\n".getBytes(ISO_8859_1))
    assert(decode(lying) == "recovered\n")
  }

  test("committed corpus: every PDF decodes byte-exactly to the sidecar text") {
    val expected = spark.read
      .parquet(operators.FundEtl.statementsRealDir + "/expected.parquet")
      .select(col("file_name"), col("batch_date"), col("content"), col("pdf_ok"))
      .collect()
      .map(r => (r.getString(0), (r.getString(1), r.getString(2), r.getBoolean(3))))
      .toMap
    assert(expected.size >= 50)
    var flate = 0
    expected.foreach { case (name, (date, text, ok)) =>
      val bytes = Files.readAllBytes(
        Paths.get(operators.FundEtl.statementsRealDir, date, name))
      if (new String(bytes.take(512), ISO_8859_1).contains("/FlateDecode")) flate += 1
      val got = decode(bytes)
      if (!ok) assert(got == null, s"$name should fail the magic check")
      else assert(got == text, s"$name decode mismatch:\n$got\nvs\n$text")
    }
    // the corpus exercises both the compressed and the plain path
    assert(flate >= 10 && flate < expected.size)
  }

  test("etl_pdf_text: defects surface as flags, never as dropped rows") {
    val out = operators.FundEtl.etlPdfText(spark, sfDir)
      .select(col("file_name"), col("pdf_ok"), col("valid")).collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    assert(out.length >= 52)
    val byName = out.map(t => (t._1, t)).toMap
    val notpdf = byName.keys.find(_.startsWith("notpdf_")).get
    val badzlib = byName.keys.find(_.startsWith("badzlib_")).get
    assert(byName(notpdf)._2 == false && byName(notpdf)._3 == false)
    assert(byName(badzlib)._2 == true && byName(badzlib)._3 == false)
    assert(out.count(_._3) >= 40, "the bulk of the corpus extracts cleanly")
  }
}
