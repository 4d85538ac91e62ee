package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimal REAL PDF text-layer decoder — JDK-only, against public
  * PDF 1.4 structure (ISO 32000 §7): the reference's native input is
  * true PDF (`conversion_extractor.py:253` `pdfplumber.open`, then
  * every extractor's per-page `extract_text()` loop). This codec
  * replaces etl_pdf_decode's stub regex with the real thing for the
  * text-layer subset a statement actually uses:
  *
  *  - xref-FREE object discovery: scan for `<<dict>> stream…endstream`
  *    spans (a damaged xref table must not kill text extraction —
  *    pdfplumber recovers the same way);
  *  - `/Length`-aware payload slicing with an endstream-scan fallback,
  *    so compressed bytes that happen to contain the ASCII word
  *    "endstream" can't truncate the stream;
  *  - `/FlateDecode` via `java.util.zip.Inflater` (the only filter a
  *    text page needs; an undamaged uncompressed stream passes as-is,
  *    any other filter is skipped);
  *  - content-stream tokenization covering the string forms of the
  *    spec — literal `(…)` with nesting, the 8 escapes, octal `\ddd`
  *    and line continuations, plus hex `<…>` — and the four
  *    text-showing operators Tj, TJ, ' and ", one extracted line per
  *    showing op (pdfplumber's extract_text joins lines the same way).
  *
  * Failure contract: no `%PDF-` magic → null (not a PDF container); a
  * stream whose inflate fails is SKIPPED (the page is damaged, the
  * file keeps whatever other pages decode) — a fully-corrupt body
  * therefore decodes to "" and surfaces downstream as valid=false,
  * the reference's per-file failed-PDF tracking.
  */
object PdfCodec {
  private val Magic = "%PDF-".getBytes("ISO-8859-1")

  /** Decoded text layer, or null when the bytes are not a PDF. */
  def extractText(bytes: Array[Byte]): UTF8String = {
    if (bytes == null || bytes.length < Magic.length) return null
    var i = 0
    while (i < Magic.length) {
      if (bytes(i) != Magic(i)) return null
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (pos >= 0 && pos < bytes.length) {
      val streamKw = {
        var k = indexOf(bytes, "stream", pos)
        while (k >= 0 && !streamKeyword(bytes, k))
          k = indexOf(bytes, "stream", k + 1)
        k
      }
      if (streamKw < 0) { pos = -1 }
      else {
        // the dict governing this stream: the << … >> span that ends
        // nearest before the keyword. The opener must be found by
        // BALANCED backward scan, not lastIndexOf — a nested
        // sub-dictionary (/DecodeParms << … >>) would otherwise
        // swallow the outer dict's /Filter and /Length keys and the
        // compressed payload would be scanned as if it were text
        val dictEnd = lastIndexOf(bytes, ">>", streamKw)
        val dictStart = if (dictEnd < 0) -1 else matchingDictStart(bytes, dictEnd)
        val dict =
          if (dictStart < 0) ""
          else new String(bytes, dictStart, dictEnd + 2 - dictStart, "ISO-8859-1")
        // payload starts after the keyword's EOL (CRLF or LF per spec)
        var dataStart = streamKw + "stream".length
        if (dataStart < bytes.length && bytes(dataStart) == '\r') dataStart += 1
        if (dataStart < bytes.length && bytes(dataStart) == '\n') dataStart += 1
        val len = parseLength(dict)
        // trust /Length only when endstream actually sits just past the
        // sliced payload (allowing the spec's one EOL) — a lying Length
        // falls back to the scan
        val lenOk = len >= 0 && dataStart + len <= bytes.length && {
          val e = indexOf(bytes, "endstream", dataStart + len)
          e >= 0 && e - (dataStart + len) <= 2
        }
        val dataEnd =
          if (lenOk) dataStart + len
          else {
            val e = indexOf(bytes, "endstream", dataStart)
            if (e < 0) bytes.length
            else {
              var t = e
              if (t > dataStart && bytes(t - 1) == '\n') t -= 1
              if (t > dataStart && bytes(t - 1) == '\r') t -= 1
              t
            }
          }
        val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
        val data =
          if (dict.contains("/FlateDecode")) inflate(raw)
          else if (dict.contains("/Filter")) null // unsupported filter → skip
          else raw
        if (data != null) extractShownText(data, out)
        val after = indexOf(bytes, "endstream", dataEnd)
        pos = if (after < 0) -1 else after + "endstream".length
      }
    }
    // The text layer is assumed UTF-8 (the corpus generator writes
    // ASCII); real-world PDFDocEncoding/UTF-16BE strings must not leak
    // invalid byte sequences into an UTF8String, so round-trip through
    // the JDK decoder, which substitutes U+FFFD for anything malformed
    UTF8String.fromString(
      new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** True when the "stream" match at k is the KEYWORD: preceded by
    * whitespace or a closing delimiter, and followed by CRLF or LF
    * (ISO 32000 §7.3.8.1 — never a bare CR). Rejects the word
    * "stream" inside a literal string or name (an Info /Title like
    * `(Quarterly income stream)`) which would otherwise pair with the
    * wrong dictionary, feed compressed bytes to the text scanner, and
    * skip past the real page stream. "endstream" matches are rejected
    * by the leading-boundary test ('d' precedes its "stream").
    */
  private def streamKeyword(bytes: Array[Byte], k: Int): Boolean = {
    val before = k == 0 || {
      val c = bytes(k - 1)
      c == ' ' || c == '\n' || c == '\r' || c == '\t' ||
        c == '>' || c == ']' || c == ')'
    }
    val e = k + "stream".length
    before && e < bytes.length &&
      (bytes(e) == '\n' ||
        (bytes(e) == '\r' && e + 1 < bytes.length && bytes(e + 1) == '\n'))
  }

  /** Index of the '<<' that balances the '>>' at dictEnd (nesting-
    * aware backward scan), or -1 when unbalanced.
    */
  private def matchingDictStart(bytes: Array[Byte], dictEnd: Int): Int = {
    var depth = 1
    var i = dictEnd - 1
    while (i >= 1) {
      if (bytes(i) == '>' && bytes(i - 1) == '>') { depth += 1; i -= 2 }
      else if (bytes(i) == '<' && bytes(i - 1) == '<') {
        depth -= 1
        if (depth == 0) return i - 1
        i -= 2
      } else i -= 1
    }
    -1
  }

  private def parseLength(dict: String): Int = {
    val m = "/Length\\s+(\\d+)".r.findFirstMatchIn(dict)
    if (m.isDefined) m.get.group(1).toInt else -1
  }

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(raw.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return out.toByteArray // truncated
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  /** One pass over a decoded content stream: buffer string objects,
    * emit the buffer (+ '\n') on each text-showing operator — but only
    * INSIDE a BT…ET text object (ISO 32000 §9.4: the showing operators
    * are only valid there). The gate is what keeps non-content streams
    * that reach this scanner (an uncompressed XMP metadata block, a
    * ToUnicode CMap — xref-free discovery cannot tell them apart from
    * pages) from emitting garbage: XML is full of `<`, `'` and `"`
    * tokens that would otherwise collect-and-show. pdfplumber walks
    * page /Contents only; BT-gating reaches the same text on files
    * whose non-page streams carry no text objects.
    */
  private def extractShownText(data: Array[Byte],
      out: java.io.ByteArrayOutputStream): Unit = {
    val pending = new java.io.ByteArrayOutputStream()
    var i = 0
    val n = data.length
    var inText = false
    def emit(): Unit = {
      pending.writeTo(out)
      out.write('\n')
      pending.reset()
    }
    while (i < n) {
      val c = data(i)
      if (c == '(') i = parseLiteral(data, i + 1, pending)
      else if (c == '<' && i + 1 < n && data(i + 1) == '<') {
        // dict in content (inline image params): skip to >>
        val e = indexOf(data, ">>", i + 2)
        i = if (e < 0) n else e + 2
      } else if (c == '<') i = parseHex(data, i + 1, pending)
      else if (c == '%') { // comment runs to EOL
        while (i < n && data(i) != '\n' && data(i) != '\r') i += 1
      } else if (c == 'B' && i + 1 < n && data(i + 1) == 'T'
          && tokenBoundary(data, i + 2) && operatorStart(data, i)) {
        inText = true; pending.reset(); i += 2
      } else if (c == 'E' && i + 1 < n && data(i + 1) == 'T'
          && tokenBoundary(data, i + 2) && operatorStart(data, i)) {
        inText = false; pending.reset(); i += 2
      } else if (c == 'T' && i + 1 < n && (data(i + 1) == 'j' || data(i + 1) == 'J')
          && tokenBoundary(data, i + 2) && operatorStart(data, i)) {
        if (inText) emit() else pending.reset()
        i += 2
      } else if ((c == '\'' || c == '"') && tokenBoundary(data, i + 1)
          && operatorStart(data, i)) {
        if (inText) emit() else pending.reset()
        i += 1
      } else i += 1
    }
    pending.reset()
  }

  /** A token at i is an OPERATOR only when the preceding byte is
    * whitespace or a (non-'/') delimiter: '/' introduces a NAME, so
    * `/TJ` (a plausible font resource name) must not show text, and a
    * glued run like `SUBT` must not toggle the BT gate. ')' and '>'
    * are included so `(x)Tj` / `<AB>Tj` — legal, delimiter-separated
    * — still show.
    */
  private def operatorStart(data: Array[Byte], i: Int): Boolean =
    i <= 0 || {
      val c = data(i - 1)
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '[' ||
        c == ']' || c == '(' || c == ')' || c == '<' || c == '>'
    }

  private def tokenBoundary(data: Array[Byte], i: Int): Boolean =
    i >= data.length || {
      val c = data(i)
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '[' ||
        c == ']' || c == '(' || c == '<' || c == '/'
    }

  /** Literal string body after '(' — balanced nesting, the standard
    * escapes, octal \ddd (1-3 digits), backslash-EOL continuation;
    * returns the index just past the closing ')'.
    */
  private def parseLiteral(data: Array[Byte], start: Int,
      out: java.io.ByteArrayOutputStream): Int = {
    var i = start
    var depth = 1
    val n = data.length
    while (i < n && depth > 0) {
      val c = data(i)
      if (c == '\\' && i + 1 < n) {
        val e = data(i + 1)
        e match {
          case 'n' => out.write('\n'); i += 2
          case 'r' => out.write('\r'); i += 2
          case 't' => out.write('\t'); i += 2
          case 'b' => out.write('\b'); i += 2
          case 'f' => out.write('\f'); i += 2
          case '(' => out.write('('); i += 2
          case ')' => out.write(')'); i += 2
          case '\\' => out.write('\\'); i += 2
          case '\r' => i += 2; if (i < n && data(i) == '\n') i += 1 // continuation
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < n && data(i) >= '0' && data(i) <= '7') {
              v = v * 8 + (data(i) - '0'); i += 1; k += 1
            }
            out.write(v & 0xff)
          case other => out.write(other); i += 2 // spec: ignore the backslash
        }
      } else if (c == '(') { depth += 1; out.write(c); i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) out.write(c)
        i += 1
      } else { out.write(c); i += 1 }
    }
    i
  }

  /** Hex string body after '<' — whitespace-tolerant, odd final digit
    * padded with 0 per spec; returns the index just past '>'.
    */
  private def parseHex(data: Array[Byte], start: Int,
      out: java.io.ByteArrayOutputStream): Int = {
    var i = start
    val n = data.length
    var hi = -1
    while (i < n && data(i) != '>') {
      val c = data(i)
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else -1
      if (v >= 0) {
        if (hi < 0) hi = v
        else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd count: final digit, low nibble 0
    if (i < n) i + 1 else i
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val nd = needle.getBytes("ISO-8859-1")
    var i = math.max(from, 0)
    val last = hay.length - nd.length
    while (i <= last) {
      var j = 0
      while (j < nd.length && hay(i + j) == nd(j)) j += 1
      if (j == nd.length) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(hay: Array[Byte], needle: String, before: Int): Int = {
    val nd = needle.getBytes("ISO-8859-1")
    var i = math.min(before, hay.length) - nd.length
    while (i >= 0) {
      var j = 0
      while (j < nd.length && hay(i + j) == nd(j)) j += 1
      if (j == nd.length) return i
      i -= 1
    }
    -1
  }
}

/** graft_pdf_text(binary) — the codegen'd column form of
  * [[PdfCodec.extractText]]: null for a non-PDF, the decoded text
  * layer (possibly empty) otherwise. Runs at scan speed inside
  * whole-stage codegen; the generated code calls the same static
  * kernel the interpreted path uses.
  */
case class PdfText(child: Expression)
    extends UnaryExpression with Serializable {
  override def prettyName: String = "graft_pdf_text"
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_pdf_text needs BINARY input, got ${child.dataType}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    PdfCodec.extractText(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.PdfCodec.extractText($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
    code
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PdfFunctions {
  def pdfText(c: Column): Column =
    Bridge.column(PdfText(Bridge.expression(c)))
}
