package graft.sources

import java.io.ByteArrayInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S3 — Excel ingest (SURVEY §2.1). The reference's actual entry point is a
  * Synapse Copy activity reading named sheets from `AnonimizedPhdRawData.xlsx`
  * into quoted CSV (`pipeline/Pipeline 1.json:114-168`; sheet names like
  * "Liczba odpowiedzi 1" in `dataset/study_group.json`, `firstRowAsHeader:
  * false`, an all-String 117-column schema). No spark-excel jar ships here,
  * but an xlsx is just a zip of small XML parts — this is a minimal,
  * dependency-free OOXML reader (java.util.zip + StAX, both JDK) covering
  * what tabular ingest needs: shared strings (incl. rich-text runs), inline
  * strings, booleans, numbers, sparse cells/gap columns, and sheet selection
  * by name.
  *
  * All values surface as Strings — exactly the reference's contract (its
  * Copy writes text CSV; typing happens later in the cleaning stage, P2
  * `advancedCasting`). Date serials therefore stay numeric strings, as they
  * do in the reference's intermediate CSV.
  *
  * Scale story: xlsx is a driver-era interchange format, not a data lake
  * format. The reader distributes per FILE (one task per workbook via the
  * binaryFile source — a directory of workbooks parses in parallel); within
  * one workbook parsing is inherently sequential (single zip stream). The
  * right pipeline shape, mirrored from the reference, is ingest-once →
  * columnar immediately ([[copyToCsv]] / parquet sink), never repeated scans
  * of the xlsx itself.
  */
object Xlsx {

  private val RelsNs =
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  /** Hardened StAX factory — xlsx content is untrusted input, so DTDs and
    * external entities are disabled. */
  private def xmlFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty("javax.xml.stream.isSupportingExternalEntities",
      java.lang.Boolean.FALSE)
    f
  }

  /** Extract named zip entries (one pass; entry order in the archive is not
    * guaranteed, so wanted parts are buffered by name). */
  private def zipEntries(bytes: Array[Byte],
      want: String => Boolean): Map[String, Array[Byte]] = {
    val zin = new java.util.zip.ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory && want(e.getName)) out += e.getName -> zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** "BC" → 54 (0-based column index). */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** 0-based column index → "A".."Z","AA".. */
  private[sources] def colLetters(idx: Int): String = {
    var n = idx + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Sheet names in workbook order (for error messages / discovery). */
  def sheetNames(bytes: Array[Byte]): Seq[String] = {
    val wb = zipEntries(bytes, _ == "xl/workbook.xml")
      .getOrElse("xl/workbook.xml", throw new IllegalArgumentException(
        "not an xlsx: missing xl/workbook.xml"))
    val r = xmlFactory().createXMLStreamReader(new ByteArrayInputStream(wb))
    val names = ArrayBuffer.empty[String]
    try while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet")
        names += r.getAttributeValue(null, "name")
    } finally r.close()
    names.toSeq
  }

  /** Parse one sheet of one workbook to a ragged grid of cell strings
    * (null = empty cell). Pure JVM — runs on executors. */
  private[sources] def parseSheet(bytes: Array[Byte], sheetName: String):
      Vector[Array[String]] = {
    val meta = zipEntries(bytes, n => n == "xl/workbook.xml" ||
      n == "xl/_rels/workbook.xml.rels" || n == "xl/sharedStrings.xml")
    val wb = meta.getOrElse("xl/workbook.xml", throw new IllegalArgumentException(
      "not an xlsx: missing xl/workbook.xml"))

    // sheet name → relationship id
    var rid: String = null
    val names = ArrayBuffer.empty[String]
    locally {
      val r = xmlFactory().createXMLStreamReader(new ByteArrayInputStream(wb))
      try while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          val n = r.getAttributeValue(null, "name")
          names += n
          if (n == sheetName) rid = r.getAttributeValue(RelsNs, "id")
        }
      } finally r.close()
    }
    require(rid != null,
      s"sheet '$sheetName' not found; workbook has: ${names.mkString(", ")}")

    // relationship id → worksheet part path
    var target: String = null
    locally {
      val rels = meta.getOrElse("xl/_rels/workbook.xml.rels",
        throw new IllegalArgumentException("xlsx missing workbook rels"))
      val r = xmlFactory().createXMLStreamReader(new ByteArrayInputStream(rels))
      try while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship" &&
            r.getAttributeValue(null, "Id") == rid)
          target = r.getAttributeValue(null, "Target")
      } finally r.close()
    }
    require(target != null, s"no relationship target for sheet '$sheetName'")
    val partPath =
      if (target.startsWith("/")) target.stripPrefix("/") else s"xl/$target"

    // shared strings: one entry per <si>, rich-text runs concatenated
    val sst: IndexedSeq[String] = meta.get("xl/sharedStrings.xml") match {
      case None => IndexedSeq.empty
      case Some(b) =>
        val out = ArrayBuffer.empty[String]
        var cur: StringBuilder = null
        val r = xmlFactory().createXMLStreamReader(new ByteArrayInputStream(b))
        try while (r.hasNext) r.next() match {
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
            cur = new StringBuilder
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "t" =>
            if (cur != null) cur.append(r.getElementText)
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
            out += cur.toString; cur = null
          case _ =>
        } finally r.close()
        out.toIndexedSeq
    }

    val sheet = zipEntries(bytes, _ == partPath).getOrElse(partPath,
      throw new IllegalArgumentException(s"xlsx missing worksheet part $partPath"))
    val rows = Vector.newBuilder[Array[String]]
    val row = ArrayBuffer.empty[String]
    var nextCol = 0        // fallback when a <c> has no r= reference
    var curCol = 0
    var cellType: String = null
    var inlineBuf: StringBuilder = null
    def place(idx: Int, v: String): Unit = {
      while (row.length <= idx) row += null
      row(idx) = v
    }
    val r = xmlFactory().createXMLStreamReader(new ByteArrayInputStream(sheet))
    try while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" => row.clear(); nextCol = 0
        case "c" =>
          val ref = r.getAttributeValue(null, "r")
          cellType = r.getAttributeValue(null, "t")
          curCol = if (ref != null) colIndex(ref) else nextCol
          nextCol = curCol + 1
          inlineBuf = if (cellType == "inlineStr") new StringBuilder else null
        case "v" =>
          val raw = r.getElementText
          val v = cellType match {
            case "s" => sst(raw.trim.toInt)
            case "b" => if (raw.trim == "1") "true" else "false"
            case _ => raw // "n"/null (numeric), "str" (formula result), "e"
          }
          place(curCol, v)
        case "t" =>
          if (inlineBuf != null) inlineBuf.append(r.getElementText)
        case _ =>
      }
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "c" =>
          if (inlineBuf != null) { place(curCol, inlineBuf.toString); inlineBuf = null }
        case "row" => rows += row.toArray
        case _ =>
      }
      case _ =>
    } finally r.close()
    rows.result()
  }

  /** Read a named sheet from xlsx file(s) at `path` into an all-String
    * DataFrame. `firstRowAsHeader = false` (the reference's setting,
    * `dataset/study_group.json`) names columns `_c0..`; with header, empty or
    * duplicate header cells fall back to `_cN` / get `_N` suffixes.
    *
    * Schema (column count + names) is probed from the FIRST file on the
    * driver — a metadata-scale read, like a CSV header sniff — then every
    * file parses in its own task; rows are padded/truncated to the probed
    * width. */
  def read(spark: SparkSession, path: String, sheetName: String,
      firstRowAsHeader: Boolean = false): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
    val first = files.head(1)
    require(first.nonEmpty, s"no files at $path")
    val probe = parseSheet(first(0), sheetName)
    val nCols = probe.iterator.map(_.length).maxOption.getOrElse(0)
    require(nCols > 0, s"sheet '$sheetName' has no cells")
    val names: Seq[String] =
      if (firstRowAsHeader) {
        val h = probe.head
        val base = (0 until nCols).map { i =>
          Option(if (i < h.length) h(i) else null).map(_.trim)
            .filter(_.nonEmpty).getOrElse(s"_c$i")
        }
        val seen = scala.collection.mutable.Map.empty[String, Int]
        base.map { n =>
          val k = seen.getOrElse(n, 0); seen(n) = k + 1
          if (k == 0) n else s"${n}_$k"
        }
      } else (0 until nCols).map(i => s"_c$i")
    val schema = StructType(names.map(n => StructField(n, StringType)))
    val drop = if (firstRowAsHeader) 1 else 0
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    files.flatMap { bytes =>
      parseSheet(bytes, sheetName).drop(drop).map { cells =>
        Row.fromSeq((0 until nCols).map(i => if (i < cells.length) cells(i) else null))
      }
    }.toDF()
  }

  /** Minimal single-sheet xlsx writer (inline strings only) — the round-trip
    * partner of [[read]] for fixtures and interchange export. Streams rows
    * via `toLocalIterator`; xlsx is a single-file driver-era format (same
    * contract as the reference's `coalesce(1)` TSV sink), so this is
    * intentionally NOT a distributed sink — export to parquet/CSV for
    * anything large. Local filesystem path. */
  def write(df: DataFrame, path: String, sheetName: String,
      header: Boolean = true): Unit = {
    def esc(s: String): String = s.flatMap {
      case '&' => "&amp;"; case '<' => "&lt;"; case '>' => "&gt;"
      case '"' => "&quot;"; case c => c.toString
    }
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    val zout = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(p))
    def part(name: String, body: String): Unit = {
      zout.putNextEntry(new java.util.zip.ZipEntry(name))
      zout.write(body.getBytes("UTF-8")); zout.closeEntry()
    }
    try {
      part("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin)
      part("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      part("xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin)
      part("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin)
      zout.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      val w = new java.io.OutputStreamWriter(zout, "UTF-8")
      w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w.write("\n<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
      var rowNum = 1
      def writeRow(vals: Seq[Any]): Unit = {
        w.write(s"""<row r="$rowNum">""")
        vals.zipWithIndex.foreach { case (v, i) =>
          if (v != null) w.write(
            s"""<c r="${colLetters(i)}$rowNum" t="inlineStr"><is><t>${esc(v.toString)}</t></is></c>""")
        }
        w.write("</row>")
        rowNum += 1
      }
      if (header) writeRow(df.columns.toSeq)
      val it = df.toLocalIterator()
      while (it.hasNext) writeRow(it.next().toSeq)
      w.write("</sheetData></worksheet>")
      w.flush(); zout.closeEntry()
    } finally zout.close()
  }

  /** The reference's Copy activity: Excel sheet → quoted delimited text
    * (`pipeline/Pipeline 1.json:114-168` — DelimitedTextSink with
    * `quoteAllText: true`). */
  def copyToCsv(spark: SparkSession, xlsxPath: String, sheetName: String,
      outPath: String, delimiter: String = ",",
      firstRowAsHeader: Boolean = false): Unit = {
    read(spark, xlsxPath, sheetName, firstRowAsHeader)
      .coalesce(1).write.mode("overwrite")
      .option("header", firstRowAsHeader.toString)
      .option("delimiter", delimiter)
      .option("quoteAll", "true")
      .csv(outPath)
  }
}
