package graft.sources

import graft.SparkSpec

class XlsxSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-authored OOXML (literal XML per ECMA-376, NOT produced by
    * Xlsx.write) so the reader is tested against the format spec rather
    * than against its own round-trip partner. Two sheets; the second
    * exercises shared strings (incl. a rich-text run), inline strings,
    * booleans, numerics, a gap column, and a cell with no r= reference. */
  private def fixtureXlsx(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def part(name: String, body: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(body.getBytes("UTF-8")); z.closeEntry()
    }
    part("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    part("xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets>
        |<sheet name="Liczba odpowiedzi 1" sheetId="1" r:id="rId1"/>
        |<sheet name="dane kontrolne" sheetId="2" r:id="rId2"/>
        |</sheets></workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
        |<si><t>Płeć</t></si>
        |<si><r><t>SUV </t></r><r><t>(max)</t></r></si>
        |<si><t>Kobieta</t></si>
        |</sst>""".stripMargin)
    part("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    // sheet2 row2: A2 shared string, B2 numeric, C2 gap (absent), D2 boolean,
    //              then a ref-less cell that must land in E2
    part("xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>wiek</t></is></c><c r="D1" t="inlineStr"><is><t>zgon</t></is></c><c r="E1" t="inlineStr"><is><t>uwagi</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>4.25</v></c><c r="D2" t="b"><v>1</v></c><c t="inlineStr"><is><t>a&amp;b</t></is></c></row>
        |<row r="3"><c r="A3" t="s"><v>2</v></c><c r="B3" t="n"><v>39525</v></c><c r="C3"><v>61</v></c><c r="D3" t="b"><v>0</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    bos.toByteArray
  }

  private def writeTemp(bytes: Array[Byte]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx")
    val p = dir.resolve("fixture.xlsx")
    java.nio.file.Files.write(p, bytes)
    p.toString
  }

  test("reads a hand-authored OOXML sheet: shared/rich/inline strings, bool, numeric, gaps") {
    val path = writeTemp(fixtureXlsx())
    val df = Xlsx.read(spark, path, "dane kontrolne", firstRowAsHeader = true)
    assert(df.columns.toSeq == Seq("Płeć", "SUV (max)", "wiek", "zgon", "uwagi"))
    val rows = df.collect().map(_.toSeq)
    assert(rows(0) == Seq("Kobieta", "4.25", null, "true", "a&b"))
    // date serial stays a numeric string (typing is the cleaning stage's job)
    assert(rows(1) == Seq("Kobieta", "39525", "61", "false", null))
  }

  test("sheet selection by name; unknown sheet errors with available names") {
    val path = writeTemp(fixtureXlsx())
    val s1 = Xlsx.read(spark, path, "Liczba odpowiedzi 1")
    assert(s1.columns.toSeq == Seq("_c0") && s1.collect().map(_.getString(0)).toSeq == Seq("Płeć"))
    val e = intercept[Exception](Xlsx.read(spark, path, "nope"))
    assert(e.getMessage.contains("Liczba odpowiedzi 1"))
    assert(Xlsx.sheetNames(fixtureXlsx()) ==
      Seq("Liczba odpowiedzi 1", "dane kontrolne"))
  }

  test("write → read round-trip preserves values, nulls, and header names") {
    val df = Seq(("ała & <b>", Some("1.5"), "x"), ("żółć", None, "y"))
      .toDF("Płeć", "SUV (max)", "kat")
      .selectExpr("`Płeć`", "`SUV (max)`", "kat")
    val path = java.nio.file.Files.createTempDirectory("graft-xlsx-w")
      .resolve("rt.xlsx").toString
    Xlsx.write(df, path, sheetName = "Liczba odpowiedzi 1")
    val back = Xlsx.read(spark, path, "Liczba odpowiedzi 1", firstRowAsHeader = true)
    assert(back.columns.toSeq == df.columns.toSeq)
    assert(back.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("copyToCsv mirrors the reference Copy activity (quoted text CSV)") {
    val df = Seq(("a", "1"), ("b", "2")).toDF("k", "v")
    val tmp = java.nio.file.Files.createTempDirectory("graft-xlsx-csv")
    val xp = tmp.resolve("in.xlsx").toString
    Xlsx.write(df, xp, sheetName = "s")
    val out = tmp.resolve("out").toString
    Xlsx.copyToCsv(spark, xp, "s", out, firstRowAsHeader = true)
    val files = new java.io.File(out).listFiles().filter(_.getName.startsWith("part-"))
    assert(files.length == 1)
    val lines = scala.io.Source.fromFile(files(0), "UTF-8").getLines().toSeq
    assert(lines.head == "\"k\",\"v\"")
    assert(lines.toSet.contains("\"a\",\"1\""))
  }

  test("column letter math round-trips through two-letter refs") {
    assert(Xlsx.colIndex("A1") == 0 && Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA10") == 26 && Xlsx.colIndex("BC12") == 54)
    (0 until 800).foreach(i => assert(Xlsx.colIndex(Xlsx.colLetters(i) + "1") == i))
  }
}
