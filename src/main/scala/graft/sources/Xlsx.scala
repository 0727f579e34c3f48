package graft.sources

import java.io.{ByteArrayInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Excel (.xlsx) grid ingestion — the reference reads CHU workbooks directly
  * (`pl.read_excel`, extract_chu_data.py:182), so a real user hits Excel on
  * day one.
  *
  * xlsx is a public format: a zip archive of XML parts (ECMA-376 /
  * ISO 29500 SpreadsheetML). This reader uses only the JDK (java.util.zip +
  * javax.xml.stream) and covers the grid subset the reference consumes:
  * shared strings, inline strings, numeric/boolean/formula-cached cells,
  * sparse cells (gaps filled with nulls) and skipped empty rows.
  *
  * Scale shape: workbooks are read with Spark's `binaryFile` source — one
  * task per file, each workbook parsed ON AN EXECUTOR — so a directory of
  * thousands of site workbooks (the reference's CHU case) fans out across
  * the cluster. Only the header comes from a single bounded driver read of
  * the lexicographically first file, the same contract as Spark's own CSV
  * header inference. A single .xlsx is never split (the zip container isn't
  * splittable), which matches the format: grids are per-site files, not
  * 100 GB tables.
  */
object Xlsx {

  /** Read a directory/glob of xlsx workbooks as one DataFrame of strings.
    *
    * @param skipRows decoration rows dropped from the top of EVERY sheet
    *                 (titles, logos — extract_chu_data.py skips a data-range
    *                 offset the same way); the next row is the header
    * @param sheet    worksheet part name (sheet1 = the first sheet)
    */
  def grid(spark: SparkSession, path: String, skipRows: Int, sheet: String = "sheet1"): DataFrame = {
    val files = spark.read.format("binaryFile").load(path)
    val headBytes = files.orderBy(col("path")).select(col("content")).head().getAs[Array[Byte]](0)
    val grid = parseSheet(headBytes, sheet)
    require(grid.length > skipRows, s"sheet has ${grid.length} rows, cannot skip $skipRows + header")
    val header = grid(skipRows).map(c => if (c == null) "" else c.trim).toSeq
    val width = header.length
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val rows = files
      .select(col("content"))
      .as(Encoders.BINARY)
      .flatMap { bytes =>
        parseSheet(bytes, sheet).iterator.drop(skipRows + 1).map { cells =>
          Row.fromSeq((0 until width).map(i => if (i < cells.length) cells(i) else null))
        }
      }(Encoders.row(schema))
    rows.toDF(header: _*)
  }

  // ------------------------------------------------------------------ parse

  /** Parse one worksheet of a workbook into rows of cell strings (null =
    * empty cell). Row/column gaps in the sparse XML are restored so the
    * output is positionally faithful to what a spreadsheet user sees.
    *
    * `sheet` is either a part name ("sheet1" -> xl/worksheets/sheet1.xml)
    * or a DISPLAY name as a spreadsheet user sees it ("Données CHU"),
    * resolved through xl/workbook.xml + its relationships — the reference
    * selects sheets by display name (`pl.read_excel(sheet_name=...)`,
    * extract_chu_data.py:182). */
  private[sources] def parseSheet(workbook: Array[Byte], sheet: String): Vector[Array[String]] = {
    val parts = scala.collection.mutable.Map.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(workbook))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        // buffer ONLY the parts sheet resolution needs — workbooks can carry
        // large embedded media under xl/media that would otherwise be held
        // in executor memory once per task
        val name = e.getName
        val needed = name == "xl/workbook.xml" ||
          name == "xl/_rels/workbook.xml.rels" ||
          name == "xl/sharedStrings.xml" ||
          name.startsWith("xl/worksheets/")
        if (needed) parts(name) = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    val sheetXml = parts.get(s"xl/worksheets/$sheet.xml").orElse {
      // display-name path: workbook.xml sheet name -> r:id -> rels target
      for {
        wb <- parts.get("xl/workbook.xml")
        rels <- parts.get("xl/_rels/workbook.xml.rels")
        rid <- sheetNameToRelId(wb).get(sheet)
        target <- relIdToTarget(rels).get(rid)
      } yield parts.getOrElse(
        if (target.startsWith("/")) target.stripPrefix("/") else s"xl/$target",
        null)
    }.filter(_ != null)
    require(sheetXml.isDefined,
      s"workbook has no sheet '$sheet' (neither a part xl/worksheets/$sheet.xml nor a sheet named '$sheet')")
    val shared = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(Array.empty[String])
    parseSheetXml(sheetXml.get, shared)
  }

  /** xl/workbook.xml: display name -> relationship id of each sheet. */
  private def sheetNameToRelId(xml: Array[Byte]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    val r = xmlReader(xml)
    while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
        r.getLocalName == "sheet") {
        val name = r.getAttributeValue(null, "name")
        // the r:id attribute lives in the officeDocument relationships ns
        var rid: String = null
        var i = 0
        while (i < r.getAttributeCount && rid == null) {
          if (r.getAttributeLocalName(i) == "id") rid = r.getAttributeValue(i)
          i += 1
        }
        if (name != null && rid != null) out += name -> rid
      }
    }
    r.close()
    out.result()
  }

  /** xl/_rels/workbook.xml.rels: relationship id -> target part path. */
  private def relIdToTarget(xml: Array[Byte]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    val r = xmlReader(xml)
    while (r.hasNext) {
      if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
        r.getLocalName == "Relationship") {
        val id = r.getAttributeValue(null, "Id")
        val target = r.getAttributeValue(null, "Target")
        if (id != null && target != null) out += id -> target
      }
    }
    r.close()
    out.result()
  }

  /** sharedStrings.xml: one `<si>` per string; rich-text runs concatenate. */
  private def parseSharedStrings(xml: Array[Byte]): Array[String] = {
    val out = ArrayBuffer.empty[String]
    val r = xmlReader(xml)
    var current: java.lang.StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => current = new java.lang.StringBuilder
            case "t" => inT = true
            case _ => ()
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT && current != null =>
          current.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => out += current.toString; current = null
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    out.toArray
  }

  private def parseSheetXml(xml: Array[Byte], shared: Array[String]): Vector[Array[String]] = {
    val rows = Vector.newBuilder[Array[String]]
    val r = xmlReader(xml)
    var rowNum = 0 // last emitted 1-based row number
    var cells: ArrayBuffer[String] = null
    var cellCol = -1 // 0-based column of the open <c>
    var cellType: String = null
    var text: java.lang.StringBuilder = null
    var collecting = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              val declared = Option(r.getAttributeValue(null, "r")).map(_.toInt)
              // restore skipped empty rows so positions stay faithful
              val target = declared.getOrElse(rowNum + 1)
              while (rowNum < target - 1) { rows += Array.empty[String]; rowNum += 1 }
              cells = ArrayBuffer.empty[String]
            case "c" =>
              val ref = r.getAttributeValue(null, "r")
              cellCol = if (ref == null) cells.length else colIndex(ref)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              text = null
            case "v" | "t" if cells != null && cellCol >= 0 =>
              // allocate only once per cell: an inlineStr with rich-text runs
              // (<is><r><t>a</t></r><r><t>b</t></r></is>) opens several <t>
              // elements whose texts must concatenate, like parseSharedStrings
              if (text == null) text = new java.lang.StringBuilder
              collecting = true
            case _ => ()
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if collecting =>
          text.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" => collecting = false
            case "c" =>
              val raw = if (text == null) null else text.toString
              val value = cellType match {
                case "s" if raw != null => shared(raw.trim.toInt)
                case "b" if raw != null => if (raw.trim == "1") "true" else "false"
                case _ => raw // n, str (formula cache), inlineStr (via <t>)
              }
              while (cells.length < cellCol) cells += null
              if (cells.length == cellCol) cells += value else cells(cellCol) = value
              cellCol = -1
            case "row" =>
              rows += cells.toArray; rowNum += 1; cells = null
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    rows.result()
  }

  /** Per-cell solid-fill colors of one worksheet (ARGB hex, null = unfilled),
    * positionally faithful like [[parseSheet]]: resolves each cell's `s`
    * style index through styles.xml cellXfs -> fills -> fgColor. The read
    * twin of `write(fills = ...)`, so a colored export (e.g. the consistency
    * matrix) can be verified cell-by-cell. */
  private[graft] def cellFills(workbook: Array[Byte], sheet: String = "sheet1"): Vector[Array[String]] = {
    var sheetXml: Array[Byte] = null
    var stylesXml: Array[Byte] = null
    val zin = new ZipInputStream(new ByteArrayInputStream(workbook))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        e.getName match {
          case n if n == s"xl/worksheets/$sheet.xml" => sheetXml = zin.readAllBytes()
          case "xl/styles.xml" => stylesXml = zin.readAllBytes()
          case _ => ()
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    require(sheetXml != null, s"workbook has no sheet part xl/worksheets/$sheet.xml")
    // styles.xml: fill position -> fgColor rgb; cellXfs position -> fillId
    val fillColors = ArrayBuffer.empty[String]
    val xfFillIds = ArrayBuffer.empty[Int]
    if (stylesXml != null) {
      val r = xmlReader(stylesXml)
      var inFills = false
      var inCellXfs = false
      var fillDepth = -1
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "fills" => inFills = true
              case "cellXfs" => inCellXfs = true
              case "fill" if inFills => fillColors += null; fillDepth = fillColors.size - 1
              case "fgColor" if inFills && fillDepth >= 0 =>
                fillColors(fillDepth) = r.getAttributeValue(null, "rgb")
              case "xf" if inCellXfs =>
                xfFillIds += Option(r.getAttributeValue(null, "fillId")).map(_.toInt).getOrElse(0)
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "fills" => inFills = false
              case "cellXfs" => inCellXfs = false
              case _ => ()
            }
          case _ => ()
        }
      }
      r.close()
    }
    def colorOfStyle(s: Int): String =
      if (s < 0 || s >= xfFillIds.length) null
      else {
        val fid = xfFillIds(s)
        if (fid < 0 || fid >= fillColors.length) null else fillColors(fid)
      }
    // second pass over the sheet grid: same row/column gap restoration as
    // parseSheetXml, but collecting the s= attribute instead of the value
    val rows = Vector.newBuilder[Array[String]]
    val r = xmlReader(sheetXml)
    var rowNum = 0
    var cells: ArrayBuffer[String] = null
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              val declared = Option(r.getAttributeValue(null, "r")).map(_.toInt)
              val target = declared.getOrElse(rowNum + 1)
              while (rowNum < target - 1) { rows += Array.empty[String]; rowNum += 1 }
              cells = ArrayBuffer.empty[String]
            case "c" if cells != null =>
              val ref = r.getAttributeValue(null, "r")
              val cellCol = if (ref == null) cells.length else colIndex(ref)
              val style = Option(r.getAttributeValue(null, "s")).map(_.toInt).getOrElse(-1)
              while (cells.length < cellCol) cells += null
              val color = colorOfStyle(style)
              if (cells.length == cellCol) cells += color else cells(cellCol) = color
            case _ => ()
          }
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT if r.getLocalName == "row" =>
          rows += cells.toArray; rowNum += 1; cells = null
        case _ => ()
      }
    }
    r.close()
    rows.result()
  }

  /** "BC23" -> 0-based column index of the letters prefix. */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && Character.isLetter(ref.charAt(i))) {
      acc = acc * 26 + (Character.toUpperCase(ref.charAt(i)) - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def xmlReader(bytes: Array[Byte]): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  // ------------------------------------------------------------------ write

  /** Write a minimal single-sheet workbook (numbers as numeric cells,
    * everything else via sharedStrings, nulls as gaps) — enough to round-trip
    * grids through [[grid]] and to hand a spreadsheet to a downstream
    * consumer, the export twin of the reference's Excel ingestion.
    *
    * @param fills optional per-cell solid fill colors, addressed positionally
    *              like `rows` (ARGB hex, e.g. "FFFF0000"; null / missing =
    *              unfilled). Colors become pattern fills in styles.xml with a
    *              cellXfs entry each — the mechanism behind the reference's
    *              colored consistency matrix (utils.py:1047
    *              `get_dataframe_color_rules` paints cells by rule priority).
    */
  def write(path: String, rows: Seq[Seq[Any]], fills: Seq[Seq[String]] = Seq.empty): Unit =
    writeSheets(path, Seq(("Sheet1", rows, fills)))

  /** Multi-sheet workbook writer — the reference's consistency workbook
    * carries one sheet per pathology (`workbook[pathologie]`,
    * utils.py:813). Sheets share one sharedStrings table and one styles
    * part; each entry is (display name, rows, fills). */
  def writeSheets(path: String, sheets: Seq[(String, Seq[Seq[Any]], Seq[Seq[String]])]): Unit = {
    require(sheets.nonEmpty, "workbook needs at least one sheet")
    val sharedIdx = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sharedOf(s: String): Int = sharedIdx.getOrElseUpdate(s, sharedIdx.size)
    // distinct colors -> fillId (0 = none, 1 = gray125, both required first)
    val colorIdx = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def esc(s: String): String =
      s.flatMap {
        case '&' => "&amp;"
        case '<' => "&lt;"
        case '>' => "&gt;"
        case '"' => "&quot;"
        case c => c.toString
      }
    def buildSheet(rows: Seq[Seq[Any]], fills: Seq[Seq[String]]): String = {
      def styleOf(ri: Int, ci: Int): Int = {
        val color =
          if (ri < fills.length && ci < fills(ri).length) fills(ri)(ci) else null
        if (color == null) 0
        else colorIdx.getOrElseUpdate(color, colorIdx.size + 1) // cellXfs index
      }
      def sAttr(ri: Int, ci: Int): String = {
        val s = styleOf(ri, ci)
        if (s == 0) "" else s""" s="$s""""
      }
      val sheet = new StringBuilder
      sheet ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n"
      sheet ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
      rows.zipWithIndex.foreach { case (cells, ri) =>
        sheet ++= s"""<row r="${ri + 1}">"""
        cells.zipWithIndex.foreach { case (v, ci) =>
          val ref = s"${colLetters(ci)}${ri + 1}"
          val st = sAttr(ri, ci)
          v match {
            case null =>
              // an unfilled empty cell needs no element; a filled one does
              if (st.nonEmpty) sheet ++= s"""<c r="$ref"$st/>"""
            case n: Int => sheet ++= s"""<c r="$ref"$st><v>$n</v></c>"""
            case n: Long => sheet ++= s"""<c r="$ref"$st><v>$n</v></c>"""
            case n: Double => sheet ++= s"""<c r="$ref"$st><v>$n</v></c>"""
            case b: Boolean => sheet ++= s"""<c r="$ref"$st t="b"><v>${if (b) 1 else 0}</v></c>"""
            // DECIMAL columns collect as java.math.BigDecimal; toPlainString
            // avoids scientific notation, which spreadsheet consumers reject
            case n: java.math.BigDecimal => sheet ++= s"""<c r="$ref"$st><v>${n.toPlainString}</v></c>"""
            case n: scala.math.BigDecimal => sheet ++= s"""<c r="$ref"$st><v>${n.bigDecimal.toPlainString}</v></c>"""
            case n: java.lang.Number => sheet ++= s"""<c r="$ref"$st><v>$n</v></c>"""
            case s => sheet ++= s"""<c r="$ref"$st t="s"><v>${sharedOf(s.toString)}</v></c>"""
          }
        }
        sheet ++= "</row>"
      }
      sheet ++= "</sheetData></worksheet>"
      sheet.toString
    }
    // build sheets FIRST: they populate the shared-string and color tables
    val sheetXmls = sheets.map { case (_, rows, fills) => buildSheet(rows, fills) }
    val sst = new StringBuilder
    sst ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n"
    sst ++= s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sharedIdx.size}" uniqueCount="${sharedIdx.size}">"""
    sharedIdx.keys.foreach(s => sst ++= s"<si><t xml:space=\"preserve\">${esc(s)}</t></si>")
    sst ++= "</sst>"
    // styles: fill 0 = none, fill 1 = gray125 (both required by consumers),
    // then one solid fill per distinct color; cellXfs index s (>=1) -> fill s+1
    val styles = new StringBuilder
    styles ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n"
    styles ++= """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">"""
    styles ++= """<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>"""
    styles ++= s"""<fills count="${colorIdx.size + 2}">"""
    styles ++= """<fill><patternFill patternType="none"/></fill>"""
    styles ++= """<fill><patternFill patternType="gray125"/></fill>"""
    colorIdx.keys.foreach { c =>
      styles ++= s"""<fill><patternFill patternType="solid"><fgColor rgb="${esc(c)}"/><bgColor indexed="64"/></patternFill></fill>"""
    }
    styles ++= "</fills>"
    styles ++= """<borders count="1"><border/></borders>"""
    styles ++= """<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>"""
    styles ++= s"""<cellXfs count="${colorIdx.size + 1}">"""
    styles ++= """<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>"""
    (1 to colorIdx.size).foreach { s =>
      styles ++= s"""<xf numFmtId="0" fontId="0" fillId="${s + 1}" borderId="0" xfId="0" applyFill="1"/>"""
    }
    styles ++= "</cellXfs></styleSheet>"
    val n = sheets.length
    val sheetOverrides = (1 to n).map(i =>
      s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString
    val sheetDecls = sheets.zipWithIndex.map { case ((name, _, _), i) =>
      s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""" }.mkString
    val sheetRels = (1 to n).map(i =>
      s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString
    val parts = Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          sheetOverrides +
          """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
          """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
          """</Types>"""),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          """</Relationships>"""),
      "xl/workbook.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
          s"""<sheets>$sheetDecls</sheets></workbook>"""),
      "xl/_rels/workbook.xml.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          sheetRels +
          s"""<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>""" +
          s"""<Relationship Id="rId${n + 2}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
          """</Relationships>"""),
      "xl/sharedStrings.xml" -> sst.toString,
      "xl/styles.xml" -> styles.toString) ++
      sheetXmls.zipWithIndex.map { case (xml, i) => s"xl/worksheets/sheet${i + 1}.xml" -> xml }
    val file = new java.io.File(path)
    Option(file.getParentFile).foreach(_.mkdirs())
    val zout = new ZipOutputStream(new FileOutputStream(file))
    try {
      parts.foreach { case (name, content) =>
        zout.putNextEntry(new ZipEntry(name))
        zout.write(content.getBytes("UTF-8"))
        zout.closeEntry()
      }
    } finally zout.close()
  }

  private[graft] def colLetters(idx: Int): String = {
    var i = idx + 1
    val sb = new StringBuilder
    while (i > 0) {
      val rem = (i - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      i = (i - 1) / 26
    }
    sb.toString
  }
}
