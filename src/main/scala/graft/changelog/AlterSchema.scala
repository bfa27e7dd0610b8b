package graft.changelog

import graft.core.Schema.{ColumnSchema, TableSchema}

/** Schema mutation for DDL propagation (O9).
  *
  * The reference derives the post-ALTER schema by replaying the statement
  * against a scratch MySQL table and re-reading information_schema
  * (/root/reference/schema/alter_schema.go:36-74 MutateTable). Without a
  * live MySQL we apply the ALTER algebra directly to the schema value —
  * ADD/DROP/MODIFY/CHANGE [COLUMN], with FIRST/AFTER ordinal moves — which
  * covers the DDL the binlog handlers react to
  * (/root/reference/changelog/mysql.go:566-623).
  */
object AlterSchema {

  private val ident = """(?:`([^`]+)`|([A-Za-z0-9_$]+))"""
  private def pick(a: String, b: String) = Option(a).getOrElse(b)

  // column type: word, optional (args), optional unsigned, e.g. varchar(32), decimal(10,2)
  private val colType = """([A-Za-z]+(?:\s*\([0-9, ]+\))?(?:\s+unsigned)?)"""

  private val addRe =
    ("""(?is)^ADD\s+(?:COLUMN\s+)?""" + ident + """\s+""" + colType +
      """(\s+NOT\s+NULL)?(?:\s+DEFAULT\s+\S+)?(?:\s+(FIRST)|\s+AFTER\s+""" + ident + """)?\s*$""").r
  private val dropRe =
    ("""(?is)^DROP\s+(?:COLUMN\s+)?""" + ident + """\s*$""").r
  private val modifyRe =
    ("""(?is)^MODIFY\s+(?:COLUMN\s+)?""" + ident + """\s+""" + colType + """(\s+NOT\s+NULL)?\s*$""").r
  private val changeRe =
    ("""(?is)^CHANGE\s+(?:COLUMN\s+)?""" + ident + """\s+""" + ident + """\s+""" + colType +
      """(\s+NOT\s+NULL)?\s*$""").r

  private def parseType(t: String): (String, Int, Int, String) = {
    // returns (data_type, precision, scale, column_type)
    val columnType = t.trim.toLowerCase.replaceAll("\\s+", " ")
    val base = columnType.takeWhile(c => c.isLetter)
    val args = "\\(([0-9, ]+)\\)".r.findFirstMatchIn(columnType).map(_.group(1))
    val nums = args.toSeq.flatMap(_.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt))
    (base, nums.headOption.getOrElse(0), nums.drop(1).headOption.getOrElse(0), columnType)
  }

  private def renumber(cols: Seq[ColumnSchema]): Seq[ColumnSchema] =
    cols.zipWithIndex.map { case (c, i) => c.copy(ordinal = i + 1) }

  /** Apply one comma-separated ALTER clause list to the schema. Returns
    * Left(reason) for unsupported clauses (the caller falls back to a
    * full schema re-pull, like the reference does on RENAME).
    */
  def mutate(schema: TableSchema, alterRest: String): Either[String, TableSchema] = {
    // split clauses on top-level commas (types may contain parenthesized commas)
    val clauses = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var depth = 0
      val cur = new StringBuilder
      alterRest.foreach {
        case '(' => depth += 1; cur += '('
        case ')' => depth -= 1; cur += ')'
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case c => cur += c
      }
      if (cur.nonEmpty) out += cur.toString
      out.map(_.trim).filter(_.nonEmpty).toSeq
    }

    clauses.foldLeft[Either[String, TableSchema]](Right(schema)) { (acc, clause) =>
      acc.flatMap(s => applyClause(s, clause))
    }
  }

  private def applyClause(schema: TableSchema, clause: String): Either[String, TableSchema] =
    clause match {
      case addRe(nQ, nB, typ, notNull, first, afterQ, afterB) =>
        val name = pick(nQ, nB)
        if (schema.columns.exists(_.name == name)) Left(s"duplicate column $name")
        else {
          val (dt, p, sc, ct) = parseType(typ)
          val newCol = ColumnSchema(name, 0, isNullable = notNull == null, dt,
            columnType = ct, numericPrecision = p, numericScale = sc)
          val cols =
            if (first != null) newCol +: schema.columns
            else Option(afterQ).orElse(Option(afterB)) match {
              case Some(after) =>
                val idx = schema.columns.indexWhere(_.name == after)
                if (idx < 0) return Left(s"AFTER column $after not found")
                val (l, r) = schema.columns.splitAt(idx + 1)
                l ++ (newCol +: r)
              case None => schema.columns :+ newCol
            }
          Right(schema.copy(columns = renumber(cols)))
        }

      case dropRe(nQ, nB) =>
        val name = pick(nQ, nB)
        val col = schema.columns.find(_.name == name)
        if (col.isEmpty) Left(s"drop of unknown column $name")
        else if (col.exists(_.isPrimaryKey)) Left(s"cannot drop PK column $name")
        else Right(schema.copy(columns = renumber(schema.columns.filterNot(_.name == name))))

      case modifyRe(nQ, nB, typ, notNull) =>
        val name = pick(nQ, nB)
        if (!schema.columns.exists(_.name == name)) Left(s"modify of unknown column $name")
        else {
          val (dt, p, sc, ct) = parseType(typ)
          Right(schema.copy(columns = schema.columns.map(c =>
            if (c.name == name)
              c.copy(dataType = dt, columnType = ct, numericPrecision = p,
                numericScale = sc, isNullable = notNull == null)
            else c)))
        }

      case changeRe(oQ, oB, nQ, nB, typ, notNull) =>
        val oldName = pick(oQ, oB)
        val newName = pick(nQ, nB)
        if (!schema.columns.exists(_.name == oldName)) Left(s"change of unknown column $oldName")
        else {
          val (dt, p, sc, ct) = parseType(typ)
          Right(schema.copy(columns = schema.columns.map(c =>
            if (c.name == oldName)
              c.copy(name = newName, dataType = dt, columnType = ct,
                numericPrecision = p, numericScale = sc, isNullable = notNull == null)
            else c)))
        }

      case other => Left(s"unsupported ALTER clause: $other")
    }
}
