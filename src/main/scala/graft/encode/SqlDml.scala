package graft.encode

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SQL DML encoders (`mysql`/`ansisql` + `_idempotent` variants) —
  * byte-parity with the reference statement shapes.
  *
  * Golden strings (/root/reference/main_test.go:64-77, :100-110):
  *   INSERT INTO "t" ("seqno","f1","f3","f4") VALUES (5,1,0,NULL);
  *   DELETE FROM "t" WHERE "seqno"=5 AND "f1"=1;
  *   idempotent suffix (non-PK columns only, last-writer-wins by seqno —
  *   encoder/sql.go:133-148):
  *     ON DUPLICATE KEY UPDATE "f3"= IF(seqno < VALUES(seqno),
  *     VALUES("f3"),"f3"),…, seqno = IF(seqno < VALUES(seqno),
  *     VALUES(seqno), seqno);
  *
  * The `mysql` dialect passes identQuote = backquote so identifiers render
  * with backquotes at build time ("quotes replaced in the code" —
  * main_test.go:83); data values are never rewritten.
  * Statements are data (string columns) executed in `foreachBatch` via
  * JDBC; on Delta-capable sinks the idempotent variant maps to
  * `MERGE … WHEN MATCHED AND s.seqno > t.seqno THEN UPDATE`.
  */
object SqlDml {

  /** Escape a string for a single-quoted SQL literal (doubled quotes —
    * util/mysql.go:24-96 semantics).
    */
  def sqlQuote(c: Column): Column =
    concat(lit("'"), regexp_replace(c.cast("string"), "'", "''"), lit("'"))

  /** Render a value for VALUES(): NULL literal, quoted string, or bare
    * number/boolean. Unquoted values go through
    * [[graft.functions.DecimalEdgeString]], so a `decimal(p,s)` column
    * renders via the float64 encoder edge (matching the CF JSON / Avro /
    * MsgPack contract and the reference's float64 statement rendering)
    * while every other type renders as before.
    */
  def value(c: Column, quoted: Boolean): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    when(c.isNull, lit("NULL"))
      .otherwise(if (quoted) sqlQuote(c)
        else GraftColumnBridge.column(
          graft.functions.DecimalEdgeString(GraftColumnBridge.expression(c))))
  }

  /** Quote an identifier with the target dialect's quote char — ANSI `"`
    * or MySQL backquote. Applied at statement BUILD time, never to data
    * (reference encoder/sql.go quotedIdent/identQuote: rewriting the
    * finished statement would corrupt quote characters inside string
    * VALUES).
    */
  private def ident(name: String, q: String): String = q + name + q

  private def colList(cols: Seq[String], q: String): String =
    cols.map(ident(_, q)).mkString(",")

  private def insertBody(table: String, seqno: Column,
                         cols: Seq[(String, Column, Boolean)], q: String): Column = {
    val head = s"INSERT INTO ${ident(table, q)} (${colList("seqno" +: cols.map(_._1), q)}) VALUES ("
    val vals: Seq[Column] =
      seqno.cast("string") +: cols.flatMap { case (_, c, quoted) => Seq(lit(","), value(c, quoted)) }
    concat((lit(head) +: vals) :+ lit(")"): _*)
  }

  /** INSERT statement column. `cols` maps column name -> (value, quoted);
    * `identQuote` selects the dialect (`"` ANSI, `` ` `` MySQL).
    */
  def insertStmt(table: String, seqno: Column, cols: Seq[(String, Column, Boolean)],
                 identQuote: String = "\""): Column =
    concat(insertBody(table, seqno, cols, identQuote), lit(";"))

  /** DELETE keyed by seqno + PK (main_test.go:101 shape). */
  def deleteStmt(table: String, seqno: Column, pk: Seq[(String, Column, Boolean)],
                 identQuote: String = "\""): Column = {
    val q = identQuote
    val conds: Seq[Column] = pk.flatMap { case (n, c, quoted) =>
      Seq(lit(s" AND ${ident(n, q)}="), value(c, quoted))
    }
    concat((lit(s"DELETE FROM ${ident(table, q)} WHERE ${ident("seqno", q)}=") +: seqno.cast("string") +: conds)
      :+ lit(";"): _*)
  }

  /** Idempotent suffix: last-writer-wins by seqno for every NON-KEY
    * column, then the seqno column itself (main_test.go:73 golden).
    */
  def onDuplicateKeyUpdate(nonKeyCols: Seq[String], identQuote: String = "\""): String = {
    val q = identQuote
    val colClauses = nonKeyCols.map(c =>
      s"${ident(c, q)}= IF(seqno < VALUES(seqno), VALUES(${ident(c, q)}),${ident(c, q)})").mkString(",")
    s" ON DUPLICATE KEY UPDATE $colClauses, seqno = IF(seqno < VALUES(seqno), VALUES(seqno), seqno);"
  }

  /** Idempotent INSERT: reference shape, updating non-PK columns only. */
  def insertIdempotentStmt(table: String, seqno: Column,
                           cols: Seq[(String, Column, Boolean)],
                           pkCols: Set[String],
                           identQuote: String = "\""): Column =
    concat(insertBody(table, seqno, cols, identQuote),
      lit(onDuplicateKeyUpdate(cols.map(_._1).filterNot(pkCols.contains), identQuote)))

  /** Sink DDL from a (name, sqlType, notNull) column spec
    * (main_test.go:345 shape).
    */
  def createTableStmt(table: String, cols: Seq[(String, String, Boolean)], pk: Seq[String],
                      identQuote: String = "\""): String = {
    val q = identQuote
    val defs = (s"${ident("seqno", q)} BIGINT NOT NULL" +: cols.map { case (n, t, nn) =>
      s"${ident(n, q)} $t${if (nn) " NOT NULL" else ""}"
    }).mkString(", ")
    s"CREATE TABLE ${ident(table, q)} ($defs, UNIQUE KEY(${ident("seqno", q)}), PRIMARY KEY (${pk.mkString(", ")}));"
  }

  /** Idempotent upsert as ANSI MERGE (the Delta/Postgres/Derby path —
    * `ON DUPLICATE KEY` is MySQL-only): stage the micro-batch, then
    * last-writer-wins by seqno. Mirrors
    * `MERGE … WHEN MATCHED AND s.seqno > t.seqno THEN UPDATE`.
    */
  def mergeIdempotentStmt(table: String, staging: String,
                          cols: Seq[String], pkCols: Seq[String]): String = {
    val nonKey = cols.filterNot(pkCols.contains)
    val on = pkCols.map(c => s"""t."$c" = s."$c"""").mkString(" AND ")
    val sets = (nonKey.map(c => s""""$c" = s."$c"""") :+ """"seqno" = s."seqno"""").mkString(", ")
    val insCols = colList("seqno" +: cols, "\"")
    val insVals = ("seqno" +: cols).map(c => s"""s."$c"""").mkString(",")
    s"""MERGE INTO "$table" t USING "$staging" s ON $on""" +
      s""" WHEN MATCHED AND s."seqno" > t."seqno" THEN UPDATE SET $sets""" +
      s""" WHEN NOT MATCHED THEN INSERT ($insCols) VALUES ($insVals)"""
  }
}
