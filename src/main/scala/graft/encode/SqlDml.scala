package graft.encode

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SQL DML encoders (`mysql`/`ansisql` + `_idempotent` variants).
  *
  * Statement shapes from the reference (/root/reference/encoder/sql.go:34-314):
  *  - INSERT INTO "t" ("seqno","c1",…) VALUES (v1,…);
  *  - DELETE FROM "t" WHERE seqno=… AND pk=…;
  *  - idempotent: … ON DUPLICATE KEY UPDATE c=IF(seqno<VALUES(seqno),
  *    VALUES(c),c), … — last-writer-wins by seqno
  *    (/root/reference/encoder/sql.go:133-148, :231-238).
  *  - schema: CREATE TABLE "t" ("seqno" BIGINT NOT NULL, …,
  *    UNIQUE KEY("seqno"), PRIMARY KEY (pks)); (:197-213)
  *
  * The generated statements are data (string columns) executed in
  * `foreachBatch` via JDBC; on Delta-capable sinks the idempotent variant
  * maps to `MERGE … WHEN MATCHED AND s.seqno > t.seqno THEN UPDATE`.
  * String escaping doubles single quotes (util/mysql.go:24-96 semantics).
  */
object SqlDml {

  /** Escape a string column for embedding in a single-quoted SQL literal. */
  def sqlQuote(c: Column): Column =
    concat(lit("'"), regexp_replace(c.cast("string"), "'", "''"), lit("'"))

  /** Render a value for VALUES(): numeric columns pass through, strings get
    * quoted. Caller says which.
    */
  def value(c: Column, quoted: Boolean): Column =
    if (quoted) sqlQuote(c) else c.cast("string")

  private def colList(cols: Seq[String]): String =
    cols.map(c => "\"" + c + "\"").mkString(",")

  private def insertBody(table: String, seqno: Column, cols: Seq[(String, Column, Boolean)]): Column = {
    val head = s"""INSERT INTO "$table" (${colList("seqno" +: cols.map(_._1))}) VALUES ("""
    val vals: Seq[Column] =
      seqno.cast("string") +: cols.flatMap { case (_, c, q) => Seq(lit(","), value(c, q)) }
    concat((lit(head) +: vals) :+ lit(")"): _*)
  }

  /** INSERT statement column. `cols` maps column name -> (value, quoted). */
  def insertStmt(table: String, seqno: Column, cols: Seq[(String, Column, Boolean)]): Column =
    concat(insertBody(table, seqno, cols), lit(";"))

  /** DELETE statement keyed by seqno + PK (encoder/sql.go delete shape). */
  def deleteStmt(table: String, seqno: Column, pk: Seq[(String, Column, Boolean)]): Column = {
    val conds: Seq[Column] = pk.flatMap { case (n, c, q) =>
      Seq(lit(s""" AND "$n"="""), value(c, q))
    }
    concat((lit(s"""DELETE FROM "$table" WHERE seqno=""") +: seqno.cast("string") +: conds) :+ lit(";"): _*)
  }

  /** Idempotent suffix: last-writer-wins by seqno for every non-key column. */
  def onDuplicateKeyUpdate(cols: Seq[String]): String =
    " ON DUPLICATE KEY UPDATE " + cols.map(c =>
      s"""$c=IF(seqno<VALUES(seqno),VALUES($c),$c)""").mkString(", ")

  /** Idempotent INSERT: append the ON DUPLICATE KEY UPDATE clause. */
  def insertIdempotentStmt(table: String, seqno: Column,
                           cols: Seq[(String, Column, Boolean)]): Column =
    concat(insertBody(table, seqno, cols),
      lit(onDuplicateKeyUpdate(cols.map(_._1)) + ";"))

  /** Sink DDL from a (name, sqlType, notNull) column spec. */
  def createTableStmt(table: String, cols: Seq[(String, String, Boolean)], pk: Seq[String]): String = {
    val defs = ("\"seqno\" BIGINT NOT NULL" +: cols.map { case (n, t, nn) =>
      s""""$n" $t${if (nn) " NOT NULL" else ""}"""
    }).mkString(", ")
    s"""CREATE TABLE "$table" ($defs, UNIQUE KEY("seqno"), PRIMARY KEY (${pk.mkString(", ")}));"""
  }
}
