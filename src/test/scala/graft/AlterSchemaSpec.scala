package graft

import org.apache.spark.sql.types._

import graft.changelog.{AlterSchema, Ddl}
import graft.core.Schema
import graft.core.Schema.{ColumnSchema, TableSchema}
import graft.state.StateStore

class AlterSchemaSpec extends SparkSuite {

  private val base = TableSchema("db1", "t1", Seq(
    ColumnSchema("f1", 1, isNullable = false, "bigint", key = "PRI"),
    ColumnSchema("f3", 2, isNullable = false, "int"),
    ColumnSchema("f4", 3, isNullable = true, "int")))

  test("ADD COLUMN appends and maps to the right Spark type") {
    // the e2e test's mid-test ALTER (main_test.go:451): add f2 varchar
    val got = AlterSchema.mutate(base, "ADD f2 varchar(32)").toOption.get
    assert(got.columns.map(_.name) == Seq("f1", "f3", "f4", "f2"))
    assert(Schema.toStructType(got)("f2").dataType == StringType)
    assert(got.columns.last.isNullable)
  }

  test("ADD ... AFTER / FIRST reorder ordinals") {
    val afterF1 = AlterSchema.mutate(base, "ADD COLUMN x tinyint(1) NOT NULL AFTER f1").toOption.get
    assert(afterF1.columns.map(_.name) == Seq("f1", "x", "f3", "f4"))
    assert(afterF1.columns.map(_.ordinal) == Seq(1, 2, 3, 4))
    assert(Schema.toStructType(afterF1)("x").dataType == BooleanType)
    val first = AlterSchema.mutate(base, "ADD `y` double FIRST").toOption.get
    assert(first.columns.head.name == "y")
  }

  test("DROP / MODIFY / CHANGE and multi-clause ALTER") {
    val got = AlterSchema.mutate(base,
      "DROP COLUMN f4, MODIFY f3 bigint NOT NULL, ADD f5 decimal(10,2)").toOption.get
    assert(got.columns.map(_.name) == Seq("f1", "f3", "f5"))
    assert(got.columns(1).dataType == "bigint")
    assert(got.columns(2).numericScale == 2)
    val renamed = AlterSchema.mutate(base, "CHANGE f3 f3_new bigint").toOption.get
    assert(renamed.columns.map(_.name) == Seq("f1", "f3_new", "f4"))
  }

  test("guards: PK drop, unknown columns, unsupported clauses") {
    assert(AlterSchema.mutate(base, "DROP f1").isLeft)
    assert(AlterSchema.mutate(base, "DROP nope").isLeft)
    assert(AlterSchema.mutate(base, "CONVERT TO CHARACTER SET utf8").isLeft)
  }

  test("end-to-end DDL propagation: classify -> mutate -> version in state") {
    val state = new StateStore(
      java.nio.file.Files.createTempDirectory("graft-ddl").toString)
    state.pushSchema("db1", "t1", "gtid:1", Schema.toStructType(base))

    val ddl = "ALTER TABLE db1.t1 ADD f2 varchar(32)"
    Ddl.classify(ddl) match {
      case Ddl.AlterTable(db, table, rest) =>
        val next = AlterSchema.mutate(base, rest).toOption.get
        state.pushSchema(db.getOrElse("db1"), table, "gtid:2", Schema.toStructType(next))
      case other => fail(s"expected AlterTable, got $other")
    }
    val current = state.currentSchema("db1", "t1").get
    assert(current.fieldNames.toSeq == Seq("f1", "f3", "f4", "f2"))
  }
}
