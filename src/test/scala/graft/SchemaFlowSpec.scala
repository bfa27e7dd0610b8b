package graft

import java.nio.file.Files

import graft.core.Schema.{ColumnSchema, TableSchema}
import graft.state.StateStore
import graft.stream.SchemaFlow

class SchemaFlowSpec extends SparkSuite {

  private val t1 = TableSchema("db1", "t1", Seq(
    ColumnSchema("f1", 1, isNullable = false, "bigint", key = "PRI"),
    ColumnSchema("f3", 2, isNullable = false, "int"),
    ColumnSchema("f4", 3, isNullable = true, "int")))

  private def newState() = new StateStore(
    Files.createTempDirectory("graft-schemaflow").toString)

  test("ALTER on the streamed table: version pushed + schema event emitted") {
    val state = newState()
    val out = SchemaFlow.onQueryEvent(state, t1,
      "ALTER TABLE db1.t1 ADD f2 varchar(32)", "uuid:1-42", seqNo = 7L)
    out match {
      case SchemaFlow.SchemaChanged(next, event) =>
        assert(next.columns.map(_.name) == Seq("f1", "f3", "f4", "f2"))
        assert(event ==
          """{"Type":"schema","Key":["f1"],"SeqNo":7,"Timestamp":0,"Fields":[{"Name":"f1","Value":"bigint"},{"Name":"f3","Value":"int"},{"Name":"f4","Value":"int"},{"Name":"f2","Value":"varchar(32)"}]}""")
        assert(state.currentSchema("db1", "t1").get.fieldNames.contains("f2"))
      case other => fail(s"expected SchemaChanged, got $other")
    }
  }

  test("other tables' DDL and non-DDL pass through untouched") {
    val state = newState()
    assert(SchemaFlow.onQueryEvent(state, t1,
      "ALTER TABLE db1.other ADD x int", "g", 1L) == SchemaFlow.NotSchemaRelated)
    assert(SchemaFlow.onQueryEvent(state, t1, "BEGIN", "g", 1L) == SchemaFlow.NotSchemaRelated)
    assert(state.currentSchema("db1", "t1").isEmpty) // nothing pushed
  }

  test("RENAME and unsupported clauses request a schema re-pull") {
    val state = newState()
    assert(SchemaFlow.onQueryEvent(state, t1,
      "RENAME TABLE db1.t1 TO db1.t1_new", "g", 1L).isInstanceOf[SchemaFlow.NeedsRepull])
    assert(SchemaFlow.onQueryEvent(state, t1,
      "ALTER TABLE db1.t1 CONVERT TO CHARACTER SET utf8", "g", 1L)
      .isInstanceOf[SchemaFlow.NeedsRepull])
  }
}
