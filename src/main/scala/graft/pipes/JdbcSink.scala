package graft.pipes

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** SQL sink (K5): executes encoder-produced DML statements over JDBC.
  *
  * Reference semantics (/root/reference/pipe/sql.go:40-245): `PushBatch`
  * wraps a transaction, `PushBatchCommit` commits. Here each partition is
  * one transaction (statement batch), and in streaming mode each
  * micro-batch maps to `foreachBatch` → per-partition transactions —
  * at-least-once like the reference; the `_idempotent` statement formats
  * (SqlDml) make redelivery safe.
  *
  * The statements are data (a string column), so this sink works for any
  * dialect the encoder emits (ansisql for Derby/Postgres, mysql for
  * backquoted identifiers).
  */
object JdbcSink {

  /** Execute the `stmtCol` statements, one JDBC transaction per partition,
    * statements batched through `addBatch`/`executeBatch`.
    */
  def executeBatch(df: DataFrame, stmtCol: String, url: String,
                   batchSize: Int = 4096): Unit = {
    df.select(stmtCol).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          val conn = DriverManager.getConnection(url)
          try {
            conn.setAutoCommit(false)
            val st = conn.createStatement()
            var n = 0
            rows.foreach { r =>
              // statements carry their own trailing ';' for file sinks;
              // JDBC wants them bare
              st.addBatch(r.getString(0).stripSuffix(";"))
              n += 1
              if (n % batchSize == 0) st.executeBatch()
            }
            st.executeBatch()
            conn.commit()
          } catch {
            case e: Throwable => conn.rollback(); throw e
          } finally conn.close()
        }
    }
  }

  /** Streaming form: one foreachBatch per micro-batch (O6 commit shape). */
  def streamTo(df: DataFrame, stmtCol: String, url: String,
               checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        executeBatch(batch, stmtCol, url)
      }
      .start()
}
