package graft.destinations

import graft.config.{JdbcAppend, JdbcCustom, JdbcDestination}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC destination — the Spark equivalent of the reference's ODBC writer
  * (aqueducts/odbc/src/lib.rs:87-211).
  *
  *   - `append`: distributed `DataFrameWriter.jdbc` — executors write
  *     concurrently in `batch_size` batches (reference :141-164).
  *   - `custom`: one transaction = optional `pre_insert` statement + prepared
  *     inserts + commit, rollback on any error (reference :170-211).
  *     All-or-nothing semantics require a single connection/transaction, so
  *     rows stream through the driver via `toLocalIterator` (one partition in
  *     memory at a time, never a full collect). This mode trades scale for
  *     transactionality by design — same contract as the reference.
  *     THROUGHPUT CEILING: one connection's insert rate (batched, but
  *     serial) — right for dimension-sized loads that must be atomic;
  *     `append` is the distributed scale path (one connection per
  *     partition, no cross-partition transaction).
  */
object Jdbc {

  def write(spark: SparkSession, d: JdbcDestination, df: DataFrame): Unit = d.writeMode match {
    case JdbcAppend =>
      df.write.format("jdbc")
        .option("url", d.connectionString)
        .option("dbtable", d.name)
        .option("batchsize", d.batchSize.toString)
        .mode(SaveMode.Append)
        .save()

    case JdbcCustom(preInsert, insert) =>
      val conn = java.sql.DriverManager.getConnection(d.connectionString)
      try {
        conn.setAutoCommit(false)
        preInsert.foreach { sql =>
          val st = conn.createStatement()
          try st.execute(sql) finally st.close()
        }
        val ps = conn.prepareStatement(insert)
        try {
          var inBatch = 0
          // single-connection transactional path: throughput is bounded by
          // one JDBC connection's serial (batched) insert rate and rows
          // stream through the driver — use `append` for bulk loads
          val it = df.toLocalIterator()
          while (it.hasNext) {
            val row = it.next()
            var i = 0
            while (i < row.length) {
              if (row.isNullAt(i)) ps.setObject(i + 1, null) else ps.setObject(i + 1, row.get(i))
              i += 1
            }
            ps.addBatch()
            inBatch += 1
            if (inBatch >= d.batchSize) { ps.executeBatch(); inBatch = 0 }
          }
          if (inBatch > 0) ps.executeBatch()
          conn.commit()
        } finally ps.close()
      } catch {
        case e: Throwable =>
          try conn.rollback() catch { case _: Throwable => () }
          throw e
      } finally conn.close()
  }
}
