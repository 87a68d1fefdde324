package graft.destinations

import graft.SparkSpec
import graft.config._
import graft.run.Runner

/** JDBC source/destination against embedded Derby (the image's only bundled
  * database driver) — ports the reference's DB-backed suite shape
  * (aqueducts/odbc/src/lib.rs:213-490) incl. custom-transaction rollback.
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def exec(sql: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try { val st = c.createStatement(); try st.execute(sql) finally st.close() }
    finally c.close()
  }

  private def queryInts(sql: String): Seq[Int] = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery(sql)
      val out = Seq.newBuilder[Int]
      while (rs.next()) out += rs.getInt(1)
      out.result()
    } finally c.close()
  }

  test("jdbc source reads via pushed-down query; jdbc append writes back") {
    exec("CREATE TABLE src_tbl (id INT, name VARCHAR(20))")
    exec("INSERT INTO src_tbl VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    exec("CREATE TABLE dst_tbl (id INT, name VARCHAR(20))")

    val aq = Aqueduct(
      sources = Seq(JdbcSource("db_src", "SELECT * FROM src_tbl WHERE id >= 2", url)),
      stages = Seq(Seq(Stage("db_stage", "SELECT id, name FROM db_src"))),
      destination = Some(JdbcDestination("dst_tbl", url, JdbcAppend)))
    Runner.run(spark, aq)
    assert(queryInts("SELECT id FROM dst_tbl ORDER BY id") == Seq(2, 3))
  }

  test("custom write mode: pre_insert + prepared inserts in one transaction") {
    exec("CREATE TABLE tx_tbl (id INT, name VARCHAR(20))")
    exec("INSERT INTO tx_tbl VALUES (99, 'stale')")
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("id", "name")
    Jdbc.write(spark,
      JdbcDestination("tx_tbl", url,
        JdbcCustom(Some("DELETE FROM tx_tbl"), "INSERT INTO tx_tbl VALUES (?, ?)")),
      df)
    assert(queryInts("SELECT id FROM tx_tbl ORDER BY id") == Seq(1, 2))
  }

  test("custom write mode rolls back everything on error (odbc lib.rs:170-211)") {
    exec("CREATE TABLE rb_tbl (id INT NOT NULL, name VARCHAR(20))")
    exec("INSERT INTO rb_tbl VALUES (42, 'keep')")
    import spark.implicits._
    // second row violates NOT NULL → whole tx (incl. the DELETE) must roll back
    val df = Seq((Some(1), "a"), (None, "boom")).toDF("id", "name")
    assertThrows[Exception] {
      Jdbc.write(spark,
        JdbcDestination("rb_tbl", url,
          JdbcCustom(Some("DELETE FROM rb_tbl"), "INSERT INTO rb_tbl VALUES (?, ?)")),
        df)
    }
    assert(queryInts("SELECT id FROM rb_tbl") == Seq(42), "rollback must restore pre-tx state")
  }
}
