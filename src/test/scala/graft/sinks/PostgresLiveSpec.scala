package graft.sinks

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/**
 * LIVE PostgreSQL integration of the JDBC/PostGIS sink protocol (SURVEY
 * §5): the statement plan (staging CREATE → load → RENAME → index) and
 * the rollback path execute against a real postgres 15 server started
 * for the suite (initdb + pg_ctl as a non-root user, spoken to over the
 * wire protocol — the sandbox has no JDBC driver jar).
 *
 * Gates, reported via `assume` (tests cancel, not fail, when absent):
 * postgres/initdb/pg_ctl binaries + a non-root user to run them. PostGIS
 * is NOT available in this sandbox, so the `geometry(Geometry,4326)`
 * column type and its GiST DDL stay string-asserted in SinksSpec; the
 * index-creation path executes here against the built-in `point` GiST
 * opclass instead.
 */
class PostgresLiveSpec extends AnyFunSuite with SparkTestBase with BeforeAndAfterAll {

  private val dir = "/tmp/graft_pg_live"
  private val port = 54331
  private var live = false

  private def sh(cmd: String): Int =
    new ProcessBuilder("sh", "-c", cmd)
      .redirectErrorStream(true)
      .redirectOutput(new java.io.File("/dev/null"))
      .start().waitFor()

  private def asNobody(cmd: String): Int =
    sh(s"""su nobody -s /bin/sh -c "cd /tmp && $cmd" """)

  override def beforeAll(): Unit = {
    super.beforeAll()
    live =
      try {
        sh("command -v initdb && command -v pg_ctl && command -v postgres") == 0 &&
        sh(s"rm -rf $dir && mkdir -p $dir && chown nobody $dir") == 0 &&
        asNobody(s"initdb -D $dir/data") == 0 &&
        asNobody(s"pg_ctl start -w -t 30 -D $dir/data -l $dir/pg.log " +
          s"-o '-p $port -k $dir -h 127.0.0.1'") == 0
      } catch { case _: Throwable => false }
  }

  override def afterAll(): Unit = {
    if (live) { asNobody(s"pg_ctl stop -D $dir/data -m fast"); sh(s"rm -rf $dir") }
    super.afterAll()
  }

  private def withPg[A](f: PgWire => A): A = {
    val pg = new PgWire("127.0.0.1", port, "nobody", "postgres")
    try f(pg) finally pg.close()
  }

  private def executor(pg: PgWire): PostgresSink.SqlExecutor =
    new PostgresSink.SqlExecutor {
      override def execute(sql: String): Unit = pg.execute(sql)
      override def tableNames(prefix: String): Seq[String] =
        pg.query("SELECT tablename FROM pg_tables WHERE schemaname = 'public'")
          .map(_.head)
    }

  test("staging → load → atomic rename executes end-to-end on live postgres") {
    assume(live, "no live postgres in this environment")
    import spark.implicits._
    val df = Seq((1L, "Madrid", 40.4), (2L, "Bogota", 4.7), (3L, "Lima", -12.0))
      .toDF("id", "city", "lat")
    withPg { pg =>
      val rows = df.collect()
      val name = PostgresSink.write(df, "stores", executor(pg), load = staging =>
        rows.foreach { r =>
          pg.execute(s"""INSERT INTO "$staging" VALUES """ +
            s"(${r.getLong(0)}, '${r.getString(1)}', ${r.getDouble(2)})")
        })
      assert(name == "stores")
      assert(pg.query("""SELECT count(*) FROM "stores"""").head.head == "3")
      // column types came from sparkToPgType
      val types = pg.query(
        """SELECT column_name, data_type FROM information_schema.columns
          |WHERE table_name = 'stores' ORDER BY ordinal_position""".stripMargin)
      assert(types == Seq(Seq("id", "bigint"), Seq("city", "text"),
        Seq("lat", "double precision")))
      // staging table is gone (renamed, not copied)
      assert(!executor(pg).tableNames("").exists(_.startsWith("importing_")))
    }
  }

  test("collision resolution consults the live catalog") {
    assume(live, "no live postgres in this environment")
    import spark.implicits._
    val df = Seq((9L, "x", 0.0)).toDF("id", "city", "lat")
    withPg { pg =>
      val name2 = PostgresSink.write(df, "stores", executor(pg), load = s =>
        pg.execute(s"""INSERT INTO "$s" VALUES (9, 'x', 0.0)"""))
      assert(name2 == "stores_1") // D1: suffix against live pg_tables
      assert(pg.query("""SELECT count(*) FROM "stores_1"""").head.head == "1")
    }
  }

  test("rollback on failed load leaves no table behind (D6)") {
    assume(live, "no live postgres in this environment")
    import spark.implicits._
    val df = Seq((1L, "x", 0.0)).toDF("id", "city", "lat")
    withPg { pg =>
      val before = executor(pg).tableNames("").toSet
      intercept[RuntimeException] {
        PostgresSink.write(df, "broken", executor(pg), load = _ =>
          throw new RuntimeException("simulated load failure"))
      }
      assert(executor(pg).tableNames("").toSet == before)
    }
  }

  test("GiST index creation executes (built-in point opclass; PostGIS gate noted)") {
    assume(live, "no live postgres in this environment")
    withPg { pg =>
      pg.execute("""CREATE TABLE "geo_live" (id bigint, p point)""")
      pg.execute("""INSERT INTO "geo_live" VALUES (1, point(1,2)), (2, point(3,4))""")
      // same statement shape as PostgresSink.plan's GiST line, executable
      // without PostGIS by indexing a built-in point column
      pg.execute("""CREATE INDEX "geo_live_p_gist" ON "geo_live" USING GIST (p)""")
      val idx = pg.query(
        "SELECT indexname FROM pg_indexes WHERE tablename = 'geo_live'")
      assert(idx.map(_.head).contains("geo_live_p_gist"))
    }
  }
}
