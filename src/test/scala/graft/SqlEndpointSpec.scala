package graft

import graft.sources.Tables
import java.sql.DriverManager

/** End-to-end S11/S12: a real JDBC client round-trip through the Thrift
  * endpoint — the engine's broker-ALB analogue. */
class SqlEndpointSpec extends GraftSuite {

  test("JDBC client queries the engine over the network endpoint") {
    server.SqlEndpoint.publishGlobalViews(spark, sfDir)
    val url = server.SqlEndpoint.start(spark, port = 10777)
    // server binds asynchronously; retry the connect briefly
    var conn: java.sql.Connection = null
    var attempts = 0
    while (conn == null && attempts < 30) {
      try conn = DriverManager.getConnection(url, "", "")
      catch { case _: Exception => attempts += 1; Thread.sleep(1000) }
    }
    assert(conn != null, s"could not connect to $url after ${attempts}s")
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT l_returnflag, count(*) AS n FROM global_temp.lineitem " +
          "GROUP BY l_returnflag ORDER BY l_returnflag")
      val got = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (r.getString(1), r.getLong(2)))
        .toList
      assert(got.map(_._1) === List("A", "N", "R"))
      assert(got.map(_._2).sum === Tables.t(spark, sfDir, "lineitem").count())
    } finally conn.close()
  }
}
