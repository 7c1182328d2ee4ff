package graft.server

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2

/** SQL-over-network endpoint (SURVEY.md §2.1 S11/S12): the engine's analogue
  * of the reference's broker `/query/sql` endpoint behind the ALB
  * (`/root/reference/lib/apache-pinot-solution-stack.ts:714-728`) and its
  * Tableau-over-JDBC consumption (`README.md:23,41`).
  *
  * Spark's Thrift JDBC/ODBC server shares this session's state, so every
  * registered view (and the Pinot compat functions, if registered on this
  * session) is queryable by any HiveServer2-protocol client — Tableau's
  * Spark SQL connector included.
  */
object SqlEndpoint {

  /** Start the JDBC endpoint on `port`; returns the JDBC URL. */
  def start(spark: SparkSession, port: Int): String = {
    spark.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    spark.sqlContext.setConf("hive.server2.thrift.bind.host", "localhost")
    HiveThriftServer2.startWithContext(spark.sqlContext)
    s"jdbc:hive2://localhost:$port/default"
  }

  /** Expose the fixture tables to every JDBC session as global temp views
    * (`global_temp.<name>`). Each Thrift connection gets its own Spark
    * session, so plain temp views would be invisible; a production
    * deployment serves a metastore-backed catalog instead and this shim
    * disappears. */
  def publishGlobalViews(spark: SparkSession, sfDir: String): Unit =
    graft.sources.Tables.all.foreach { n =>
      graft.sources.Tables.t(spark, sfDir, n).createOrReplaceGlobalTempView(n)
    }
}
