package graft.tools

import graft.{Registry, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for selected queries so plan
  * properties (PushedFilters, ReadSchema pruning, broadcast joins,
  * WholeStageCodegen spans, TakeOrderedAndProject) can be audited — the
  * SURVEY.md §4 checklist. Usage: runMain graft.tools.Plans [queryName...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Registry.all.map(_.name)
    names.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        println(s"\n===== $name =====")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
