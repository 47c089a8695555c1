package graft

import org.apache.spark.sql.execution.FormattedMode

/** Dev utility: print the formatted physical plan of one or more
  * SparkEntry queries (all when no args). Use to confirm pushdown
  * (`PushedFilters`, pruned `ReadSchema`), join strategies, and
  * codegen spans while iterating on operators:
  * {{{ sbt "runMain graft.PlanCheck q10_pruned_scan" }}}
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"===== $name")
      println(SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
