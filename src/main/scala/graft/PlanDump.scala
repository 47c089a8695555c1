package graft

import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: dump `.explain("formatted")` for named queries to files —
  * the optimization-round evidence trail (plans/rNN/<query>_<tag>.txt).
  *
  * Usage: runMain graft.PlanDump <outDir> <tag> <query> [<query> ...]
  *
  * Explain only — nothing executes, so this is safe to run against any
  * scale factor. Stream gates and fixture-building gates that cannot be
  * planned without side effects are skipped with a note.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query...>")
    val outDir = java.nio.file.Paths.get(args(0))
    val tag = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => System.err.println(s"[plandump] unknown query: $n")
        case Some(f) =>
          val out = outDir.resolve(s"${n}_$tag.txt")
          try {
            val plan = f(spark, sfDir).queryExecution.explainString(FormattedMode)
            java.nio.file.Files.writeString(out, plan)
            println(s"[plandump] wrote $out")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $n failed to plan: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
