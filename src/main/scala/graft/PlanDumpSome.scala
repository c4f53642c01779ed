package graft

import java.nio.file.{Files, Paths}

/** Dev tool: `explain("formatted")` for an arbitrary query subset — the
  * per-round plan-audit companion to [[PlanDump]]'s fixed headline list.
  * `sbt "runMain graft.PlanDumpSome <sfDir> <outFile> <query ...>"` */
object PlanDumpSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = args(1)
    val names = args.drop(2).toSeq
    val spark = DevSession.local()
    val sb = new StringBuilder
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      sb.append(s"## $name\n\n```\n")
      try sb.append(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => sb.append(s"EXPLAIN FAILED: $e\n") }
      sb.append("```\n\n")
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    spark.stop()
  }
}
