package graft
import org.apache.spark.sql.SparkSession

/** Exec-mode plan audit: runs named SparkEntry queries to completion
  * (noop sink — AQE finalizes every stage), then reports the
  * AQE-FINALIZED physical plan's operator census as one JSON line per
  * query. This is the scale-readiness gate the round logs cite: a
  * CartesianProduct or an un-broadcast small-side join in the final
  * plan is a 100× scale-killer regardless of local wall time, and
  * only the POST-execution plan shows what AQE actually picked
  * (explain() before execution shows isFinalPlan=false placeholders).
  *
  * Usage: graft.PlanAudit <sfDir> [queryName...]
  *   (no names = the full suite; heavy — prefer a subset)
  *
  * Counts are substring censuses over the formatted final plan — the
  * same thing a human greps out of .explain("formatted"), made
  * machine-checkable. BNLJ/cartesian hits are NOT asserted here
  * (some queries carry documented 1-row broadcast riders); the reader
  * compares against the round log's declared rider counts.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftConf.localSession(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val selected = SparkEntry.queries
      .filter { case (k, _) => names.isEmpty || names(k) }
      .toSeq.sortBy(_._1)
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // Execute THIS DataFrame's own QueryExecution (df.write would
        // wrap the logical plan in a new QueryExecution and leave
        // df.queryExecution un-finalized — observed: isFinalPlan=false
        // on every query whose builder runs no driver-side action).
        df.queryExecution.toRdd.count()
        val plan = df.queryExecution.executedPlan.toString
        def n(tok: String) = {
          var c = 0; var i = plan.indexOf(tok)
          while (i >= 0) { c += 1; i = plan.indexOf(tok, i + tok.length) }
          c
        }
        val finalized = n("isFinalPlan=true") > 0 || n("AdaptiveSparkPlan") == 0
        println(s"""{"q":"$name","final":$finalized,""" +
          s""""exchange":${n("Exchange")},"bhj":${n("BroadcastHashJoin")},""" +
          s""""smj":${n("SortMergeJoin")},"bnlj":${n("BroadcastNestedLoopJoin")},""" +
          s""""cartesian":${n("CartesianProduct")},""" +
          // simple-string plans mark codegen stages "*(k) Op", not the
          // word WholeStageCodegen — DISTINCT stage ids = span count
          s""""codegen_spans":${"""\*\((\d+)\)""".r
            .findAllMatchIn(plan).map(_.group(1)).toSet.size}}""")
      } catch { case e: Throwable =>
        println(s"""{"q":"$name","error":"${e.getClass.getSimpleName}"}""")
      } finally {
        spark.sqlContext.clearCache()
      }
    }
    spark.stop()
  }
}
