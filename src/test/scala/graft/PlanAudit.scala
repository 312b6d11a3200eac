package graft

/** Round plan-audit harness (test scope, run by hand):
  * prints the join/exchange inventory of each named query's executed
  * plan at sf0.001 — the evidence line SURVEY's plan-audit sections
  * cite. Not a ScalaTest suite; invoked via Test/runMain.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = args.drop(1) match {
      case Array() => SparkEntry.queries.keys.toSeq.sorted
      case rest => rest.toSeq
    }
    val spark = GraftConf.localSession(4)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      def n(s: String): Int = plan.sliding(s.length).count(_ == s)
      println(f"$name%-24s BNLJ=${n("BroadcastNestedLoopJoin")}%d " +
        f"cart=${n("CartesianProduct")}%d bhj=${n("BroadcastHashJoin")}%d " +
        f"smj=${n("SortMergeJoin")}%d exch=${n("Exchange")}%d")
    }
    spark.stop()
  }
}
