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
    // SPARK_GRAFT_PLAN_EXEC=1: materialize each query first so AQE
    // finalizes — the printed counts are then the RUNTIME join picks
    // (isFinalPlan=true), not the static plan. This is the evidence
    // mode for size-based join choices left to AQE (e.g. the r10
    // un-hinted customer/supplier joins in q139/q140/q143: static
    // plans show SMJ, the finalized plan shows AQE's BHJ at test SF).
    val exec = sys.env.get("SPARK_GRAFT_PLAN_EXEC").contains("1")
    val spark = GraftConf.localSession(4)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val qe = SparkEntry.queries(name)(spark, dir).queryExecution
      if (exec) qe.toRdd.foreach(_ => ())
      val plan = qe.executedPlan.toString
      def n(s: String): Int = plan.sliding(s.length).count(_ == s)
      println(f"$name%-24s BNLJ=${n("BroadcastNestedLoopJoin")}%d " +
        f"cart=${n("CartesianProduct")}%d bhj=${n("BroadcastHashJoin")}%d " +
        f"smj=${n("SortMergeJoin")}%d exch=${n("Exchange")}%d " +
        f"final=${plan.contains("isFinalPlan=true")}%b")
    }
    spark.stop()
  }
}
