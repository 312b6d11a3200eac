package graft

/** Ad-hoc single-query timer for same-session A/B comparisons
  * (min-of-N over one JVM, the bench-variance discipline): args =
  * sfDir queryName [passes].
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val name = args(1)
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = GraftConf.localSession(32)
    spark.sparkContext.setLogLevel("ERROR")
    val times = (1 to passes).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[timeq] $name min=${times.min}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
