package graft
object ProfilePlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftConf.localSession(8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = operators.Profile.profileTable(Tables.orders(spark, "/root/testdata/sf0.1"))
    println(df.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
