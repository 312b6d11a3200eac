package graft

/** Ad-hoc single-query timer for same-session A/B comparisons
  * (min-of-N over one JVM, the bench-variance discipline): args =
  * sfDir queryNames[,comma-list] [passes] [sqlConfKey=value ...].
  * Reports wall, gc_ms and allocated MB per pass (allocation is the
  * host-noise-free counterpart of gc_ms for A/B work).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(',').toSeq // comma-list shares one JVM/session
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = GraftConf.localSession(32)
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(3).foreach { kv =>
      val Array(k, v) = kv.split("=", 2) // values may contain '='
      spark.conf.set(k, v)
      println(s"[timeq] set $k=$v")
    }
    import scala.jdk.CollectionConverters._
    def gcMs(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    // total heap bytes allocated across all live threads — the
    // host-noise-free counterpart of gc_ms for A/B allocation work
    // (task threads are pooled and live for the JVM's life, so the
    // sum is monotone between passes)
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    def allocMb(): Double = {
      val ids = tmx.getAllThreadIds
      tmx.getThreadAllocatedBytes(ids).filter(_ > 0).sum / 1e6
    }
    for (name <- names) {
      val runs = (1 to passes).map { _ =>
        spark.catalog.clearCache()
        System.gc() // drain prior garbage so gc_ms is THIS pass's own
        val g0 = gcMs(); val a0 = allocMb()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, gcMs() - g0, allocMb() - a0)
      }
      val best = runs.minBy(_._1)
      println(f"[timeq] $name min=${best._1}%.3f gc_at_min=${best._2}ms " +
        f"alloc_at_min=${best._3}%.0fMB " +
        f"all=${runs.map(r => f"${r._1}%.2f/${r._2}/${r._3}%.0f").mkString(",")}")
    }
    spark.stop()
  }
}
