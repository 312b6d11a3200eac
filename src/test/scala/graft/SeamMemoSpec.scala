package graft

import java.util.concurrent.{Callable, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pins the build-once seam machinery itself (VERDICT r12 items 2-3):
  * exactly-once builds under concurrent first access, and the
  * reliable-checkpoint knob that keeps seam pins alive through
  * executor loss on a real cluster.
  *
  * Executor-kill fault injection is deliberately NOT attempted here:
  * the suite runs one local JVM (local[2]), where killing "the
  * executor" kills the driver too; `local-cluster` mode would spawn
  * separate worker JVMs needing SPARK_HOME wiring and a test-classpath
  * hand-off that this sandbox's single-JVM sbt harness does not
  * provide. What IS provable locally — and is the entire mechanism the
  * fault-tolerance claim rests on — is that reliable mode writes the
  * pinned partitions to the configured filesystem dir (shared storage
  * on a cluster, where they survive any executor) instead of executor
  * block-manager memory.
  */
class SeamMemoSpec extends SparkSpec {

  test("perSessionMemo builds exactly once under concurrent first access") {
    val cache = new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, SparkEntry.SeamBox]]()
    val builds = new AtomicInteger(0)
    def memoCall(): DataFrame =
      SparkEntry.perSessionMemo(cache, spark, "k") {
        builds.incrementAndGet()
        // a real (lazy, session-bound) frame, as the seams build
        spark.range(3).toDF("id").localCheckpoint(true)
      }
    // two threads race the FIRST access through a start barrier — the
    // old getOrElseUpdate-of-DataFrame evaluated the builder in both
    val ready = new CountDownLatch(2)
    val go = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    try {
      val futs = (1 to 2).map { _ =>
        pool.submit(new Callable[DataFrame] {
          override def call(): DataFrame = {
            ready.countDown()
            go.await(10, TimeUnit.SECONDS)
            memoCall()
          }
        })
      }
      ready.await(10, TimeUnit.SECONDS) shouldBe true
      go.countDown()
      val dfs = futs.map(_.get(60, TimeUnit.SECONDS))
      builds.get() shouldBe 1
      // both callers hold the SAME memoized frame, not equal rebuilds
      assert(dfs(0) eq dfs(1))
      // later sequential access still reuses it
      assert(memoCall() eq dfs(0))
      builds.get() shouldBe 1
    } finally pool.shutdown()
  }

  test("pinSeam reliable mode checkpoints to the configured dir and yields the same rows") {
    val dir = java.nio.file.Files.createTempDirectory("seam_ckpt").toString
    spark.conf.set("spark.graft.seam.checkpoint", "reliable")
    spark.conf.set("spark.graft.seam.checkpoint.dir", dir)
    try {
      val pinned = SparkEntry.pinSeam(spark, spark.range(10).toDF("id"))
      pinned.count() shouldBe 10L
      rowsOf(pinned).map(_.head.asInstanceOf[Long]).sorted shouldBe (0L to 9L)
      // the pinned partitions live as FILES under the configured dir —
      // on a cluster that dir is shared storage, which is exactly why
      // they survive executor loss (local-checkpoint blocks do not)
      def walk(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        kids ++ kids.flatMap(walk)
      }
      val parts = walk(new java.io.File(dir))
        .filter(f => f.isFile && f.getName.startsWith("part-"))
      assert(parts.nonEmpty,
        s"no checkpoint part files under $dir — reliable mode did not engage")
    } finally {
      spark.conf.set("spark.graft.seam.checkpoint", "local")
      spark.conf.unset("spark.graft.seam.checkpoint.dir")
    }
  }

  test("pinSeam default stays localCheckpoint; unknown mode fails loudly") {
    // default (no conf set): local checkpoint — plan collapses to a scan
    val pinned = SparkEntry.pinSeam(spark, spark.range(5).toDF("id"))
    pinned.count() shouldBe 5L
    assert(pinned.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
    spark.conf.set("spark.graft.seam.checkpoint", "both-please")
    try {
      val e = intercept[IllegalArgumentException] {
        SparkEntry.pinSeam(spark, spark.range(1).toDF("id"))
      }
      e.getMessage should include("both-please")
    } finally spark.conf.set("spark.graft.seam.checkpoint", "local")
  }
}
