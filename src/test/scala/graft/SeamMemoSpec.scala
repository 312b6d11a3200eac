package graft

import java.util.concurrent.{Callable, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pins the build-once seam machinery itself (VERDICT r12 items 2-3,
  * r13 item 4): exactly-once builds under concurrent first access, the
  * reliable-checkpoint knob that keeps seam pins alive through
  * executor loss on a real cluster, and BEHAVIORAL fault injection —
  * the pinned blocks are dropped through the block-manager master
  * (exactly what executor loss does to them) and the test asserts the
  * two modes diverge as designed: default local-checkpoint mode has
  * truncated its lineage and fails, reliable mode recomputes identical
  * rows from the checkpoint dir. Killing a worker JVM itself would
  * need `local-cluster` (separate workers + SPARK_HOME wiring this
  * single-JVM sbt harness does not provide), but block loss IS the
  * failure surface an executor kill presents to a downstream read —
  * injected here without leaving local mode.
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

  test("fault injection: losing pinned blocks kills local mode, reliable mode recomputes from the checkpoint dir") {
    // the pin of either mode is a LogicalRDD over one concrete RDD —
    // dropping that RDD's blocks via the block-manager master is the
    // same loss an executor crash inflicts on it
    def pinnedRddId(df: DataFrame): Int = {
      val ids = df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      }
      ids should have size 1
      ids.head
    }
    val master = org.apache.spark.SparkEnv.get.blockManager.master
    // default mode: localCheckpoint truncated the lineage, so the
    // blocks ARE the data — losing them is unrecoverable (the
    // "lineage has been truncated" warn in the logs, now asserted)
    val localPinned = SparkEntry.pinSeam(spark, spark.range(100).toDF("id"))
    localPinned.count() shouldBe 100L
    master.removeRdd(pinnedRddId(localPinned), blocking = true)
    val e = intercept[org.apache.spark.SparkException] { localPinned.count() }
    e.getMessage.toLowerCase should include("checkpoint block")
    // reliable mode: same injection, but the pin lives as files in the
    // checkpoint dir (shared storage on a cluster) — the read path
    // recomputes the SAME rows instead of failing
    val dir = java.nio.file.Files.createTempDirectory("seam_ckpt_fault").toString
    spark.conf.set("spark.graft.seam.checkpoint", "reliable")
    spark.conf.set("spark.graft.seam.checkpoint.dir", dir)
    try {
      val reliablePinned =
        SparkEntry.pinSeam(spark, spark.range(100).toDF("id"))
      reliablePinned.count() shouldBe 100L
      master.removeRdd(pinnedRddId(reliablePinned), blocking = true)
      rowsOf(reliablePinned).map(_.head.asInstanceOf[Long]).sorted shouldBe
        (0L until 100L)
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
