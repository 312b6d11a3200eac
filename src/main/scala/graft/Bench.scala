package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, timing FULL materialization (noop datasource
  * sink — every row is produced, nothing is collected to the driver),
  * and prints one machine-parseable JSON line.
  *
  * The record is SELF-ATTRIBUTING (VERDICT r12 item 1: the r12 driver
  * record read 1.08× while solo re-timings proved 0.79× — the
  * inflation was in-suite/host noise, and nothing in the record let a
  * reader see that without a judge re-run). The instruments that make
  * an outlier explainable from the record alone:
  *
  *  - per-query `passes`: ALL pass times, not just the min — a query
  *    whose passes read [16.1, 16.0] regressed; [13.3, 3.6] hit a
  *    transient (GC storm, load burst, codegen compile) on pass 1.
  *  - per-query `gc_ms` / `gc_pause_ms` / `codegen_compiles` per
  *    pass: `gc_ms` is the summed task jvmGCTime — 32 concurrent
  *    tasks each count the same collection, so it over-reads real
  *    pause time by up to the task-slot count (r13/r14 burned
  *    adjudication time on ">100% gc share" artifacts); `gc_pause_ms`
  *    is the JVM GarbageCollectorMXBean collection-time delta — the
  *    REAL wall-clock pause, exact in local[32]'s single JVM (VERDICT
  *    r14 item 1). Quote gc_pause_ms; gc_ms remains for its
  *    allocation-pressure signal (tasks × pauses).
  *  - per-query `steal` per pass + top-level `pass_steal`: host CPU
  *    steal jiffies accrued during the query / the full-suite pass.
  *  - `steal_pre`: a pre-run steal sample over SPARK_GRAFT_STEAL_SECS
  *    seconds (default 120; 0 skips for local iteration) — this
  *    host's steal arrives in 10-60 min waves, so per-pass deltas
  *    alone can look clean while the suite ran inside a wave.
  *
  * Steal-aware pass retry (VERDICT r14 item 2: all five r14 attempts
  * ran on 51k-104k-jiffy steal and the round total was unusable
  * cross-round, while clean windows demonstrably existed): after the
  * base SPARK_GRAFT_PASSES passes, if fewer than min(2, passes) of
  * them accrued ≤ SPARK_GRAFT_STEAL_THRESHOLD jiffies (default 2000 ≈
  * 20 stolen CPU-seconds), up to SPARK_GRAFT_STEAL_RETRIES (default
  * 3) extra full passes run until enough clean ones exist. Per-query
  * mins stay min-over-ALL-passes — steal only ever inflates a pass,
  * so a contaminated pass can never fake a better min — and the
  * record stamps `pass_steal`, `clean_passes` (indices) and
  * `no_clean_window` so a reader can see at a glance whether the
  * total is comparable.
  *
  * Record files (VERDICT r14 item 5): every run lands ONLY in
  * bench_attempts/bench_out.<n>.json (first free n, CREATE_NEW).
  * `bench_out.json` — the round-record pointer cross-round tooling
  * reads — is written solely by an explicit
  * `graft.Bench --promote <n>` step, logged in
  * bench_attempts/promotions.log, so a driver or manual run can never
  * silently replace the committed round record in the working tree.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // ---- explicit promotion mode: the ONLY writer of bench_out.json
    if (args.length >= 1 && args(0) == "--promote") {
      require(args.length == 2, "usage: graft.Bench --promote <n>")
      val n = args(1).toInt
      val src = Paths.get("bench_attempts", s"bench_out.$n.json")
      require(Files.exists(src), s"no such attempt: $src")
      Files.copy(src, Paths.get("bench_out.json"),
        StandardCopyOption.REPLACE_EXISTING)
      val note = s"promoted attempt $n -> bench_out.json at " +
        java.time.Instant.now().toString + "\n"
      Files.writeString(Paths.get("bench_attempts", "promotions.log"), note,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      println(s"[bench] $note")
      return
    }

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    def stealJiffies(): Long =
      try {
        val src = scala.io.Source.fromFile("/proc/stat")
        try {
          val f = src.getLines().next().trim.split("\\s+")
          if (f.length > 8) f(8).toLong else -1L
        } finally src.close()
      } catch { case _: Throwable => -1L }

    // Real GC pause time: the JVM's own collector-time counter. In
    // local[32] there is exactly one JVM, so deltas of this counter
    // ARE the wall-clock milliseconds the collectors ran — no
    // task-level multi-counting.
    def gcPauseMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }

    // Pre-run steal sample BEFORE the session spins up (an idle JVM —
    // any steal observed here is the host's, not ours). Records both
    // the window and the delta so the reader can rate-compare runs.
    val stealSecs =
      math.max(0, sys.env.getOrElse("SPARK_GRAFT_STEAL_SECS", "120").toInt)
    val stealPre =
      if (stealSecs == 0) """{"secs":0,"jiffies":-1}"""
      else {
        val s0 = stealJiffies()
        Thread.sleep(stealSecs * 1000L)
        val d = stealJiffies() - s0
        s"""{"secs":$stealSecs,"jiffies":$d}"""
      }

    // the shared harness session (GraftConf) so the bench runs the
    // same optimizer configuration as Verify and the specs
    val spark = GraftConf.localSession(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // ---- per-query GC attribution: one listener accumulating task
    // jvmGCTime; snapshot deltas around each query. The listener bus
    // is async, so the post-query snapshot flushes it first (via the
    // bytecode-public LiveListenerBus.waitUntilEmpty — private[spark]
    // in source, hence reflection; best-effort: on any failure the
    // delta still lands, attributed to whichever query the late
    // events trail into).
    val gcAccum = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) { gcAccum.addAndGet(m.jvmGCTime); () }
        }
      })
    val flushListenerBus: () => Unit =
      try {
        val busM = spark.sparkContext.getClass.getMethod("listenerBus")
        val bus = busM.invoke(spark.sparkContext)
        val waitM = bus.getClass.getMethod("waitUntilEmpty")
        () => { try { waitM.invoke(bus); () } catch { case _: Throwable => () } }
      } catch { case _: Throwable => () => () }

    // Janino compilation counter (Spark's global CodegenMetrics — the
    // object is private[spark], so reflection again; -1 everywhere if
    // the internals moved, never a crash)
    val codegenCount: () => Long =
      try {
        val cls = Class.forName(
          "org.apache.spark.metrics.source.CodegenMetrics$")
        val mod = cls.getField("MODULE$").get(null)
        val hist = cls.getMethod("METRIC_COMPILATION_TIME").invoke(mod)
          .asInstanceOf[com.codahale.metrics.Histogram]
        () => hist.getCount
      } catch { case _: Throwable => () => -1L }

    // Warmup: run the flagship once untimed so JVM/codegen/session setup
    // is not attributed to the first timed query (r2's q01 showed 17 s of
    // suite warmup vs ~3 s steady-state).
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    // per-query failure COUNT, not a flat set: a query that fails one
    // pass but succeeds another is "flaky" (valid min time, listed
    // separately), only all-pass failures are "failed" — r6's flat set
    // reported both a failure and a valid time for the same query
    var failCounts = Map.empty[String, Int].withDefaultValue(0)
    // Host-load attribution (r9 verdict item 4: the driver read +31%
    // over the builder's recorded total, uniformly — environment, not
    // regression, but unprovable without data). One snapshot before
    // each pass and one after the last: 1-min loadavg, cumulative cpu
    // steal jiffies from /proc/stat (deltas between snapshots = steal
    // during the pass), and the number of live JVMs (concurrent
    // harnesses are the usual contention source on a shared host).
    def hostSnapshot(): String = {
      val load = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      val steal = stealJiffies()
      // FOREIGN JVMs only (VERDICT r11 nit: the old count included the
      // bench's own sbt parent, so a demonstrably quiet host read
      // jvms=2 and needed prose attribution) — exclude this process,
      // its ancestors (the sbt/launcher chain), and its descendants,
      // so a clean run reads foreign_jvms=0 machine-checkably.
      val own = scala.collection.mutable.Set.empty[Long]
      var cur: java.util.Optional[ProcessHandle] =
        java.util.Optional.of(ProcessHandle.current())
      while (cur.isPresent) { own += cur.get.pid(); cur = cur.get.parent() }
      ProcessHandle.current().descendants().forEach(p => own += p.pid())
      val jvms = ProcessHandle.allProcesses()
        .filter(p => p.info().command()
          .map[java.lang.Boolean](_.contains("java")).orElse(false))
        .filter(p => !own.contains(p.pid()))
        .count()
      val l = "%.2f".formatLocal(java.util.Locale.ROOT, load)
      s"""{"loadavg":$l,"steal_jiffies":$steal,"foreign_jvms":$jvms}"""
    }
    val hostSnaps = scala.collection.mutable.ArrayBuffer.empty[String]
    // VERDICT r11 item 3: q144's full-exact corpus² side is the
    // GATE-SCALE recall audit; q206 (sampled probes) is the
    // 100×-survivable protocol. The bench carries ONE price per
    // protocol: q144 stays oracle-gated every round via Verify and its
    // full-exact run is stress-hosted (StressBench knn_exact_full),
    // but it is not timed in the resident bench suite. Passing it as
    // an explicit arg still benches it for local iteration. The
    // record DECLARES this (VERDICT r14 item 4) in its `excluded`
    // field so n=216-vs-217-gated explains itself.
    val benchExcluded = Map(
      "q144_knn_audit_approx" ->
        ("gate-scale full-exact recall audit: oracle-gated every round " +
          "via Verify, timed as StressBench knn_exact_full; q206 is the " +
          "benched sampled-probe ANN protocol"))
    // optional args = query-name subset for local iteration; the driver
    // passes none and gets the full suite
    val selected =
      if (args.isEmpty)
        SparkEntry.queries.filter { case (k, _) => !benchExcluded.contains(k) }
      else SparkEntry.queries.filter { case (k, _) => args.contains(k) }
    val order = selected.keys.toSeq.sorted
    // per-query, per-pass instrument arrays (a failed pass records
    // elapsed -1.0 — self-documenting in the detail, excluded from min)
    val passTimes = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.ArrayBuffer[Double]]
    val passGc = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.ArrayBuffer[Long]]
    val passGcPause = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.ArrayBuffer[Long]]
    val passSteal = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.ArrayBuffer[Long]]
    val passCodegen = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.ArrayBuffer[Long]]
    def buf[T](m: scala.collection.mutable.Map[String,
        scala.collection.mutable.ArrayBuffer[T]], k: String) =
      m.getOrElseUpdate(k, scala.collection.mutable.ArrayBuffer.empty[T])
    def runPass(): Unit =
      order.foreach { name =>
        val fn = selected(name)
        flushListenerBus()
        val gc0 = gcAccum.get(); val cg0 = codegenCount()
        val gp0 = gcPauseMs(); val st0 = stealJiffies()
        val t0 = System.nanoTime()
        var ok = true
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failCounts += name -> (failCounts(name) + 1)
          ok = false
        }
        val elapsed = (System.nanoTime() - t0) / 1e9
        flushListenerBus()
        buf(passTimes, name) += (if (ok) elapsed else -1.0)
        buf(passGc, name) += gcAccum.get() - gc0
        buf(passGcPause, name) += gcPauseMs() - gp0
        val st1 = stealJiffies()
        buf(passSteal, name) += (if (st0 < 0 || st1 < 0) -1L else st1 - st0)
        val cg1 = codegenCount()
        buf(passCodegen, name) += (if (cg0 < 0 || cg1 < 0) -1L else cg1 - cg0)
        // drop this query's persisted tables so later queries aren't
        // timed under the accumulated heap pressure of the whole suite
        // (observed 4x run-to-run swings on the dedup self-joins without)
        spark.sqlContext.clearCache()
        // clearCache only covers CacheManager entries; localCheckpoint
        // blocks (the q26/q32 parse boundary) are freed by the
        // ContextCleaner only after their RDD is GC'd — nudge it so the
        // blocks don't sit in the block manager across later queries
        // (this explicit collection runs AFTER the gc_pause snapshot,
        // so it is attributed to no query)
        System.gc()
      }
    // Per-query MIN over all full-suite passes (r6; base default 2).
    // One cold pass mixes JIT/codegen compilation into whichever
    // queries run first and leaves heavier ones hostage to transient
    // machine load — measured r6: q01 4.4 s as the suite opener vs
    // 2.05 s solo; q11 9.8-14 s across identical-code runs. Caches and
    // checkpoint blocks are dropped after every query, so later passes
    // re-run the full plan and only keep warmed codegen — min-of-N is
    // the steady-state throughput number the baseline comparison wants,
    // with run-to-run jitter (GC pause, load spike) filtered out.
    val basePasses =
      math.max(1, sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt)
    val stealThreshold =
      sys.env.getOrElse("SPARK_GRAFT_STEAL_THRESHOLD", "2000").toLong
    val maxExtra =
      math.max(0, sys.env.getOrElse("SPARK_GRAFT_STEAL_RETRIES", "3").toInt)
    val passStealTotals = scala.collection.mutable.ArrayBuffer.empty[Long]
    def isClean(s: Long): Boolean = s < 0 || s <= stealThreshold
    val wantClean = math.min(2, basePasses)
    var done = false
    while (!done) {
      hostSnaps += hostSnapshot()
      val st0 = stealJiffies()
      runPass()
      val st1 = stealJiffies()
      passStealTotals += (if (st0 < 0 || st1 < 0) -1L else st1 - st0)
      val ranBase = passStealTotals.size >= basePasses
      val cleanSoFar = passStealTotals.count(isClean)
      val extrasLeft = passStealTotals.size - basePasses < maxExtra
      done = ranBase && (cleanSoFar >= wantClean || !extrasLeft)
    }
    hostSnaps += hostSnapshot() // post-run: catches load that built up DURING
    val totalPasses = passStealTotals.size
    val cleanIdx = passStealTotals.zipWithIndex.collect {
      case (s, i) if isClean(s) => i
    }
    // "no clean window": at least one pass measured real steal and
    // none came in under threshold (all-unknown stays false — nothing
    // to adjudicate from)
    val noCleanWindow = passStealTotals.exists(_ >= 0) &&
      !passStealTotals.exists(s => s >= 0 && s <= stealThreshold)
    // a query that failed EVERY pass has no real time — report 0 and
    // rely on the `failed` array (a sentinel would wreck the total)
    val results = order.map { name =>
      val good = passTimes(name).filter(_ >= 0)
      name -> (if (good.isEmpty) 0.0 else good.min)
    }
    // 3-decimal rounding: at 86+ queries, full-precision doubles push
    // the one-line JSON past the driver's captured log tail
    // (BENCH_r07.json came back parsed:null) — ms precision is already
    // below host noise, so nothing is lost
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val detail = order.map { name =>
      "\"" + name + "\":{\"passes\":" +
        passTimes(name).map(r3).mkString("[", ",", "]") +
        ",\"gc_ms\":" + passGc(name).mkString("[", ",", "]") +
        ",\"gc_pause_ms\":" + passGcPause(name).mkString("[", ",", "]") +
        ",\"steal\":" + passSteal(name).mkString("[", ",", "]") +
        ",\"codegen_compiles\":" + passCodegen(name).mkString("[", ",", "]") +
        "}"
    }.mkString("{", ",", "}")
    def names(p: Int => Boolean) = failCounts.toSeq.collect {
      case (k, c) if p(c) => k
    }.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val failedJson = names(_ == totalPasses) // no pass succeeded: time is 0.0
    val flakyJson = names(c => c > 0 && c < totalPasses) // timed, not clean
    val total = results.map(_._2).sum
    val hostJson = hostSnaps.mkString("[", ",", "]")
    val excludedJson =
      if (args.nonEmpty) "{}" // explicit subset: nothing auto-excluded
      else benchExcluded.toSeq.sorted.map { case (k, why) =>
        "\"" + k + "\":\"" + why + "\""
      }.mkString("{", ",", "}")
    val stealJson =
      s""""steal_threshold":$stealThreshold,"pass_steal":${
        passStealTotals.mkString("[", ",", "]")},"clean_passes":${
        cleanIdx.mkString("[", ",", "]")},"no_clean_window":$noCleanWindow"""
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"flaky":$flakyJson,"sf":"$sfDir","passes":$totalPasses,"passes_base":$basePasses,$stealJson,"steal_pre":$stealPre,"excluded":$excludedJson,"host":$hostJson,"query_detail":$detail}"""
    // At 87 queries the full line is ~2.6 kB — larger than the driver's
    // captured log tail, so it can never be recovered from stdout alone
    // (BENCH_r07/r08 both came back parsed:null). The full record lives
    // in the attempt file; stdout gets the full line for humans plus a
    // guaranteed-short summary line LAST, sized to always fit the tail.
    // Non-destructive attempts (VERDICT r13 item 2): every run lands in
    // bench_attempts/bench_out.<n>.json (first free n), so a later
    // attempt — or the driver's own run — can never clobber the only
    // copy of the cleanest record (r13 lost its 216.7 s attempt that
    // way). Since r15, bench_out.json itself is written ONLY by
    // `--promote` (VERDICT r14 item 5).
    val attemptsDir = Paths.get("bench_attempts")
    Files.createDirectories(attemptsDir)
    // CREATE_NEW, retrying on collision: a find-free-then-write pair
    // would let two concurrent bench JVMs (driver-launched racing a
    // manual run) pick the same n and silently clobber — the exact
    // loss this file exists to prevent
    val attemptPath = Iterator.from(1)
      .map(n => attemptsDir.resolve(s"bench_out.$n.json"))
      .flatMap { p =>
        try {
          Files.writeString(p, line + "\n",
            java.nio.file.StandardOpenOption.CREATE_NEW)
          Some(p)
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => None
        }
      }.next()
    val summary =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n":${results.size},"failed":$failedJson,"flaky":$flakyJson,"sf":"$sfDir","passes":$totalPasses,"passes_base":$basePasses,$stealJson,"steal_pre":$stealPre,"excluded":$excludedJson,"host":$hostJson,"detail":"$attemptPath","attempt":"$attemptPath"}"""
    // stop BEFORE printing so the JSON lines are the LAST stdout lines —
    // the driver captures a bounded log tail and must find them there
    spark.stop()
    println(line)
    println(summary)
  }
}
