package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, timing FULL materialization (noop datasource
  * sink — every row is produced, nothing is collected to the driver),
  * and prints one machine-parseable JSON line. The same line is also
  * written to bench_out.json so log noise can never eat it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // the shared harness session (GraftConf) so the bench runs the
    // same optimizer configuration as Verify and the specs
    val spark = GraftConf.localSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
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
      val steal =
        try {
          val src = scala.io.Source.fromFile("/proc/stat")
          try {
            val f = src.getLines().next().trim.split("\\s+")
            if (f.length > 8) f(8).toLong else -1L
          } finally src.close()
        } catch { case _: Throwable => -1L }
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
    // an explicit arg still benches it for local iteration.
    val benchExcluded = Set("q144_knn_audit_approx")
    // optional args = query-name subset for local iteration; the driver
    // passes none and gets the full suite
    val selected =
      if (args.isEmpty)
        SparkEntry.queries.filter { case (k, _) => !benchExcluded(k) }
      else SparkEntry.queries.filter { case (k, _) => args.contains(k) }
    def runPass(): Seq[(String, Double)] =
      selected.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        var ok = true
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failCounts += name -> (failCounts(name) + 1)
          ok = false
        }
        // a failed attempt's (short) elapsed must not win the
        // cross-pass min — a query that fails fast in one pass and
        // succeeds in another would otherwise report the failure's time
        val elapsed =
          if (ok) (System.nanoTime() - t0) / 1e9 else Double.MaxValue
        // drop this query's persisted tables so later queries aren't
        // timed under the accumulated heap pressure of the whole suite
        // (observed 4x run-to-run swings on the dedup self-joins without)
        spark.sqlContext.clearCache()
        // clearCache only covers CacheManager entries; localCheckpoint
        // blocks (the q26/q32 parse boundary) are freed by the
        // ContextCleaner only after their RDD is GC'd — nudge it so the
        // blocks don't sit in the block manager across later queries
        System.gc()
        name -> elapsed
      }
    // Per-query MIN over `passes` full suite passes (r6; default 2).
    // One cold pass mixes JIT/codegen compilation into whichever
    // queries run first and leaves heavier ones hostage to transient
    // machine load — measured r6: q01 4.4 s as the suite opener vs
    // 2.05 s solo; q11 9.8-14 s across identical-code runs. Caches and
    // checkpoint blocks are dropped after every query, so later passes
    // re-run the full plan and only keep warmed codegen — min-of-N is
    // the steady-state throughput number the baseline comparison wants,
    // with run-to-run jitter (GC pause, load spike) filtered out.
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt)
    val results = (1 to passes).map { _ =>
        hostSnaps += hostSnapshot()
        runPass()
      }
      .reduce((a, b) => a.zip(b).map { case ((k, v1), (_, v2)) => k -> math.min(v1, v2) })
      // a query that failed EVERY pass has no real time — report 0 and
      // rely on the `failed` array (MaxValue would wreck the total)
      .map { case (k, v) => k -> (if (v == Double.MaxValue) 0.0 else v) }
    // 3-decimal rounding: at 86+ queries, full-precision doubles push
    // the one-line JSON past the driver's captured log tail
    // (BENCH_r07.json came back parsed:null) — ms precision is already
    // below host noise, so nothing is lost
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    def names(p: Int => Boolean) = failCounts.toSeq.collect {
      case (k, c) if p(c) => k
    }.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val failedJson = names(_ == passes) // no pass succeeded: time is 0.0
    val flakyJson = names(c => c > 0 && c < passes) // timed, but not clean
    val total = results.map(_._2).sum
    hostSnaps += hostSnapshot() // post-run: catches load that built up DURING
    val hostJson = hostSnaps.mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"flaky":$flakyJson,"sf":"$sfDir","passes":$passes,"host":$hostJson}"""
    // At 87 queries the full line is ~2.6 kB — larger than the driver's
    // captured log tail, so it can never be recovered from stdout alone
    // (BENCH_r07/r08 both came back parsed:null). The full record lives
    // in bench_out.json; stdout gets the full line for humans plus a
    // guaranteed-short summary line LAST, sized to always fit the tail.
    val summary =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n":${results.size},"failed":$failedJson,"flaky":$flakyJson,"sf":"$sfDir","passes":$passes,"host":$hostJson,"detail":"bench_out.json"}"""
    Files.writeString(Paths.get("bench_out.json"), line + "\n")
    // stop BEFORE printing so the JSON lines are the LAST stdout lines —
    // the driver captures a bounded log tail and must find them there
    spark.stop()
    println(line)
    println(summary)
  }
}
