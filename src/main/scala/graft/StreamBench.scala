package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.sources.Ingest
import graft.operators.OptionAgg
import graft.streaming.StreamingOps

/** Streaming throughput micro-bench: the full e2e pipeline the
  * StreamingSpec gates for correctness (produce-shape records → topic
  * → S6 JSON parse + validity filter → 24-measure 1-minute windowedAgg
  * → checkpointed parquet sink), timed over a synthetic trade stream
  * and reported as ONE machine-parseable JSON line (also written to
  * stream_bench.json). The topic is a multi-file parquet dir consumed
  * with maxFilesPerTrigger, so the run exercises real micro-batch
  * scheduling (N batches), watermark advance, and state-store
  * open/commit per batch — the costs a single-batch run would hide.
  *
  * Rows default to 200k (SPARK_GRAFT_STREAM_ROWS overrides): enough
  * that per-batch fixed costs do not dominate, small enough to run in
  * seconds locally. Throughput = input rows / wall seconds across the
  * whole query (setup + all batches + final commit).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftConf.localSession(cpus)
    spark.sparkContext.setLogLevel("WARN")

    val n = sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS", "200000").toLong
    val dir = Files.createTempDirectory("stream_bench")
    val topic = s"$dir/topic"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"

    // deterministic synthetic trades: 250 ms spacing (4 rows/s of
    // event time), 50 symbols, both sides/types, premiums straddling
    // the whale threshold — every conditional cell of the 24-measure
    // menu gets rows. Written time-ordered into 16 files so the
    // watermark advances monotonically as the source drains them.
    val baseUs = 1704103200000000L // 2024-01-01 10:00:00 UTC
    val trades = spark.range(n).select(
      timestamp_micros(lit(baseUs) + col("id") * 250000L).as("ts"),
      concat(lit("SYM"), (col("id") % 50).cast("string")).as("osym"),
      element_at(array(lit("buy"), lit("sell"), lit("no_side")),
        (col("id") % 3 + 1).cast("int")).as("side"),
      element_at(array(lit("call"), lit("put")),
        (col("id") % 2 + 1).cast("int")).as("otype"),
      (col("id") % 100 + 1).as("qty"),
      ((col("id") % 1000) * 301).cast("double").as("premium"))
    Ingest.toProducerRecords(trades, "osym", "ts")
      .repartitionByRange(16, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(topic)

    val valueSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("osym", StringType),
      StructField("side", StringType), StructField("otype", StringType),
      StructField("qty", LongType), StructField("premium", DoubleType)))

    val t0 = System.nanoTime()
    val raw = spark.readStream
      .schema("key string, value string, ts timestamp")
      .option("maxFilesPerTrigger", "2") // 16 files / 2 → 8 micro-batches
      .parquet(topic)
      .withColumnRenamed("ts", "kafka_ts")
    val parsed = Ingest.valid(Ingest.parseJson(raw, "value", valueSchema))
      .select("ts", "osym", "side", "otype", "qty", "premium")
    // 10-minute grace: files drain near time-order (range-partitioned
    // write), so real cross-batch disorder stays far inside the grace
    val agged = StreamingOps.windowedAgg(parsed, "ts", "osym",
      "1 minute", "10 minutes",
      count(lit(1)).as("count") +: OptionAgg.measures())
    val q = StreamingOps.sink(agged, "parquet", Some(out), ckpt,
      trigger = Trigger.AvailableNow()).start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9

    val progress = q.recentProgress
    val inputRows = progress.map(_.numInputRows).sum
    val batches = progress.count(_.numInputRows > 0)
    // explicit schema: a tiny run (rows' event time all inside the
    // watermark grace) finalizes ZERO windows, and a schema-inferring
    // read of the empty sink dir would throw AFTER the bench succeeded
    val outWindows = spark.read.schema(agged.schema).parquet(out).count()
    val line =
      s"""{"metric":"stream_e2e_pipeline","unit":"rows_per_sec","value":${inputRows / secs},""" +
        s""""rows":$n,"input_rows":$inputRows,"batches":$batches,""" +
        s""""secs":$secs,"out_windows":$outWindows,"cpus":$cpus}"""
    println(line)
    Files.writeString(Paths.get("stream_bench.json"), line + "\n")
    spark.stop()
  }
}
