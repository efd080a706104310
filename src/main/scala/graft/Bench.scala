package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR and reports per-query + total wall times.
  *
  * Output protocol: the per-query map is large (~8 KB at 270 queries) and
  * the driver's log-tail window (last 2000 chars) truncated it three rounds
  * running, so the detail JSON goes to `bench.json` AND an EARLY stdout
  * line, while the LAST two stdout lines are sized to fit the tail window
  * together: (a) a compact per-query values array (sorted-name order,
  * 2-decimal) so every round's BENCH_r0N.json carries the full per-query
  * picture without ad-hoc archives, and (b) the short total-only JSON
  * (<200 bytes) that the driver's last-line parser reads.
  *
  * Each query gets one unmeasured warmup run (JIT + codegen + parquet
  * footer cache) and two measured runs; we keep the min. The two measured
  * passes run in OPPOSITE suite orders: single-shot timings on this box
  * swing several× from GC/state debt accumulated by whatever ran just
  * before (r02 recorded x_rollup at 11.7 s in-suite vs 1.1 s isolated;
  * r03 saw tpch_q1 2.3× slower right after the streaming pair landed
  * alphabetically before it). Reversing the second pass gives every query
  * two different predecessors, so min-of-two sheds any one neighbor's
  * debt; an explicit System.gc() between queries drains the rest.
  *
  * Contention guard (r10 lesson: driver read 1.44× baseline purely from
  * box load; builder same-code archive read 0.90×): the 1-minute loadavg
  * is the wrong per-query signal because the bench's own 32-thread bursts
  * dominate it for the whole run. Instead each measurement window records
  * EXTERNAL CPU pressure — (Δ busy jiffies across all cpus − Δ jiffies of
  * this process) / wall — i.e. how many cores OTHER processes burned while
  * the query ran. A query whose kept (min) window saw > EXT_CPU_THRESHOLD
  * external cores is re-measured up to MAX_RETRIES more times, stopping at
  * the first clean window; the min over all windows is kept. loadavg is
  * still recorded at start/end and per query for cross-round adjudication.
  */
object Bench {
  /** External cores of non-bench CPU above which a window is contended.
    * r16 lesson: 1.5 cores let a run whose loadavg rose 0.6→2.85 finish
    * with `remeasured: []` — too deaf. 0.75 external cores re-arms the
    * retry while staying above the box's idle daemon noise (~0.1-0.3).
    */
  private val ExtCpuThreshold = 0.75
  private val MaxRetries = 2

  /** Measurement slots between interleaved calibration probes. r16's
    * archive took probes only at the two ends and they disagreed 2.7× —
    * end-point normalization is meaningless when the box drifts mid-run.
    * Every ~64 slots (~2×537 slots/run ⇒ ~17 probes) keeps each query
    * within a few minutes of a probe it can be normalized by.
    */
  private val ProbeEvery = 64

  /** (busy jiffies summed over all cpus, jiffies of this process incl. all
    * threads). USER_HZ is 100 on every Linux this targets; only deltas are
    * compared against wall time so an unusual HZ shifts the threshold, not
    * correctness.
    */
  private def cpuSnap(): (Long, Long) = {
    try {
      val stat = java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/stat"))
        .linesIterator.next() // "cpu  user nice system idle iowait irq softirq steal ..."
      val f = stat.trim.split("\\s+").drop(1).map(_.toLong)
      val busy = f(0) + f(1) + f(2) + f(5) + f(6) + (if (f.length > 7) f(7) else 0L)
      val self = java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/self/stat"))
      // comm (field 2) may contain spaces/parens — parse after the LAST ')':
      // fields from 3 on; utime=field 14 → idx 11, stime=field 15 → idx 12.
      val after = self.substring(self.lastIndexOf(')') + 2).split(" ")
      (busy, after(11).toLong + after(12).toLong)
    } catch { case _: Throwable => (-1L, -1L) }
  }

  private def loadavg1m(): Double = try java.nio.file.Files
    .readString(java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble
  catch { case _: Throwable => -1.0 }

  /** One measurement window: (wall sec, external cores, loadavg_1m,
    * global measurement-slot index — the key that picks this window's
    * nearest calibration probe).
    */
  private case class Window(sec: Double, extCores: Double, load: Double,
      slot: Long)

  /** One interleaved calibration probe: taken at measurement slot
    * `slot`, CPU-probe seconds and shuffle-probe seconds.
    */
  private case class Probe(slot: Long, cpu: Double, shuf: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val loadStart = loadavg1m()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.withObjectStoreConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Materialize through toRdd.count(): a plain df.count() would let
    // Catalyst prune every unreferenced projection and time a bare scan
    // for expression-heavy queries; toRdd forces all output columns.
    def materialize(name: String): Boolean =
      try { SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
    // SPARK_GRAFT_ONLY=q1,q2 restricts the run (local iteration aid).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // Fixed-cost CALIBRATION probe (cross-run drift normalizer): a
    // constant 4×10^8-row range-sum at pinned parallelism (64 slices,
    // independent of shuffle conf) — pure codegen'd long arithmetic, no
    // IO, no shuffle, so its wall time measures only what the BOX gives
    // this JVM. Identical code across rounds ⇒ calib ratio between two
    // archives ≈ the box-speed ratio; tools/bench_compare.py divides it
    // out so per-query ratios read as code, not contention.
    var calibWarmed = false
    def calibrate(): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(0L, 400000000L, 1L, 64)
          .selectExpr("sum(id % 97)").queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      if (!calibWarmed) once() // warm (codegen compile), first probe only
      Seq(once(), once()).min
    }
    // Second, EXCHANGE-BEARING probe (r14 verdict: the CPU probe
    // under-corrects shuffle contention — a box can be arithmetic-fast
    // and exchange-slow when other tenants hammer disk/page cache). A
    // fixed 10^7-row hash repartition into a PINNED 64 partitions (user
    // repartition ⇒ AQE never coalesces it) followed by a
    // partition-local groupBy on the same key — exactly ONE exchange of
    // constant volume, identical code every round. bench_compare.py
    // normalizes exchange-bearing queries by THIS ratio and
    // exchange-free ones by the CPU ratio.
    def calibrateShuffle(): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(0L, 10000000L, 1L, 64)
          .selectExpr("id AS k")
          .repartition(64, org.apache.spark.sql.functions.col("k"))
          .groupBy("k").count()
          .queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      if (!calibWarmed) once() // warm (codegen compile), first probe only
      val r = Seq(once(), once()).min
      calibWarmed = true
      r
    }
    // INTERLEAVED probe series (r16 verdict: the archive's two end-point
    // probes disagreed 2.7×, so end-point normalization was meaningless
    // when the box drifted mid-run). A probe fires before measurement
    // slot 0, then every ProbeEvery slots, then once after the last
    // retry — each query's kept window is normalized by its NEAREST
    // probe (bench_compare.py), so mid-run drift moves the probe the
    // query is divided by, not the cross-round verdict.
    val probes = collection.mutable.ArrayBuffer.empty[Probe]
    var slotCounter = 0L
    def takeProbe(): Unit =
      probes += Probe(slotCounter, calibrate(), calibrateShuffle())
    def timed(name: String): Option[Window] = {
      if (slotCounter % ProbeEvery == 0) takeProbe()
      val slot = slotCounter
      slotCounter += 1
      val load = loadavg1m()
      val (busy0, self0) = cpuSnap()
      val t0 = System.nanoTime()
      val ok = materialize(name)
      // Snapshot the elapsed time BEFORE the gc: the collection happens
      // on this query's dime conceptually, but it drains debt produced
      // here so it must not land inside the NEXT query's wall time —
      // and a full-heap System.gc() pause (~0.3-0.5 s on this heap) in
      // the measured region would tax all 270 queries.
      val dt = (System.nanoTime() - t0) / 1e9
      val (busy1, self1) = cpuSnap()
      System.gc()
      val ext =
        if (busy0 < 0 || busy1 < 0 || dt <= 0) -1.0
        else math.max(0.0, ((busy1 - busy0) - (self1 - self0)) / 100.0 / dt)
      if (ok) Some(Window(dt, ext, load, slot)) else None
    }
    // Which queries carry an exchange — drives the per-query choice of
    // normalizer in bench_compare.py. Captured during the WARMUP pass
    // (plan inspection is free there; a separate construction pass would
    // re-run the eager queries' build-side jobs).
    val exchangeBearing = collection.mutable.Set.empty[String]
    val warmupFailed = collection.mutable.ArrayBuffer.empty[String]
    names.foreach { n => // warmup pass + exchange detection
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.queryExecution.toRdd.count()
        // Inspect the plan AFTER execution so AQE has resolved to the
        // FINAL plan (the initial plan can both over-count exchanges AQE
        // later elides and miss ones AQE introduces). Only
        // HASH-partitioning exchanges count: every registered query
        // ends in a deterministic orderBy (a rangepartitioning exchange
        // over a bounded result) and many carry broadcast or
        // single-partition exchanges — counting those would classify the
        // whole registry as shuffle-bound and kill the CPU normalizer.
        if (df.queryExecution.executedPlan.toString
            .contains("Exchange hashpartitioning"))
          exchangeBearing += n
      } catch { case e: Throwable =>
        // A warmup failure means the query was never classified — record
        // it in the JSON so bench_compare.py can exclude it instead of
        // silently normalizing a possibly shuffle-bound query by the CPU
        // probe.
        warmupFailed += n
        System.err.println(s"[bench] $n warmup failed: ${e.getMessage}")
      }
    }
    System.gc()
    val pass1 = names.map(n => n -> timed(n)).toMap
    val pass2 = names.reverse.map(n => n -> timed(n)).toMap
    // Load-guarded re-measurement: a window is clean when other processes
    // burned < ExtCpuThreshold cores during it (ext < 0 = /proc unreadable
    // → treat as clean rather than loop forever). Keep the min over ALL
    // windows — contention only ever inflates a wall time, so extra runs
    // can only tighten the estimate.
    def clean(w: Window): Boolean = w.extCores < ExtCpuThreshold
    val remeasured = collection.mutable.ArrayBuffer.empty[String]
    val windows: Map[String, Seq[Window]] = names.map { n =>
      var ws = Seq(pass1(n), pass2(n)).flatten
      if (ws.nonEmpty && !ws.exists(clean)) {
        remeasured += n
        var tries = 0
        while (tries < MaxRetries && !ws.exists(clean)) {
          ws = ws ++ timed(n).toSeq
          tries += 1
        }
      }
      n -> ws
    }.toMap
    val results = names.map { n =>
      val ws = windows(n)
      n -> (if (ws.isEmpty) -1.0 else ws.map(_.sec).min)
    }
    takeProbe() // close the series after the last retry window
    val calibStart = probes.head.cpu
    val calibEnd = probes.last.cpu
    val calibShufStart = probes.head.shuf
    val calibShufEnd = probes.last.shuf
    val calibS = probes.map(_.cpu).min
    val calibShufS = probes.map(_.shuf).min
    val loadEnd = loadavg1m()
    def fmt(v: Double): String = f"$v%.4f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // Per-query contention evidence for the kept (min) window, plus the
    // loadavg each window started at — the adjudication data the r10
    // verdict asked for.
    val ext = names.map { n =>
      val ws = windows(n)
      val kept = if (ws.isEmpty) None else Some(ws.minBy(_.sec))
      "\"" + n + "\":" + fmt(kept.map(_.extCores).getOrElse(-1.0))
    }.mkString("{", ",", "}")
    // The probe series + each kept window's slot — bench_compare.py
    // normalizes each query by its NEAREST probe, not the end points.
    val series = probes.map(p =>
        s"""{"slot":${p.slot},"cpu":${fmt(p.cpu)},"shuf":${fmt(p.shuf)}}""")
      .mkString("[", ",", "]")
    val qSlot = names.map { n =>
      val ws = windows(n)
      val kept = if (ws.isEmpty) -1L else ws.minBy(_.sec).slot
      "\"" + n + "\":" + kept
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // A SPARK_GRAFT_ONLY-restricted run is a partial sum, not the suite
    // total — say so in the JSON so no tooling compares it across rounds.
    val filtered = if (only.isDefined) ""","filtered":true""" else ""
    val remeas = remeasured.map("\"" + _ + "\"").mkString("[", ",", "]")
    val exch = names.filter(exchangeBearing)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val wfail = warmupFailed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val detail =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec"$filtered,"calib_s":${fmt(calibS)},"calib_start_s":${fmt(calibStart)},"calib_end_s":${fmt(calibEnd)},"calib_shuffle_s":${fmt(calibShufS)},"calib_shuffle_start_s":${fmt(calibShufStart)},"calib_shuffle_end_s":${fmt(calibShufEnd)},"loadavg_1m_at_start":$loadStart,"loadavg_1m_at_end":$loadEnd,"ext_cpu_threshold":$ExtCpuThreshold,"remeasured":$remeas,"calib_series":$series,"q_slot":$qSlot,"queries":$qs,"ext_cpu_cores":$ext,"exchange_bearing":$exch,"warmup_failed":$wfail,"sf":"$sfDir"}"""
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), detail + "\n")
    println(detail) // full detail early — safe to truncate, bench.json has it too
    spark.stop()
    // The driver archives only the last 2000 stdout chars ("tail") plus the
    // parsed last line. These two lines are sized to fit that window
    // together, so BENCH_r0N.json itself carries the full per-query map:
    // (1) compact per-query seconds, 2-decimal, in sorted-name order — the
    //     names are recoverable from SparkEntry.queries at the same commit;
    // (2) the short total-only summary as the VERBATIM LAST line (after
    //     spark.stop() so no shutdown logging lands below it).
    def fmt2(v: Double): String = if (v < 0) "-1" else f"$v%.2f"
    println(s"""{"qv_order":"sorted_names","n":${results.size},"qv":[${results.map(r => fmt2(r._2)).mkString(",")}]}""")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec"$filtered,"n_queries":${results.size},"calib_s":${fmt(calibS)},"calib_shuffle_s":${fmt(calibShufS)},"loadavg_1m_at_start":$loadStart,"remeasured_n":${remeasured.size},"sf":"$sfDir"}""")
  }
}
