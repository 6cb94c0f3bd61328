package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE SHORT JSON summary line on stdout
  * (total seconds, query count, failures). The per-query seconds map is
  * written to BENCH_LAST.json only — stdout consumers keep a bounded
  * tail, and the full 87-query map does not fit it.
  *
  * Measurement protocol (BASELINE.md): local[32], shuffle partitions =
  * cores, AQE on, UTC, noop-format write to force full execution of
  * every operator (a bare count() would let Catalyst prune projections).
  * A session warm-up touches each table first so query 1 doesn't pay
  * JVM/codegen init.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // Spark writes startup banners ("Setting default log level...") to
    // stdout, which breaks the driver's parse of the one-line JSON
    // contract. Route everything to stderr for the duration of the run
    // and print the JSON line on the real stdout at the end — it is then
    // the first AND only stdout line.
    val realOut = System.out
    System.setOut(System.err)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession
      .builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // graft's typed aggregates all carry bounded buffers; the 128-group
      // default would silently degrade them to sort-based passes (see
      // the Verify.scala note)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "16777216")
      .config("spark.sql.adaptive.enabled", "true")
      // static conf, default 100: an 84-query suite generates far more
      // codegen'd classes than that, so the LRU thrashes and queries
      // re-compile classes the suite already built
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: JVM + codegen + file listing, outside the timings
    graft.sources.Tables.names.foreach { t =>
      graft.sources.Tables.load(spark, sfDir, t).count()
    }

    // SPARK_GRAFT_ONLY=q_a,q_b limits the run (local iteration on a hot
    // query); SPARK_GRAFT_REPEAT=n re-times each query n times and keeps
    // the minimum (steady-state cost, excludes first-run listing/JIT).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt

    // The per-query map lives here; the path is anchored to the repo root
    // (BENCH_OUT override > user.dir, which sbt's fork sets to baseDirectory)
    // so launching Bench outside sbt still lands the file predictably.
    val benchOut = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_OUT",
      java.nio.file.Paths.get(sys.props("user.dir"), "BENCH_LAST.json").toString)

    // Settle-pass reference: a prior run's per-query seconds AT THE SAME
    // sf dir. Resolution order (r20 — the r19 driver run went
    // referenceless because the last BENCH_LAST was an sf1 capture, so
    // the one run that needed settling got settled:0):
    //   1. SPARK_GRAFT_BENCH_REF (explicit override),
    //   2. the per-sf BENCH_LAST_<sf>.json this main stamps on every run,
    //   3. the legacy shared BENCH_LAST.json,
    //   4. the COMMITTED per-sf reference BENCH_REF_<sf>.json (refreshed
    //      each round) — the self-defending floor: whatever ran last,
    //      a same-sf reference always exists.
    // A candidate only qualifies if its "sf" field matches this run's.
    // Parsed with a regex — our own single-line format, no JSON dep.
    val sfName = new java.io.File(sfDir).getName
    val repoDir = java.nio.file.Paths.get(benchOut).toAbsolutePath.getParent
    def parseRef(path: String): Map[String, Double] =
      try {
        val txt = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
        if (!txt.contains("\"sf\":\"" + sfDir + "\"")) Map.empty
        else {
          val from = txt.indexOf("\"queries\":")
          if (from < 0) Map.empty
          else {
            // bound the scan at the queries object's closing brace — the
            // file now carries a trailing "settled" object whose numeric
            // fields would otherwise parse as phantom query entries
            // (r16 ADVICE). The queries object is flat, so the first '}'
            // after the key closes it.
            val end = txt.indexOf('}', from)
            val span = if (end < 0) txt.substring(from) else txt.substring(from, end + 1)
            "\"([A-Za-z0-9_]+)\":([0-9]+\\.[0-9]+)".r
              .findAllMatchIn(span)
              .map(m => m.group(1) -> m.group(2).toDouble)
              .toMap
          }
        }
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    val benchOutPerSf = repoDir.resolve(s"BENCH_LAST_$sfName.json").toString
    val refQueries: Map[String, Double] =
      (sys.env.get("SPARK_GRAFT_BENCH_REF").toSeq ++ Seq(
        benchOutPerSf, benchOut,
        repoDir.resolve(s"BENCH_REF_$sfName.json").toString))
        .iterator.map(parseRef).find(_.nonEmpty).getOrElse(Map.empty)
    // SPARK_GRAFT_DIAG=true: decompose each query's FIRST-run cost into
    // task work vs driver/JVM overhead (guide §1 — measure before
    // optimizing the suite's dominant term, the per-query first-run
    // overhead). Pure measurement: the timed region is unchanged; the
    // per-query deltas land in SPARK_GRAFT_DIAG_OUT
    // (default /tmp/bench_diag.tsv), never on stdout.
    val diag = sys.env.get("SPARK_GRAFT_DIAG").exists(v => v == "1" || v == "true")
    val diagListener = if (diag) {
      val l = new org.apache.spark.scheduler.SparkListener {
        val jobs, stages, tasks, runMs, cpuNs, taskGcMs = new java.util.concurrent.atomic.AtomicLong
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages.incrementAndGet()
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          val m = t.taskMetrics
          if (m != null) {
            runMs.addAndGet(m.executorRunTime)
            cpuNs.addAndGet(m.executorCpuTime)
            taskGcMs.addAndGet(m.jvmGCTime)
          }
        }
        def reset(): Unit = Seq(jobs, stages, tasks, runMs, cpuNs, taskGcMs).foreach(_.set(0))
      }
      spark.sparkContext.addSparkListener(l)
      Some(l)
    } else None
    val diagRows = scala.collection.mutable.ArrayBuffer.empty[String]
    // Catalyst phase decomposition (r20): per-executed-query analysis /
    // optimization / physical-planning driver time, summed per bench
    // query via a QueryExecutionListener. Diag-only — the listener is
    // not registered in timed runs.
    val phaseMs = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]
    def phaseGet(k: String): Long = Option(phaseMs.get(k)).map(_.get).getOrElse(0L)
    if (diag) spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.tracker.phases.foreach { case (phase, summary) =>
          phaseMs.computeIfAbsent(phase, _ => new java.util.concurrent.atomic.AtomicLong)
            .addAndGet(summary.durationMs)
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    })
    val jitBean = java.lang.management.ManagementFactory.getCompilationMXBean
    def gcTotalMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def cgCount: Long =
      org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    def cgSrcBytes: Long =
      org.apache.spark.metrics.source.CodegenMetrics.METRIC_SOURCE_CODE_SIZE.getCount *
        org.apache.spark.metrics.source.CodegenMetrics.METRIC_SOURCE_CODE_SIZE
          .getSnapshot.getMean.toLong
    val selected = SparkEntry.benchQueries.toSeq
      .sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      // A failed run must not win min() with its (fast) time-to-throw:
      // only successful runs are timed; a query with zero successes is
      // reported in "failed", not in "queries".
      diagListener.foreach(_.reset())
      val (jit0, gc0, cg0) = if (diag) (jitBean.getTotalCompilationTime, gcTotalMs, cgCount) else (0L, 0L, 0L)
      val (an0, op0, pl0) =
        if (diag) (phaseGet("analysis"), phaseGet("optimization"), phaseGet("planning"))
        else (0L, 0L, 0L)
      val times = (1 to repeat).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: $e"); None
        }
      }
      diagListener.foreach { l =>
        Thread.sleep(120) // listener bus drain — diag runs are not timing truth
        diagRows += f"$name\t${times.minOption.getOrElse(-1.0)}%.3f\t${l.jobs.get}\t${l.stages.get}\t${l.tasks.get}\t${l.runMs.get}\t${l.cpuNs.get / 1000000}\t${l.taskGcMs.get}\t${jitBean.getTotalCompilationTime - jit0}\t${gcTotalMs - gc0}\t${cgCount - cg0}\t${phaseGet("analysis") - an0}\t${phaseGet("optimization") - op0}\t${phaseGet("planning") - pl0}"
      }
      name -> times.minOption
    }
    if (diag) {
      val out = sys.env.getOrElse("SPARK_GRAFT_DIAG_OUT", "/tmp/bench_diag.tsv")
      val header = "query\twall_s\tjobs\tstages\ttasks\ttask_run_ms\ttask_cpu_ms\ttask_gc_ms\tjit_ms\tgc_ms\tcg_units\tanalysis_ms\toptimization_ms\tplanning_ms"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out),
        (header +: diagRows).mkString("", "\n", "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] diag written to $out (cg source bytes ~ $cgSrcBytes)")
    }
    val ok = results.collect { case (k, Some(v)) => k -> v }
    val failed = results.collect { case (k, None) => k }

    // Settle pass (BASELINE.md mover protocol, automated): any query
    // whose in-suite time regressed >1.5× vs the reference run is
    // re-timed warm in this same JVM (min of SETTLE_REPEAT runs) — the
    // hand re-runs of rounds 13-15 showed such movers are almost always
    // suite interference (GC, codegen-cache pressure from neighbors),
    // and the warm-solo minimum is the honest steady-state number. Both
    // values land in the JSON so the round capture needs no manual pass.
    // Skipped when REPEAT>1 (already steady-state) or under ONLY.
    val settleRepeat = sys.env.getOrElse("SPARK_GRAFT_SETTLE_REPEAT", "5").toInt
    // Trigger lowered 1.5 → 1.3 (r19; the r18 verdict's ask): two rounds
    // running, >1.3× movers (q_classifier_auc_trained 1.39×, then
    // q_graph_harmonic 1.49×) sat just under the old trigger and never
    // got a verdict while every stamped mover settled `interference`.
    // Override: SPARK_GRAFT_SETTLE_TRIGGER.
    val settleTrigger =
      sys.env.getOrElse("SPARK_GRAFT_SETTLE_TRIGGER", "1.3").toDouble
    val settled: Seq[(String, Double, Double, Double)] =
      if (repeat > 1 || only.isDefined || settleRepeat <= 0) Seq.empty
      else ok.flatMap { case (name, inSuite) =>
        refQueries.get(name).collect {
          case ref if ref > 0 && inSuite > settleTrigger * ref =>
            val fn = SparkEntry.benchQueries(name)
            val times = (1 to settleRepeat).flatMap { _ =>
              val t0 = System.nanoTime()
              try {
                fn(spark, sfDir).write.format("noop").mode("overwrite").save()
                Some((System.nanoTime() - t0) / 1e9)
              } catch {
                case e: Throwable =>
                  System.err.println(s"[bench] settle $name failed: $e"); None
              }
            }
            times.minOption.map(solo => (name, inSuite, solo, ref))
        }.flatten
      }
    // Verdict per settled mover (r16 VERDICT Next #5): "interference"
    // when the warm-solo minimum lands at-or-below the reference
    // (suite neighbors — GC, codegen cache — caused the in-suite blip),
    // "regression" when even solo stays above it. Tolerance 1.15×: the
    // warm-solo min still jitters a few percent run-to-run; movers whose
    // solo lands in (1.15×, settleTrigger×] of the reference get a hard
    // regression verdict — at the 1.3 default that band is narrow, and a
    // genuine plan regression typically sits well above it (r19 ADVICE:
    // this comment used to claim such movers can't occur; they can, and
    // flagging them loudly is the point). A regression verdict is a FAILURE:
    // the query joins "failed" in both JSON lines so a real mover can
    // never hide in prose again.
    def verdict(solo: Double, ref: Double): String =
      if (solo <= ref * 1.15) "interference" else "regression"
    val regressed = settled.collect {
      case (k, _, solo, ref) if verdict(solo, ref) == "regression" => k
    }
    val settledJson = settled
      .map { case (k, inSuite, solo, ref) =>
        "\"" + k + "\":" +
          f"""{"in_suite":$inSuite%.3f,"solo":$solo%.3f,"ref":$ref%.3f,"verdict":"${verdict(solo, ref)}"}"""
      }
      .mkString("{", ",", "}")
    val qs = ok
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failedJson = (failed ++ regressed.map(_ + ":regressed"))
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2).sum
    // Settle-ADJUSTED total (r19, the r18 verdict's ask): in-suite
    // totals have been interference-dominated two rounds running — the
    // adjusted number replaces every `interference`-settled mover's
    // in-suite time with its warm-solo minimum, i.e. the total the
    // suite would have recorded without the ambient blips. Regressions
    // are NOT adjusted (a real mover must stay visible).
    val soloByName = settled.collect {
      case (k, _, solo, ref) if verdict(solo, ref) == "interference" => k -> solo
    }.toMap
    val adjusted = ok.map { case (k, v) => soloByName.getOrElse(k, v) }.sum
    // stdout gets a SHORT summary line only: downstream captures keep a
    // bounded tail of stdout, and an 87-query map (~2 KB) overflows it.
    // The per-query detail goes to BENCH_LAST.json exclusively.
    val summary =
      f"""{"metric":"total","value":$total%.3f,"adjusted":$adjusted%.3f,"unit":"sec","n":${ok.size},"settled":${settled.size},"failed":$failedJson,"sf":"$sfDir"}"""
    val full =
      f"""{"metric":"total","value":$total%.3f,"adjusted":$adjusted%.3f,"unit":"sec","queries":$qs,"settled":$settledJson,"failed":$failedJson,"sf":"$sfDir"}"""
    realOut.println(summary)
    // two copies: the legacy shared path (external consumers) AND the
    // per-sf stamp — so a later run at a DIFFERENT sf can neither
    // destroy this run's per-query evidence nor leave the next same-sf
    // run referenceless (r19 VERDICT #1)
    Seq(benchOut, benchOutPerSf).foreach { p =>
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(p),
        (full + "\n").getBytes("UTF-8"))
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] file write failed ($p): $e")
      }
    }
    spark.stop()
  }
}
