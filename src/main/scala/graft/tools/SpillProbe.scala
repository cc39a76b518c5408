package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.Locale

/** Stage-level spill/skew probe (VERDICT r10 item 6 / r11 item 3): run one
  * SparkEntry query once and print, per completed stage, the SQL metrics
  * that distinguish SPILL (memory+disk bytes spilled > 0, task durations
  * uniform) from SKEW (one task's duration/input dwarfs the stage median)
  * — the two look identical from wall-clock alone. One JSON line per
  * stage plus a totals line, Bench-style.
  *
  * Usage: SpillProbe <queryName> [sfDir]   (env: SPARK_GRAFT_CPUS) */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q3_join")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cpus)

    // per-stage task-duration samples for the skew read: listener state is
    // only mutated on the listener bus thread, read after the job blocks
    val durs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.ArrayList[Long]]()
    val lines = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    // atomics, not captured vars: written on the listener-bus thread and
    // read on the main thread — a plain LongRef has no happens-before
    // with the post-sleep read and can legally print 0 for a run that
    // spilled
    val totSpillMem = new java.util.concurrent.atomic.AtomicLong()
    val totSpillDisk = new java.util.concurrent.atomic.AtomicLong()
    def s2(v: Double) = String.format(Locale.ROOT, "%.2f", Double.box(v))
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null)
          durs.computeIfAbsent(t.stageId, _ => new java.util.ArrayList[Long]())
            .add(t.taskMetrics.executorRunTime)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        if (m == null) return
        totSpillMem.addAndGet(m.memoryBytesSpilled)
        totSpillDisk.addAndGet(m.diskBytesSpilled)
        val ds = Option(durs.get(si.stageId))
          .map(a => { val arr = new Array[Long](a.size); var i = 0
            val it = a.iterator; while (it.hasNext) { arr(i) = it.next(); i += 1 }
            java.util.Arrays.sort(arr); arr })
          .getOrElse(Array.empty[Long])
        val med = if (ds.isEmpty) 0L else ds(ds.length / 2)
        val mx = if (ds.isEmpty) 0L else ds.last
        // only print stages that moved real data or spilled — the probe
        // is for the heavy tail, not the hundreds of metadata stages
        val gb = 1024.0 * 1024 * 1024
        if (m.memoryBytesSpilled > 0 || m.diskBytesSpilled > 0 ||
            m.shuffleWriteMetrics.bytesWritten > gb ||
            m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead > gb ||
            m.inputMetrics.bytesRead > gb) {
          // JSON-safe name: stage names embed node descriptions that can
          // carry quotes/backslashes — strip to a safe charset rather
          // than emit a line the bench-log scrapers cannot parse
          val safeName = si.name.takeWhile(_ != '\n').take(60)
            .map(c => if (c == '"' || c == '\\') '\'' else c)
          lines.add(s"""{"stage":${si.stageId},"name":"$safeName"""" +
            s""","tasks":${si.numTasks},"input_gb":${s2(m.inputMetrics.bytesRead / gb)}""" +
            s""","shuffle_read_gb":${s2((m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead) / gb)}""" +
            s""","shuffle_write_gb":${s2(m.shuffleWriteMetrics.bytesWritten / gb)}""" +
            s""","spill_mem_gb":${s2(m.memoryBytesSpilled / gb)}""" +
            s""","spill_disk_gb":${s2(m.diskBytesSpilled / gb)}""" +
            s""","task_ms_median":$med,"task_ms_max":$mx}""")
        }
      }
    })

    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    // drain listener events before reading accumulated state (the public
    // API has no waitUntilEmpty; the bus clears in well under this)
    Thread.sleep(3000)
    lines.forEach(println)
    val gb = 1024.0 * 1024 * 1024
    println(s"""{"metric":"spill_probe","query":"$name","wall_sec":${s2(wall)}""" +
      s""","total_spill_mem_gb":${s2(totSpillMem.get / gb)},"total_spill_disk_gb":${s2(totSpillDisk.get / gb)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
