package graft

import graft.sources.SnapshotTable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted,
  SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Per-commit footer/stats collection must run as a DISTRIBUTED job
  * ([[SnapshotTable.probeFooters]]): a 100 TB MERGE emitting tens of
  * thousands of files cannot serialize footer opens through the driver
  * — the same scale shape CONVERT's probe job covers (ConvertSpec). */
class CommitFooterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(p: String) = Files.createTempDirectory(s"graft_$p").toString

  test("a multi-file commit collects footers in a distributed job") {
    val s = spark.newSession()
    import s.implicits._
    val dir = tmp("footer_job")
    // count tasks of the probe's collect stages only (the data write
    // job runs alongside in the same commit)
    val probeStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        if (e.stageInfo.name.contains("collect at SnapshotTable.scala")) {
          probeStages.add(e.stageInfo.stageId); ()
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (probeStages.contains(e.stageId)) { tasks.incrementAndGet(); () }
    }
    s.sparkContext.addSparkListener(listener)
    val t =
      try {
        val t0 = new SnapshotTable(s, dir).create(
          (1L to 400L).map(k => (k, k * 1.0)).toDF("k", "v").repartition(4))
        // listener events post asynchronously — give the bus a beat
        val deadline = System.currentTimeMillis() + 10000
        while (tasks.get() < 2 && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        t0
      } finally s.sparkContext.removeSparkListener(listener)
    assert(tasks.get() > 1,
      s"expected a distributed footer job, saw ${tasks.get()} tasks")
    // the probed metadata is intact: rows and stats as before
    assert(t.read().count() == 400L)
    assert(t.detail.head.getLong(3) == 400L, "manifest row count from footers")
  }
}
