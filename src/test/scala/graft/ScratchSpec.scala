package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scratch-space registry semantics: registered dirs/views die at sweep,
  * everything else survives (the harness relies on this to GC per-run
  * DML scratch without touching staged roots). */
class ScratchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sweep deletes registered dirs and drops registered views, once") {
    val d = Scratch.dir("spec")
    val f = new java.io.File(d, "sub/marker.txt")
    f.getParentFile.mkdirs()
    java.nio.file.Files.writeString(f.toPath, "x")
    import spark.implicits._
    Seq(1, 2).toDF("v").createOrReplaceTempView("scratch_spec_view")
    Scratch.view("scratch_spec_view")

    val unregistered =
      java.nio.file.Files.createTempDirectory("graft_keep").toString

    Scratch.sweep(spark)
    assert(!new java.io.File(d).exists(), "registered dir must be deleted")
    assert(!spark.catalog.tableExists("scratch_spec_view"))
    assert(new java.io.File(unregistered).exists(), "staged dirs survive")

    // queue is drained: a second sweep is a no-op (nothing re-deleted)
    Scratch.sweep(spark)
    assert(new java.io.File(unregistered).exists())
    new java.io.File(unregistered).delete()
  }
}
