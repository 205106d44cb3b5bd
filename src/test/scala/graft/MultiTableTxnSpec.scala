package graft

import graft.sources.GraftDatabase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Atomicity semantics of GraftDatabase multi-table transactions:
  * table commits are INVISIBLE to consistent readers until the db
  * snapshot publishes (the crash-between-commit-and-publish window
  * leaves readers on the old consistent pair), cross-table AS OF
  * resolves every member to its pinned version, and the publish race
  * retries only across disjoint table sets. */
class MultiTableTxnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDb(): GraftDatabase = new GraftDatabase(spark,
    java.nio.file.Files.createTempDirectory("graft_mtx").toString)

  private def df(pairs: (Long, String)*) = {
    import spark.implicits._
    pairs.toDF("k", "v")
  }

  test("unpublished commits are invisible; publish makes both visible at once") {
    val db = freshDb()
    db.transact(Seq("a", "b")) { d =>
      d.table("a").create(df(1L -> "x")): Unit
      d.table("b").create(df(10L -> "y")): Unit
    }
    // crash window: both tables commit but the txn never publishes
    db.table("a").append(df(2L -> "x2"))
    db.table("b").append(df(20L -> "y2"))
    assert(db.read("a").count() == 1 && db.read("b").count() == 1,
      "consistent reader must not see unpublished commits")
    assert(db.table("a").read().count() == 2, "direct table read sees them")
    // a later publish (recovery or the txn completing) flips BOTH at once
    db.publish(Seq("a", "b"))
    assert(db.read("a").count() == 2 && db.read("b").count() == 2)
  }

  test("database AS OF resolves every member to its pinned version") {
    val db = freshDb()
    val v0 = db.transact(Seq("a", "b")) { d =>
      d.table("a").create(df(1L -> "x")): Unit
      d.table("b").create(df(10L -> "y")): Unit
    }
    db.transact(Seq("a", "b")) { d =>
      d.table("a").append(df(2L -> "x2"))
      d.table("b").append(df(20L -> "y2"))
    }
    assert(db.read("a", v0).count() == 1 && db.read("b", v0).count() == 1)
    assert(db.read("a").count() == 2 && db.read("b").count() == 2)
  }

  test("publish race: disjoint winner's pins carry forward; overlap fails loudly") {
    val db = freshDb()
    db.transact(Seq("a", "b")) { d =>
      d.table("a").create(df(1L -> "x")): Unit
      d.table("b").create(df(10L -> "y")): Unit
    }
    db.table("a").append(df(2L -> "x2"))
    // craft a colliding winner at the next db version that pinned only
    // the DISJOINT table b — our publish must retry and carry b's pin
    val log = java.nio.file.Paths.get(db.root, "_graft_db_log")
    def snap(v: Int, json: String): Unit =
      java.nio.file.Files.write(log.resolve(f"v$v%010d.json"),
        json.getBytes("UTF-8"))
    snap(1, """{"version":1,"ts":1,"tables":{"b":7}}""")
    val v = db.publish(Seq("a"))
    assert(v == 2)
    assert(db.tableVersions() == Map("a" -> 1, "b" -> 7))
    // overlap: a second crafted winner re-pins table a itself — publish
    // must refuse rather than silently last-write-win
    db.table("a").append(df(3L -> "x3"))
    snap(3, """{"version":3,"ts":1,"tables":{"a":99}}""")
    intercept[java.util.ConcurrentModificationException] {
      db.publish(Seq("a"))
    }
  }

  test("db vacuum drops crash orphans and history outside the retained snapshots") {
    val db = freshDb()
    db.transact(Seq("a", "b")) { d =>
      d.table("a").create(df(1L -> "x")): Unit
      d.table("b").create(df(10L -> "y")): Unit
    }                                                       // db v0: a@0 b@0
    db.transact(Seq("a", "b")) { d =>
      d.table("a").append(df(2L -> "x2"))
      d.table("b").append(df(20L -> "y2"))
    }                                                       // db v1: a@1 b@1
    // crash window: a txn commits both halves but never publishes
    db.table("a").append(df(3L -> "orphan"))                // a@2 UNPUBLISHED
    db.table("b").append(df(30L -> "orphan"))               // b@2 UNPUBLISHED
    assert(db.table("a").currentVersion == 2)

    val rolled = db.vacuum(retainDbVersions = 1)            // retain db v1 only
    assert(rolled == Map("a" -> 1, "b" -> 1), s"got $rolled")
    // orphans gone: direct table reads now agree with the consistent view
    assert(db.table("a").currentVersion == 1)
    assert(db.table("a").read().count() == 2)
    assert(db.read("a").count() == 2 && db.read("b").count() == 2)
    // history below the retained pin reclaimed: db v0 no longer resolves
    intercept[Exception] { db.tableVersions(0) }
    // retained snapshot still fully readable after file reclaim
    assert(db.read("a", dbVersion = 1).count() == 2)
    // vacuum is idempotent once clean
    assert(db.vacuum(retainDbVersions = 1) == Map("a" -> 0, "b" -> 0))
    // and the members accept new transactions afterwards
    db.transact(Seq("a")) { d => d.table("a").append(df(4L -> "x4")): Unit }
    assert(db.read("a").count() == 3)
  }

  test("vacuum racing between member-commit and publish fails the publish, not the readers") {
    val db = freshDb()
    db.transact(Seq("a", "b")) { d =>
      d.table("a").create(df(1L -> "x")): Unit
      d.table("b").create(df(10L -> "y")): Unit
    }                                                       // db v0: a@0 b@0
    // an in-flight transaction commits its member halves and records
    // the commit versions it intends to publish...
    db.table("a").append(df(2L -> "x2"))                    // a@1 UNPUBLISHED
    db.table("b").append(df(20L -> "y2"))                   // b@1 UNPUBLISHED
    val txnPins = Map(
      "a" -> db.table("a").currentVersion,
      "b" -> db.table("b").currentVersion)
    // ...and a concurrent vacuum runs before it publishes: the
    // unpublished versions look exactly like crash orphans and are
    // rolled back — the publish must detect the reclaim and FAIL
    // rather than pin versions whose manifests are gone
    db.vacuum(retainDbVersions = 1)
    val caught = intercept[java.util.ConcurrentModificationException] {
      db.publish(txnPins)
    }
    assert(caught.getMessage.contains("vacuum reclaimed"), caught.getMessage)
    // published state untouched and every reader still consistent —
    // no db snapshot may pin a version whose manifest vacuum deleted
    assert(db.currentVersion == 0)
    assert(db.read("a").count() == 1 && db.read("b").count() == 1)
    db.tableVersions().foreach { case (n, v) =>
      assert(db.table(n).versionExists(v), s"$n@v$v must still resolve")
    }
    // the transaction re-runs cleanly afterwards
    db.transact(Seq("a", "b")) { d =>
      d.table("a").append(df(2L -> "x2"))
      d.table("b").append(df(20L -> "y2"))
    }
    assert(db.read("a").count() == 2 && db.read("b").count() == 2)
  }
}
