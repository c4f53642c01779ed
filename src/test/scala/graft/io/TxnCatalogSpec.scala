package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for multi-table atomic commits: the catalog record is the only
  * commit point (a crash between member commits and the fence is never
  * observable through the catalog), interrupted transactions are
  * superseded by the next one, independent transactions compose under
  * contention, and same-table races refuse to pin backwards. */
class TxnCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newBase() =
    s"/tmp/graft_txn_spec/${java.util.UUID.randomUUID()}"

  private def pair(): (String, String, String) = {
    val b = newBase(); (s"$b/cat", s"$b/a", s"$b/b")
  }

  test("crash between member commit and fence is invisible; next txn heals") {
    val (cat, ra, rb) = pair()
    Versioned.commit(spark, ra, (1L to 10L).toDF("id"))
    Versioned.commit(spark, rb, Seq((10L)).toDF("n")) // MV: count of a
    TxnCatalog.create(spark, cat, Map("a" -> ra, "b" -> rb))
    // injected crash: 'a' commits, the fence never lands
    Versioned.commitAppend(spark, ra, (11L to 20L).toDF("id"))
    val a1 = TxnCatalog.readTable(spark, cat, "a")
    assert(a1.count() == 10, "torn member commit must stay invisible")
    assert(TxnCatalog.readTable(spark, cat, "b").as[Long].head() == 10L)
    // the next full transaction supersedes the orphan: its member commit
    // lands ON TOP of the orphaned version (append composes), one fence
    TxnCatalog.commitAtomic(spark, cat, Seq(
      "a" -> (s => Versioned.commitAppend(s, ra, (21L to 25L).toDF("id"))),
      "b" -> (s => Versioned.commit(s, rb,
        Seq(Versioned.countAt(s, ra, Versioned.currentVersion(s, ra))).toDF("n")))))
    val a2 = TxnCatalog.readTable(spark, cat, "a")
    assert(a2.count() == 25) // 10 + orphaned 10 + 5 — all pinned now
    assert(TxnCatalog.readTable(spark, cat, "b").as[Long].head() == 25L)
  }

  test("independent transactions on disjoint tables compose under race") {
    for (round <- 1 to 3) {
      val base = newBase()
      val (cat, ra, rb) = (s"$base/cat", s"$base/a", s"$base/b")
      Versioned.commit(spark, ra, Seq(1L).toDF("id"))
      Versioned.commit(spark, rb, Seq(1L).toDF("id"))
      TxnCatalog.create(spark, cat, Map("a" -> ra, "b" -> rb))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val t1 = new Thread(() => try TxnCatalog.commitAtomic(spark, cat, Seq(
        "a" -> (s => Versioned.commitAppend(s, ra, Seq(2L).toDF("id")))))
        catch { case e: Throwable => errs.add(e) })
      val t2 = new Thread(() => try TxnCatalog.commitAtomic(spark, cat, Seq(
        "b" -> (s => Versioned.commitAppend(s, rb, Seq(2L).toDF("id")))))
        catch { case e: Throwable => errs.add(e) })
      t1.start(); t2.start(); t1.join(); t2.join()
      assert(errs.isEmpty, s"round $round: $errs")
      assert(TxnCatalog.readTable(spark, cat, "a").count() == 2, s"round $round")
      assert(TxnCatalog.readTable(spark, cat, "b").count() == 2, s"round $round")
      val pins = TxnCatalog.pinsAt(spark, cat)
      assert(pins == Map("a" -> 2, "b" -> 2), s"round $round: $pins")
    }
  }

  test("a stale same-table transaction refuses to pin backwards") {
    val (cat, ra, rb) = pair()
    Versioned.commit(spark, ra, Seq(1L).toDF("id"))
    Versioned.commit(spark, rb, Seq(1L).toDF("id"))
    TxnCatalog.create(spark, cat, Map("a" -> ra, "b" -> rb))
    TxnCatalog.commitAtomic(spark, cat, Seq(
      "a" -> (s => Versioned.commitAppend(s, ra, Seq(2L).toDF("id")))))
    val v2 = Versioned.currentVersion(spark, ra) // = 2, pinned
    // a transaction claiming an OLD version for 'a' must refuse
    intercept[TxnCatalog.TxnConflict] {
      TxnCatalog.commitAtomic(spark, cat, Seq("a" -> (_ => v2)))
    }
  }

  test("catalog guards: unknown table, double create, missing pin") {
    val (cat, ra, rb) = pair()
    Versioned.commit(spark, ra, Seq(1L).toDF("id"))
    TxnCatalog.create(spark, cat, Map("a" -> ra))
    intercept[IllegalArgumentException] {
      TxnCatalog.commitAtomic(spark, cat, Seq("zz" -> (_ => 1)))
    }
    intercept[Exception] { TxnCatalog.create(spark, cat, Map("a" -> ra)) }
    intercept[IllegalArgumentException] {
      TxnCatalog.readTable(spark, cat, "nope")
    }
  }

  test("maintainMembers sweeps the catalog; pins stay on their versions") {
    val (cat, ra, rb) = pair()
    // member a: bloom-indexed, then decayed by a plain append (the
    // backfill has work); member b: healthy
    BloomIndex.commitAppendBloom(spark, ra,
      (1L to 100L).map(i => (i, i * 2)).toDF("id", "m"), "id")
    Versioned.commitAppend(spark, ra,
      (101L to 200L).map(i => (i, i * 2)).toDF("id", "m"))
    Versioned.commit(spark, rb, Seq(1L).toDF("n"))
    TxnCatalog.create(spark, cat, Map("a" -> ra, "b" -> rb))
    val worked = TxnCatalog.maintainMembers(spark, cat)
    assert(worked.keySet == Set("a"), s"only the decayed member needs work: $worked")
    // the maintenance commit is an ordinary out-of-band member commit:
    // catalog readers keep the pinned version
    assert(TxnCatalog.pinOf(spark, cat, "a")._2 == 2)
    assert(TxnCatalog.readTable(spark, cat, "a").count() == 200)
    assert(TxnCatalog.maintainMembers(spark, cat).isEmpty, "steady state")
  }

  test("maintainMembers heals heterogeneous members each under its OWN declared policy") {
    val (cat, ra, rb) = pair()
    // member a declares an aggressive defrag policy (folds 1-row dirs);
    // member b declares NO small-fold (smallRows = 0) — the same two
    // tiny appends must fold on a and stay put on b under ONE
    // parameterless sweep
    Versioned.commit(spark, ra, (0L until 3000L).map(i => (i, i % 5)).toDF("id", "m"))
    Versioned.commitDeclareStatsCols(spark, ra, Seq("id"))
    Versioned.commitDeclarePolicy(spark, ra, smallRows = 1000L, targetRows = 4000L)
    Versioned.commit(spark, rb, (0L until 3000L).map(i => (i, i % 5)).toDF("id", "m"))
    Versioned.commitDeclareStatsCols(spark, rb, Seq("id"))
    Versioned.commitDeclarePolicy(spark, rb, smallRows = 0L)
    Seq(ra, rb).foreach { r =>
      Versioned.commitAppend(spark, r, Seq((17L, -2L)).toDF("id", "m"))
      Versioned.commitAppend(spark, r, Seq((18L, -3L)).toDF("id", "m"))
    }
    TxnCatalog.create(spark, cat, Map("a" -> ra, "b" -> rb))
    val worked = TxnCatalog.maintainMembers(spark, cat) // NO parameters
    assert(worked.keySet == Set("a"),
      s"only a's policy has the fold threshold: $worked")
    val va = Versioned.currentVersion(spark, ra)
    val rowsA = Versioned.dirRows(spark, ra, va)
    assert(Versioned.manifest(spark, ra, va)
      .count(d => rowsA.get(d).exists(_ < 1000L)) < 2, "a folded under its policy")
    val vb = Versioned.currentVersion(spark, rb)
    val rowsB = Versioned.dirRows(spark, rb, vb)
    assert(Versioned.manifest(spark, rb, vb)
      .count(d => rowsB.get(d).exists(_ < 1000L)) >= 2, "b kept its fragments")
    assert(TxnCatalog.maintainMembers(spark, cat).isEmpty, "steady state")
  }

  test("create arbitrates on the mapping file: a different map can never pin") {
    val (cat, ra, rb) = pair()
    Versioned.commit(spark, ra, Seq(1L).toDF("id"))
    Versioned.commit(spark, rb, Seq(2L).toDF("id"))
    TxnCatalog.create(spark, cat, Map("a" -> ra))
    // a second creator with a DIFFERENT table map must refuse BEFORE
    // publishing any pin record (the TOCTOU let it land catalog v2
    // pinning tables absent from the surviving mapping file)
    val e = intercept[IllegalArgumentException] {
      TxnCatalog.create(spark, cat, Map("a" -> ra, "b" -> rb))
    }
    assert(e.getMessage.contains("different table map"))
    assert(Versioned.currentVersion(spark, cat) == 1, "the loser published a pin record")
    assert(TxnCatalog.pinsAt(spark, cat).keySet == Set("a"))
  }

  test("a torn create (mapping written, no pins) heals on retry with the same map") {
    val (cat, ra, _) = pair()
    Versioned.commit(spark, ra, Seq(1L).toDF("id"))
    // simulate the crash between the two create halves: mapping file
    // present, no pin record ever published
    val tf = new org.apache.hadoop.fs.Path(s"$cat/tables.json")
    val f = Versioned.fs(spark, tf)
    val out = f.create(tf, false)
    try out.write(s"""{"a":"$ra"}""".getBytes("UTF-8")) finally out.close()
    assert(Versioned.currentVersion(spark, cat) == 0)
    // same map: create finishes the missing half
    assert(TxnCatalog.create(spark, cat, Map("a" -> ra)) == 1)
    assert(TxnCatalog.readTable(spark, cat, "a").count() == 1)
    // and a later duplicate create still refuses
    intercept[Exception] { TxnCatalog.create(spark, cat, Map("a" -> ra)) }
  }

  test("pin-safe vacuum keeps the pinned version while the head ran ahead") {
    val (cat, ra, rb) = pair()
    Versioned.commit(spark, ra, (1L to 5L).toDF("id"))
    TxnCatalog.create(spark, cat, Map("a" -> ra))
    // the member advances OUTSIDE the catalog: pin stays at 1
    (1 to 3).foreach(i => Versioned.commitAppend(spark, ra, Seq(100L + i).toDF("id")))
    TxnCatalog.vacuumMember(spark, cat, "a", keep = 1, graceMs = 0)
    // the pinned version must still read (keep=1 alone would have
    // reclaimed v1's record)
    assert(TxnCatalog.readTable(spark, cat, "a").count() == 5)
    // and after the catalog catches up, normal retention applies
    TxnCatalog.commitAtomic(spark, cat, Seq(
      "a" -> (s => Versioned.commitAppend(s, ra, Seq(999L).toDF("id")))))
    TxnCatalog.vacuumMember(spark, cat, "a", keep = 1, graceMs = 0)
    assert(TxnCatalog.readTable(spark, cat, "a").count() == 9)
  }

  test("cross-table time travel: each catalog version is one atomic state") {
    val (cat, ra, rb) = pair()
    Versioned.commit(spark, ra, (1L to 10L).toDF("id"))
    Versioned.commit(spark, rb, Seq(10L).toDF("n"))
    TxnCatalog.create(spark, cat, Map("a" -> ra, "b" -> rb)) // cat v1
    TxnCatalog.commitAtomic(spark, cat, Seq(                 // cat v2
      "a" -> (s => Versioned.commitAppend(s, ra, (11L to 15L).toDF("id"))),
      "b" -> (s => Versioned.commit(s, rb, Seq(15L).toDF("n")))))
    // v1's pair is still one consistent state, whatever the heads say
    assert(TxnCatalog.readTableAt(spark, cat, "a", 1).count() == 10)
    assert(TxnCatalog.readTableAt(spark, cat, "b", 1).as[Long].head() == 10L)
    assert(TxnCatalog.readTableAt(spark, cat, "a", 2).count() == 15)
    assert(TxnCatalog.readTableAt(spark, cat, "b", 2).as[Long].head() == 15L)
    val h = TxnCatalog.history(spark, cat)
    assert(h.map(_._1) == Seq(2, 1))
    assert(h.head._2 == Map("a" -> 2, "b" -> 2))
  }

  test("racing same-map creators never wedge the mapping file (checksum-safe)") {
    val (cat, ra, _) = pair()
    Versioned.commit(spark, ra, Seq(1L).toDF("id"))
    val tables = Map("a" -> ra)
    // 8 threads race the whole create (mapping write-then-rename + pin
    // publish).  Pre-fix, the checksummed tmp write + two-op FileContext
    // rename could leave tables.json under a mismatched .crc — wedging
    // EVERY later read with ChecksumException; written raw there is no
    // sidecar to desynchronize, and the JVM monitor serializes peers.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val futs = (1 to 8).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, Int]] {
        def call(): Either[Throwable, Int] =
          try Right(TxnCatalog.create(spark, cat, tables))
          catch { case t: Throwable => Left(t) }
      })
    }
    val res = futs.map(_.get())
    pool.shutdown()
    assert(res.exists(_.isRight), "at least one creator must land the catalog")
    res.foreach {
      case Left(t) =>
        // losers may refuse loudly ("already exists") but must never
        // corrupt: a ChecksumException here means the mapping is wedged
        assert(!t.isInstanceOf[org.apache.hadoop.fs.ChecksumException],
          s"checksum corruption under create race: $t")
      case Right(v) => assert(v == 1)
    }
    // the catalog stays fully readable — repeatedly (the pre-fix failure
    // mode poisoned every subsequent read)
    (1 to 3).foreach { _ =>
      assert(TxnCatalog.tablesOf(spark, cat) == tables)
      assert(TxnCatalog.pinsAt(spark, cat) == Map("a" -> 1))
    }
    assert(Versioned.currentVersion(spark, cat) == 1,
      "racing creators must not stack duplicate pin records")
  }
}
