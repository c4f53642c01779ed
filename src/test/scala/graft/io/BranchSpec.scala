package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for named branches over the commit log: the fork is isolated in
  * both directions, fast-forward merges adopt branch dirs without
  * rewriting data and compose with concurrent parent commits, snapshot
  * merges carry rewritten history when the parent stood still, genuine
  * divergence throws (and damages nothing), and the parent's vacuum can
  * never reclaim a dir a live branch still references. */
class BranchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    s"/tmp/graft_branch_spec/${java.util.UUID.randomUUID()}"

  private def ids(root: String): Seq[Long] = {
    val v = Versioned.currentVersion(spark, root)
    Versioned.readAt(spark, root, v).select("id").as[Long].collect().sorted.toSeq
  }

  test("fork isolation: branch and main diverge without seeing each other") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 10L).toDF("id"))
    Branches.create(spark, root, "exp")
    val b = s"$root/refs/exp"
    Versioned.commitAppend(spark, b, Seq(100L).toDF("id"))
    Versioned.commitAppend(spark, root, Seq(200L).toDF("id"))
    assert(ids(root) == (1L to 10L) :+ 200L)
    assert(ids(b) == (1L to 10L) :+ 100L)
    assert(Branches.list(spark, root) == Seq("exp"))
    assert(Branches.forkVersion(spark, root, "exp") == 1)
  }

  test("fast-forward merge: adoption by rename on top of a moved main head") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 10L).toDF("id"))
    Branches.create(spark, root, "exp")
    val b = s"$root/refs/exp"
    Versioned.commitAppend(spark, b, Seq(100L, 101L).toDF("id"))
    Versioned.commitAppend(spark, b, Seq(102L).toDF("id"))
    Versioned.commitAppend(spark, root, Seq(200L).toDF("id")) // main moved
    val dirsBefore = Versioned.manifest(spark, root,
      Versioned.currentVersion(spark, root))
    val vm = Branches.merge(spark, root, "exp")
    assert(ids(root) == ((1L to 10L) ++ Seq(100L, 101L, 102L, 200L)).sorted)
    // append semantics: main's pre-merge dirs all survive, branch dirs
    // appended; adopted entries are parent-RELATIVE (renamed, not copied)
    val m = Versioned.manifest(spark, root, vm)
    assert(dirsBefore.forall(m.contains))
    assert(m.forall(d => !d.startsWith("/")))
    // metadata carried: count answered without scanning
    assert(Versioned.countAt(spark, root, vm) == 14)
    // consumed
    assert(Branches.list(spark, root).isEmpty)
  }

  test("fast-forward carries branch zone-map stats into the parent") {
    val root = newRoot()
    Versioned.commitAppendClustered(spark, root,
      (1L to 1000L).toDF("id"), "id", buckets = 4)
    Branches.create(spark, root, "exp")
    val b = s"$root/refs/exp"
    Versioned.commitAppendClustered(spark, b,
      (2001L to 3000L).toDF("id"), "id", buckets = 4)
    val vm = Branches.merge(spark, root, "exp")
    val st = Versioned.dirStats(spark, root, vm)
    val m = Versioned.manifest(spark, root, vm)
    assert(m.forall(st.contains), "every merged dir must carry stats")
    // pruning works across the merge: a probe in the branch's range
    // reads none of main's original dirs
    assert(Versioned.readRange(spark, root, vm, 2500, 2510)
      .as[Long].collect().sorted.toSeq == (2500L to 2510L))
    val pruned = m.filter(d => st(d)._2 < 2500 || st(d)._1 > 2510)
    assert(pruned.size >= 4, "main-side dirs must be prunable for branch-range probes")
  }

  test("fast-forward merge carries branch MOR deletes on its own dirs") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 10L).toDF("id"))
    Branches.create(spark, root, "exp")
    val b = s"$root/refs/exp"
    Versioned.commitAppend(spark, b, (100L to 120L).toDF("id"))
    Versioned.commitDeleteMOR(spark, b, col("id").between(105L, 110L))
    val vm = Branches.merge(spark, root, "exp")
    assert(ids(root) == ((1L to 10L) ++ (100L to 104L) ++ (111L to 120L)).sorted)
    assert(Versioned.countAt(spark, root, vm) == 10 + 21 - 6)
  }

  test("snapshot merge: branch rewrote history, parent stood still") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 10L).map(i => (i, i * 10)).toDF("id", "v"))
    Branches.create(spark, root, "exp")
    val b = s"$root/refs/exp"
    // CoW update on the branch replaces inherited dirs (the transform
    // sees each touched dir's FULL content, so it conditions itself)
    Versioned.commitUpdate(spark, b, col("id") <= 3,
      df => df.withColumn("v",
        when(col("id") <= 3, col("v") + 1000).otherwise(col("v"))))
    val vm = Branches.merge(spark, root, "exp")
    val got = Versioned.readAt(spark, root, vm)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(got == (1L to 10L).map(i => (i, if (i <= 3) i * 10 + 1000 else i * 10)))
    assert(Branches.list(spark, root).isEmpty)
    assert(vm == 2)
  }

  test("divergence throws MergeConflict and damages neither side") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 10L).map(i => (i, i)).toDF("id", "v"))
    Branches.create(spark, root, "exp")
    val b = s"$root/refs/exp"
    Versioned.commitUpdate(spark, b, col("id") === 1,
      df => df.withColumn("v",
        when(col("id") === 1, lit(-1L)).otherwise(col("v"))))
    Versioned.commitAppend(spark, root, Seq((99L, 99L)).toDF("id", "v")) // diverged
    intercept[Branches.MergeConflict] {
      Branches.merge(spark, root, "exp")
    }
    // both refs intact and readable after the refused merge
    assert(ids(root) == (1L to 10L) :+ 99L)
    assert(Versioned.readAt(spark, b, Versioned.currentVersion(spark, b))
      .filter(col("v") === -1L).count() == 1)
    assert(Branches.list(spark, root) == Seq("exp"))
  }

  test("parent vacuum keeps dirs a live branch references") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 10L).toDF("id"))
    Branches.create(spark, root, "exp")
    // main rewrites history away from the forked dirs, then vacuums to 1
    Versioned.commit(spark, root, (50L to 60L).toDF("id"))
    Versioned.vacuum(spark, root, keep = 1, graceMs = 0)
    // branch still reads its fork snapshot: the pinned dirs survived
    assert(ids(s"$root/refs/exp") == (1L to 10L))
    // after the branch is dropped, the same vacuum reclaims them
    Branches.delete(spark, root, "exp")
    Versioned.vacuum(spark, root, keep = 1, graceMs = 0)
    val dataDir = new org.apache.hadoop.fs.Path(s"$root/data")
    val left = Versioned.fs(spark, dataDir).listStatus(dataDir).length
    assert(left == 1, s"expected only the head's dir to survive, found $left")
  }

  test("parent schema alters since the fork apply to adopted dirs") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 5L).toDF("id"))
    Branches.create(spark, root, "exp")
    val b = s"$root/refs/exp"
    Versioned.commitAppend(spark, b, (100L to 102L).toDF("id"))
    Versioned.commitAlterAdd(spark, root, "tag", "STRING")
    Versioned.commitAppend(spark, root,
      Seq((200L, "t")).toDF("id", "tag"))
    val vm = Branches.merge(spark, root, "exp")
    val got = Versioned.readAt(spark, root, vm)
    assert(got.columns.toSeq == Seq("id", "tag"))
    assert(got.filter(col("tag").isNull).select("id").as[Long]
      .collect().sorted.toSeq == ((1L to 5L) ++ (100L to 102L)))
    assert(got.filter(col("tag") === "t").count() == 1)
  }

  test("a refused fast-forward un-adopts: both refs intact afterwards") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 10L).toDF("id"))
    Versioned.commitAlterAdd(spark, root, "tag", "STRING")
    Branches.create(spark, root, "exp") // fork AFTER the alter
    val b = s"$root/refs/exp"
    Versioned.commitAppend(spark, b, (100L to 105L).toDF("id")
      .withColumn("tag", lit(null).cast("string")))
    // main REWRITES its alter history out from under the fork: restore
    // to the pre-alter version shrinks the event log — the fork's events
    // are no longer a prefix, so the merge must refuse AND roll back
    Versioned.restore(spark, root, 1)
    intercept[Branches.MergeConflict] {
      Branches.merge(spark, root, "exp")
    }
    // the branch still reads its own appended rows (dirs moved back)
    assert(Versioned.readAt(spark, b, Versioned.currentVersion(spark, b))
      .select("id").as[Long].collect().sorted.toSeq ==
      ((1L to 10L) ++ (100L to 105L)).sorted)
    assert(Branches.list(spark, root) == Seq("exp"))
  }

  test("a second create under the same name is refused while one lives") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 3L).toDF("id"))
    Branches.create(spark, root, "exp")
    intercept[IllegalArgumentException] {
      Branches.create(spark, root, "exp")
    }
    Branches.delete(spark, root, "exp")
    Branches.create(spark, root, "exp") // re-creatable after delete
    assert(Branches.list(spark, root) == Seq("exp"))
  }

  test("rebase replays appends onto a moved main; fast-forward then lands") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 10L).toDF("id"))
    Branches.create(spark, root, "exp")
    val b = s"$root/refs/exp"
    Versioned.commitAppend(spark, b, Seq(100L, 101L).toDF("id"))
    Versioned.commitAppend(spark, root, Seq(200L).toDF("id"))
    Branches.rebase(spark, root, "exp")
    assert(Branches.forkVersion(spark, root, "exp") == 2)
    assert(ids(b) == ((1L to 10L) ++ Seq(100L, 101L, 200L)).sorted)
    // main moves AGAIN after the rebase: an append-only rebased branch
    // still fast-forwards (adoption onto whatever head main reached)
    Versioned.commitAppend(spark, root, Seq(300L).toDF("id"))
    Branches.merge(spark, root, "exp")
    assert(ids(root) == ((1L to 10L) ++ Seq(100L, 101L, 200L, 300L)).sorted)
  }

  test("rebase replays MOR deletes; conflicts when main touched the same dir") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 10L).toDF("id"))
    Branches.create(spark, root, "exp")
    val b = s"$root/refs/exp"
    Versioned.commitDeleteMOR(spark, b, col("id") === 3L)
    Versioned.commitAppend(spark, root, Seq(200L).toDF("id"))
    Branches.rebase(spark, root, "exp")
    assert(ids(b) == ((1L to 10L).filterNot(_ == 3L) :+ 200L).sorted)
    // snapshot merge (main unmoved since the rebase) carries the delete
    Branches.merge(spark, root, "exp")
    assert(ids(root) == ((1L to 10L).filterNot(_ == 3L) :+ 200L).sorted)
    // conflict case: main vectored the same dir the branch deleted from
    val root2 = newRoot()
    Versioned.commit(spark, root2, (1L to 10L).toDF("id"))
    Branches.create(spark, root2, "exp")
    Versioned.commitDeleteMOR(spark, s"$root2/refs/exp", col("id") === 3L)
    Versioned.commitDeleteMOR(spark, root2, col("id") === 7L)
    intercept[Branches.MergeConflict] { Branches.rebase(spark, root2, "exp") }
    // both refs intact
    assert(ids(root2) == (1L to 10L).filterNot(_ == 7L))
    assert(ids(s"$root2/refs/exp") == (1L to 10L).filterNot(_ == 3L))
  }

  test("rebase refuses a branch that rewrote fork history") {
    val root = newRoot()
    Versioned.commitAppendClustered(spark, root, (1L to 100L).toDF("id"), "id", 4)
    Branches.create(spark, root, "exp")
    Versioned.commitUpdate(spark, s"$root/refs/exp", col("id") === 5L,
      df => df.filter(col("id") =!= 5L))
    Versioned.commitAppend(spark, root, Seq(200L).toDF("id"))
    intercept[Branches.MergeConflict] { Branches.rebase(spark, root, "exp") }
  }

  test("rebase races a main append x3: nothing lost, merge lands everything") {
    for (round <- 1 to 3) {
      val root = newRoot()
      Versioned.commit(spark, root, (1L to 10L).toDF("id"))
      Branches.create(spark, root, "exp")
      val b = s"$root/refs/exp"
      Versioned.commitAppend(spark, b, Seq(100L).toDF("id"))
      Versioned.commitAppend(spark, root, Seq(200L).toDF("id"))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val t1 = new Thread(() =>
        try Versioned.commitAppend(spark, root, Seq(300L + round).toDF("id"))
        catch { case e: Throwable => errs.add(e) })
      val t2 = new Thread(() =>
        try Branches.rebase(spark, root, "exp")
        catch { case e: Branches.MergeConflict => () // a legal race outcome
                case e: Throwable => errs.add(e) })
      t1.start(); t2.start(); t1.join(); t2.join()
      assert(errs.isEmpty, s"round $round: ${errs}")
      // whatever interleaving happened, one more sequential rebase makes
      // the branch current and the merge must land EVERYTHING
      Branches.rebase(spark, root, "exp")
      Branches.merge(spark, root, "exp")
      assert(ids(root) == ((1L to 10L) ++ Seq(100L, 200L, 300L + round)).sorted,
        s"round $round lost rows")
    }
  }

  test("a crashed create's stub refuses re-create until deleted explicitly") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 3L).toDF("id"))
    // simulate the crash: a fork pointer exists, no log ever landed
    val stub = new org.apache.hadoop.fs.Path(s"$root/refs/exp/fork.json")
    val f = Versioned.fs(spark, stub)
    val out = f.create(stub, false)
    try out.write("""{"srcVersion":1}""".getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalStateException] { Branches.create(spark, root, "exp") }
    assert(e.getMessage.contains("crashed create"))
    Branches.delete(spark, root, "exp")
    Branches.create(spark, root, "exp")
    assert(Branches.forkVersion(spark, root, "exp") == 1)
  }

  test("an interrupted rebase is refused by merge and healed by rebase") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 10L).toDF("id"))
    Branches.create(spark, root, "exp")
    val b = s"$root/refs/exp"
    Versioned.commitAppend(spark, b, Seq(100L).toDF("id"))
    Versioned.commitDeleteMOR(spark, b, col("id") === 3L)
    Versioned.commitAppend(spark, root, Seq(200L).toDF("id"))
    Branches.rebase(spark, root, "exp")
    // simulate a crash BEFORE the final pointer write: re-arm the intent
    // with the ORIGINAL fork state (what a real crash would leave)
    val ptr = new org.apache.hadoop.fs.Path(s"$b/fork.json")
    val f = Versioned.fs(spark, ptr)
    val out = f.create(ptr, true)
    try out.write(
      """{"srcVersion":1,"forkLocalV":1,"rebasing":{"src":2,"preHead":3}}"""
        .getBytes("UTF-8")) finally out.close()
    val e = intercept[Branches.MergeConflict] { Branches.merge(spark, root, "exp") }
    assert(e.getMessage.contains("interrupted rebase"))
    // heal: rebase restarts from preHead, supersedes the orphans
    Branches.rebase(spark, root, "exp")
    Branches.merge(spark, root, "exp")
    assert(ids(root) == ((1L to 10L).filterNot(_ == 3L) ++ Seq(100L, 200L)).sorted)
  }

  test("heal refuses to supersede a non-rebase commit made under a live intent") {
    val root = newRoot()
    Versioned.commit(spark, root, (1L to 10L).toDF("id"))
    Branches.create(spark, root, "exp")
    val b = s"$root/refs/exp"
    Versioned.commitAppend(spark, b, Seq(100L).toDF("id"))
    Versioned.commitDeleteMOR(spark, b, col("id") === 3L)
    Versioned.commitAppend(spark, root, Seq(200L).toDF("id"))
    Branches.rebase(spark, root, "exp") // branch log now carries the marked snapshots
    // simulate the crash before the final pointer: re-arm the intent
    val ptr = new org.apache.hadoop.fs.Path(s"$b/fork.json")
    val f = Versioned.fs(spark, ptr)
    val out = f.create(ptr, true)
    try out.write(
      """{"srcVersion":1,"forkLocalV":1,"rebasing":{"src":2,"preHead":3}}"""
        .getBytes("UTF-8")) finally out.close()
    // a LEGITIMATE commit lands on the branch while the intent is live —
    // restarting from preHead would silently drop it from the replay
    Versioned.commitAppend(spark, b, Seq(400L).toDF("id"))
    val e = intercept[IllegalStateException] { Branches.rebase(spark, root, "exp") }
    assert(e.getMessage.contains("non-rebase commit"))
    // ...while a crash whose later versions are ALL the rebase's own
    // artifacts still heals (the original interrupted-rebase contract):
    // covered by the test above; here the refusal left the branch intact
    assert(ids(b).contains(400L))
  }

  test("rebase races a concurrent BRANCH commit x3: the commit is never lost") {
    for (round <- 1 to 3) {
      val root = newRoot()
      Versioned.commit(spark, root, (1L to 10L).toDF("id"))
      Branches.create(spark, root, "exp")
      val b = s"$root/refs/exp"
      Versioned.commitAppend(spark, b, Seq(100L).toDF("id"))
      Versioned.commitAppend(spark, root, Seq(200L).toDF("id"))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val t1 = new Thread(() =>
        try Versioned.commitAppend(spark, b, Seq(300L + round).toDF("id"))
        catch { case e: Throwable => errs.add(e) })
      val t2 = new Thread(() =>
        try Branches.rebase(spark, root, "exp")
        catch { case e: Branches.MergeConflict => () // legal: clean in-process abort
                case e: Throwable => errs.add(e) })
      t1.start(); t2.start(); t1.join(); t2.join()
      assert(errs.isEmpty, s"round $round: $errs")
      // an in-process failure must have RESTORED the pointer (no wedged
      // intent), and whatever the interleaving, one sequential rebase +
      // merge must land main's append, the branch's work, AND the racer
      val ptrTxt = {
        val p = new org.apache.hadoop.fs.Path(s"$b/fork.json")
        val in = Versioned.fs(spark, p).open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      }
      assert(!ptrTxt.contains("rebasing"),
        s"round $round: a clean in-process rebase failure left the intent armed")
      Branches.rebase(spark, root, "exp")
      Branches.merge(spark, root, "exp")
      assert(ids(root) == ((1L to 10L) ++ Seq(100L, 200L, 300L + round)).sorted,
        s"round $round lost rows")
    }
  }
}
