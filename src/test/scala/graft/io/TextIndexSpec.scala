package graft.io

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the token index: probes return exactly the word-boundary
  * regexp's rows, pruning actually skips dirs whose filters exclude the
  * term, unindexed appends degrade to conservative reads (never lost
  * rows), phrase probes AND the token filters, and the index survives
  * carry-forward by later commits. */
class TextIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newRoot() =
    s"/tmp/graft_textindex_spec/${java.util.UUID.randomUUID()}"

  private def corpus(tag: String, n: Int, planted: Map[Long, String]) =
    (1L to n.toLong).map { i =>
      val extra = planted.getOrElse(i, "")
      (i, s"alpha beta gamma $tag row$i $extra".trim)
    }.toDF("id", "text")

  test("token probe equals the word-boundary regexp filter") {
    val root = newRoot()
    // 'needle' planted in rows 3 and 7; 'needles' in row 5 must NOT match
    TextIndex.commitAppendIndexed(spark, root,
      corpus("d0", 10, Map(3L -> "the needle here", 5L -> "needles", 7L -> "needle.")),
      "text")
    val got = TextIndex.readToken(spark, root, 1, "needle")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L, 7L))
  }

  test("pruning skips dirs whose filter excludes the term") {
    val root = newRoot()
    (0 until 8).foreach { d =>
      val planted = if (d == 5) Map(3L -> "zebra") else Map.empty[Long, String]
      TextIndex.commitAppendIndexed(spark, root, corpus(s"d$d", 50, planted), "text")
    }
    val v = Versioned.currentVersion(spark, root)
    val probe = TextIndex.readToken(spark, root, v, "zebra")
    // with a 6-token vocabulary per dir and 2^16 bits, false positives
    // are essentially impossible: exactly ONE dir's files are read
    val dirsRead = probe.inputFiles.map(_.split("/data/")(1).split("/")(0)).distinct
    assert(dirsRead.length == 1, s"expected 1 dir read, got ${dirsRead.length}")
    assert(probe.select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("unindexed appends are read conservatively, never pruned wrongly") {
    val root = newRoot()
    TextIndex.commitAppendIndexed(spark, root, corpus("d0", 10, Map.empty), "text")
    // a plain append bypasses the index: its dir carries no filter
    Versioned.commitAppend(spark, root,
      Seq((100L, "hidden kiwi text")).toDF("id", "text"))
    val v = Versioned.currentVersion(spark, root)
    assert(TextIndex.readToken(spark, root, v, "kiwi")
      .select("id").as[Long].collect().toSeq == Seq(100L))
  }

  test("phrase probe: tokens in order, not just co-occurrence") {
    val root = newRoot()
    TextIndex.commitAppendIndexed(spark, root,
      corpus("d0", 10, Map(
        2L -> "canary string omega",
        4L -> "omega then canary string elsewhere",
        6L -> "string canary omega")), // reversed order: no phrase match
      "text")
    val got = TextIndex.readPhrase(spark, root, 1, "canary string")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 4L))
    // AND pruning still exact for multi-token membership
    val all2 = TextIndex.readTokensAll(spark, root, 1, Seq("canary", "omega"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(all2 == Seq(2L, 4L, 6L))
  }

  test("index entries carry through later commits and vacuum") {
    val root = newRoot()
    TextIndex.commitAppendIndexed(spark, root,
      corpus("d0", 20, Map(9L -> "quokka")), "text")
    TextIndex.commitAppendIndexed(spark, root, corpus("d1", 20, Map.empty), "text")
    Versioned.commitAppend(spark, root, Seq((500L, "plain")).toDF("id", "text"))
    Versioned.vacuum(spark, root, keep = 1, graceMs = 0)
    val v = Versioned.currentVersion(spark, root)
    assert(TextIndex.readToken(spark, root, v, "quokka")
      .select("id").as[Long].collect().toSeq == Seq(9L))
  }

  test("misuse guards: wrong probe API and malformed terms are refused") {
    val root = newRoot()
    TextIndex.commitAppendIndexed(spark, root, corpus("d0", 5, Map.empty), "text")
    intercept[IllegalArgumentException] {
      BloomIndex.readPointStrings(spark, root, 1, Seq("alpha"))
    }
    intercept[IllegalArgumentException] {
      TextIndex.readToken(spark, root, 1, "has space")
    }
    val vroot = newRoot()
    BloomIndex.commitAppendBloom(spark, vroot, Seq((1L, "x")).toDF("id", "s"), "id")
    intercept[IllegalArgumentException] {
      TextIndex.readToken(spark, vroot, 1, "x")
    }
  }

  test("ANY probe: union pruning, exact OR rows, subset of conservative") {
    val root = newRoot()
    (0 until 8).foreach { d =>
      val planted =
        if (d == 2) Map(3L -> "zebra here")
        else if (d == 6) Map(9L -> "quagga there")
        else Map.empty[Long, String]
      TextIndex.commitAppendIndexed(spark, root, corpus(s"d$d", 50, planted), "text")
    }
    val v = Versioned.currentVersion(spark, root)
    val any = TextIndex.readTokensAny(spark, root, v, Seq("zebra", "quagga"))
    assert(any.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 9L))
    // the union-pruned dir set is the UNION of the per-term prunes (2 of
    // 8) and a SUBSET of the conservative full read
    val dirsOf = (df: org.apache.spark.sql.DataFrame) =>
      df.inputFiles.map(_.split("/data/")(1).split("/")(0)).distinct.toSet
    val anyDirs = dirsOf(any)
    assert(anyDirs.size == 2, s"expected the 2-dir union, got ${anyDirs.size}")
    assert(anyDirs.subsetOf(dirsOf(Versioned.readAt(spark, root, v))),
      "pruned union must be a subset of the conservative read")
    assert(dirsOf(TextIndex.readToken(spark, root, v, "zebra")).subsetOf(anyDirs))
  }

  test("ranked retrieval scores the pruned read like the full corpus") {
    val root = newRoot()
    // 'zebra' concentrated in dir 2, twice in doc 3 (tf matters); the
    // common vocabulary appears everywhere so df/avgdl are corpus-wide
    (0 until 4).foreach { d =>
      val planted =
        if (d == 2) Map(3L -> "zebra zebra stripes", 7L -> "zebra")
        else Map.empty[Long, String]
      TextIndex.commitAppendIndexed(spark, root,
        corpus(s"d$d", 30, planted)
          .withColumn("id", col("id") + lit(d * 100L)) // ids unique per dir
          .withColumn("n_toks", size(graft.llm.TextOps.toks(col("text"))).cast("long")),
        "text")
    }
    Versioned.commitDeclareSum(spark, root, "n_toks")
    val v = Versioned.currentVersion(spark, root)
    val ranked = TextIndex.rankBm25(spark, root, v, Seq("zebra"), k = 5, idCol = "id")
      .withColumnRenamed("doc_id", "id")
    // oracle: the same BM25 over the FULL stored corpus (no pruning)
    val full = Versioned.readAt(spark, root, v)
    val toks = full.select(col("id").as("doc_id"),
      explode(graft.llm.TextOps.toks(col("text"))).as("w"))
    val want = graft.llm.Relevance.bm25Tokens(toks, full.count().toDouble, Seq("zebra"))
      .orderBy(col("score_milli").desc, col("doc_id")).limit(5)
      .withColumnRenamed("doc_id", "id")
    assert(ranked.collect().toSeq.map(_.toSeq) == want.collect().toSeq.map(_.toSeq))
    // and the ranked read was pruned to the term dir
    assert(ranked.inputFiles.map(_.split("/data/")(1).split("/")(0)).distinct.length == 1)
  }

  test("fenced indexed batches: exactly-once AND a filter per batch") {
    val root = newRoot()
    TextIndex.commitAppendIndexed(spark, root, corpus("d0", 20, Map.empty), "text")
    val b1 = corpus("d1", 20, Map(3L -> "zebra")).withColumn("id", col("id") + 100L)
    assert(Versioned.commitBatchIndexed(spark, root, 1L, b1).nonEmpty)
    // a replayed batch is SKIPPED: no new dir, no new filter entry
    val v = Versioned.currentVersion(spark, root)
    assert(Versioned.commitBatchIndexed(spark, root, 1L, b1).isEmpty)
    assert(Versioned.currentVersion(spark, root) == v)
    // the batch dir carries its own filter: the probe prunes to it
    val probe = TextIndex.readToken(spark, root, v, "zebra")
    assert(probe.select("id").as[Long].collect().toSeq == Seq(103L))
    assert(probe.inputFiles.map(_.split("/data/")(1).split("/")(0)).distinct.length == 1)
    val dirs = Versioned.manifest(spark, root, v)
    assert(dirs.forall(Versioned.dirBlooms(spark, root, v).contains))
  }
}
