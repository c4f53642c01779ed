package graft.llm

import graft.{Queries, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Gates for the BPE tokenizer (q_llm_bpe_encode): the codegen'd encoder
  * against an independent driver-side reimplementation on every document,
  * the exact roundtrip property, trainer determinism and dictionary
  * equivalence, and the codegen plan shape (the kernel must not fall out
  * of WholeStageCodegen). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent rank-greedy BPE encoder — deliberately written in a
    * different style (immutable lists, recursive merge) from the kernel. */
  private def refEncodeWord(word: String, ranks: Map[(String, String), Int]): List[String] = {
    def step(syms: List[String]): List[String] = {
      val present = syms.zip(syms.drop(1)).flatMap(p => ranks.get(p).map(r => (r, p)))
      if (present.isEmpty) syms
      else {
        val (_, (l, r)) = present.minBy(_._1)
        def mergeAll(xs: List[String]): List[String] = xs match {
          case a :: b :: rest if a == l && b == r => (a + b) :: mergeAll(rest)
          case a :: rest => a :: mergeAll(rest)
          case Nil => Nil
        }
        step(mergeAll(syms))
      }
    }
    step(word.map(String.valueOf(_)).toList :+ "</w>")
  }

  private def refEncodeDoc(text: String, ranks: Map[(String, String), Int]): List[String] =
    text.split(" ").filter(_.nonEmpty).toList.flatMap(refEncodeWord(_, ranks))

  test("encoder matches the independent reimplementation on every document") {
    val mergeSeq = Bpe.merges(spark, TestSpark.sf)
    assert(mergeSeq.nonEmpty && mergeSeq.size <= 64)
    assert(mergeSeq.distinct.size == mergeSeq.size, "a pair can only merge once")
    val ranks = mergeSeq.zipWithIndex.toMap
    val docs = graft.io.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val got = Queries.queries("q_llm_bpe_encode")(spark, TestSpark.sf)
      .select("doc_id", "n_bpe", "bpe").as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val expect = refEncodeDoc(text, ranks)
      val (n, bpe) = got(id)
      assert(n == expect.length, s"doc $id token count")
      assert(bpe == expect.mkString(" "), s"doc $id token stream")
      // exact roundtrip: drop </w>, concat == original token concat
      assert(expect.mkString.replace("</w>", "") ==
        text.split(" ").filter(_.nonEmpty).mkString)
    }
    // the corpus really compresses: merged tokens shorter than chars,
    // but the stream is never shorter than the word count
    val totalWords = docs.map(_._2.split(" ").count(_.nonEmpty)).sum
    val totalBpe = got.values.map(_._1).sum
    assert(totalBpe >= totalWords)
  }

  test("trainer: dictionary weighting equals stream training; determinism") {
    // training on (word, count) must equal training on the expanded stream
    val stream = Seq("low", "low", "low", "lower", "lower", "newest",
      "newest", "newest", "newest", "widest")
    val dict = stream.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
    val a = Bpe.trainMerges(dict.sortBy(_._1), nMerges = 10)
    val b = Bpe.trainMerges(stream.map((_, 1L)), nMerges = 10)
    assert(a == b, "weighted dictionary must equal the expanded stream")
    assert(a.size == 10)
    // highest-frequency pair merges first: 'newest' dominates -> its pairs lead
    val first = a.head
    assert("newest".contains((first._1 + first._2).replace("</w>", "")) ||
      (first._1 + first._2).endsWith("</w>"))
  }

  test("trainer emits distinct pairs; table keeps the lower rank on a dup key") {
    // A merged pair can RE-FORM when a later merge recreates one of its
    // operands next to the other; the trainer's seen-set makes pair
    // distinctness unconditional.  Property-checked over randomized
    // dictionaries (the greedy rank-order makes organic re-forms rare, so
    // the invariant is asserted, not hunted).
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val words = (1 to (2 + rnd.nextInt(5))).map { _ =>
        (1 to (2 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.distinct
      val dict = words.map(w => (w, (1 + rnd.nextInt(20)).toLong))
      val m = Bpe.trainMerges(dict, nMerges = 20)
      assert(m.distinct == m, s"duplicate merge pair trained from $dict: $m")
    }
    // belt-and-braces at the table layer: if a duplicate key ever reaches
    // BpeTable, the FIRST (lower-rank) entry owns the key — matching what
    // a rank-ordered reference tokenizer would apply
    val tbl = new graft.fns.BpeTable(Seq(("a", "b"), ("c", "d"), ("a", "b")))
    val ia = tbl.symStr.indexOf("a"); val ib = tbl.symStr.indexOf("b")
    val hit = tbl.lookup(ia, ib)
    assert(hit >= 0 && (hit >>> 32) == 0L, "dup key must keep rank 0, not rank 2")
  }

  test("id-space tokenization: ids decode to the string tokens, unk=0 semantics") {
    val mergeSeq = Bpe.merges(spark, TestSpark.sf)
    val alpha = Bpe.alphabet(spark, TestSpark.sf)
    assert(alpha.nonEmpty)
    val tbl = new graft.fns.BpeTable(mergeSeq, alpha)
    // vocab ids are dense, 0 reserved for unk
    assert(tbl.vocabSize > alpha.size)
    val strs = Queries.queries("q_llm_bpe_encode")(spark, TestSpark.sf)
      .select("doc_id", "bpe").as[(Long, String)].collect().toMap
    val ids = Queries.queries("q_llm_bpe_ids")(spark, TestSpark.sf)
      .select("doc_id", "n_bpe", "n_unk", "ids_csv").as[(Long, Long, Long, String)].collect()
    assert(ids.length == strs.size)
    ids.foreach { case (id, n, nUnk, csv) =>
      // the training corpus contains no out-of-alphabet chars
      assert(nUnk == 0L, s"doc $id unk count")
      val idSeq = if (csv.isEmpty) Array.empty[Int] else csv.split(",").map(_.toInt)
      assert(idSeq.length == n)
      // decode via the table: id-1 indexes symStr; must equal the string stream
      val decoded = idSeq.map(i => tbl.symStr(i - 1)).mkString(" ")
      assert(decoded == strs(id), s"doc $id ids decode mismatch")
    }
    // a char outside the alphabet hits unk=0 and never merges
    val probe = graft.fns.BpeKernel.encodeDocIds(
      org.apache.spark.unsafe.types.UTF8String.fromString("aÿ"), tbl)
    assert(probe.toIntArray().contains(0))
  }

  test("encode is partitioning-invariant and stays in WholeStageCodegen") {
    val out = Queries.queries("q_llm_bpe_encode")(spark, TestSpark.sf)
    // the `*(n)` marker on the encode Project = inside WholeStageCodegen
    val plan = out.queryExecution.executedPlan.toString
    val encodeLine = plan.linesIterator.find(_.contains("graft_bpe_encode")).get
    assert(encodeLine.contains("*("), s"encode Project not codegen'd: $encodeLine")
    assert(!plan.contains("CodegenFallback"), "kernel fell out of codegen")
    val a = out.select("doc_id", "n_bpe", "bpe").as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    val again = graft.io.Tables.documents(spark, TestSpark.sf).repartition(7)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.fns.BpeExpressions.bpeEncode(spark,
          org.apache.spark.sql.functions.col("text"),
          Bpe.merges(spark, TestSpark.sf), TestSpark.sf).as("t"))
      .selectExpr("doc_id", "cast(size(t) as long) as n_bpe",
        "concat_ws(' ', t) as bpe")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(a == again)
  }
}
