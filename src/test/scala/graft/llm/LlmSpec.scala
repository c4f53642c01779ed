package graft.llm

import graft.{Queries, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the approximate / hash-based LLM operators, run on a
  * synthetic corpus with PLANTED duplicates (written as a temp sfDir so the
  * judged query functions run unmodified).
  */
class LlmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Corpus: 40 random word-soup docs + planted pairs:
    * 100/101 exact dupes, 102/103 near-dupes (2 token edits in 60). */
  private lazy val plantedDir: String = {
    val dir = "/tmp/graft_test_planted"
    val vocab = Vector("the", "a", "data", "query", "join", "filter", "scan",
      "sort", "merge", "group", "agg", "window", "hash", "vector", "stream")
    val r = new scala.util.Random(99)
    def soup(n: Int) = Seq.fill(n)(vocab(r.nextInt(vocab.size))).mkString(" ")
    val base = (0 until 40).map(i => (i.toLong, soup(60)))
    val exact = soup(60)
    val nearToks = Seq.fill(60)(vocab(r.nextInt(vocab.size)))
    val near1 = nearToks.mkString(" ")
    val near2 = nearToks.updated(10, "xxx").updated(40, "yyy").mkString(" ")
    val docs = (base ++ Seq((100L, exact), (101L, exact), (102L, near1), (103L, near2)))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text").cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup groups the planted exact duplicates; idempotent") {
    val out = Queries.queries("q_llm_dedup_exact")(spark, plantedDir)
    val dup = out.filter($"dups" > 1).collect()
    assert(dup.length == 1 && dup.head.getAs[Long]("keep_id") == 100L)
    // idempotence: dedup of the deduped keep-set has no dups
    assert(out.filter($"dups" > 1).count() == 1)
    assert(out.count() == 43) // 44 docs, one pair collapsed
  }

  test("MinHash LSH surfaces the planted near-dup pair") {
    val out = Queries.queries("q_llm_dedup_near")(spark, plantedDir)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(out.contains((100L, 101L)), "exact pair must collide")
    assert(out.contains((102L, 103L)), "near pair (2/60 token edits) must collide")
  }

  test("SimHash: identical docs at hamming 0; near pair within threshold") {
    val out = Queries.queries("q_llm_dedup_simhash")(spark, plantedDir)
    val m = out.select("ia", "ib", "ham").as[(Long, Long, Long)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    assert(m.get((100L, 101L)).contains(0L))
    assert(m.contains((102L, 103L)))
  }

  test("ngram Jaccard: planted near pair scores high, exact pair = 1") {
    val out = Queries.queries("q_llm_dedup_ngram")(spark, plantedDir)
    val m = out.select("ia", "ib", "jacc").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(m((100L, 101L)) == 1.0)
    assert(m((102L, 103L)) > 0.7)
    assert(m.values.forall(j => j >= 0.0 && j <= 1.0))
  }

  test("dedup clustering: components are consistent, transitive, min-labeled") {
    val out = Queries.queries("q_llm_dedup_cluster")(spark, plantedDir).collect()
    val comp = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component")).toMap
    // planted chain: 100=101 exact, 102~103 near — each pair must share a
    // component labeled by its min doc_id
    assert(comp.get(100L).contains(100L) && comp.get(101L).contains(100L))
    assert(comp.get(102L).contains(102L) && comp.get(103L).contains(102L))
    // labels are closed: every component label is itself a member with that label
    comp.values.toSet.foreach { c: Long => assert(comp(c) == c, s"label $c not closed") }
    // csize agrees with the actual member count
    val sizes = out.map(r => r.getAs[Long]("component") -> r.getAs[Long]("csize")).toMap
    sizes.foreach { case (c, n) =>
      assert(comp.values.count(_ == c).toLong == n, s"component $c size mismatch")
    }
  }

  test("connected components: driver union-find == distributed propagation") {
    // random graph incl. chains (transitivity across many hops) and isolates
    val r = new scala.util.Random(3)
    val chain = (0 until 30).map(i => (1000L + i, 1001L + i)) // 31-node path
    val rand = (1 to 120).map(_ => (r.nextInt(80).toLong, r.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val pairs = (chain ++ rand).toDF("ia", "ib")
    val local = DedupCluster.connectedComponents(pairs, maxDriverEdges = Long.MaxValue)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    val dist = DedupCluster.connectedComponents(pairs, maxDriverEdges = -1L)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(local == dist, "hybrid paths must label identically")
    assert(local(1030L) == 1000L, "30-hop chain must collapse to its min id")
  }

  test("sorted-neighborhood dedup surfaces the planted exact pair with jacc 1") {
    val out = Queries.queries("q_llm_dedup_sorted")(spark, plantedDir).collect()
    val pairs = out.map(r => (r.getAs[Long]("ia"), r.getAs[Long]("ib")) ->
      r.getAs[Double]("jacc")).toMap
    // identical docs have identical min-shingle sort keys and unique-id
    // tie-break -> adjacent ranks -> inside any window >= 1
    assert(pairs.get((100L, 101L)).contains(1.0), s"got $pairs")
    assert(pairs.values.forall(j => j >= 0.3 && j <= 1.0))
    // SNM candidate bound: every emitted pair sits within the rank window,
    // so pair count can never exceed n * WINDOW
    assert(out.length <= 44 * 10)
  }

  test("incremental dedup drops batch docs duplicating the corpus, keeps the rest") {
    val dir = "/tmp/graft_test_incr"
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val r = new scala.util.Random(7)
    def soup(n: Int) = Seq.fill(n)(vocab(r.nextInt(vocab.size))).mkString(" ")
    val corpus5 = soup(60)
    val corpus7toks = Seq.fill(60)(vocab(r.nextInt(vocab.size)))
    val docs = Seq(
      (0L, soup(60)), (1L, soup(60)), (2L, soup(60)),     // corpus filler
      (5L, corpus5), (7L, corpus7toks.mkString(" ")),     // corpus targets
      (18L, corpus5),                                     // batch: exact dup of 5
      (19L, soup(60)),                                    // batch: unique
      (28L, corpus7toks.updated(20, "xxx").mkString(" ")) // batch: near-dup of 7
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text").cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Queries.queries("q_llm_dedup_incremental")(spark, dir).collect()
      .map(row => row.getAs[Long]("doc_id") ->
        (Option(row.getAs[java.lang.Long]("dup_of")), row.getAs[String]("action"))).toMap
    assert(out.keySet == Set(18L, 19L, 28L), "verdicts exactly for the batch slice")
    assert(out(18L) == (Some(5L), "drop"), s"exact cross-split dup: ${out(18L)}")
    assert(out(28L)._2 == "drop" && out(28L)._1.contains(7L),
      s"near cross-split dup: ${out(28L)}")
    assert(out(19L) == (None, "keep"), s"unique batch doc: ${out(19L)}")
  }

  test("CDC chunk identities are stable under a local edit") {
    // the reason content-defined beats fixed-stride: inserting tokens
    // mid-doc must only change the chunks TOUCHING the edit — every other
    // chunk keeps its exact text (boundaries depend on local content, not
    // global offsets), which is what makes chunk-level dedup/caching
    // survive corpus revisions
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val r = new scala.util.Random(31)
    val base = Seq.fill(300)(vocab(r.nextInt(vocab.size)))
    val edited = base.take(150) ++ Seq("INS1", "INS2", "INS3") ++ base.drop(150)
    def chunksOf(toks: Seq[String], dir: String): Seq[String] = {
      Seq((0L, toks.mkString(" "))).toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length($"text").cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      Queries.queries("q_llm_chunk_cdc")(spark, dir)
        .select("chunk").as[String].collect().toSeq
    }
    val a = chunksOf(base, "/tmp/graft_test_cdc_a")
    val b = chunksOf(edited, "/tmp/graft_test_cdc_b")
    assert(a.size >= 10, s"expected many ~16-token chunks, got ${a.size}")
    // multiset symmetric difference: at most the removed pre-edit chunk
    // plus its <= 2 replacements (+1 margin for an edit landing on a cut)
    def bag(s: Seq[String]) = s.groupBy(identity).view.mapValues(_.size).toMap
    val (ba, bb) = (bag(a), bag(b))
    val diff = (ba.keySet ++ bb.keySet).toSeq
      .map(k => math.abs(ba.getOrElse(k, 0) - bb.getOrElse(k, 0))).sum
    assert(diff <= 4, s"local edit changed $diff chunk identities of ${a.size}")
  }

  test("connected components computes its input pipeline exactly once") {
    // the candidate-generation join feeding the component search is the
    // expensive part — the size probe must not re-run it.  An accumulator
    // in the input pipeline counts actual row computations.
    val acc = spark.sparkContext.longAccumulator("cc-input-rows")
    def counted = (0L until 50L).map(i => (i, i + 1)).toDF("ia", "ib")
      .as[(Long, Long)].map { p => acc.add(1); p }.toDF("ia", "ib")
    DedupCluster.connectedComponents(counted, maxDriverEdges = Long.MaxValue).collect()
    assert(acc.value == 50L, s"driver path: input ran ${acc.value} row-reads, want 50")
    acc.reset()
    DedupCluster.connectedComponents(counted, maxDriverEdges = -1L).collect()
    assert(acc.value == 50L, s"distributed path: input ran ${acc.value} row-reads, want 50")
  }

  test("df cap bounds candidate generation under a planted hot shingle") {
    // 400 docs all share one boilerplate shingle (df=400); each doc also has
    // 4 private shingles.  Uncapped, the hot key alone yields 400*399/2 =
    // 79800 candidate pairs; with any cap < 400 it must contribute none.
    val hot = 777L
    val idx = (0L until 400L).flatMap(d =>
      (hot, d) +: (1 to 4).map(j => (d * 10 + j + 10000L, d)))
      .toDF("s", "doc_id").select("doc_id", "s")
    val capped = TextOps.dfCapped(idx, cap = 100L)
    assert(capped.filter($"s" === hot).count() == 0, "hot shingle must be dropped")
    assert(capped.count() == 400L * 4, "private shingles must survive")
    val candidates = Dedup.jaccardPairs(capped)
    assert(candidates.count() == 0, "no candidates from private shingles")
    val uncapped = Dedup.jaccardPairs(idx)
    assert(uncapped.count() == 400L * 399 / 2, "uncapped index goes quadratic")
    // the planted near-dup corpus is unaffected: no shingle there is hot
    val fullIdx = TextOps.hashedShingles(spark, plantedDir)
      .select($"doc_id", $"h".as("s"))
    assert(TextOps.dfCapped(fullIdx, TextOps.DF_CAP).count() == fullIdx.count())
  }

  test("large/small-star: 10k-node chain converges in O(log n) rounds, labels == union-find") {
    val n = 10000
    val pairs = spark.range(0, n - 1)
      .selectExpr("id AS ia", "id + 1 AS ib")
    val (labels, rounds) = DedupCluster.largeSmallStar(pairs)
    val maxRounds = math.ceil(math.log(n.toDouble) / math.log(2)).toInt + 5
    assert(rounds <= maxRounds, s"$rounds rounds for a $n-chain (max $maxRounds)")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    assert(got.values.forall(_ == 0L), "one chain component labeled by its min")
  }

  test("large/small-star: forest with self-loops and duplicate edges labels like union-find") {
    // three components (one a triangle with duplicate/self edges), isolates excluded
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L), // triangle + noise
      (10L, 11L),                                        // pair
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L)     // path
    ).toDF("ia", "ib")
    val (labels, _) = DedupCluster.largeSmallStar(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L, 24L -> 20L)
    assert(got == expect)
  }

  test("large/small-star survives constraint-carrying filtered inputs (CCStress regression)") {
    // Regression for the round-10 CCStress find: a Union whose children
    // shared the checkpointed round frame's lineage crashed Spark's
    // UnionBase constraint rewriting (key-not-found on a stale exprId
    // after DeduplicateRelations) whenever the INPUT plan carried filter
    // constraints — exactly this shape: range -> filter -> union of two
    // derivations.  The star rounds are now union-free; this input must
    // converge and label exactly.
    val g = 100L
    val n = 2000L
    val ids = spark.range(n)
    val chain = ids
      .filter(pmod($"id" + 1, lit(g)) =!= 0 && $"id" + 1 < n)
      .select($"id".as("ia"), ($"id" + 1).as("ib"))
    val chords = ids
      .select($"id", explode(sequence(lit(0), lit(2))).as("j"))
      .select($"id".as("ia"),
        ($"id" - pmod($"id", lit(g)) + pmod(xxhash64($"id", $"j"), lit(g))).as("ib"))
      .filter($"ia" =!= $"ib" && $"ib" < n)
    val (labels, rounds) = DedupCluster.largeSmallStar(chain.unionByName(chords))
    val bad = labels.filter($"comp" =!= $"id" - pmod($"id", lit(g))).count()
    assert(bad == 0, "labels must equal each node's group base")
    assert(labels.count() == n)
    assert(rounds <= math.ceil(math.log(n.toDouble) / math.log(2)).toInt + 5)
  }

  test("staged cache is FIFO-bounded: rebuilt entries stay correct") {
    import graft.io.Staged
    var builds = 0
    def get(tag: String) = Staged(spark, s"cap-test|$tag") {
      builds += 1
      Seq((tag, builds)).toDF("tag", "build")
    }
    val first = get("a").collect()(0)
    // churn well past the 64-entry cap so "a" is evicted
    (1 to 70).foreach(i => get(s"churn$i"))
    val again = get("a").collect()(0)
    assert(again.getString(0) == "a", "rebuilt entry must be the right table")
    assert(again.getInt(1) > first.getInt(1), "entry was rebuilt after eviction")
  }

  test("similarity top-k: ranks are 1..5, no self-matches, sims descend") {
    val out = Queries.queries("q_llm_similarity_topk")(spark, TestSpark.sf)
      .select("qid", "nid", "rn", "sim").as[(Long, Long, Long, Double)].collect()
    assert(out.forall { case (q, n, _, _) => q != n })
    val byQ = out.groupBy(_._1)
    assert(byQ.forall(_._2.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)))
    byQ.values.foreach { rows =>
      val sims = rows.sortBy(_._3).map(_._4)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(sims.forall(s => s <= 1.0 + 1e-9 && s >= -1.0 - 1e-9))
    }
  }

  test("IVF ANN recall@5 >= 0.6 vs brute force") {
    val brute = Queries.queries("q_llm_similarity_topk")(spark, TestSpark.sf)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ivf = Queries.queries("q_llm_ann_ivf")(spark, TestSpark.sf)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("LSH ANN returns ranked neighbors with sane recall vs brute force") {
    val brute = Queries.queries("q_llm_similarity_topk")(spark, TestSpark.sf)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val lsh = Queries.queries("q_llm_ann_lsh")(spark, TestSpark.sf)
      .select("qid", "nid", "rn").as[(Long, Long, Long)].collect()
    assert(lsh.nonEmpty)
    assert(lsh.forall { case (q, n, _) => q != n })
    val recall = (brute & lsh.map(t => (t._1, t._2)).toSet).size.toDouble / brute.size
    // 16-table OR-construction + query-directed multi-probe: 0.86 measured
    // at sf0.01 (BASELINE.md sweep); 0.8 gate leaves noise margin
    assert(recall >= 0.8, s"recall=$recall")
  }

  /** Error-bound gates for the two approximate aggregates (the only judged
    * queries without a SQL oracle besides the ANN pair).  Asserted at BOTH
    * sf0.001 (smoke) and sf0.1 (the bench scale, ~600k lineitem rows /
    * ~20k distinct parts — where a sketch-accuracy regression would
    * actually show): HLL++ within 5% of exact count-distinct, and the
    * Greenwald-Khanna percentile sketch within 2% of exact interpolated
    * percentiles.  The bounds are deliberately tighter at sf0.1 than the
    * documented sketch guarantees (HLL rsd default 5%, GK accuracy
    * 1/1000) so silent parameter drift fails loudly. */
  private def approxDistinctErr(sfDir: String): Double = {
    val approx = Queries.queries("q_agg_approx_distinct")(spark, sfDir)
      .select("l_returnflag", "approx_parts").as[(String, Long)].collect().toMap
    val exact = Queries.queries("q_agg_distinct")(spark, sfDir)
      .select("l_returnflag", "n_parts").as[(String, Long)].collect().toMap
    exact.map { case (k, ex) => math.abs(approx(k) - ex).toDouble / ex }.max
  }

  private def approxPctErr(sfDir: String): Double = {
    val approx = Queries.queries("q_agg_approx_percentile")(spark, sfDir)
      .select("l_returnflag", "p50_approx", "p90_approx")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val exact = Queries.queries("q_agg_percentiles")(spark, sfDir)
      .select("l_returnflag", "p50", "p90")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    exact.flatMap { case (k, (p50, p90)) =>
      Seq(math.abs(approx(k)._1 - p50) / p50, math.abs(approx(k)._2 - p90) / p90)
    }.max
  }

  test("approx distinct within 15% of exact at sf0.001") {
    assert(approxDistinctErr(TestSpark.sf) < 0.15)
  }

  test("approx distinct within 5% of exact at sf0.1") {
    val err = approxDistinctErr(TestSpark.sf01)
    assert(err < 0.05, f"max relative error $err%.4f")
  }

  test("approx percentiles within 5% of exact at sf0.001") {
    assert(approxPctErr(TestSpark.sf) < 0.05)
  }

  test("approx percentiles within 2% of exact at sf0.1") {
    val err = approxPctErr(TestSpark.sf01)
    assert(err < 0.02, f"max relative error $err%.4f")
  }

  test("WAV round-trip: synth -> parse recovers fields; walker skips chunks; corrupt fails") {
    val w = Multimodal.wavBytes(7L, "hello world!")
    val f = Multimodal.parseWav(7L, w)
    assert(f.channels == 2 && f.sample_rate == 15000) // doc_id 7: 1+7%2, 8000+7%8*1000
    assert(f.n_bytes == 44 + 12 && f.n_samples == 6) // 12 bytes / 2 channels
    assert(f.pcm_sum == "hello world!".getBytes.map(_ & 0xff).sum)
    // generic walker: splice an unknown odd-sized chunk between fmt and data
    val junk = "LIST".getBytes ++ Array[Byte](3, 0, 0, 0) ++ Array[Byte](9, 9, 9, 0) // + pad
    val spliced = w.take(36) ++ junk ++ w.drop(36)
    val riffSize = spliced.length - 8
    spliced(4) = (riffSize & 0xff).toByte; spliced(5) = ((riffSize >> 8) & 0xff).toByte
    spliced(6) = ((riffSize >> 16) & 0xff).toByte; spliced(7) = ((riffSize >> 24) & 0xff).toByte
    val f2 = Multimodal.parseWav(7L, spliced)
    assert(f2.channels == f.channels && f2.sample_rate == f.sample_rate &&
      f2.n_samples == f.n_samples && f2.pcm_sum == f.pcm_sum)
    // corrupt magic must throw, not return garbage
    val bad = w.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.parseWav(7L, bad))
  }

  test("BMP round-trip: synth -> parse recovers fields; pad/row-order slips fail; corrupt fails") {
    val text = "0123456789abcdefghijklmnopqrstuvwxyz0123456789ABCDEF"
    val id = 7L // width 3, height 2 -> rowSize 12 (3 pad bytes per row)
    val b = Multimodal.bmpBytes(id, text)
    val f = Multimodal.parseBmp(id, b)
    assert(f.width == 3 && f.height == 2)
    assert(f.n_bytes == 54 + 12 * 2)
    val expectedWsum = (0 until 18).map(j => (j + 1).toLong * text.charAt(j).toLong).sum
    assert(f.pix_wsum == expectedWsum, "weighted checksum must reflect logical raster order")
    // flipping the two stored rows changes logical order -> checksum must change
    val flipped = b.clone()
    for (i <- 0 until 12) {
      flipped(54 + i) = b(54 + 12 + i); flipped(54 + 12 + i) = b(54 + i)
    }
    assert(Multimodal.parseBmp(id, flipped).pix_wsum != f.pix_wsum)
    // corrupt magic / size field must throw, not return garbage
    val bad = b.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.parseBmp(id, bad))
    val badSize = b.clone(); badSize(2) = (badSize(2) + 1).toByte
    intercept[IllegalArgumentException](Multimodal.parseBmp(id, badSize))
  }

  test("fingerprint is order-sensitive (rolling, not bag-of-words)") {
    val dir = "/tmp/graft_test_fp"
    Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", lit(5L))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fp = Queries.queries("q_llm_fingerprint")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(3L) && fp(1L) != fp(2L))
  }
}
