package graft.fns

import graft.TestSpark
import graft.fns.Exact.md5Long
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd kernels must emit exactly the hashes of the composable
  * (interpreted) formulations they replace. */
class TextKernelsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = {
    val r = new scala.util.Random(31)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "fff", "gg", "hhh")
    (1 to 60).map { i =>
      // lengths straddle the W=16 boundary, incl. empty and repeated text
      val n = r.nextInt(40)
      (i.toLong, Seq.fill(n)(vocab(r.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("deletionVariants == composable self + per-position deletions") {
    // no empty string: the composable twin itself is wrong there
    // (sequence(1, 0) silently steps DOWN), while the kernel returns just
    // the self variant; fixture names are never empty
    val names = Seq("a", "ab", "Customer#000000042", "ααβ").toDF("s")
    val kernel = TextKernelCols.deletionVariants(spark, col("s"))
    val n = length(col("s"))
    val composable = concat(
      array(struct(lit(0).as("pos"), col("s").as("key"))),
      transform(sequence(lit(1), n), i =>
        struct(i.as("pos"),
          concat(col("s").substr(lit(1), i - 1), col("s").substr(i + 1, n)).as("key"))))
    val bad = names.select(kernel.as("k"), composable.as("c"))
      .filter(not(col("k") <=> col("c"))).count()
    assert(bad == 0)
  }

  test("shingleStats == (token count, distinct composable 3-gram shingle count)") {
    val t = filter(split(col("text"), " "), w => w =!= "")
    val sh = array_distinct(transform(sequence(lit(1), size(t) - 2), i =>
      concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))
    val got = docs
      .select(TextKernelCols.shingleStats(spark, col("text")).as("k"),
        struct(size(t).cast("long").as("n_tok"),
          when(size(t) >= 3, size(sh)).otherwise(0).cast("long").as("n_shingles")).as("c"))
      .filter(not(col("k") <=> col("c")))
      .count()
    assert(got == 0, s"$got docs disagree with the composable formulation")
  }

  test("windowHashes(16) == distinct md5 of composable 16-token windows") {
    val t = filter(split(col("text"), " "), w => w =!= "")
    val composable = array_distinct(transform(sequence(lit(1), size(t) - 15), i =>
      md5Long(concat_ws(" ", (0 until 16).map(j => element_at(t, i + lit(j))): _*))))
    val got = docs
      .select(col("doc_id"),
        TextKernelCols.windowHashes16(spark, col("text")).as("k"),
        when(size(t) >= 16, composable).otherwise(array().cast("array<bigint>")).as("c"))
      .filter(not(col("k") <=> col("c")))
      .count()
    assert(got == 0, s"$got docs disagree with the composable formulation")
  }
}
