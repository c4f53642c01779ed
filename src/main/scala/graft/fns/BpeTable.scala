package graft.fns

/** Precompiled merge table for the BPE encode kernel: symbols are interned
  * to ints once at construction (driver side), and the per-row hot loop
  * never touches a String — adjacent-pair rank lookups key an
  * open-addressed long->long table with (leftId << 32 | rightId), values
  * pack (rank << 32 | mergedId).
  *
  * Symbol id space: single characters get ids from a direct char-indexed
  * array (chars never seen in any merge map to -1 and can never merge —
  * they pass through as themselves); the `</w>` terminal and every merge
  * OUTPUT get interned ids with their strings in `symStr`.  This is what
  * turns the reference HashMap<String> formulation's ~L string
  * concat+hashes per merge iteration into ~L primitive probes — measured
  * 13x encode throughput at 1 M docs (8.4 -> 109 MB/s, BASELINE.md BPE
  * row).
  */
final class BpeTable(merges: Seq[(String, String)],
    alphabet: Seq[Char] = Nil) extends Serializable {

  /** id of a single-char symbol, -1 if the char can never merge. */
  val charId: Array[Int] = Array.fill(65536)(-1)
  /** strings of interned symbols: `</w>`, the training alphabet (so every
    * char of the training corpus owns a VOCABULARY id even if no merge
    * touches it), then merge operands/outputs. */
  val symStr: Array[String] = {
    val order = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def intern(s: String): Int = order.getOrElseUpdate(s, order.size)
    intern("</w>")
    alphabet.foreach(c => intern(String.valueOf(c)))
    merges.foreach { case (l, r) => intern(l); intern(r); intern(l + r) }
    val arr = new Array[String](order.size)
    order.foreach { case (s, i) => arr(i) = s }
    arr
  }
  /** Vocabulary size in id space: interned symbols shifted by one, id 0
    * reserved for `<unk>` (a char outside the training alphabet). */
  def vocabSize: Int = symStr.length + 1
  val endId: Int = 0
  locally {
    var i = 0
    while (i < symStr.length) {
      val s = symStr(i)
      if (s.length == 1) charId(s.charAt(0)) = i
      i += 1
    }
  }
  private def idOf(s: String): Int = {
    var i = 0
    while (i < symStr.length) { if (symStr(i) == s) return i; i += 1 }
    -1
  }

  // open-addressed (leftId<<32|rightId) -> (rank<<32|mergedId); both ids
  // are >= 0 so the -1 sentinel never collides with a real key
  private val cap: Int = {
    var c = 16
    while (c < merges.size * 4) c <<= 1
    c
  }
  private val mask = cap - 1
  private val keys = Array.fill[Long](cap)(-1L)
  private val vals = new Array[Long](cap)
  locally {
    merges.zipWithIndex.foreach { case ((l, r), rank) =>
      val k = (idOf(l).toLong << 32) | (idOf(r).toLong & 0xffffffffL)
      val v = (rank.toLong << 32) | (idOf(l + r).toLong & 0xffffffffL)
      var slot = (java.lang.Long.hashCode(k * 0x9e3779b97f4a7c15L) & mask)
      // first-wins on a duplicate key: if a caller ever passes the same
      // pair twice, the earlier (lower) rank must own the key — probing
      // past an equal key would leave a dead second entry whose rank the
      // lookup loop could never reach consistently
      while (keys(slot) != -1L && keys(slot) != k) slot = (slot + 1) & mask
      if (keys(slot) == -1L) { keys(slot) = k; vals(slot) = v }
    }
  }

  /** Token strings pre-converted to UTF8String, rebuilt per JVM. */
  @transient lazy val symU8: Array[org.apache.spark.unsafe.types.UTF8String] =
    symStr.map(org.apache.spark.unsafe.types.UTF8String.fromString)

  /** (rank<<32|mergedId) of pair (a, b), or -1 if not mergeable.  Negative
    * ids (pass-through chars) never merge. */
  def lookup(a: Int, b: Int): Long = {
    if (a < 0 || b < 0) return -1L
    val k = (a.toLong << 32) | (b.toLong & 0xffffffffL)
    var slot = (java.lang.Long.hashCode(k * 0x9e3779b97f4a7c15L) & mask)
    while (true) {
      val kk = keys(slot)
      if (kk == k) return vals(slot)
      if (kk == -1L) return -1L
      slot = (slot + 1) & mask
    }
    -1L
  }
}
