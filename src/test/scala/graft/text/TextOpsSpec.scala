package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase.spark

class TextOpsSpec extends AnyFunSuite {
  import spark.implicits._

  test("JVM hash60 equals the h60 Column (portability invariant)") {
    val words = Seq("abc", "hash join", "0:the quick fox", "ümlaut")
    val fromCol = words.toDF("w").select(TextOps.h60($"w")).as[Long].collect().toSeq
    assert(fromCol == words.map(TextOps.hash60))
  }

  test("shingles3 produces overlapping word trigrams") {
    val sh = Seq("a b c d e").toDF("t")
      .select(TextOps.shingles3(TextOps.tokens($"t")))
      .as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d", "c d e"))
  }

  test("minhash signature: equal sets => equal signatures; disjoint differ") {
    val df = Seq("x y z w q r s t", "x y z w q r s t", "aa bb cc dd ee ff gg hh")
      .toDF("t")
      .select(TextOps.minhashSignature(TextOps.shingles3(TextOps.tokens($"t")), 8).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    assert(sigs(0).length == 8)
  }

  test("simhash: near-identical docs have close hamming distance") {
    val d1 = ("the quick brown fox jumps over the lazy dog " * 5).trim
    val d2 = d1.replace("lazy", "sleepy")
    val d3 = "completely different words entirely unrelated content here now"
    val hs = Seq(d1, d2, d3).toDF("t")
      .select(TextOps.simhash64(TextOps.tokens($"t"))).as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0), hs(1)) < ham(hs(0), hs(2)))
  }

  test("langId picks marker-word argmax with deterministic fallback") {
    val preds = Seq("the cat and the dog", "der hund ist und das", "xyzzy qwerty")
      .toDF("t").select(TextOps.langId(TextOps.tokens($"t"))).as[String].collect()
    assert(preds.toSeq == Seq("en", "de", "und"))
  }

  test("fingerprint is position-sensitive") {
    val fps = Seq("a b", "b a").toDF("t")
      .select(TextOps.fingerprint(TextOps.tokens($"t"))).as[Long].collect()
    assert(fps(0) != fps(1))
  }
}

/** Prefix-filter correctness: the t_prefix_join candidate rule must
  * lose NO pair at the threshold (the guarantee the df-cap heuristic
  * trades away). Brute-force all-pairs Jaccard over sf0.001 documents
  * is the ground truth. */
class PrefixJoinSpec extends AnyFunSuite {
  import spark.implicits._

  test("prefix-filtered join finds exactly the brute-force shingle-Jaccard >= 0.5 pairs") {
    val sf = "/root/testdata/sf0.001"
    val gate = graft.queries.TextQueries.prefixJoin(spark, sf)
      .select($"a", $"b", $"jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    // brute force: every doc pair, exact distinct-3-shingle Jaccard
    val sets = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        val w = t.split(" ").filter(_.nonEmpty)
        id -> (if (w.length < 3) Set.empty[String]
               else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet)
      }
      .sortBy(_._1)
    val brute = (for {
      i <- sets.indices; j <- i + 1 until sets.length
      (a, sa) = sets(i); (b, sb) = sets(j)
      if sa.nonEmpty && sb.nonEmpty
      inter = (sa intersect sb).size
      jac = inter.toDouble / (sa.size + sb.size - inter)
      if jac >= 0.5
    } yield (a, b) -> jac).toMap
    assert(gate.keySet == brute.keySet,
      s"missing=${(brute.keySet -- gate.keySet).take(5)} extra=${(gate.keySet -- brute.keySet).take(5)}")
    assert(brute.nonEmpty, "fixture must contain at least one near-dup pair at 0.5")
    gate.foreach { case (k, j) => assert(math.abs(j - brute(k)) < 1e-12) }
  }
  test("line dedup keeps each repeated chunk exactly once, at its first occurrence") {
    // 3 docs sharing one 16-token boilerplate chunk; doc 0 also
    // repeats it internally. Global line dedup must keep the chunk
    // ONLY at (doc 0, idx 0) and count per-doc survivors correctly.
    val boiler = (1 to 16).map(i => s"b$i").mkString(" ")
    val uniq = (d: Int) => (1 to 16).map(i => s"u${d}_$i").mkString(" ")
    val df = Seq(
      (0L, s"$boiler $boiler ${uniq(0)}"),   // boiler at idx 0 AND 1
      (1L, s"${uniq(1)} $boiler"),           // later doc: repeat dropped
      (2L, s"$boiler ${uniq(2)}"))           // later doc: repeat dropped
      .toDF("doc_id", "text")
      .withColumn("toks", split(col("text"), " "))
    // drive the gate query through a temp dir shim: reuse the internal
    // chunking directly for a pure-semantics check
    val chunks = df.select(col("doc_id"),
      posexplode(TextOps.chunkTexts(col("toks"), 16)).as(Seq("idx", "chunk")))
      .select(col("doc_id"), col("idx"), TextOps.h60(col("chunk")).as("h"))
    val firstDoc = chunks.groupBy(col("h")).agg(min(col("doc_id")).as("kd"))
    val keeper = chunks.select(col("h").as("fh"), col("doc_id"), col("idx"))
      .join(firstDoc, col("fh") === firstDoc("h") && col("doc_id") === firstDoc("kd"))
      .groupBy(col("fh")).agg(min(col("idx")).as("ki"), min(col("kd")).as("kd"))
      .select(col("fh").as("h"), col("ki"), col("kd"))
    val kept = chunks.join(keeper, Seq("h"))
      .where(col("doc_id") === col("kd") && col("idx") === col("ki"))
      .select(col("doc_id"), col("idx")).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // every distinct chunk survives exactly once; boiler only at (0,0)
    assert(kept == Set((0L, 0), (0L, 2), (1L, 0), (2L, 1)),
      s"kept=$kept")
  }

}
