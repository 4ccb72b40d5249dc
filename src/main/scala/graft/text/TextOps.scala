package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis and deduplication operators for LLM-scale data
  * pipelines (SURVEY §7.1 step 8): tokenization, shingling, portable
  * hashing, MinHash signatures, SimHash, fingerprinting, quality
  * scoring, language-ID.
  *
  * Everything here is Column-level (codegen'd, embarrassingly parallel —
  * no shuffle until an explicit join/groupBy), so it scales linearly
  * with the corpus: per-document signatures are computed map-side; only
  * candidate-pair generation (LSH band join / shared-shingle join)
  * shuffles, and it shuffles signatures, not documents.
  */
object TextOps {

  /** Whitespace tokenization: split on single spaces, drop empties. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Portable 60-bit hash: first 15 hex chars of md5, parsed base-16.
    * Chosen because both Spark (`conv`) and any ANSI-ish oracle engine
    * can reproduce it exactly; 60 bits keeps it positive in an int64. */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** SQL twin of [[h60]] (DuckDB syntax). */
  def h60Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  /** Word n-gram shingles (n=3): the standard near-dup unit. */
  def shingles3(toks: Column): Column =
    transform(sequence(lit(0), size(toks) - 3),
      i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))

  /** MinHash signature of k seeded hash functions over the shingle set
    * — computed per-row with higher-order functions (no shuffle, no UDF;
    * the classic explode+groupBy(min) formulation shuffles |shingles|*k
    * rows and is strictly worse). h_j(s) = h60(j || ':' || s). */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(shingles, s => h60(concat(j.cast("string"), lit(":"), s)))))

  /** LSH band key: rows-per-band consecutive signature entries joined to
    * one string; equal key in a band => candidate pair. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** SimHash-64 over the token multiset: per-bit majority vote of the
    * 60-bit token hashes, bit set iff vote > 0. Column-level relational
    * form (explodes tokens x bits) lives in the oracle; this is the
    * single-pass per-document form. */
  val simhash64: Column => Column = {
    val f = udf((toks: Seq[String]) => {
      val votes = new Array[Int](60)
      toks.foreach { t =>
        val h = hash60(t)
        var b = 0
        while (b < 60) { votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1); b += 1 }
      }
      var out = 0L
      var b = 0
      while (b < 60) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      out
    })
    (c: Column) => f(c)
  }

  /** JVM twin of [[h60]] for use inside kernels. */
  def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Position-weighted document fingerprint (rolling-hash style):
    * sum_i (h60(tok_i) & 0xFFFFFFF) * (i+1). 28-bit masked terms keep
    * the int64 sum exact for documents up to ~2^25 tokens. */
  def fingerprint(toks: Column): Column =
    aggregate(
      transform(sequence(lit(0), size(toks) - 1),
        i => h60(element_at(toks, i + 1)).bitwiseAND(lit(0xFFFFFFFL)) * (i + lit(1)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Marker-word profiles for the language-ID heuristic. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "que", "los", "una"),
    "fr" -> Seq("le", "les", "et", "des", "une"),
    "zh" -> Seq("de", "shi", "bu", "wo", "le"))

  /** Language-ID: score = marker-word occurrences per language; predict
    * the argmax, ties broken by language code order, 'und' if no marker
    * seen. Deterministic n-gram-free heuristic (real corpora would use
    * char n-gram profiles; same shape). */
  def langScores(toks: Column): Seq[(String, Column)] =
    langProfiles.map { case (lang, words) =>
      lang -> size(filter(toks, t => words.map(w => t === w).reduce(_ || _)))
    }

  def langId(toks: Column): Column = {
    val scores = langScores(toks)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, lit("und"))) { case (acc, (lang, sc)) =>
      acc.when(sc === best, lit(lang))
    }
  }
}
