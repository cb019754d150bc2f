package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  test("q67: planted PII is counted and fully scrubbed") {
    val out = Scrub.q67PiiRedact(spark, sf0001).cache()
    val n = graft.Tables.documents(spark, sf0001).count()
    assert(out.count() === n)
    // every doc plants exactly one of each category (the corpus itself
    // carries none), and the scrub must leave no live pattern behind
    assert(out.filter($"n_email" =!= 1 || $"n_phone" =!= 1 || $"n_ip" =!= 1)
      .count() === 0)
    val leftovers = out.filter(
      $"clean".rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") ||
      $"clean".rlike("\\+1-\\d{3}-555-\\d{4}") ||
      $"clean".rlike("\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"))
    assert(leftovers.count() === 0, "live PII pattern survived redaction")
    // placeholders present exactly once each
    assert(out.filter(!$"clean".contains("<EMAIL>") ||
      !$"clean".contains("<PHONE>") || !$"clean".contains("<IP>"))
      .count() === 0)
    out.unpersist()
  }

  test("q67: IPv4 redaction respects digit boundaries and octet ranges") {
    // version strings, >3-digit runs, and out-of-range octets must all
    // survive; a genuine dotted-quad must not. The planted trailer adds
    // one real IP (10.0.0.1 for doc 0), so n_ip counts 2.
    val docs = Seq((0L,
      "release v1.2.3.4 build 9999.1.2.3 bad 256.1.2.3 real 8.8.8.8 end",
      "en", "src", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("scrub-ip").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = Scrub.q67PiiRedact(spark, dir).head()
    assert(row.getAs[Long]("n_ip") === 2L,
      s"exactly 8.8.8.8 + the planted 10.0.0.1 are IPs: $row")
    val clean = row.getAs[String]("clean")
    assert(clean.contains("v1.2.3.4"), "version string must survive redaction")
    assert(clean.contains("9999.1.2.3"), "digit runs must not partially match")
    assert(clean.contains("256.1.2.3"), "out-of-range octets are not IPs")
    assert(!clean.contains("8.8.8.8"), "a genuine IP must be redacted")
  }

  test("q68: repeated chunks keep only their first occurrence, docs reassemble in order") {
    // 16-token chunks A, B, C; doc 0 = A B, doc 1 = B C (B repeats),
    // doc 2 = A (repeat), doc 3 = unique D + trailing partial chunk
    def chunk(word: String): String = Seq.fill(16)(word).mkString(" ")
    val a = chunk("alpha"); val b = chunk("bravo")
    val c = chunk("charlie"); val dd = chunk("delta")
    val docs = Seq(
      (0L, s"$a $b", "en", "src", 1L),
      (1L, s"$b $c", "en", "src", 1L),
      (2L, a, "en", "src", 1L),
      (3L, s"$dd tail words", "en", "src", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("scrub").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Scrub.q68ChunkDedup(spark, dir)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // doc 0 keeps both chunks (first occurrences of A and B)
    assert(out(0) === ((0L, 2L, 2L, s"$a $b")))
    // doc 1 loses B (doc 0 owns it), keeps C
    assert(out(1) === ((1L, 2L, 1L, c)))
    // doc 2 is entirely duplicate -> zero kept, null text
    assert(out(2)._2 === 1L && out(2)._3 === 0L && out(2)._4 == null)
    // doc 3 keeps its full chunk AND the trailing partial chunk
    assert(out(3) === ((3L, 2L, 2L, s"$dd tail words")))
    // corpus-level conservation: every distinct chunk is kept exactly once
    val full = Scrub.q68ChunkDedup(spark, sf0001).cache()
    val keptTotal = full.agg(sum("n_kept")).as[Long].head()
    val distinctChunks = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        filter(split(col("text"), "\\s+"), t => length(t) > 0).as("t"))
      .filter(size(col("t")) > 0)
      .select(posexplode(expr("sequence(1, size(t), 16)")).as(Seq("i", "s")),
        col("t"))
      .select(array_join(expr("slice(t, s, 16)"), " ").as("ch"))
      .distinct().count()
    assert(keptTotal === distinctChunks)
    full.unpersist()
  }
}
