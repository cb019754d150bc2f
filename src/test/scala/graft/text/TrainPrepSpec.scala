package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  test("shuffle-shard: layout-independent, positions are a per-shard permutation") {
    val docs = graft.Tables.documents(spark, sf0001)
    val out = TrainPrep.shuffleShard(docs, "doc_id", nShards = 8).cache()
    assert(out.count() === docs.count()) // every row dealt exactly once

    // positions within each shard are exactly 1..count (a permutation —
    // the property a trainer's sequential shard reader depends on)
    val badPos = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("nd"))
      .filter($"mx" =!= $"n" || $"mn" =!= 1 || $"nd" =!= $"n")
    assert(badPos.isEmpty, "pos must be a 1..n permutation per shard")

    // all shards populated, none pathologically hot: a seeded hash deal
    // over 500 ids should stay within a loose 3x band of uniform
    val sizes = out.groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(sizes.keySet === (0L until 8L).toSet)
    val uniform = docs.count().toDouble / 8
    sizes.values.foreach(n =>
      assert(n > uniform / 3 && n < uniform * 3, s"shard size $n vs $uniform"))

    // the deal is a pure function of (id, seed): physical layout must not
    // change a single assignment...
    val repart = TrainPrep.shuffleShard(docs.repartition(13), "doc_id", 8)
    assert(repart.exceptAll(out).isEmpty && out.exceptAll(repart).isEmpty,
      "repartitioned input must produce the identical deal")

    // ...and a different seed must re-deal (the point of seeding): some
    // doc lands in a different shard
    val reseeded = TrainPrep.shuffleShard(docs, "doc_id", 8, seed = 43L)
    assert(reseeded.exceptAll(out).count() > 0, "new seed must reshuffle")
    out.unpersist()
  }

  test("bigram LM: counts and conditionals match a hand-checked fixture") {
    val docs = Seq(
      (1L, "a b a b c"), // bigrams: (a,b) (b,a) (a,b) (b,c)
      (2L, "a b"),       // (a,b)
      (3L, "c"),         // too short: no bigram
      (4L, "  a   c "),  // padded whitespace: tokenizer must see (a,c)
      (5L, "")           // 0 tokens: slice length clamps to 0, no crash
    ).toDF("doc_id", "text")
    val lm = bigramsOf(docs)
    assert(lm === Map(
      ("a", "b") -> (3L, 0.75), ("a", "c") -> (1L, 0.25),
      ("b", "a") -> (1L, 0.5), ("b", "c") -> (1L, 0.5)))
  }

  test("bigram LM: conditionals sum to 1 per context on the corpus") {
    val lm = TrainPrep.q66BigramLm(spark, sf0001).cache()
    // raw (unrounded-sum) check: per w1 the probabilities must total ~1
    // (rounding each term to 4 decimals bounds the drift by 5e-5 * fanout)
    val offenders = lm.groupBy("w1")
      .agg(sum("p").as("tot"), count(lit(1)).as("k"))
      .filter(abs($"tot" - 1.0) > $"k" * 5e-5)
    assert(offenders.isEmpty, "P(.|w1) must sum to 1")
    // counts conserve the corpus: sum of bigram counts = sum of (len-1)
    val toks = filter(split(col("text"), "\\s+"), t => t =!= "")
    val expected = graft.Tables.documents(spark, sf0001)
      .select((size(toks) - 1).cast("long").as("nb"))
      .filter($"nb" > 0).agg(sum("nb")).as[Long].head()
    assert(lm.agg(sum("n")).as[Long].head() === expected)
    lm.unpersist()
  }

  test("bigram LM merge: shard counts re-aggregate to exactly the whole-corpus table") {
    val docs = graft.Tables.documents(spark, sf0001)
    val whole = TrainPrep.bigramLm(docs)
      .as[(String, String, Long, Double)].collect().toSet
    val merged = TrainPrep.q72BigramLmMerge(spark, sf0001)
      .as[(String, String, Long, Double)].collect().toSet
    assert(merged === whole, "merge of disjoint shards must be exact")
    // three-way split exercises the reduce over more than two tables
    val three = TrainPrep.bigramLmMerge((0 until 3).map(r =>
      TrainPrep.bigramLm(docs.filter($"doc_id" % 3 === r))))
      .as[(String, String, Long, Double)].collect().toSet
    assert(three === whole)
  }

  test("LM score: hand fixture — seen bigrams use LM probs, unseen hit the floor, short docs are null") {
    val ref = Seq((1L, "a b a c")) // p(b|a)=0.5 p(c|a)=0.5 p(a|b)=1.0
      .toDF("doc_id", "text")
    val target = Seq(
      (10L, "a b"),   // -ln(0.5)                     = 0.6931
      (11L, "a z"),   // unseen → -ln(1e-4)           = 9.2103
      (12L, "b a c"), // (-ln(1.0) + -ln(0.5)) / 2    = 0.3466
      (13L, "x"),     // too short: null verdict, row kept
      (14L, ""),      // 0 tokens: slice length must clamp to 0, not -1
      (15L, "   ")    // whitespace-only: same 0-token edge
    ).toDF("doc_id", "text")
    val out = TrainPrep.lmScore(target, TrainPrep.bigramLm(ref))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (id, n, s) => id -> ((n, s)) }.toMap
    assert(out(10L) === ((Some(1L), Some(0.6931))))
    assert(out(11L) === ((Some(1L), Some(9.2103))))
    assert(out(12L) === ((Some(2L), Some(0.3466))))
    assert(out(13L) === ((None, None)))
    assert(out(14L) === ((None, None)))
    assert(out(15L) === ((None, None)))
    assert(out.size === 6)
  }

  test("LM score: contract entry scores every doc finitely, held-out split exercised") {
    val docs = graft.Tables.documents(spark, sf0001)
    val out = TrainPrep.q71LmScore(spark, sf0001).cache()
    assert(out.count() === docs.count())
    // the corpus has no sub-2-token docs, so every verdict is a finite
    // positive nll (the floor clamp forbids ln(0) → infinity)
    assert(out.filter($"avg_nll".isNull || isnan($"avg_nll") ||
      $"avg_nll" <= 0.0 || $"avg_nll" > -math.log(1e-4) + 1e-9).count() === 0)
    // held-out fifth really present on both sides of the split
    assert(out.filter($"doc_id" % 5 === 0).count() > 0)
    assert(out.filter($"doc_id" % 5 =!= 0).count() > 0)
    out.unpersist()
  }

  test("ccnet buckets: exact terciles with remainder to head, nulls unbucketed") {
    // one language, scores 1..9 in shuffled doc order → head {1,2,3},
    // middle {4,5,6}, tail {7,8,9} regardless of layout; doc 99 unscored
    val scored = Seq(
      (5L, "en", Some(5.0)), (1L, "en", Some(1.0)), (9L, "en", Some(9.0)),
      (3L, "en", Some(3.0)), (7L, "en", Some(7.0)), (2L, "en", Some(2.0)),
      (8L, "en", Some(8.0)), (4L, "en", Some(4.0)), (6L, "en", Some(6.0)),
      (99L, "en", None)
    ).toDF("doc_id", "lang", "avg_nll")
    val out = TrainPrep.ccnetBuckets(scored.repartition(7))
      .as[(Long, String, Option[Double], Option[String])]
      .collect().map(r => r._1 -> r._4).toMap
    for (id <- 1L to 3L) assert(out(id) === Some("head"), s"doc $id")
    for (id <- 4L to 6L) assert(out(id) === Some("middle"), s"doc $id")
    for (id <- 7L to 9L) assert(out(id) === Some("tail"), s"doc $id")
    assert(out(99L) === None, "unscored doc keeps a null bucket")
    // n=4 remainder: (3·(r−1)) div 4 → head,head,middle,tail
    val four = TrainPrep.ccnetBuckets(Seq(
      (1L, "de", Some(1.0)), (2L, "de", Some(2.0)),
      (3L, "de", Some(3.0)), (4L, "de", Some(4.0))
    ).toDF("doc_id", "lang", "avg_nll"))
      .as[(Long, String, Option[Double], Option[String])]
      .collect().map(r => r._1 -> r._4.get).toMap
    assert(four === Map(1L -> "head", 2L -> "head",
      3L -> "middle", 4L -> "tail"))
  }

  test("ccnet buckets: approx scale path agrees >=90% with the exact form") {
    val docs = graft.Tables.documents(spark, sf0001)
    val scored = docs.select($"doc_id", $"lang")
      .join(TrainPrep.q71LmScore(spark, sf0001).select("doc_id", "avg_nll"),
        Seq("doc_id"))
    val exact = TrainPrep.ccnetBuckets(scored)
      .select($"doc_id", $"bucket".as("b_exact"))
    val approx = TrainPrep.ccnetBucketsApprox(scored)
      .select($"doc_id", $"bucket".as("b_approx"))
    val joined = exact.join(approx, "doc_id").cache()
    val n = joined.count()
    assert(n === docs.count())
    val agree = joined.filter($"b_exact" <=> $"b_approx").count()
    assert(agree.toDouble / n >= 0.9,
      s"approx/exact bucket agreement ${agree.toDouble / n} below 0.9")
    // per-language bucket sizes from the approx path stay near n/3
    val docsPerLang = scored.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val sizes = TrainPrep.ccnetBucketsApprox(scored)
      .filter($"bucket".isNotNull)
      .groupBy("lang", "bucket").count()
      .as[(String, String, Long)].collect()
    sizes.foreach { case (l, b, c) =>
      val third = docsPerLang(l) / 3.0
      assert(c >= third * 0.5 && c <= third * 1.5,
        s"$l/$b size $c far from even third $third")
    }
    joined.unpersist()
  }

  test("exportShards: one pos-ordered run per shard dir, lossless, re-dealable") {
    val dir = java.nio.file.Files.createTempDirectory("shards")
    try {
      val docs = graft.Tables.documents(spark, sf0001)
      val n = docs.count()
      TrainPrep.exportShards(docs, "doc_id", dir.toString, nShards = 7)
      val back = spark.read.parquet(dir.toString)
      assert(back.count() === n, "export must be lossless")
      assert(back.select("doc_id").distinct().count() === n)
      // shard dirs present and rows inside each file run in pos order
      val shardDirs = new java.io.File(dir.toString).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      assert(shardDirs.length === 7)
      shardDirs.foreach { sd =>
        val rows = spark.read.parquet(sd.toString)
          .select("pos").collect().map(_.getLong(0))
        // ONE file per shard (no maxRecordsPerFile): parquet preserves
        // the written row order, which must be the contiguous 1..k run
        assert(rows.toSeq === (1L to rows.length).toSeq,
          s"${sd.getName}: pos not a contiguous ordered run")
      }
      // re-dealing with another seed moves documents between shards
      TrainPrep.exportShards(docs, "doc_id", dir.toString, nShards = 7,
        seed = 43L)
      val deal42 = TrainPrep.shuffleShard(docs, "doc_id", 7)
        .select("doc_id", "shard").as[(Long, Long)].collect().toMap
      val deal43 = TrainPrep.shuffleShard(docs, "doc_id", 7, seed = 43L)
        .select("doc_id", "shard").as[(Long, Long)].collect().toMap
      assert(deal42.count { case (id, s43) => deal43(id) != s43 } > n / 4,
        "a new seed must re-deal a substantial fraction of rows")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  private def bigramsOf(docs: org.apache.spark.sql.DataFrame) =
    TrainPrep.bigramLm(docs)
      .as[(String, String, Long, Double)].collect()
      .map { case (w1, w2, n, p) => (w1, w2) -> (n, p) }.toMap
}
