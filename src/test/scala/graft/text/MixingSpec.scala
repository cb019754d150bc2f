package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {
  import spark.implicits._

  test("domain mix: hash-threshold sampling hits target fractions, layout-independent") {
    val docs = graft.Tables.documents(spark, sf0001)
    val mixed = Mixing.domainMix(docs, "lang",
      Map("en" -> 1.0, "de" -> 0.5)).cache()
    // en kept fully, de halved (tolerance for small per-lang counts),
    // every other lang dropped (fraction 0)
    val before = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val after = mixed.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(after("en") === before("en"))
    assert(after.keySet === Set("en", "de"))
    val deRatio = after("de").toDouble / before("de")
    assert(deRatio > 0.25 && deRatio < 0.75, s"de ratio $deRatio")
    // determinism is structural (pure function of doc_id + seed): a
    // repartitioned input must select the IDENTICAL doc set
    val repart = Mixing.domainMix(docs.repartition(13), "lang",
      Map("en" -> 1.0, "de" -> 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(repart === mixed.select("doc_id").as[Long].collect().toSet)
    mixed.unpersist()
  }

  test("group sample: exactly min(n, group size) per group, layout-independent") {
    val docs = graft.Tables.documents(spark, sf0001)
    val out = Mixing.groupSample(docs, "lang", "doc_id", 20).cache()
    val sizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val taken = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(taken.keySet === sizes.keySet)
    taken.foreach { case (l, c) => assert(c === math.min(20L, sizes(l))) }
    // pure function of (doc_id, seed): repartitioned input selects the
    // identical rows with the identical ranks
    val repart = Mixing.groupSample(docs.repartition(13), "lang", "doc_id", 20)
      .as[(Long, String, Long)].collect().toSet
    assert(repart === out.as[(Long, String, Long)].collect().toSet)
    // a different seed re-deals the sample (overwhelmingly likely to
    // differ somewhere on 500 docs)
    val reseed = Mixing.groupSample(docs, "lang", "doc_id", 20, seed = 7L)
      .as[(Long, String, Long)].collect().toSet
    assert(reseed !== out.as[(Long, String, Long)].collect().toSet)
    out.unpersist()
  }

  test("group sample topk twin: row-identical to the window form; " +
      "plan has no window and no full sort") {
    val docs = graft.Tables.documents(spark, sf0001)
    val win = Mixing.groupSample(docs, "lang", "doc_id", 20)
      .as[(Long, String, Long)].collect().toSet
    val heap = Mixing.groupSampleTopK(docs, "lang", "doc_id", 20)
    assert(heap.as[(Long, String, Long)].collect().toSet === win,
      "heap twin selects the identical (doc, rank) set")
    // the twin's point: no WindowExec, no per-group sort — selection
    // runs inside the k-bounded aggregate
    val plan = heap.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the top_k heap aggregate in:\n$plan")
    // layout independence rides the same purity argument as the
    // window form — verified directly
    val repart = Mixing.groupSampleTopK(docs.repartition(13), "lang",
      "doc_id", 20).as[(Long, String, Long)].collect().toSet
    assert(repart === win)
  }

  test("temperature mix: exact thresholds, flattening, layout independence") {
    // power-of-two domain ratios so α=0.5 rates are IEEE-exact:
    // fr is rarest (kept whole); de = sqrt(25/100) = 0.5; en =
    // sqrt(25/400) = 0.25 — thresholds must come out exactly
    val rows = (1 to 400).map(i => (i.toLong, "en")) ++
      (401 to 500).map(i => (i.toLong, "de")) ++
      (501 to 525).map(i => (i.toLong, "fr"))
    val docs = rows.toDF("doc_id", "lang")
    val out = Mixing.temperatureMix(docs, "lang", "doc_id", alpha = 0.5).cache()
    val thr = out.select("lang", "keep_thr").distinct()
      .as[(String, Long)].collect().toMap
    assert(thr === Map("fr" -> 1000000L, "de" -> 500000L, "en" -> 250000L))
    val kept = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("fr") === 25L, "rarest domain is kept whole")
    // binomial(400, .25) and binomial(100, .5): ±4.5σ windows
    assert(kept("en") >= 60 && kept("en") <= 140, s"en kept ${kept("en")}")
    assert(kept("de") >= 28 && kept("de") <= 72, s"de kept ${kept("de")}")
    // flattening: the mix is strictly more balanced than the corpus
    assert(kept("en").toDouble / kept("fr") < 400.0 / 25.0)
    // pure function of (doc_id): repartitioned input keeps the same set
    val repart = Mixing.temperatureMix(docs.repartition(13), "lang",
      "doc_id", alpha = 0.5).select("doc_id").as[Long].collect().toSet
    assert(repart === out.select("doc_id").as[Long].collect().toSet)
    out.unpersist()
  }

  test("temperature mix: alpha=1 is the identity; samples nest as alpha rises") {
    val docs = graft.Tables.documents(spark, sf0001)
    val all = Mixing.temperatureMix(docs, "lang", "doc_id", alpha = 1.0).cache()
    assert(all.count() === docs.count(), "alpha=1 reproduces the corpus")
    assert(all.select("keep_thr").distinct().as[Long].collect().toSeq ===
      Seq(1000000L))
    all.unpersist()
    // one hash draw per doc serves every temperature → the hotter
    // (smaller-α, flatter) sample is a subset of the cooler one
    val cold = Mixing.temperatureMix(docs, "lang", "doc_id", alpha = 0.3)
      .select("doc_id").as[Long].collect().toSet
    val warm = Mixing.temperatureMix(docs, "lang", "doc_id", alpha = 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(cold.subsetOf(warm), "α=0.3 sample must nest inside α=0.7")
    assert(cold.size < warm.size, "flattening must actually drop rows")
  }

  test("bloom-prefiltered contamination is row-identical to the exact form") {
    // no false negatives (Bloom) + exact downstream join (kills false
    // positives) => identical verdicts; this is the claim that lets the
    // bloom variant share the exact form's oracle SQL
    val exact = Mixing.contaminationQuery(spark, sf0001)
      .collect().map(_.toSeq).toSet
    val bloom = Mixing.contaminationBloomQuery(spark, sf0001)
      .collect().map(_.toSeq).toSet
    assert(bloom === exact)
    // and at a deliberately awful fpp the exact join still saves it
    val docs = graft.Tables.documents(spark, sf0001)
    val loose = Mixing.contaminationBloom(
      docs.filter($"doc_id" % 10 =!= 0), docs.filter($"doc_id" % 10 === 0),
      fpp = 0.5).collect().map(_.toSeq).toSet
    assert(loose === exact)
  }

  test("contamination: planted cross-split near-dups are flagged, clean docs are not") {
    // benchmark = doc_id % 10 == 0; the corpus contains mutated
    // near-dup copies of some benchmark docs (planted by the driver
    // data), which share most shingles -> high overlap for those docs
    val out = Mixing.contaminationQuery(spark, sf0001).cache()
    val nBench = graft.Tables.documents(spark, sf0001)
      .filter($"doc_id" % 10 === 0).count()
    assert(out.count() === nBench) // every bench doc gets a verdict row
    // shingle-less docs (< 3 tokens) must report null ("unknown"), never
    // a false "clean"
    val shortDocs = out.filter($"n_shingles" === 0)
    assert(shortDocs.filter($"contaminated".isNotNull).count() === 0)
    assert(out.filter($"contaminated").count() > 0,
      "planted cross-split dups should contaminate")
    assert(out.filter(!$"contaminated").count() > 0,
      "not every bench doc is a dup")
    // contaminated docs really do share a near-dup pair across the split
    val pairs = NearDup.minhashNeardupFast(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect()
    val crossSplit = pairs.collect {
      case (a, b) if a % 10 == 0 && b % 10 != 0 => a
      case (a, b) if b % 10 == 0 && a % 10 != 0 => b
    }.toSet
    val flagged = out.filter($"contaminated")
      .select("doc_id").as[Long].collect().toSet
    assert(crossSplit.subsetOf(flagged),
      s"near-dup bench docs missing from contamination: ${crossSplit -- flagged}")
    out.unpersist()
  }
}
