package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q58 shard-parallel sequence packing: the (lang, shard) window must
  * place every token of every document exactly once per shard — the
  * invariant that lets a trainer stream packs per (lang, shard, pack_id)
  * with no token lost or double-packed.
  */
class PackShardedSpec extends SparkSpec {

  test("sharded packing conserves tokens within every (lang, shard)") {
    val out = TextQueries.q58PackSharded(spark, sf0001).cache()
    val docs = graft.Tables.documents(spark, sf0001)
    assert(out.count() === docs.count(), "every doc packed exactly once")
    // start = pack_id*2048 + pack_offset and packing is contiguous, so
    // the max end position in a shard must equal the shard's token sum
    val bad = out.groupBy("lang", "shard")
      .agg(
        max(col("pack_id") * 2048 + col("pack_offset") + col("n_tokens"))
          .as("max_end"),
        sum("n_tokens").as("total"))
      .filter(col("max_end") =!= col("total"))
      .count()
    assert(bad === 0, "token conservation violated in some (lang, shard)")
    out.unpersist()
  }

  test("window partition cardinality scales with the shard count") {
    val out = TextQueries.q58PackSharded(spark, sf0001)
    val nLang = out.select("lang").distinct().count()
    val nPart = out.select("lang", "shard").distinct().count()
    // q56's per-lang window has exactly nLang sort partitions; the
    // sharded form must fan that out (8 shards per lang on this corpus)
    assert(nPart >= nLang * 4,
      s"expected ≥ ${nLang * 4} (lang, shard) partitions, got $nPart")
  }
}
