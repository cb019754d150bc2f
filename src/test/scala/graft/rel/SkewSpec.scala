package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // skewed fixture: one hot key with 10k rows, 100 cold keys
  private lazy val skewed = (
    (1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k$i", i.toDouble))
    ).toDF("key", "v").cache()

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy("key")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n_rows"))
      .orderBy("key").collect()
    val salted = Skew.saltedSumCount(skewed, Seq("key"), "v")
      .withColumnRenamed("sum_v", "sum_v")
      .orderBy("key").collect()
    assert(plain.length == salted.length)
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getString(0) == s.getString(0))
      assert(math.abs(p.getDouble(1) - s.getDouble(1)) < 1e-6)
      assert(p.getLong(2) == s.getLong(2))
    }
  }

  test("salted join equals plain join") {
    val dim = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .map(k => (k, s"dim_$k")).toDF("key", "attr")
    val plain = skewed.join(dim, "key").groupBy("key", "attr")
      .agg(count(lit(1)).as("n")).orderBy("key").collect()
    val salted = Skew.saltedJoin(skewed, dim, "key").groupBy("key", "attr")
      .agg(count(lit(1)).as("n")).orderBy("key").collect()
    assert(plain.sameElements(salted))
  }
}
