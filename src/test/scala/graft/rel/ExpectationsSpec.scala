package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Planted-violation exactness and the one-scan fusion contract. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  private lazy val users = Seq(
    (Some(1L), Some("a@x.com"), 25.0, "US"),
    (Some(2L), None, 40.0, "DE"),       // null email
    (Some(2L), Some("c@x.com"), -3.0, "FR"), // dup id, age out of range
    (None, Some("d@x.com"), 99.0, "XX")      // null id, country not in set
  ).toDF("id", "email", "age", "country")

  private lazy val countries = Seq("US", "DE", "FR").toDF("code")

  test("every check type counts its planted violations exactly") {
    val out = validate(
      Map("users" -> users, "countries" -> countries),
      Seq(
        Complete("users", "email"),
        Complete("users", "id"),
        Unique("users", "id"),
        InRange("users", "age", 0.0, 90.0),
        Matches("users", "email", "^[a-z]@x\\.com$"),
        SubsetOf("users", "country", "countries", "code")))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out("complete(users.email)") == ((0.75, 1L, false)))
    assert(out("complete(users.id)") == ((0.75, 1L, false)))
    // 3 distinct non-null ids... count(distinct id) = 2 over {1,2,2}:
    // 4 rows, compliant = 2 → metric 0.5, violations 2
    assert(out("unique(users.id)") == ((0.5, 2L, false)))
    // -3 and 99 both out of [0, 90]: 2 compliant of 4
    assert(out("in_range(users.age,0.0,90.0)") == ((0.5, 2L, false)))
    // null email is a violation of matches too
    assert(out("matches(users.email)") == ((0.75, 1L, false)))
    // 'XX' not in ref → 1 violation (nulls would be exempt)
    assert(out("subset_of(users.country,countries.code)") ==
      ((0.75, 1L, false)))
  }

  test("a clean table passes the whole suite") {
    val clean = Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("id", "name", "v")
    val out = validate(Map("t" -> clean), Seq(
      Complete("t", "id"), Unique("t", "id"),
      InRange("t", "v", 0.0, 100.0))).collect()
    assert(out.forall(_.getBoolean(4)))
    assert(out.forall(_.getDouble(2) == 1.0))
    assert(out.forall(_.getLong(3) == 0L))
  }

  test("null foreign keys are exempt from subset_of (SQL FK semantics)") {
    val fk = Seq(Some("US"), None, None).toDF("country")
    val out = validate(
      Map("t" -> fk, "ref" -> countries),
      Seq(SubsetOf("t", "country", "ref", "code"))).collect().head
    assert(out.getLong(3) == 0L && out.getBoolean(4))
  }

  test("fused single-table checks cost ONE scan of the table " +
      "(the Deequ contract)") {
    val df = validate(Map("users" -> users), Seq(
      Complete("users", "email"),
      InRange("users", "age", 0.0, 90.0),
      Matches("users", "email", "^[a-z]@x\\.com$")))
    // no Unique (count-distinct expands) and no SubsetOf here: the
    // three checks must compile into one Aggregate over one relation
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate => a
    }
    assert(aggs.size == 1, s"expected 1 fused aggregate, got ${aggs.size}")
    val scans = df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r
      case l: LogicalPlan if l.children.isEmpty &&
          l.getClass.getSimpleName.contains("Relation") => l
    }
    assert(scans.size <= 1, s"expected ≤1 scan, got ${scans.size}")
  }

  test("an EMPTY table reports null metric / zero violations / passed " +
      "for every check type instead of tripping ANSI division-by-zero") {
    val empty = Seq.empty[(Long, String, Double)].toDF("id", "name", "v")
    val ref = Seq(1L).toDF("id")
    val out = validate(Map("t" -> empty, "ref" -> ref), Seq(
      Complete("t", "name"), Unique("t", "id"),
      InRange("t", "v", 0.0, 1.0),
      SubsetOf("t", "id", "ref", "id"))).collect()
    assert(out.length == 4)
    assert(out.forall(_.isNullAt(2)))
    assert(out.forall(_.getLong(3) == 0L))
    assert(out.forall(_.getBoolean(4)))
  }

  test("unknown table or empty suite is rejected loudly") {
    intercept[IllegalArgumentException] {
      validate(Map.empty, Seq(Complete("nope", "x")))
    }
    intercept[IllegalArgumentException] {
      validate(Map("t" -> users), Seq.empty)
    }
  }
}
