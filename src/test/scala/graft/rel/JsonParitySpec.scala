package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** from_json (schema'd struct parse) must agree with q14's
  * get_json_object path extraction on the events.props payload —
  * the two JSON surfaces the engine offers.
  */
class JsonParitySpec extends SparkSpec {
  import spark.implicits._

  test("from_json struct access equals get_json_object extraction") {
    val ev = graft.Tables.events(spark, sf0001)
    val viaPath = ev.select($"event_id",
      get_json_object($"props", "$.k").cast("long").as("k"))
    val viaStruct = ev.select($"event_id",
      from_json($"props", lit("k LONG")).getField("k").as("k"))
    assert(viaPath.exceptAll(viaStruct).count() == 0)
    assert(viaStruct.exceptAll(viaPath).count() == 0)
    assert(viaPath.filter($"k".isNull).count() == 0, "unparsed props")
  }
}
