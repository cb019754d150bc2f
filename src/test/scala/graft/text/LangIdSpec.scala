package graft.text

import graft.SparkSpec

/** LangId accuracy on real-language fixtures — not just determinism:
  * every stopword-bearing sentence must classify correctly, and the
  * character-n-gram fallback must rescue short stopword-free fragments.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private def predict(rows: Seq[(Long, String, String)]): Map[Long, String] =
    LangId.langIdOf(rows.toDF("doc_id", "lang", "text"))
      .select("doc_id", "lang_pred").as[(Long, String)]
      .collect().toMap

  test("real sentences classify to their language via stopword profiles") {
    val got = predict(Seq(
      (1L, "en", "it was the best of times and the worst of times"),
      (2L, "de", "der hund und die katze spielen nicht mit dem ball"),
      (3L, "fr", "le chat et les chiens sont dans la maison pour la nuit"),
      (4L, "es", "el perro y los gatos no llegan por la tarde"),
      (5L, "zh", "我不是这里的人他们都在那里有很多人")))
    assert(got === Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es",
      5L -> "zh"))
  }

  test("short stopword-free fragments fall back to character n-grams") {
    val got = predict(Seq(
      (1L, "en", "thinking highlights motivation"),
      (2L, "de", "schönheit zurückgeblieben"),
      (3L, "fr", "général café découverte"),
      (4L, "es", "año cañón pequeño")))
    assert(got === Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es"))
  }

  test("no evidence at all predicts 'und', deterministically") {
    val rows = Seq((1L, "xx", "zzz qqq www"))
    assert(predict(rows) === Map(1L -> "und"))
    assert(predict(rows) === Map(1L -> "und")) // stable across runs
  }

  test("case-insensitive stopword matching (sentence-initial capitals)") {
    val got = predict(Seq(
      (1L, "en", "The cat sat On the mat"),
      (2L, "de", "Der Hund Und Die Katze")))
    assert(got === Map(1L -> "en", 2L -> "de"))
  }
}
