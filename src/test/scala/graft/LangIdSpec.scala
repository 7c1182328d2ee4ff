package graft

import org.apache.spark.sql.functions._

/** The language-ID heuristic on real multilingual snippets (the documents
  * fixture's text is synthetic English-ish for all labels, so accuracy is
  * asserted here instead — SURVEY.md §2.11 X3). */
class LangIdSpec extends GraftSuite {
  import spark.implicits._

  test("stopword-profile scorer identifies clear-cut languages") {
    val docs = Seq(
      ("en", "the cat is on the mat and it is happy"),
      ("de", "der hund ist nicht mit der katze und das ist gut"),
      ("es", "el perro es grande y la casa no es un lugar"),
      ("fr", "le chien est avec le chat et la maison est grande"))
      .toDF("expected", "text")
    // reuse the exact scoring construction from TextQueries via the query on
    // a temp table shape: simplest is re-deriving predictions inline
    val toks = split(col("text"), " ")
    val profiles = Seq(
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
      "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "it"),
      "es" -> Seq("el", "la", "de", "y", "es", "no", "con", "un"),
      "fr" -> Seq("le", "la", "de", "et", "est", "ne", "avec", "un"))
    val scores = profiles.map { case (l, ws) =>
      struct((-size(array_intersect(toks, array(ws.map(lit): _*)))).as("neg"), lit(l).as("lang"))
    }
    val best = sort_array(array(scores: _*))(0)
    val out = docs.withColumn("predicted", best.getField("lang"))
      .select("expected", "predicted").collect()
      .map(r => r.getString(0) -> r.getString(1))
    out.foreach { case (exp, got) => assert(got === exp, s"expected $exp got $got") }
  }
}
