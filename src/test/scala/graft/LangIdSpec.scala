package graft

import org.apache.spark.sql.functions._
import graft.parse.LangId

/** Labeled-accuracy gate for the stopword-profile language classifier
  * (round-4 verdict item #6): on real sentences in each profiled language
  * the argmax must recover the label exactly; degenerate inputs fall to
  * "unknown"; and the tie-break is the documented fixed profile order.
  */
class LangIdSpec extends SparkSpecBase {
  import spark.implicits._

  private def predict(texts: Seq[(String, String)]): Seq[(String, String)] = {
    texts.toDF("lang", "text")
      .withColumn("__ws", split(lower(col("text")), " "))
      .select(col("lang"), LangId.predCol("__ws").as("pred"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  private val labeled = Seq(
    "en" -> "the cat sat on the mat and it is a fine day to be in the sun",
    "en" -> "you know that the results of the study are in and they look good",
    "fr" -> "le chat est dans le jardin et les oiseaux chantent pour une belle journée",
    "fr" -> "les résultats des études sont dans le rapport que nous avons pour vous",
    "de" -> "der hund ist in dem garten und das wetter ist nicht schlecht für ein spiel",
    "de" -> "die ergebnisse der studie sind von den forschern und das ist ein erfolg",
    "es" -> "el gato está en el jardín y los pájaros cantan una canción por la mañana",
    "es" -> "los resultados de un estudio es algo que vemos como un gran éxito pero raro",
    "it" -> "il gatto è nel giardino e gli uccelli cantano anche se non sono di questo posto",
    "it" -> "i risultati della ricerca sono chiari e anche questo studio non si discute",
    "pt" -> "o gato está no jardim e os pássaros cantam uma canção para você com muito gosto",
    "pt" -> "os resultados dos estudos não são claros mas isso é algo que vemos com mais calma",
    "nl" -> "de kat zit in de tuin en het weer is niet slecht voor een spelletje met de bal",
    "nl" -> "de resultaten van het onderzoek zijn ook naar de pers gegaan maar dan anders",
    "sv" -> "katten sitter i trädgården och jag har inte sett att det är så fint väder som idag",
    "sv" -> "resultaten är klara och jag har inte läst det som står där men det är bra med mer",
    "pl" -> "kot siedzi w ogrodzie ale nie wiem czy to jest tak jak było już wcześniej",
    "pl" -> "wyniki badania są jasne ale czy to jest tak jak się wydaje przez cały czas",
    "id" -> "kucing itu duduk di taman dan saya tidak tahu apakah ini akan menjadi hari yang baik",
    "id" -> "hasil dari penelitian ini jelas dan akan ada banyak hal yang bisa dilakukan dengan itu")

  test("labeled accuracy is 100% on real sentences in every profiled language") {
    val preds = predict(labeled)
    preds.foreach { case (lang, pred) => pred shouldBe lang }
  }

  test("no stopword evidence predicts unknown") {
    predict(Seq(
      "zz" -> "quantum flux capacitor harmonics",
      "zz" -> "zzz qqq www")) foreach { case (_, p) => p shouldBe "unknown" }
  }

  test("ties break in fixed profile order (en before fr before de before es)") {
    // exactly one hit for each of two profiles → the earlier profile wins
    predict(Seq("x" -> "the le")).head._2 shouldBe "en"
    predict(Seq("x" -> "le der")).head._2 shouldBe "fr"
    predict(Seq("x" -> "der el")).head._2 shouldBe "de"
  }

  test("profile words are collision-free across languages") {
    // the discriminative-on-short-texts contract: each word belongs to
    // exactly one language's profile
    val all = LangId.profiles.flatMap(_._2)
    all.distinct.size shouldBe all.size
    LangId.profiles.size shouldBe 10
  }

  test("the Spark CASE chain and the DuckDB SQL mirror agree branch for branch") {
    // the mirror is generated from the same profiles val — a profile edit
    // that forgets one side cannot pass this
    val sql = LangId.predSqlDuck("ws")
    LangId.profiles.foreach { case (lang, words) =>
      sql should include(s"'$lang'")
      words.foreach(w => sql should include(s"'$w'"))
    }
  }
}
