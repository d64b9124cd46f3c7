package graft

import org.apache.spark.sql.functions._
import graft.link.{Mentions, Scoring, Trainer}

/** Reproduces the frozen served model (Scoring.trainedModel): runs the
  * reference's train-classifier path (cli.py:176-208 -> spark.ml LinearSVC,
  * Trainer.train) on the sf0.001 corpus with the planted gold, prints the
  * learned weights as Scala literals, and commits the model through the
  * Scoring.saveModel parquet sink at models/trained_svm.
  *
  * The served query (el_annotate_trained) inlines the printed literals so
  * its DuckDB oracle can re-derive the exact decision function;
  * TrainerSpec's frozen-model test pins that re-running this training
  * reproduces the frozen model's predictions.
  */
object TrainFreeze {
  def main(args: Array[String]): Unit = {
    val spark = BenchChild.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val a = Pipeline.artifacts(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 120)
    val tags = Mentions.candidates(
      Mentions.extract(docs, a.dictKeys, a.maxKeyTokens),
      a.dictKeys, a.entityDict, a.pagerank, a.bow).persist()
    val gold = Trainer.plantedGold(tags).persist()
    val model = Trainer.train(tags, gold, Scoring.Params(), c = 0.01, maxIter = 50)
    val best = Scoring.bestLinks(tags, Scoring.Params(), model)
    val (p, r, f1) = Trainer.evaluate(best, gold)
    println(f"TRAINED precision=$p%.4f recall=$r%.4f f1=$f1%.4f")
    def arr(xs: Array[Double]) = xs.map(_.toString).mkString("Array(", ", ", ")")
    println(s"TRAINED weights = ${arr(model.weights)}")
    println(s"TRAINED mean = ${arr(model.mean)}")
    println(s"TRAINED scale = ${arr(model.scale)}")
    println(s"TRAINED intercept = ${model.intercept}")
    Scoring.saveModel(spark, model, "models/trained_svm")

    // miniature crossfit_model grid (classifier.py:94-158 shape: vary the
    // similarity + propagation depth, k-fold by doc_id) — recorded artifact
    val grid = for {
      sim <- Seq("direct_link", "edge_ratio")
      steps <- Seq(1, 2)
    } yield Scoring.Params(nbSteps = steps, similarity = sim)
    val (bestP, bestF1, _, scores) =
      Trainer.crossfit(tags, gold, grid, k = 2, c = 0.01, maxIter = 25)
    scores.foreach { case (p, f1) =>
      println(f"CROSSFIT sim=${p.similarity}%-12s nbSteps=${p.nbSteps} meanF1=$f1%.4f")
    }
    println(f"CROSSFIT best sim=${bestP.similarity} nbSteps=${bestP.nbSteps} f1=$bestF1%.4f")
    import spark.implicits._
    scores.map { case (pp, f1) => (pp.similarity, pp.nbSteps, f1) }
      .toDF("similarity", "nb_steps", "mean_f1")
      .coalesce(1).write.mode("overwrite").parquet("models/crossfit_grid")
    spark.stop()
  }
}
