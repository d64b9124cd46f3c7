package graft
import org.apache.spark.sql.SparkSession
object DbgClusters {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val t = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (10L, t),
      (20L, t.split(" ").drop(1).mkString(" ")),
      (30L, t.split(" ").drop(2).mkString(" ")),
      (99L, (1 to 40).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val ids = graft.dedup.Dedup.docShingleIds(d, "rank")
    val cand = graft.dedup.Dedup.minhashCandidates(d, idMode = "rank", ids = Some(ids))
    println("CAND: " + cand.collect().mkString(", "))
    val ver = graft.dedup.Dedup.jaccardVerify(d, cand, 0.5, precomputedIds = Some(ids))
    println("VERIFIED: " + ver.collect().mkString(", "))
    val comp = graft.link.ConnectedComponents.runWithIsolated(
      spark, d.select($"doc_id"), ver.select($"doc1".as("src"), $"doc2".as("dst")))
    println("COMP: " + comp.collect().mkString(", "))
    spark.stop()
  }
}
