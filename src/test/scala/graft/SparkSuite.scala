package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared session for the whole test run (SparkSessions are heavy). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .getOrCreate()
}

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Build a Graph fixture from literal edges / labeled nodes. */
  def graph(edges: Seq[(String, String, Double)],
      labels: Map[String, String] = Map.empty): Graph = {
    import spark.implicits._
    val e = edges.toDF("src", "dst", "weight")
    val ids = edges.flatMap(t => Seq(t._1, t._2)).distinct ++
      labels.keys.filterNot(id => edges.exists(t => t._1 == id || t._2 == id))
    val n = ids.distinct.map(id => (id, labels.getOrElse(id, "none")))
      .toDF("id", "label")
    Graph(n, e)
  }

  def scoresMap(df: DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  def assertApprox(got: Map[String, Double], want: Map[String, Double],
      tol: Double = 1e-9): Unit = {
    assert(got.keySet == want.keySet,
      s"key sets differ: got ${got.keySet}, want ${want.keySet}")
    want.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < tol, s"$k: got ${got(k)}, want $v")
    }
  }
}
