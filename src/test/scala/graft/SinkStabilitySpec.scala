package graft

import java.io.File
import java.nio.file.Files

import graft.operators.RankOutput
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Forked-JVM fixture: writes the deterministic transcendental score
  * set through the CLI sink path, exactly as the in-JVM spec does, so
  * the two byte streams can be compared across JVM boundaries. */
object SinkStabilityMain {
  /** 40 transcendental-born scores, two of which differ by ~1e-15
    * (below the sink's 12-decimal round — a deliberate tie that only
    * the id tiebreak can order). */
  def fixture(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = (1 to 38).map(i =>
      (f"n$i%02d", math.exp(math.sin(i.toDouble)) / math.Pi)) ++
      Seq(("tie_b", 0.5), ("tie_a", 0.5 + 5e-16))
    rows.toDF("id", "score")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try RankOutput.writeScoresText(fixture(spark), args(0))
    finally spark.stop()
  }
}

/** VERDICT r9 item 5: the sorted text sink's bytes must be identical
  * across JVM runs — the 12-decimal pre-rank round in
  * [[RankOutput.writeScoresText]] plus the id tiebreak make tie order
  * and printed strings platform-stable. */
class SinkStabilitySpec extends SparkSuite {

  private def sinkBytes(dir: String): String = {
    val parts = new File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    assert(parts.length == 1, s"expected one part file, got ${parts.length}")
    new String(Files.readAllBytes(parts.head.toPath), "UTF-8")
  }

  test("sub-round ties order by id; scores print rounded") {
    val tmp = Files.createTempDirectory("graft-sink").toString
    RankOutput.writeScoresText(SinkStabilityMain.fixture(spark), s"$tmp/a")
    val lines = sinkBytes(s"$tmp/a").split("\n")
    val ia = lines.indexWhere(_.startsWith("('tie_a'"))
    val ib = lines.indexWhere(_.startsWith("('tie_b'"))
    assert(ia >= 0 && ib >= 0 && ia == ib - 1,
      s"tie group must order by id: tie_a at $ia, tie_b at $ib")
    // both ties print the identical rounded score
    assert(lines(ia).drop("('tie_a', ".length) ==
      lines(ib).drop("('tie_b', ".length))
  }

  test("sink bytes are identical across two JVM runs") {
    val tmp = Files.createTempDirectory("graft-sink-jvm").toString
    RankOutput.writeScoresText(SinkStabilityMain.fixture(spark), s"$tmp/in")
    val inJvm = sinkBytes(s"$tmp/in")
    // second JVM: same fixture, same sink path, fresh process
    val opens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util",
      "java.util.concurrent", "java.util.concurrent.atomic",
      "sun.nio.ch", "sun.nio.cs", "sun.security.action",
      "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val java = new File(new File(sys.props("java.home"), "bin"), "java")
    val cmd = Seq(java.getAbsolutePath) ++ opens ++
      Seq("-Xmx2g", "-cp", sys.props("java.class.path"),
        "graft.SinkStabilityMain", s"$tmp/forked")
    val proc = new ProcessBuilder(cmd: _*).inheritIO().start()
    assert(proc.waitFor() == 0, "forked JVM failed")
    assert(sinkBytes(s"$tmp/forked") == inJvm,
      "sink bytes differ across JVM runs")
  }
}
