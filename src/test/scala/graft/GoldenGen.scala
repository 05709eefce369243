package graft

import java.nio.file.{Files, Paths}

/** Regenerates the checked-in goldens for the three §3 pipeline shapes.
  * Run after an INTENDED output-contract change:
  *   sbt "Test/runMain graft.GoldenGen"
  * then review the diff like any code change. */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = GoldenSpec.goldenDir
    Files.createDirectories(Paths.get(dir))
    GoldenSpec.shapes(spark).foreach { case (name, lines) =>
      Files.writeString(Paths.get(s"$dir/$name.jsonl"), lines.mkString("", "\n", "\n"))
      println(s"wrote $dir/$name.jsonl (${lines.size} lines)")
    }
    spark.stop()
  }
}
