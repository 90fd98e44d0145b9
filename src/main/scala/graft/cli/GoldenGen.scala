package graft.cli

import org.apache.spark.sql.SparkSession
import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.{Files, Paths}

/** Regenerates the CLI golden files (VERDICT r2 item 6): the five
  * reference verbs over the fixed seeded fixture corpus (`--synth`,
  * seed 42), captured byte-exactly as CliSpec asserts them. The printer
  * shapes mirror the reference (src/printer.rs:6-62,
  * src/nlu/glossary.rs:218-278); the CONTENTS are deterministic by
  * design — permutation- and partition-count-invariant clustering, all
  * collections sorted — which is what makes byte-exact goldens possible.
  *
  * {{{ sbt "runMain graft.cli.GoldenGen src/test/resources/goldens 800" }}}
  */
object GoldenGen {

  val Verbs: Seq[String] = Seq("languages", "news", "categories", "threads", "top")
  val FixtureDocs = 800L

  def render(spark: SparkSession, verb: String, n: Long): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    Console.withOut(new PrintStream(buf, true, "UTF-8")) {
      Main.run(spark, verb, Map("synth" -> n.toString))
    }
    buf.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "src/test/resources/goldens"
    val n = if (args.length > 1) args(1).toLong else FixtureDocs
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    Verbs.foreach { verb =>
      Files.write(Paths.get(s"$outDir/$verb.json"), render(spark, verb, n))
      System.err.println(s"[goldengen] wrote $outDir/$verb.json")
    }
    spark.stop()
  }
}
