package graft

import org.scalatest.funsuite.AnyFunSuite

/** The CLI verb surface (SURVEY §7.1.9): every subcommand resolves to a
  * runnable plan; unknown verbs fail loudly. */
class CliSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private val commands = Seq(
    Seq("members", "all"), Seq("members", "by-club", "7"),
    Seq("members", "by-region", "2"), Seq("members", "history"),
    Seq("members", "intl-history"), Seq("members", "mailing-addresses"),
    Seq("users", "all"), Seq("users", "by-uid", "1"),
    Seq("clubs"), Seq("clubs", "by-number", "107"),
    Seq("regions"), Seq("regions", "by-uid", "2"),
    Seq("standing-committees"), Seq("races"), Seq("roles"),
    Seq("roles", "microsite-admins"),
    Seq("airstreams"), Seq("addresses", "by-user", "1"),
    Seq("leadership", "for-clubs"),
    Seq("leadership", "for-clubs", "--all"),
    Seq("leadership", "for-clubs", "--as-of", "1996-06-01"),
    Seq("leadership", "for-region", "0", "--all"),
    Seq("leadership", "international", "--all"),
    Seq("curate"), Seq("contamination"),
    Seq("query", "smp1_hash_sample"), Seq("query", "tx7_normalize"))

  test("export verb writes shards then verifies its own manifest clean") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_export_").toString
    val m = Cli.resolve(spark, d, Seq("export", "--shards", "4", "--out", dir))
    assert(m.count() > 0)
    assert(new java.io.File(s"$dir/MANIFEST.json").exists())
    import org.apache.spark.sql.functions.col
    val v = Cli.resolve(spark, d, Seq("export", "--verify", dir))
    assert(v.filter(col("status") =!= "ok").count() == 0)
    // append the same table again as a top-up batch: counts double and
    // the incrementally-updated manifest still verifies clean. (The
    // write-returned manifest recomputes from disk lazily — capture its
    // total BEFORE the append mutates the directory.)
    import spark.implicits._
    val firstTotal = m.agg(org.apache.spark.sql.functions.sum("n_rows")).as[Long].head()
    val a = Cli.resolve(spark, d, Seq("export", "--append", "--shards", "4", "--out", dir))
    val total = a.agg(org.apache.spark.sql.functions.sum("n_rows")).as[Long].head()
    assert(total == 2 * firstTotal)
    val v2 = Cli.resolve(spark, d, Seq("export", "--verify", dir))
    assert(v2.filter(col("status") =!= "ok").count() == 0)
  }

  test("bpe-train writes the vocab artifact and returns the merge list") {
    val out = java.nio.file.Files.createTempDirectory("bpe_cli").toString
    val m = Cli.resolve(spark, d, Seq("bpe-train", "--merges", "4", "--out", out))
    assert(m.count() == 4)
    assert(m.columns.toSeq == Seq("it", "l", "r", "cnt"))
    val vocab = spark.read.parquet(s"$out/vocab")
    assert(vocab.columns.toSeq == Seq("word", "freq", "sym"))
    assert(vocab.count() > 0)
    val toks = spark.read.parquet(s"$out/tokens")
    assert(toks.columns.toSeq == Seq("token", "freq"))
    assert(toks.count() > 0)
  }

  test("every CLI verb resolves and runs") {
    commands.foreach { cmd =>
      val df = Cli.resolve(spark, d, cmd)
      df.count() // must execute without error (some are empty at sf0.001)
    }
  }

  test("members by-club emits serde-style JSON lines (null fields skipped)") {
    val lines = graft.pipeline.JsonOut.lines(
      graft.queries.Catalog.ordered(Cli.resolve(spark, d, Seq("members", "by-club", "7"))))
    assert(lines.nonEmpty)
    assert(lines.forall(l => l.startsWith("{\"uid\":")))
    assert(lines.forall(l => !l.contains("\"pass\""))) // null placeholder skipped
  }

  test("unknown verb fails loudly") {
    intercept[IllegalArgumentException] {
      Cli.resolve(spark, d, Seq("nonsense", "verb"))
    }
  }
}
