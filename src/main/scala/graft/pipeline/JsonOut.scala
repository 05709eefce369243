package graft.pipeline

import org.apache.spark.sql.DataFrame

/** S7/F9: the JSON output contract — the Spark twin of the reference's
  * only output path, `print_json` (`ddb/src/cmd/mod.rs:28-31`): one JSON
  * document per row on stdout, with None/null fields SKIPPED (serde's
  * `skip_serializing_if = "Option::is_none"`, `ddb/src/members.rs:723-733`).
  *
  * `toJSON` runs Jackson with `ignoreNullFields` on (Spark's default for
  * the JSON generator), so null columns vanish from the document exactly
  * like serde. Key order is schema order — deterministic; row order is
  * the caller's (sort first for goldens).
  *
  * `lines`/`print` materialize on the driver — that IS the contract for
  * a CLI result (the reference collects into a Vec before printing).
  * Dataset-sized output goes through `write` (distributed JSON writer,
  * same null-skipping), never through the driver. */
object JsonOut {
  def lines(df: DataFrame): Seq[String] = df.toJSON.collect().toSeq
  def print(df: DataFrame): Unit = lines(df).foreach(println)
  /** The at-scale path: distributed JSON write, same document shape. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
