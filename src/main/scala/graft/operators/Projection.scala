package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-projection dimensionality reduction for embedding columns —
  * the Johnson–Lindenstrauss step that turns a 64-d float vector into a
  * 16-d one while approximately preserving pairwise distances, used to
  * shrink ANN candidate scans and cut shuffle bytes before clustering.
  *
  * The projection matrix is a DETERMINISTIC Achlioptas sign matrix:
  * R[i][j] = ±1 derived from the engine-portable md5-bucket convention
  * (`md5("i_j") mod 2` on the 60-bit hex prefix) — no RNG, no seed
  * state, so any engine (and the DuckDB oracle) regenerates the exact
  * matrix from the formula alone. Components are fixed-pointed to the
  * 1e-6 grid (emb6's idiom) BEFORE summing, so each output coordinate
  * is an exact BIGINT sum of ±q_i — bit-identical under any partition
  * layout, engine, or evaluation order. (A float dot here would make
  * the result depend on summation order.)
  *
  * Scale shape: the signs are dIn×dOut literals baked into the plan
  * (driver model state, the k-means contract) and the projection is a
  * PURE MAP — zero shuffle, runs at scan speed, embarrassingly
  * parallel at 100 TB. Distance preservation is the standard JL
  * guarantee for sign matrices (Achlioptas 2003): the scale-out path
  * for sim-search pre-filters when 64 dims of float are too wide.
  */
object Projection {

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** The ±1 sign for input dim i, output dim j: md5-bucket parity of
    * "i_j" — the Scala twin of the oracle's
    * `('0x' || substr(md5(i || '_' || j), 1, 15))::BIGINT % 2`. */
  def sign(i: Int, j: Int): Long = {
    val h = java.lang.Long.parseLong(md5Hex(s"${i}_$j").substring(0, 15), 16)
    if (h % 2 == 0) 1L else -1L
  }

  /** Project `emb` (array<float>, length dIn) to dOut coordinates in
    * long format: (id, dim, value) with value = Σ_i sign(i,dim)·q_i over
    * the 1e-6 fixed-point components q_i. Pure map + one bounded
    * explode (dOut rows per input row). */
  def jlProject(df: DataFrame, id: Column, emb: Column,
      dIn: Int, dOut: Int): DataFrame = {
    require(dIn > 0 && dOut > 0 && dOut <= dIn,
      s"need 0 < dOut <= dIn, got dIn=$dIn dOut=$dOut")
    val fixed = transform(emb, e => round(e.cast("double") * lit(1e6)).cast("long"))
    val coords = (0 until dOut).map { j =>
      val signs = array((0 until dIn).map(i => lit(sign(i, j))): _*)
      aggregate(zip_with(fixed, signs, (q, s) => q * s), lit(0L), (acc, v) => acc + v)
    }
    df.select(id.as("id"), posexplode(array(coords: _*)).as(Seq("dim", "value")))
      .select(col("id"), col("dim").cast("long").as("dim"), col("value"))
  }
}
