package graft

import org.apache.spark.sql.functions._
import graft.queries.DrupalFixture._

// scratch profiling harness (not a test): times flagship stages
object ProfileMbr {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = spark
    def time(nm: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $nm%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    // warmup
    graft.queries.Members.byClub(spark, d, 7).count()

    val asOfD = lit("1995-06-17").cast("date")
    def acpAll = {
      val p0 = paragraphs(s, d).filter(col("status") === "1" && col("ptype") === "membership")
      val pc = paraClub(s, d).filter(col("deleted") === "0")
        .select(col("entity_id"), col("club_target"))
      val fjd = paraJoin(s, d).filter(col("deleted") === "0")
        .select(col("entity_id"), col("join_dt"))
      val fld = paraLeave(s, d).filter(col("deleted") === "0")
        .select(col("entity_id"), col("leave_dt"))
      p0.join(pc, col("paragraph_id") === pc("entity_id")).drop("entity_id")
        .join(fjd, col("paragraph_id") === fjd("entity_id"), "left").drop("entity_id")
        .join(fld, col("paragraph_id") === fld("entity_id"), "left").drop("entity_id")
        .filter(col("join_dt").isNotNull && col("join_dt") <= asOfD &&
          (col("leave_dt").isNull || col("leave_dt") >= asOfD))
    }
    def flags = {
      val uhc = userHomeClub(s, d).filter(col("deleted") === "0")
      val uac = userAffClub(s, d).filter(col("deleted") === "0")
      val uic = userIntraClub(s, d).filter(col("deleted") === "0")
      def flagJoin(links: org.apache.spark.sql.DataFrame, nm: String) =
        links.select(col("entity_id").as(s"${nm}_uid"), col("target_id").as(s"${nm}_pid"),
          lit(1).as(s"${nm}_hit"))
      acpAll
        .join(flagJoin(uhc, "uhc"), col("uid") === col("uhc_uid") &&
          col("paragraph_id") === col("uhc_pid"), "left")
        .join(flagJoin(uac, "uac"), col("uid") === col("uac_uid") &&
          col("paragraph_id") === col("uac_pid"), "left")
        .join(flagJoin(uic, "uic"), col("uid") === col("uic_uid") &&
          col("paragraph_id") === col("uic_pid"), "left")
        .groupBy(col("uid"))
        .agg(
          greatest(max(coalesce(col("uhc_hit"), lit(0))),
            max(coalesce(col("uic_hit"), lit(0)))).as("member_flag"),
          max(coalesce(col("uac_hit"), lit(0))).as("affiliate_flag"),
          max(col("join_dt")).as("latest_join_date"),
          max(col("leave_dt")).as("latest_expiration_date"),
          max(struct(col("join_dt"), (-col("paragraph_id")).as("neg_pid"),
            col("paragraph_id"), col("club_target"))).as("pick"))
    }

    for (_ <- 1 to 2) {
      time("acpAll")(acpAll.count())
      time("flags")(flags.count())
      time("mbr1 byClub")(graft.queries.Members.byClub(spark, d, 7).count())
      time("mbr3 all")(graft.queries.Members.all(spark, d).count())
    }
    spark.stop()
  }
}
