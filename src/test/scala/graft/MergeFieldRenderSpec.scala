package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MergeFieldRender
import graft.sources.{MergeField, MergeFieldCatalog}

/** F8 typed dispatch contract (mailchimp/src/merge_fields.rs:272-365):
  * date/birthday formats, number-vs-text dispatch, None propagation
  * (field skipped), and type mismatch = error. */
class MergeFieldRenderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    (1L, "Alice", Some("2001-03-04"), Some(BigDecimal("12.50"))),
    (2L, "Bob", None, None)
  ).toDF("uid", "name", "d", "bal")
    .withColumn("d", col("d").cast("date"))
    .withColumn("bal", col("bal").cast("decimal(12,2)"))

  test("date renders %Y-%m-%d, birthday renders %m/%d, null propagates") {
    val fields = Seq(MergeField("JOINED", "date", "j"),
      MergeField("BDAY", "birthday", "b"))
    val out = df.select(col("uid"), MergeFieldRender.mergeJson(df, fields,
      Map("JOINED" -> col("d"), "BDAY" -> col("d"))).as("j"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == """{"JOINED":"2001-03-04","BDAY":"03/04"}""")
    assert(out(2L) == "{}") // None propagates: both fields skipped
  }

  test("number keeps JSON number (decimal scale); text renders ints as strings") {
    val fields = Seq(MergeField("BAL", "number", "bal"),
      MergeField("UID", "text", "uid"), MergeField("NAME", "text", "n"))
    val out = df.select(col("uid"), MergeFieldRender.mergeJson(df, fields,
      Map("BAL" -> col("bal"), "UID" -> col("uid"), "NAME" -> col("name"))).as("j"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == """{"BAL":12.50,"UID":"1","NAME":"Alice"}""")
    assert(out(2L) == """{"UID":"2","NAME":"Bob"}""")
  }

  test("type mismatch is an error, not a silent coercion") {
    // string value for a number field (reference Error::InvalidMergeType)
    val e1 = intercept[IllegalArgumentException] {
      MergeFieldRender.mergeJson(df, Seq(MergeField("BAL", "number", "b")),
        Map("BAL" -> col("name")))
    }
    assert(e1.getMessage.contains("invalid merge type"))
    // date value for a text field
    intercept[IllegalArgumentException] {
      MergeFieldRender.mergeJson(df, Seq(MergeField("D", "text", "d")),
        Map("D" -> col("d")))
    }
    // no renderer for the address family
    intercept[IllegalArgumentException] {
      MergeFieldRender.mergeJson(df, Seq(MergeField("A", "address", "a")),
        Map("A" -> col("name")))
    }
  }

  test("declared catalog drives order; unsupplied tags are omitted") {
    val j = df.filter(col("uid") === 1).select(MergeFieldRender.mergeJson(df,
      MergeFieldCatalog.all, Map("NAME" -> col("name"), "BAL" -> col("bal"),
        "JOINED" -> col("d"), "BDAY" -> col("d")))).as[String].head()
    // catalog order NAME,BAL,JOINED,BDAY,(ROLE,SEGMENT omitted)
    assert(j == """{"NAME":"Alice","BAL":12.50,"JOINED":"2001-03-04","BDAY":"03/04"}""")
  }
}
