package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.MergeField

/** F8: the typed merge-field renderer — (value × declared MergeType) →
  * JSON scalar, driven by the MergeFieldCatalog declaration.
  *
  * Mirrors `mailchimp/src/merge_fields.rs:272-365` (ToMergeFieldValue
  * trait + impls): NaiveDate renders as `%Y-%m-%d` for Date fields and
  * `%m/%d` for Birthday fields; integers render as JSON numbers for
  * Number fields and strings for Text fields; strings render only for
  * Text fields; anything else is Error::InvalidMergeType; None
  * propagates (the field is skipped in the JSON output, F9).
  *
  * Spark twist: column types are static, so the type×type dispatch
  * happens ONCE at plan build — a mismatch throws here (the static twin
  * of the reference's per-value runtime error) instead of per row, and
  * the accepted cases compile to codegen'd `date_format`/`cast`
  * expressions with zero per-row branching.
  */
object MergeFieldRender {

  /** Render one value column for a declared field; throws
    * IllegalArgumentException on a type mismatch. */
  def render(field: MergeField, value: Column, valueType: DataType): Column = {
    def bad(): Nothing = throw new IllegalArgumentException(
      s"invalid merge type '${field.mergeType}' for ${field.tag}: " +
        s"cannot render ${valueType.simpleString}")
    field.mergeType match {
      case "date" => valueType match {
        case DateType | TimestampType => date_format(value, "yyyy-MM-dd")
        case _ => bad()
      }
      case "birthday" => valueType match {
        case DateType | TimestampType => date_format(value, "MM/dd")
        case _ => bad()
      }
      case "number" => valueType match {
        case _: NumericType => value
        case _ => bad()
      }
      case "text" => valueType match {
        case StringType => value
        case ByteType | ShortType | IntegerType | LongType =>
          value.cast(StringType) // u64/i64 → Text

        case _ => bad()
      }
      case _ => bad() // no renderer for address/phone/url/... value kinds
    }
  }

  /** Render a whole declared catalog into one JSON object column:
    * fields ordered as declared, values dispatched per declared type,
    * nulls skipped (serde's skip_serializing_if="Option::is_none" twin,
    * F9). Tags without a supplied value column are omitted, matching
    * `MergeFields::to_value` returning None for unknown tags. */
  def mergeJson(df: DataFrame, fields: Seq[MergeField],
      values: Map[String, Column]): Column = {
    val rendered = fields.flatMap { f =>
      values.get(f.tag).map { c =>
        val tpe = df.select(c).schema.head.dataType
        render(f, c, tpe).as(f.tag)
      }
    }
    require(rendered.nonEmpty, "no renderable merge fields")
    to_json(struct(rendered: _*), Map("ignoreNullFields" -> "true"))
  }
}
