package graft.sources

/** Config-declared merge-field catalog (SURVEY §2.1 S6, §1.1): the
  * reference declares audience merge fields in TOML
  * (`mailchimp/data/fields-all.toml`, `fields-club.toml`), loads and
  * validates them (`mailchimp/src/merge_fields.rs:174-208` — tag ≤ 10
  * chars), and diffs the catalog against the live sink schema (S14).
  *
  * No TOML dependency is available (zero-egress build), so the catalog
  * is declared in code and parsed from a minimal `tag:type:name` line
  * format for config-file round-trips; validation rules match the
  * reference. This is driver-side metadata — plain Scala, not a data op.
  */
final case class MergeField(tag: String, mergeType: String, name: String,
    required: Boolean = false)

object MergeFieldCatalog {
  val MaxTagLength = 10
  val MergeTypes: Set[String] =
    Set("text", "number", "date", "birthday", "address", "phone", "url",
      "imageurl", "radio", "dropdown", "zip")

  /** The "all members" catalog — shape mirrors fields-all.toml. */
  val all: Seq[MergeField] = Seq(
    MergeField("NAME", "text", "Full Name", required = true),
    MergeField("BAL", "number", "Balance"),
    MergeField("JOINED", "date", "Join Date"),
    MergeField("BDAY", "birthday", "Birthday"),
    MergeField("ROLE", "text", "Role"),
    MergeField("SEGMENT", "text", "Segment"))

  /** The per-club catalog — a subset, mirrors fields-club.toml. */
  val club: Seq[MergeField] = all.filter(f => Set("NAME", "JOINED", "ROLE")(f.tag))

  def validate(fields: Seq[MergeField]): Either[String, Seq[MergeField]] = {
    val badTag = fields.find(f => f.tag.isEmpty || f.tag.length > MaxTagLength)
    val badType = fields.find(f => !MergeTypes(f.mergeType))
    val dup = fields.groupBy(_.tag).collectFirst { case (t, fs) if fs.size > 1 => t }
    badTag.map(f => Left(s"tag '${f.tag}' exceeds $MaxTagLength chars or empty"))
      .orElse(badType.map(f => Left(s"unknown merge type '${f.mergeType}'")))
      .orElse(dup.map(t => Left(s"duplicate tag '$t'")))
      .getOrElse(Right(fields))
  }

  /** Parse `TAG:type:Display Name[:required]` lines (comments with #). */
  def parse(lines: Iterator[String]): Either[String, Seq[MergeField]] = {
    val fields = lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        l.split(":", 4) match {
          case Array(tag, tpe, name)       => MergeField(tag, tpe, name)
          case Array(tag, tpe, name, req)  => MergeField(tag, tpe, name, req == "required")
          case _ => return Left(s"unparseable merge-field line: '$l'")
        }
      }.toSeq
    validate(fields)
  }

  /** S14 schema diff on driver metadata: declared vs live tags →
    * (toAdd, toDelete, toUpdate-name). Mirrors merge_fields::sync
    * (`mailchimp/src/merge_fields.rs:51-101`). */
  def diff(declared: Seq[MergeField], live: Seq[MergeField])
      : (Seq[MergeField], Seq[MergeField], Seq[MergeField]) = {
    val liveByTag = live.map(f => f.tag -> f).toMap
    val decByTag = declared.map(f => f.tag -> f).toMap
    val add = declared.filterNot(f => liveByTag.contains(f.tag))
    val del = live.filterNot(f => decByTag.contains(f.tag))
    val upd = declared.filter(f => liveByTag.get(f.tag).exists(l =>
      l.name != f.name || l.mergeType != f.mergeType))
    (add, del, upd)
  }
}
