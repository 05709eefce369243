package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar expression library (SURVEY §2.7). Everything here is built from
  * codegen'd `org.apache.spark.sql.functions` — no Scala UDFs — so each
  * helper inlines into whole-stage codegen and is pushdown-transparent.
  *
  * Each function documents the reference behavior it reproduces
  * (file:line cites into /root/reference).
  */
object F {

  /** Stable user id: url-safe-no-pad base64 of sha256 of trim+lower email.
    * Reference: `db/src/user.rs:31-35` (sha256 + BASE64_URL_SAFE_NO_PAD).
    * Built-ins only: sha2 gives hex → unhex → base64 → translate +/ → -_
    * → strip padding. */
  def idForEmail(email: Column): Column =
    regexp_replace(
      translate(base64(unhex(sha2(lower(trim(email)), 256))), "+/", "-_"),
      "=+$", "")

  /** Audience member id: md5 of lowercased email.
    * Reference: `mailchimp/src/members.rs:107-109`. */
  def memberIdForEmail(email: Column): Column = md5(lower(email))

  /** Email validity predicate. Reference `mailchimp/src/members.rs:111-114`:
    * lowercase; reject empty / *noemail.com / *example.com. */
  def isValidEmail(email: Column): Column = {
    val e = lower(coalesce(email, lit("")))
    (e =!= "") && !e.endsWith("noemail.com") && !e.endsWith("example.com")
  }

  /** Deterministic 60-bit hash shared with the DuckDB oracle:
    * first 15 hex chars of md5(seed|value) as a long. Used by minhash /
    * simhash / fingerprint operators so the oracle can replicate them
    * bit-for-bit (Spark's murmur `hash()` has no DuckDB twin). */
  def portableHash60(c: Column, seed: Int): Column =
    conv(substring(md5(concat_ws("|", lit(seed), c)), 1, 15), 16, 10)
      .cast("long")

  /** As-of validity predicate (SURVEY §2.6 T1/T2): row valid at `asOf`
    * when start <= asOf and (end is null or end >= asOf).
    * Reference `ddb/src/leadership.rs:104-121`. */
  def validAsOf(start: Column, end: Column, asOf: Column): Column =
    (start <= asOf) && (end.isNull || end >= asOf)

  /** Trailing-window membership filter (T4): active within 1 year before
    * asOf and joined on/before asOf. Reference `ddb/src/members.rs:344-345`. */
  def activeWithinYear(join: Column, leave: Column, asOf: Column): Column =
    (join <= asOf) && (leave.isNull || leave >= add_months(asOf, -12))

  /** Synthetic email for the hashing/validity operators: the testdata has
    * no email column, so derive one deterministically from a name column
    * (`Customer#000000042` → `customer.000000042@{acme.org|example.com}`);
    * every 10th key lands on the invalid domain to exercise P10. */
  def synthEmail(name: Column, key: Column): Column =
    concat(
      replace(lower(name), lit("#"), lit(".")),
      when(key % 10 === 0, lit("@example.com")).otherwise(lit("@acme.org")))

  /** Whitespace tokenization shared with the oracle: trim then split on
    * runs of whitespace (DuckDB twin: regexp_split_to_array(trim(x),'\s+')). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")
}
