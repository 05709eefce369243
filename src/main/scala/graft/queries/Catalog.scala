package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F
import graft.operators.{Dedup, Merge}
import graft.sources.Tables._

/** One catalog entry: the Spark builder plus (optionally) the equivalent
  * DuckDB SQL for the driver's oracle compare. Every query ends with a
  * deterministic ORDER BY over all output columns (Spark: asc nulls
  * first ≡ DuckDB: ORDER BY ALL NULLS FIRST) so row order can never be
  * the reason a hash differs. */
final case class Q(build: (SparkSession, String) => DataFrame, oracle: Option[String])

object Catalog {
  /** Injected "now" for all temporal operators (SURVEY §7.4.2: determinism
    * demands a parameterized clock; testdata orders span 1995..2001). */
  val AsOf = "2000-06-01"

  def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(c => col(c).asc): _*)

  private val OBA = " ORDER BY ALL NULLS FIRST"

  /** Exact money arithmetic for aggregating parquet doubles: cents as
    * BIGINT (round kills the ~1e-9 fp error; summation of longs is
    * order-independent, unlike double sums across shuffle partitions). */
  private def cents(c: Column): Column = round(c * 100, 0).cast("long")

  // ---------------------------------------------------------------- §2.2
  // P1 wide projection with aliasing + NULL struct-compat placeholders
  // (ddb/src/members.rs:262-301 "NULL AS pass" convention).
  val p1 = Q(
    (s, d) => ordered(customer(s, d).select(
      col("c_custkey").as("cust_id"),
      lower(col("c_name")).as("name_lc"),
      col("c_mktsegment").as("segment"),
      lit(null).cast("string").as("pass"),
      col("c_acctbal").as("balance"))),
    Some("SELECT c_custkey AS cust_id, lower(c_name) AS name_lc, " +
      "c_mktsegment AS segment, CAST(NULL AS VARCHAR) AS pass, " +
      "c_acctbal AS balance FROM customer" + OBA))

  // P2 computed boolean projection (ddb/src/users.rs:71-76).
  val p2 = Q(
    (s, d) => ordered(orders(s, d).select(
      col("o_orderkey").as("order_id"),
      (col("o_orderstatus") === "F").as("is_finished"),
      (col("o_totalprice") > 100000.0).as("is_big"))),
    Some("SELECT o_orderkey AS order_id, o_orderstatus = 'F' AS is_finished, " +
      "o_totalprice > 100000.0 AS is_big FROM orders" + OBA))

  // P3 constant-folding defaults (ddb/src/members.rs:289 COALESCE(...,'Regular')).
  val p3 = Q(
    (s, d) => ordered(customer(s, d).select(
      col("c_custkey").as("cust_id"),
      when(col("c_mktsegment") === "FURNITURE", lit("Regular"))
        .otherwise(col("c_mktsegment")).as("segment_or_default"))),
    Some("SELECT c_custkey AS cust_id, CASE WHEN c_mktsegment = 'FURNITURE' " +
      "THEN 'Regular' ELSE c_mktsegment END AS segment_or_default FROM customer" + OBA))

  // P4 entity-type/status filter (ddb/src/members.rs:339-342).
  val p4 = Q(
    (s, d) => ordered(lineitem(s, d)
      .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
      .select(col("l_orderkey").as("order_id"),
        col("l_linenumber").cast("long").as("line_no"),
        col("l_quantity").as("qty"))),
    Some("SELECT l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS line_no, " +
      "l_quantity AS qty FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'" + OBA))

  // P5 IN-list filter (ddb/src/members.rs:343).
  val p5 = Q(
    (s, d) => ordered(orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey").as("order_id"), col("o_orderpriority").as("priority"))),
    Some("SELECT o_orderkey AS order_id, o_orderpriority AS priority FROM orders " +
      "WHERE o_orderpriority IN ('1-URGENT','2-HIGH')" + OBA))

  // P6/T4 trailing-1-year window vs injected asOf (ddb/src/members.rs:344-345).
  val p6 = Q(
    (s, d) => ordered(orders(s, d)
      .filter(col("o_orderdate") <= lit(AsOf).cast("date") &&
        col("o_orderdate") >= add_months(lit(AsOf).cast("date"), -12))
      .select(col("o_orderkey").as("order_id"), col("o_orderdate").as("order_date"))),
    Some(s"SELECT o_orderkey AS order_id, o_orderdate AS order_date FROM orders " +
      s"WHERE o_orderdate <= DATE '$AsOf' AND o_orderdate >= DATE '$AsOf' - INTERVAL 12 MONTH" + OBA))

  // P7 null-guard filters (ddb/src/users.rs:92-94).
  val p7 = Q(
    (s, d) => ordered(events(s, d)
      .filter(col("props").isNotNull && col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"))),
    Some("SELECT event_id, user_id FROM events " +
      "WHERE props IS NOT NULL AND user_id IS NOT NULL" + OBA))

  // P8 parameterized point filter (ddb/src/members.rs:57-78 byUid).
  val p8 = Q(
    (s, d) => ordered(customer(s, d).filter(col("c_custkey") === 42)
      .select(col("c_custkey").as("cust_id"), col("c_name").as("name"),
        col("c_nationkey").cast("long").as("nation"))),
    Some("SELECT c_custkey AS cust_id, c_name AS name, " +
      "CAST(c_nationkey AS BIGINT) AS nation FROM customer WHERE c_custkey = 42" + OBA))

  // P9 dynamic IN-set as semi-join (ddb/src/members.rs:538-558).
  val p9 = Q(
    (s, d) => {
      val keys = supplier(s, d).filter(col("s_acctbal") > 5000).select(col("s_suppkey"))
      ordered(lineitem(s, d)
        .join(broadcast(keys), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_suppkey").as("supp"))
        .agg(count(lit(1)).as("n")))
    },
    Some("SELECT l_suppkey AS supp, CAST(count(*) AS BIGINT) AS n FROM lineitem " +
      "WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000) " +
      "GROUP BY 1" + OBA))

  // P10 email-validity predicate (mailchimp/src/members.rs:111-114) over
  // synthesized emails (testdata has no email column).
  val p10 = Q(
    (s, d) => {
      val withEmail = customer(s, d).select(col("c_custkey").as("cust_id"),
        F.synthEmail(col("c_name"), col("c_custkey")).as("email"))
      ordered(withEmail.filter(F.isValidEmail(col("email"))))
    },
    Some("SELECT cust_id, email FROM (SELECT c_custkey AS cust_id, " +
      "replace(lower(c_name), '#', '.') || (CASE WHEN c_custkey % 10 = 0 " +
      "THEN '@example.com' ELSE '@acme.org' END) AS email FROM customer) " +
      "WHERE email <> '' AND email NOT LIKE '%noemail.com' " +
      "AND email NOT LIKE '%example.com'" + OBA))

  // P11 row-level PII stripping: the conformed projection keeps only
  // non-PII columns (sync-app/migrations/20251227120001_remove_pii_
  // restrict_regions.sql; db/src/member.rs:216-226 address = user/state).
  val p11 = Q(
    (s, d) => ordered(customer(s, d).select(
      col("c_custkey").as("user_id"),
      col("c_nationkey").cast("long").as("state"))),
    Some("SELECT c_custkey AS user_id, CAST(c_nationkey AS BIGINT) AS state " +
      "FROM customer" + OBA))

  // ---------------------------------------------------------------- §2.3
  // J1 many-way assembly join (ddb/src/members.rs:303-338 ~20-way EAV
  // assembly) — fact lineitem widened with orders/customer/nation/region/
  // part/supplier; dims broadcast, fact never re-shuffled.
  val j1 = Q(
    (s, d) => {
      val li = lineitem(s, d).filter(
        col("l_shipdate") >= lit("2000-01-01").cast("date") &&
        col("l_shipdate") <= lit("2000-12-31").cast("date"))
      val df = li
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(nationB(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(regionB(s, d), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey").as("order_id"),
          col("l_linenumber").cast("long").as("line_no"),
          col("o_orderdate").as("order_date"),
          col("c_name").as("cust_name"), col("n_name").as("cust_nation"),
          col("r_name").as("cust_region"), col("p_name").as("part_name"),
          col("s_name").as("supp_name"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      ordered(df)
    },
    Some("SELECT l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS line_no, " +
      "o_orderdate AS order_date, c_name AS cust_name, n_name AS cust_nation, " +
      "r_name AS cust_region, p_name AS part_name, s_name AS supp_name, " +
      "l_extendedprice * (1.0 - l_discount) AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "JOIN part ON l_partkey = p_partkey " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "WHERE l_shipdate >= DATE '2000-01-01' AND l_shipdate <= DATE '2000-12-31'" + OBA))

  // J2 self-join with aliases (ddb/src/members.rs:309,314-315 — same dim
  // twice): nation as customer-nation and as supplier-nation.
  val j2 = Q(
    (s, d) => {
      val n1 = nation(s, d).select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      val n2 = nation(s, d).select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val df = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2001-06-01").cast("date"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("ck"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("sk"))
        .select(col("l_orderkey").as("order_id"),
          col("l_linenumber").cast("long").as("line_no"),
          col("cust_nation"), col("supp_nation"))
      ordered(df)
    },
    Some("SELECT l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS line_no, " +
      "n1.n_name AS cust_nation, n2.n_name AS supp_nation " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
      "JOIN supplier ON l_suppkey = s_suppkey " +
      "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
      "WHERE l_shipdate >= DATE '2001-06-01'" + OBA))

  // J3 compound/conditional join keys (ddb/src/members.rs:305-308).
  val j3 = Q(
    (s, d) => ordered(lineitem(s, d)
      .join(broadcast(part(s, d)),
        col("l_partkey") === col("p_partkey") && col("p_size") > 25 && col("l_quantity") > 30)
      .select(col("l_orderkey").as("order_id"),
        col("l_linenumber").cast("long").as("line_no"),
        col("p_name").as("part_name"), col("p_size").cast("long").as("size"))),
    Some("SELECT l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS line_no, " +
      "p_name AS part_name, CAST(p_size AS BIGINT) AS size " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey AND p_size > 25 " +
      "AND l_quantity > 30" + OBA))

  // J4 COALESCE-key join (ddb/src/leadership.rs:85-87).
  val j4 = Q(
    (s, d) => {
      val key = coalesce(when(col("user_id") === 0, lit(null)).otherwise(col("user_id")), lit(13))
      val c = customer(s, d)
      ordered(events(s, d)
        .join(c, c("c_custkey") === key)
        .select(col("event_id"), col("c_name").as("resolved_name")))
    },
    Some("SELECT event_id, c_name AS resolved_name FROM events JOIN customer " +
      "ON c_custkey = coalesce(nullif(user_id, 0), 13)" + OBA))

  // J5 scope semi-join with UNION ALL branches (ddb/src/members.rs:381-392).
  val j5 = Q(
    (s, d) => {
      val asia = nation(s, d).join(regionB(s, d),
          col("n_regionkey") === col("r_regionkey") && col("r_name") === "ASIA")
        .select(col("n_nationkey").as("scope_key"))
      val scope = asia.unionByName(
        s.range(1).select(lit(0).cast("int").as("scope_key")))
      ordered(customer(s, d)
        .join(broadcast(scope), col("c_nationkey") === col("scope_key"), "left_semi")
        .select(col("c_custkey").as("cust_id"), col("c_nationkey").cast("long").as("nation")))
    },
    Some("SELECT c_custkey AS cust_id, CAST(c_nationkey AS BIGINT) AS nation " +
      "FROM customer WHERE c_nationkey IN (" +
      "SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey " +
      "WHERE r_name = 'ASIA' UNION ALL SELECT 0)" + OBA))

  // J6 anti-join (ddb/src/members.rs:327,349 partner exclusion).
  val j6 = Q(
    (s, d) => ordered(customer(s, d)
      .join(orders(s, d).select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey").as("cust_id"), col("c_name").as("name"))),
    Some("SELECT c_custkey AS cust_id, c_name AS name FROM customer " +
      "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)" + OBA))

  // J7/A3 argmax-per-group: latest order per customer, deterministic
  // min-key tie-break (ddb/src/members.rs:421-430 + SURVEY §7.4.1).
  val j7 = Q(
    (s, d) => ordered(Dedup.keepOneByKey(orders(s, d),
        Seq(col("o_custkey")), Seq(col("o_orderdate").desc, col("o_orderkey").asc))
      .select(col("o_custkey").as("cust"), col("o_orderkey").as("latest_order"),
        col("o_orderdate").as("order_date"))),
    Some("SELECT o_custkey AS cust, o_orderkey AS latest_order, o_orderdate AS order_date " +
      "FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey " +
      "ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn FROM orders) WHERE rn = 1" + OBA))

  // J8 existence-flag left joins (ddb/src/members.rs:224-238).
  val j8 = Q(
    (s, d) => {
      val flags = orders(s, d).groupBy(col("o_custkey")).agg(
        max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("u"),
        max(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("o"))
      ordered(customer(s, d).join(flags, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey").as("cust_id"),
          coalesce(col("u") === 1, lit(false)).as("has_urgent"),
          coalesce(col("o") === 1, lit(false)).as("has_open")))
    },
    Some("SELECT c_custkey AS cust_id, coalesce(u = 1, FALSE) AS has_urgent, " +
      "coalesce(o = 1, FALSE) AS has_open FROM customer LEFT JOIN (" +
      "SELECT o_custkey, max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS u, " +
      "max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS o FROM orders GROUP BY 1) " +
      "ON c_custkey = o_custkey" + OBA))

  // J9 lookup join against a small broadcast dim (ddb/src/members.rs:538-558).
  val j9 = Q(
    (s, d) => ordered(lineitem(s, d)
      .join(broadcast(part(s, d).filter(col("p_brand") === "Brand#1")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("order_id"),
        col("l_linenumber").cast("long").as("line_no"), col("p_name").as("part_name"))),
    Some("SELECT l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS line_no, " +
      "p_name AS part_name FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "WHERE p_brand = 'Brand#1'" + OBA))

  // J10 FK-existence filter before load (sync-app/src/sync.rs:541-590).
  val j10 = Q(
    (s, d) => ordered(lineitem(s, d)
      .join(orders(s, d).filter(col("o_orderstatus") === "O").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey").as("order_id"), col("l_linenumber").cast("long").as("line_no"))),
    Some("SELECT l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS line_no " +
      "FROM lineitem WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey " +
      "AND o_orderstatus = 'O')" + OBA))

  // J11 dual-branch resolve + precedence (ddb/src/roles.rs:43-66).
  val j11 = Q(
    (s, d) => {
      val c = customer(s, d).select(col("c_custkey"), col("c_name"))
      val sup = supplier(s, d).select(col("s_suppkey"), col("s_name"))
      ordered(events(s, d)
        .join(c, col("user_id") === col("c_custkey"), "left")
        .join(broadcast(sup), col("user_id") === col("s_suppkey"), "left")
        .filter(col("c_custkey").isNotNull || col("s_suppkey").isNotNull)
        .select(col("event_id"),
          coalesce(col("s_name"), col("c_name")).as("resolved_name"),
          col("s_suppkey").isNotNull.as("is_supplier")))
    },
    Some("SELECT event_id, coalesce(s_name, c_name) AS resolved_name, " +
      "s_suppkey IS NOT NULL AS is_supplier FROM events " +
      "LEFT JOIN customer ON user_id = c_custkey " +
      "LEFT JOIN supplier ON user_id = s_suppkey " +
      "WHERE c_custkey IS NOT NULL OR s_suppkey IS NOT NULL" + OBA))

  // ---------------------------------------------------------------- §2.4
  // A1 canonical-row pick: min line per order (ddb/src/members.rs:240-258).
  // NOTE (l_orderkey, l_linenumber) is NOT unique in the testdata — the
  // full tie-break chain makes the pick total and deterministic
  // (SURVEY §7.4.1 documented-tie-break requirement).
  val a1 = Q(
    (s, d) => ordered(Dedup.keepOneByKey(lineitem(s, d),
        Seq(col("l_orderkey")),
        Seq(col("l_linenumber").asc, col("l_partkey").asc, col("l_suppkey").asc,
          col("l_quantity").asc))
      .select(col("l_orderkey").as("order_id"),
        col("l_linenumber").cast("long").as("line_no"), col("l_partkey").as("part"))),
    Some("SELECT l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS line_no, " +
      "l_partkey AS part FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey " +
      "ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity) AS rn FROM lineitem) " +
      "WHERE rn = 1" + OBA))

  // A2 flags rollup: MAX of booleans + GREATEST (ddb/src/members.rs:398-419).
  val a2 = Q(
    (s, d) => ordered(orders(s, d).groupBy(col("o_custkey").as("cust")).agg(
      (max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)) === 1).as("has_urgent"),
      max(col("o_orderdate")).as("last_order"),
      greatest(max(col("o_totalprice")), lit(100.0)).as("max_price_floor"))),
    Some("SELECT o_custkey AS cust, " +
      "max(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) = 1 AS has_urgent, " +
      "max(o_orderdate) AS last_order, greatest(max(o_totalprice), 100.0) AS max_price_floor " +
      "FROM orders GROUP BY 1" + OBA))

  // A4 DISTINCT projection (ddb/src/users.rs:58).
  val a4 = Q(
    (s, d) => ordered(customer(s, d)
      .select(col("c_nationkey").cast("long").as("nation"), col("c_mktsegment").as("segment"))
      .distinct()),
    Some("SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nation, " +
      "c_mktsegment AS segment FROM customer" + OBA))

  // A5/A8 unique-by over an ordered union of sources
  // (sync-app/src/sync.rs:497-514): orders-source beats events-source.
  val a5 = Q(
    (s, d) => {
      val src1 = orders(s, d).select(col("o_custkey").as("key"),
        lit("orders").as("src"), lit(0).as("rank"), col("o_orderkey").as("tie"))
      val src2 = events(s, d).select(col("user_id").as("key"),
        lit("events").as("src"), lit(1).as("rank"), col("event_id").as("tie"))
      ordered(Dedup.uniqueBy(src1.unionByName(src2), Seq(col("key")),
          col("rank"), Seq(col("tie")))
        .select(col("key"), col("src")))
    },
    Some("SELECT key, src FROM (SELECT *, row_number() OVER (PARTITION BY key " +
      "ORDER BY rank, tie) AS rn FROM (" +
      "SELECT o_custkey AS key, 'orders' AS src, 0 AS rank, o_orderkey AS tie FROM orders " +
      "UNION ALL SELECT user_id, 'events', 1, event_id FROM events)) WHERE rn = 1" + OBA))

  // A6 partition + priority merge (ddb/src/members.rs:41-55): per dedup
  // key, "regular" (BUILDING) beats "affiliate" (others); min-id tie-break.
  val a6 = Q(
    (s, d) => {
      val withKey = customer(s, d).select(
        (col("c_custkey") % 100).as("dedup_key"), col("c_custkey").as("cust_id"),
        col("c_mktsegment").as("segment"),
        when(col("c_mktsegment") === "BUILDING", 0).otherwise(1).as("prio"))
      ordered(Dedup.priorityMerge(withKey, Seq(col("dedup_key")),
          col("prio"), Seq(col("cust_id")))
        .select(col("dedup_key"), col("cust_id"), col("segment")))
    },
    Some("SELECT dedup_key, cust_id, segment FROM (SELECT *, row_number() OVER (" +
      "PARTITION BY dedup_key ORDER BY prio, cust_id) AS rn FROM (" +
      "SELECT c_custkey % 100 AS dedup_key, c_custkey AS cust_id, " +
      "c_mktsegment AS segment, CASE WHEN c_mktsegment = 'BUILDING' THEN 0 ELSE 1 END " +
      "AS prio FROM customer)) WHERE rn = 1" + OBA))

  // A7 set subtraction (mailchimp/src/members.rs:80-85).
  val a7 = Q(
    (s, d) => ordered(customer(s, d).select(col("c_custkey").as("cust_id"))
      .except(orders(s, d).select(col("o_custkey").as("cust_id")))),
    Some("SELECT c_custkey AS cust_id FROM customer " +
      "EXCEPT SELECT o_custkey FROM orders" + OBA))

  // A8+A10 union of heterogeneous sources + per-source stats.
  val a8 = Q(
    (s, d) => {
      val u = orders(s, d).select(col("o_custkey").as("key"), lit("orders").as("src"))
        .unionByName(events(s, d).select(col("user_id").as("key"), lit("events").as("src")))
      ordered(u.groupBy(col("key"), col("src")).agg(count(lit(1)).as("n")))
    },
    Some("SELECT key, src, CAST(count(*) AS BIGINT) AS n FROM (" +
      "SELECT o_custkey AS key, 'orders' AS src FROM orders " +
      "UNION ALL SELECT user_id, 'events' FROM events) GROUP BY key, src" + OBA))

  // A9 flat-map / explode (ddb/src/members.rs:783-794 brn explode).
  val a9 = Q(
    (s, d) => ordered(part(s, d).select(col("p_partkey").as("part_id"),
      explode(split(col("p_name"), " ")).as("word"))),
    Some("SELECT p_partkey AS part_id, unnest(string_split(p_name, ' ')) AS word " +
      "FROM part" + OBA))

  // A10 count/stat aggregation with exact cents arithmetic
  // (sync-app/src/sync.rs:11-28 stats emission).
  val a10 = Q(
    (s, d) => ordered(orders(s, d).groupBy(col("o_orderstatus").as("status")).agg(
      count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_cents"))),
    Some("SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n, " +
      "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents " +
      "FROM orders GROUP BY 1" + OBA))

  // A11 keyed-first (ddb/src/members.rs:550-557, deterministic variant:
  // FIRST event by (ts, id) — the reference's last-write-wins is
  // iteration-order-dependent, SURVEY §7.4.1).
  val a11 = Q(
    (s, d) => ordered(Dedup.keepOneByKey(events(s, d),
        Seq(col("user_id")), Seq(col("ts").asc, col("event_id").asc))
      .select(col("user_id"), col("event_type").as("first_type"),
        col("value").as("first_value"))),
    Some("SELECT user_id, event_type AS first_type, value AS first_value FROM (" +
      "SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn " +
      "FROM events) WHERE rn = 1" + OBA))

  // ---------------------------------------------------------------- §2.5
  // W2 deterministic ORDER BY + LIMIT top-k.
  val w2 = Q(
    (s, d) => ordered(lineitem(s, d)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(100)
      .select(col("l_orderkey").as("order_id"),
        col("l_linenumber").cast("long").as("line_no"), col("l_extendedprice").as("price"))),
    Some("SELECT * FROM (SELECT l_orderkey AS order_id, " +
      "CAST(l_linenumber AS BIGINT) AS line_no, l_extendedprice AS price FROM lineitem " +
      "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100)" + OBA))

  // W3 fetch_optional: first-row-or-none point lookup with deterministic
  // order (ddb/src/users.rs:99-108 — latest order of one customer).
  val w3 = Q(
    (s, d) => ordered(orders(s, d).filter(col("o_custkey") === 77)
      .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
      .limit(1)
      .select(col("o_orderkey").as("order_id"), col("o_orderdate").as("order_date"))),
    Some("SELECT * FROM (SELECT o_orderkey AS order_id, o_orderdate AS order_date " +
      "FROM orders WHERE o_custkey = 77 " +
      "ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 1)" + OBA))

  // W4 first element of a sorted collected list (ddb/src/members.rs:918).
  val w4 = Q(
    (s, d) => ordered(orders(s, d).groupBy(col("o_custkey").as("cust"))
      .agg(element_at(array_sort(collect_list(col("o_orderpriority"))), 1).as("first_prio"))),
    Some("SELECT o_custkey AS cust, list_sort(list(o_orderpriority))[1] AS first_prio " +
      "FROM orders GROUP BY 1" + OBA))

  // ---------------------------------------------------------------- §2.6
  // T1/T2 as-of validity over synthesized intervals (ddb/src/leadership.rs:
  // 104-121): start = order date, end = +90d, every 5th open-ended.
  private def asofQ(asofDate: String) = Q(
    (s, d) => {
      val iv = orders(s, d).select(col("o_orderkey").as("order_id"),
        col("o_orderdate").as("start_ts"),
        when(col("o_orderkey") % 5 === 0, lit(null).cast("timestamp"))
          .otherwise(col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("end_ts"))
      ordered(iv.filter(F.validAsOf(col("start_ts"), col("end_ts"),
        lit(asofDate).cast("date"))))
    },
    Some("SELECT * FROM (SELECT o_orderkey AS order_id, o_orderdate AS start_ts, " +
      "CASE WHEN o_orderkey % 5 = 0 THEN NULL " +
      "ELSE o_orderdate + INTERVAL 90 DAY END AS end_ts FROM orders) " +
      s"WHERE start_ts <= DATE '$asofDate' AND (end_ts IS NULL OR end_ts >= DATE '$asofDate')" + OBA))

  val t1 = asofQ(AsOf)
  val t2 = asofQ("1999-01-01")

  // T3 DateFilter::All — same interval table, no date predicate (full
  // history, ddb/src/leadership.rs:109; used by sync at sync.rs:486-494).
  val t3 = Q(
    (s, d) => ordered(orders(s, d).select(col("o_orderkey").as("order_id"),
      col("o_orderdate").as("start_ts"),
      when(col("o_orderkey") % 5 === 0, lit(null).cast("timestamp"))
        .otherwise(col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("end_ts"))),
    Some("SELECT o_orderkey AS order_id, o_orderdate AS start_ts, " +
      "CASE WHEN o_orderkey % 5 = 0 THEN NULL " +
      "ELSE o_orderdate + INTERVAL 90 DAY END AS end_ts FROM orders" + OBA))

  // T4 rolling window on the fact table (ddb/src/members.rs:344).
  val t4 = Q(
    (s, d) => ordered(lineitem(s, d)
      .filter(col("l_shipdate") <= lit(AsOf).cast("date") &&
        col("l_shipdate") >= add_months(lit(AsOf).cast("date"), -12))
      .select(col("l_orderkey").as("order_id"),
        col("l_linenumber").cast("long").as("line_no"), col("l_shipdate").as("ship"))),
    Some("SELECT l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS line_no, " +
      "l_shipdate AS ship FROM lineitem " +
      s"WHERE l_shipdate <= DATE '$AsOf' AND l_shipdate >= DATE '$AsOf' - INTERVAL 12 MONTH" + OBA))

  // T5 epoch→date + date-part formats (ddb/src/users.rs:64,
  // mailchimp/src/merge_fields.rs:292-306 birthday MM/dd render).
  val t5 = Q(
    (s, d) => ordered(events(s, d).select(col("event_id"),
      to_date(from_unixtime(col("event_id") * 86400)).as("epoch_date"),
      date_format(col("ts"), "yyyy-MM-dd").as("day"),
      date_format(col("ts"), "MM/dd").as("month_day"))),
    Some("SELECT event_id, (to_timestamp(event_id * 86400))::DATE AS epoch_date, " +
      "strftime(ts, '%Y-%m-%d') AS day, strftime(ts, '%m/%d') AS month_day " +
      "FROM events" + OBA))

  // ---------------------------------------------------------------- §2.7
  // F1 sha256 → url-safe-no-pad base64 stable id (db/src/user.rs:31-35).
  val f1 = Q(
    (s, d) => {
      val e = customer(s, d).select(col("c_custkey").as("cust_id"),
        F.synthEmail(col("c_name"), col("c_custkey")).as("email"))
      ordered(e.select(col("cust_id"), col("email"),
        F.idForEmail(col("email")).as("user_id_hash")))
    },
    Some("SELECT cust_id, email, replace(replace(rtrim(to_base64(unhex(sha256(" +
      "lower(trim(email))))), '='), '+', '-'), '/', '_') AS user_id_hash FROM (" +
      "SELECT c_custkey AS cust_id, replace(lower(c_name), '#', '.') || " +
      "(CASE WHEN c_custkey % 10 = 0 THEN '@example.com' ELSE '@acme.org' END) AS email " +
      "FROM customer)" + OBA))

  // F2 md5 member id (mailchimp/src/members.rs:107-109).
  val f2 = Q(
    (s, d) => {
      val e = customer(s, d).select(col("c_custkey").as("cust_id"),
        F.synthEmail(col("c_name"), col("c_custkey")).as("email"))
      ordered(e.select(col("cust_id"), F.memberIdForEmail(col("email")).as("member_id")))
    },
    Some("SELECT cust_id, md5(lower(email)) AS member_id FROM (" +
      "SELECT c_custkey AS cust_id, replace(lower(c_name), '#', '.') || " +
      "(CASE WHEN c_custkey % 10 = 0 THEN '@example.com' ELSE '@acme.org' END) AS email " +
      "FROM customer)" + OBA))

  // F4 CSV split + per-element trim (ddb/src/members.rs:1050-1058).
  val f4 = Q(
    (s, d) => {
      val csv = concat(col("c_mktsegment"), lit(" , "), col("c_name"))
      ordered(customer(s, d).select(col("c_custkey").as("cust_id"),
        explode(transform(split(csv, ","), t => trim(t))).as("item")))
    },
    Some("SELECT c_custkey AS cust_id, unnest(list_transform(string_split(" +
      "c_mktsegment || ' , ' || c_name, ','), x -> trim(x))) AS item FROM customer" + OBA))

  // F5 CAST family (ddb/src/members.rs:267-301, airstreams.rs:52-58).
  val f5 = Q(
    (s, d) => ordered(lineitem(s, d).select(
      col("l_orderkey").cast("string").as("order_key_str"),
      col("l_linenumber").cast("long").as("line_no"),
      floor(col("l_quantity")).cast("long").as("qty_int"),
      col("l_shipdate").cast("date").as("ship_day"))),
    Some("SELECT CAST(l_orderkey AS VARCHAR) AS order_key_str, " +
      "CAST(l_linenumber AS BIGINT) AS line_no, " +
      "CAST(floor(l_quantity) AS BIGINT) AS qty_int, " +
      "CAST(l_shipdate AS DATE) AS ship_day FROM lineitem" + OBA))

  // F7 enum decode maps (ddb/src/members.rs:622-710).
  val f7 = Q(
    (s, d) => ordered(orders(s, d).select(col("o_orderkey").as("order_id"),
      when(col("o_orderstatus") === "O", "open")
        .when(col("o_orderstatus") === "F", "finished")
        .when(col("o_orderstatus") === "P", "partial")
        .otherwise("unknown").as("status_label"),
      substring(col("o_orderpriority"), 1, 1).cast("long").as("prio_num"))),
    Some("SELECT o_orderkey AS order_id, CASE o_orderstatus WHEN 'O' THEN 'open' " +
      "WHEN 'F' THEN 'finished' WHEN 'P' THEN 'partial' ELSE 'unknown' END AS status_label, " +
      "CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num FROM orders" + OBA))

  // F8 typed merge-field rendering (mailchimp/src/merge_fields.rs:272-365):
  // Text stays text, Number stays numeric, Date → yyyy-MM-dd, Birthday →
  // MM/dd; None propagates (every 7th customer has no join date).
  val f8 = Q(
    (s, d) => {
      val joined = when(col("c_custkey") % 7 === 0, lit(null).cast("date"))
        .otherwise(date_add(lit("1995-01-01").cast("date"), (col("c_custkey") % 1000).cast("int")))
      ordered(customer(s, d).select(col("c_custkey").as("cust_id"),
        col("c_name").as("mf_name"),
        col("c_acctbal").as("mf_balance"),
        date_format(joined, "yyyy-MM-dd").as("mf_joined"),
        date_format(joined, "MM/dd").as("mf_birthday")))
    },
    Some("SELECT c_custkey AS cust_id, c_name AS mf_name, c_acctbal AS mf_balance, " +
      "strftime(joined, '%Y-%m-%d') AS mf_joined, strftime(joined, '%m/%d') AS mf_birthday " +
      "FROM (SELECT *, CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE " +
      "DATE '1995-01-01' + CAST(c_custkey % 1000 AS INT) END AS joined FROM customer)" + OBA))

  // F8b the full typed merge-field DISPATCH: (value × declared MergeType)
  // → one JSON object per member, declaration-ordered, null fields
  // skipped (F9), mismatches erroring at plan time
  // (mailchimp/src/merge_fields.rs:272-365). The oracle rebuilds the
  // exact Jackson byte stream: declared key order, decimal scale
  // preserved, date/birthday format dispatch, null keys dropped.
  val f8b = Q(
    (s, d) => {
      val joined = when(col("c_custkey") % 7 === 0, lit(null).cast("date"))
        .otherwise(date_add(lit("1995-01-01").cast("date"), (col("c_custkey") % 1000).cast("int")))
      val df = customer(s, d).select(col("c_custkey").as("cust_id"),
        col("c_name").as("name"),
        col("c_acctbal").cast("decimal(12,2)").as("bal"),
        joined.as("joined"),
        when(col("c_custkey") % 3 === 0, lit(null).cast("date"))
          .otherwise(joined).as("bday"),
        col("c_mktsegment").as("segment"))
      ordered(df.select(col("cust_id"),
        graft.functions.MergeFieldRender.mergeJson(df,
          graft.sources.MergeFieldCatalog.all, Map(
            "NAME" -> col("name"), "BAL" -> col("bal"), "JOINED" -> col("joined"),
            "BDAY" -> col("bday"), "SEGMENT" -> col("segment"))).as("merge_json")))
    },
    Some("SELECT cust_id, '{\"NAME\":\"' || name || '\"' || " +
      "CASE WHEN bal IS NULL THEN '' ELSE ',\"BAL\":' || CAST(bal AS VARCHAR) END || " +
      "CASE WHEN joined IS NULL THEN '' ELSE ',\"JOINED\":\"' || strftime(joined, '%Y-%m-%d') || '\"' END || " +
      "CASE WHEN bday IS NULL THEN '' ELSE ',\"BDAY\":\"' || strftime(bday, '%m/%d') || '\"' END || " +
      "',\"SEGMENT\":\"' || segment || '\"}' AS merge_json FROM (" +
      "SELECT c_custkey AS cust_id, c_name AS name, " +
      "CAST(c_acctbal AS DECIMAL(12,2)) AS bal, " +
      "CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE " +
      "DATE '1995-01-01' + CAST(c_custkey % 1000 AS INT) END AS joined, " +
      "CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE (CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE " +
      "DATE '1995-01-01' + CAST(c_custkey % 1000 AS INT) END) END AS bday, " +
      "c_mktsegment AS segment FROM customer)" + OBA))

  // F10 tag derivation: per-entity boolean tags exploded to rows
  // (ddb/src/members.rs:833-861).
  val f10 = Q(
    (s, d) => {
      val tags = array(
        struct(lit("building").as("tag"), (col("c_mktsegment") === "BUILDING").as("active")),
        struct(lit("machinery").as("tag"), (col("c_mktsegment") === "MACHINERY").as("active")),
        struct(lit("big_balance").as("tag"), (col("c_acctbal") > 5000.0).as("active")),
        struct(lit("debtor").as("tag"), (col("c_acctbal") < 0.0).as("active")))
      ordered(customer(s, d).select(col("c_custkey").as("cust_id"),
          explode(tags).as("t"))
        .select(col("cust_id"), col("t.tag").as("tag"), col("t.active").as("active")))
    },
    Some("SELECT c_custkey AS cust_id, 'building' AS tag, c_mktsegment = 'BUILDING' AS active FROM customer " +
      "UNION ALL SELECT c_custkey, 'machinery', c_mktsegment = 'MACHINERY' FROM customer " +
      "UNION ALL SELECT c_custkey, 'big_balance', c_acctbal > 5000.0 FROM customer " +
      "UNION ALL SELECT c_custkey, 'debtor', c_acctbal < 0.0 FROM customer" + OBA))

  // ---------------------------------------------------------------- §2.1
  // S8 upsert merge (db/src/user.rs:59-99): source wins on key conflict,
  // target survives otherwise, pure full-outer rewrite.
  val s8 = Q(
    (s, d) => {
      val target = customer(s, d).filter(col("c_custkey") < 1000)
        .select(col("c_custkey").as("cust_id"), col("c_mktsegment").as("segment"),
          col("c_acctbal").as("balance"))
      val source = customer(s, d).filter(col("c_custkey") >= 500 && col("c_custkey") < 1500)
        .select(col("c_custkey").as("cust_id"), lit("UPDATED").as("segment"),
          (col("c_acctbal") + 100.0).as("balance"))
      ordered(Merge.upsert(target, source, Seq("cust_id")))
    },
    Some("SELECT coalesce(s.cust_id, t.cust_id) AS cust_id, " +
      "CASE WHEN s.cust_id IS NOT NULL THEN s.segment ELSE t.segment END AS segment, " +
      "CASE WHEN s.cust_id IS NOT NULL THEN s.balance ELSE t.balance END AS balance FROM " +
      "(SELECT c_custkey AS cust_id, c_mktsegment AS segment, c_acctbal AS balance " +
      "FROM customer WHERE c_custkey < 1000) t FULL OUTER JOIN " +
      "(SELECT c_custkey AS cust_id, 'UPDATED' AS segment, c_acctbal + 100.0 AS balance " +
      "FROM customer WHERE c_custkey >= 500 AND c_custkey < 1500) s " +
      "ON t.cust_id = s.cust_id" + OBA))

  // S9 composite-key upsert with pre-dedup (db/src/club.rs:215-257):
  // source deduped on (supp, part) by min (orderkey, lineno) first.
  val s9 = Q(
    (s, d) => {
      val li = lineitem(s, d)
      val target = Dedup.keepOneByKey(li.filter(col("l_orderkey") < 5000),
          Seq(col("l_suppkey"), col("l_partkey")),
          Seq(col("l_orderkey").asc, col("l_linenumber").asc, col("l_quantity").asc))
        .select(col("l_suppkey").as("supp"), col("l_partkey").as("part"),
          col("l_quantity").as("qty"))
      val source = li.filter(col("l_orderkey") >= 5000 && col("l_orderkey") < 10000)
        .select(col("l_suppkey").as("supp"), col("l_partkey").as("part"),
          col("l_quantity").as("qty"), col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
      val deduped = Dedup.keepOneByKey(source, Seq(col("supp"), col("part")),
        Seq(col("ok").asc, col("ln").asc, col("qty").asc)).drop("ok", "ln")
      ordered(Merge.upsert(target, deduped, Seq("supp", "part")))
    },
    Some("WITH t AS (SELECT l_suppkey AS supp, l_partkey AS part, l_quantity AS qty FROM (" +
      "SELECT *, row_number() OVER (PARTITION BY l_suppkey, l_partkey " +
      "ORDER BY l_orderkey, l_linenumber, l_quantity) AS rn FROM lineitem WHERE l_orderkey < 5000) WHERE rn = 1), " +
      "src AS (SELECT l_suppkey AS supp, l_partkey AS part, l_quantity AS qty FROM (" +
      "SELECT *, row_number() OVER (PARTITION BY l_suppkey, l_partkey " +
      "ORDER BY l_orderkey, l_linenumber, l_quantity) AS rn FROM lineitem " +
      "WHERE l_orderkey >= 5000 AND l_orderkey < 10000) WHERE rn = 1) " +
      "SELECT coalesce(src.supp, t.supp) AS supp, coalesce(src.part, t.part) AS part, " +
      "CASE WHEN src.supp IS NOT NULL AND src.part IS NOT NULL THEN src.qty ELSE t.qty END AS qty " +
      "FROM t FULL OUTER JOIN src ON t.supp = src.supp AND t.part = src.part" + OBA))

  // S10 retain / anti-delete GC (db/src/lib.rs:16-76): orders surviving
  // the keep-set of positive-balance customers.
  val s10 = Q(
    (s, d) => {
      val keep = customer(s, d).filter(col("c_acctbal") > 0)
        .select(col("c_custkey").as("cust_id"))
      ordered(Merge.retain(
        orders(s, d).select(col("o_orderkey").as("order_id"), col("o_custkey").as("cust_id")),
        keep, Seq("cust_id")))
    },
    Some("SELECT o_orderkey AS order_id, o_custkey AS cust_id FROM orders " +
      "WHERE EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey " +
      "AND c_acctbal > 0)" + OBA))

  // S12 audience retain deletes with status exemption
  // (mailchimp/src/members.rs:68-97: Cleaned members never deleted).
  val s12 = Q(
    (s, d) => {
      val keep = orders(s, d).select(col("o_custkey").as("user_id"))
      ordered(Merge.retainDeletes(
        events(s, d).select(col("event_id"), col("user_id"), col("event_type")),
        keep, Seq("user_id"), exempt = Some(col("event_type") === "error")))
    },
    Some("SELECT event_id, user_id, event_type FROM events " +
      "WHERE event_type <> 'error' AND NOT EXISTS (" +
      "SELECT 1 FROM orders WHERE o_custkey = user_id)" + OBA))

  // S14 schema diff/sync (mailchimp/src/merge_fields.rs:51-101): declared
  // catalog vs live schema → add / delete / update partitions.
  val s14 = Q(
    (s, d) => {
      val declared = part(s, d).filter(col("p_size") <= 25)
        .select(col("p_type").as("tag")).distinct()
      val live = part(s, d).filter(col("p_size") >= 20)
        .select(col("p_type").as("tag")).distinct()
      val dj = declared.select(col("tag"), lit(1).as("dec"))
        .join(live.select(col("tag"), lit(1).as("liv")), Seq("tag"), "full_outer")
      ordered(dj.select(col("tag"),
        when(col("liv").isNull, "add").when(col("dec").isNull, "delete")
          .otherwise("keep").as("action")))
    },
    Some("SELECT coalesce(d.tag, l.tag) AS tag, CASE WHEN l.tag IS NULL THEN 'add' " +
      "WHEN d.tag IS NULL THEN 'delete' ELSE 'keep' END AS action FROM " +
      "(SELECT DISTINCT p_type AS tag FROM part WHERE p_size <= 25) d FULL OUTER JOIN " +
      "(SELECT DISTINCT p_type AS tag FROM part WHERE p_size >= 20) l ON d.tag = l.tag" + OBA))

  // EAV1 wide→EAV explosion: the Drupal storage model (SURVEY §1.1) —
  // one (entity_id, field, value) row per attribute.
  val eav1 = Q(
    (s, d) => {
      val triplets = array(
        struct(lit("name").as("field"), col("c_name").as("value")),
        struct(lit("segment").as("field"), col("c_mktsegment").as("value")),
        struct(lit("nation").as("field"), col("c_nationkey").cast("string").as("value")))
      ordered(customer(s, d)
        .select(col("c_custkey").as("entity_id"), explode(triplets).as("t"))
        .select(col("entity_id"), col("t.field").as("field"), col("t.value").as("value")))
    },
    Some("SELECT c_custkey AS entity_id, 'name' AS field, c_name AS value FROM customer " +
      "UNION ALL SELECT c_custkey, 'segment', c_mktsegment FROM customer " +
      "UNION ALL SELECT c_custkey, 'nation', CAST(c_nationkey AS VARCHAR) FROM customer" + OBA))

  // EAV2 assembly: EAV triplets back to a wide typed record — the core
  // extract pattern of the reference (ddb/src/members.rs:303-338 builds
  // wide members from one-table-per-attribute via ~20 joins; conditional
  // aggregation is the shuffle-minimal Spark equivalent: ONE hash
  // shuffle on entity_id instead of N self-joins).
  val eav2 = Q(
    (s, d) => {
      val triplets = array(
        struct(lit("name").as("field"), col("c_name").as("value")),
        struct(lit("segment").as("field"), col("c_mktsegment").as("value")),
        struct(lit("nation").as("field"), col("c_nationkey").cast("string").as("value")))
      val eav = customer(s, d)
        .select(col("c_custkey").as("entity_id"), explode(triplets).as("t"))
        .select(col("entity_id"), col("t.field").as("field"), col("t.value").as("value"))
      ordered(eav.groupBy(col("entity_id")).agg(
        max(when(col("field") === "name", col("value"))).as("name"),
        max(when(col("field") === "segment", col("value"))).as("segment"),
        max(when(col("field") === "nation", col("value"))).cast("long").as("nation")))
    },
    Some("WITH eav AS (SELECT c_custkey AS entity_id, 'name' AS field, c_name AS value " +
      "FROM customer UNION ALL SELECT c_custkey, 'segment', c_mktsegment FROM customer " +
      "UNION ALL SELECT c_custkey, 'nation', CAST(c_nationkey AS VARCHAR) FROM customer) " +
      "SELECT entity_id, max(CASE WHEN field = 'name' THEN value END) AS name, " +
      "max(CASE WHEN field = 'segment' THEN value END) AS segment, " +
      "CAST(max(CASE WHEN field = 'nation' THEN value END) AS BIGINT) AS nation " +
      "FROM eav GROUP BY entity_id" + OBA))

  /** Relational (reference-parity) section of the catalog. */
  val entries: Seq[(String, Q)] = Seq(
    "p1_wide_projection" -> p1, "p2_bool_projection" -> p2,
    "p3_coalesce_default" -> p3, "p4_status_filter" -> p4,
    "p5_inlist_filter" -> p5, "p6_date_window" -> p6,
    "p7_null_guard" -> p7, "p8_point_lookup" -> p8,
    "p9_dynamic_inset" -> p9, "p10_email_validity" -> p10,
    "p11_pii_strip" -> p11,
    "j1_assembly_join" -> j1, "j2_selfjoin_alias" -> j2,
    "j3_multicond_join" -> j3, "j4_coalesce_key_join" -> j4,
    "j5_scope_semijoin" -> j5, "j6_anti_join" -> j6,
    "j7_argmax_latest" -> j7, "j8_existence_flags" -> j8,
    "j9_broadcast_lookup" -> j9, "j10_fk_filter" -> j10,
    "j11_dual_resolve" -> j11,
    "a1_minpick_dedup" -> a1, "a2_flags_rollup" -> a2,
    "a4_distinct" -> a4, "a5_unique_by" -> a5,
    "a6_priority_dedup" -> a6, "a7_except" -> a7,
    "a8_union_stats" -> a8, "a9_explode" -> a9,
    "a10_stats_agg" -> a10, "a11_keyed_first" -> a11,
    "w2_topk_order_limit" -> w2, "w3_point_first" -> w3,
    "w4_first_sorted" -> w4,
    "t1_asof_current" -> t1, "t2_asof_param" -> t2,
    "t3_full_history" -> t3, "t4_rolling_window" -> t4,
    "t5_epoch_formats" -> t5,
    "f1_email_id_hash" -> f1, "f2_md5_member_id" -> f2,
    "f4_split_trim" -> f4, "f5_cast_family" -> f5,
    "f7_enum_decode" -> f7, "f8_merge_field_render" -> f8,
    "f8b_typed_dispatch" -> f8b, "f10_tag_derivation" -> f10,
    "s8_upsert_merge" -> s8, "s9_composite_upsert" -> s9,
    "s10_retain_gc" -> s10, "s12_audience_retain" -> s12,
    "s14_schema_diff" -> s14,
    "eav1_explode" -> eav1, "eav2_assembly" -> eav2)
}
