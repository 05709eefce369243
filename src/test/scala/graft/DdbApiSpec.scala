package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries._

/** The named reference-mirroring query API (SURVEY §7.1.4): every public
  * fn of ddb/src/{users,clubs,regions,leadership,roles,airstreams,
  * addresses,races,standing_committees,members}.rs has a Spark twin with
  * a matching signature; this suite calls each one on sf0.001. */
class DdbApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("Users.{all, byUid, byEmail}") {
    val all = Users.all(spark, d)
    assert(all.count() > 0)
    assert(all.columns.toSeq == Seq("uid", "email", "first_name", "last_name",
      "active", "last_login"))
    assert(Users.byUid(spark, d, 1L).count() == 1)
    val email = all.orderBy("uid").select("email").first().getString(0)
    assert(Users.byEmail(spark, d, email).count() == 1)
  }

  test("Clubs / Regions: all, byUid, byNumber") {
    assert(Clubs.all(spark, d).count() == 25)
    assert(Clubs.byUid(spark, d, 7L).count() == 1)
    assert(Clubs.byNumber(spark, d, 107L).select("uid").first().getLong(0) == 7L)
    assert(Regions.all(spark, d).count() == 5)
    assert(Regions.byUid(spark, d, 2L).count() == 1)
    assert(Regions.byNumber(spark, d, 12L).select("uid").first().getLong(0) == 2L)
  }

  test("Leadership.forX across scopes and DateFilters") {
    val allClubs = Leadership.forAllClubs(spark, d, DateFilter.All)
    val current = Leadership.forAllClubs(spark, d) // Current default
    val asOf = Leadership.forAllClubs(spark, d, DateFilter.AsOf("1996-01-01"))
    assert(allClubs.count() > 0)
    assert(current.count() <= allClubs.count())
    assert(asOf.count() <= allClubs.count())
    // scoped variants are subsets of the all-scope plan
    val club = allClubs.select("entity_uid").first().getLong(0)
    assert(Leadership.forClub(spark, d, club, DateFilter.All).count() > 0)
    assert(Leadership.forRegion(spark, d, 0L, DateFilter.All).count() ==
      Leadership.forAllRegions(spark, d, DateFilter.All)
        .filter(col("entity_uid") === 0L).count())
    assert(Leadership.forClubByNumber(spark, d, club + 100, DateFilter.All).count() ==
      Leadership.forClub(spark, d, club, DateFilter.All).count())
    assert(Leadership.forRegionByNumber(spark, d, 10L, DateFilter.All).count() ==
      Leadership.forRegion(spark, d, 0L, DateFilter.All).count())
    // remaining scopes exercise without error (may be empty at sf0.001)
    Leadership.forInternational(spark, d, DateFilter.All).count()
    Leadership.forAllStandingCommittees(spark, d, DateFilter.All).count()
    Leadership.forStandingCommittee(spark, d, 900L, DateFilter.All).count()
  }

  test("StandingCommittees, Races, Roles, Airstreams, Addresses") {
    StandingCommittees.all(spark, d).count()
    StandingCommittees.byUid(spark, d, 900L).count()
    assert(Races.all(spark, d).count() == 5) // one per segment
    Roles.all(spark, d).count()
    Roles.micrositeAdmins(spark, d).count()
    val as = Airstreams.all(spark, d)
    assert(as.count() > 0)
    val someUser = as.select("user_id").first().getLong(0)
    assert(Airstreams.byUserId(spark, d, someUser).count() > 0)
    assert(Addresses.all(spark, d).count() > 0)
    assert(Addresses.byUserId(spark, d, 1L).count() == 1)
  }

  test("Members point lookups (byUid, byEmail) ride the composed plan") {
    val m = Members.all(spark, d)
    val uid = m.orderBy("uid").select("uid").first().getLong(0)
    assert(Members.byUid(spark, d, uid).count() == 1)
    val email = m.orderBy("uid").select("email").first().getString(0)
    assert(Members.byEmail(spark, d, email).count() == 1)
  }
}
