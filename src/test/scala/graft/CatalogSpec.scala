package graft

import graft.operators.Catalog
import graft.operators.Catalog._

/** Catalog filter semantics (ref getAllStreamsRequest.ts:20-69):
  * smart-case Contains, case-insensitive StartsWith, ContainsAny over
  * array columns, Include/Exclude lists, naive full-text Search.
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val streams = Seq(
    ("s1", "Market Trades", "live", Seq("prod", "options")),
    ("s2", "market quotes", "live", Seq("prod")),
    ("s3", "News Feed", "paused", Seq("beta")),
    ("s4", "internal metrics", "stopped", Seq("infra", "beta"))
  ).toDF("id", "name", "status", "labels")

  test("Contains is smart-case: lowercase pattern matches any case, capitalized is exact-case") {
    Catalog.search(streams, Seq(Contains("name", "market"))).count() shouldBe 2
    Catalog.search(streams, Seq(Contains("name", "Market"))).count() shouldBe 1
  }

  test("StartsWith is always case-insensitive (ref getAllStreamsRequest.ts:24-62)") {
    Catalog.search(streams, Seq(StartsWith("name", "MARKET"))).count() shouldBe 2
    Catalog.search(streams, Seq(StartsWith("name", "news"))).count() shouldBe 1
  }

  test("Equals / Include / Exclude on status") {
    Catalog.search(streams, Seq(Equals("status", "live"))).count() shouldBe 2
    Catalog.search(streams, Seq(Include("status", Seq("live", "paused")))).count() shouldBe 3
    Catalog.search(streams, Seq(Exclude("status", Seq("stopped")))).count() shouldBe 3
  }

  test("ContainsAny overlaps an array column against a value list") {
    Catalog.search(streams, Seq(ContainsAny("labels", Seq("options", "infra"))))
      .collect().map(_.getString(0)).sorted.toSeq shouldBe Seq("s1", "s4")
  }

  test("Search spans multiple columns with smart-case") {
    Catalog.search(streams, Seq(Search(Seq("name", "status"), "feed"))).count() shouldBe 1
    Catalog.search(streams, Seq(Search(Seq("name", "status"), "live"))).count() shouldBe 2
  }

  test("UnderLocation matches the subtree, not sibling prefixes (ref streamLocation.ts:16-28)") {
    val located = Seq(
      ("a", "/cars/gt3"), ("b", "/cars/gt3/telemetry"),
      ("c", "/cars/gt3x"), ("d", "/cars")).toDF("id", "location")
    Catalog.search(located, Seq(UnderLocation("location", "/cars/gt3")))
      .collect().map(_.getString(0)).sorted.toSeq shouldBe Seq("a", "b")
    Catalog.search(located, Seq(UnderLocation("location", "/cars/")))
      .count() shouldBe 4 // trailing slash normalized
  }

  test("filters compose conjunctively; empty filter list is identity") {
    Catalog.search(streams, Seq(
      Contains("name", "market"), Equals("status", "live"))).count() shouldBe 2
    Catalog.search(streams, Nil).count() shouldBe 4
  }
}
