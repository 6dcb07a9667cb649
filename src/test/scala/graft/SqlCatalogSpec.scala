package graft

/** The published SQL-function catalog must match the live registry:
  * every graft-registered function documented, the committed markdown
  * byte-identical to a fresh render. */
class SqlCatalogSpec extends SparkSpec {

  test("every registered graft function has a catalog description") {
    val undocumented = SqlCatalog.registered(spark)
      .map(_._1).filterNot(SqlCatalog.descriptions.contains)
    assert(undocumented.isEmpty,
      s"functions missing from SqlCatalog.descriptions: $undocumented")
  }

  test("no stale catalog entries for unregistered functions") {
    val live = SqlCatalog.registered(spark).map(_._1).toSet
    val stale = SqlCatalog.descriptions.keys.filterNot(live.contains)
    assert(stale.isEmpty, s"descriptions for unregistered functions: $stale")
  }

  test("docs/SQL_FUNCTIONS.md is in sync with the registry") {
    val committed = java.nio.file.Files.readString(
      java.nio.file.Paths.get("docs/SQL_FUNCTIONS.md"))
    assert(committed == SqlCatalog.render(spark),
      "docs/SQL_FUNCTIONS.md drifted — run `sbt \"runMain graft.SqlCatalog\"`")
  }
}
