package graft

/** Keeps the human-facing operator counts derived from `Catalog.all`
  * so they can never drift again (rounds 7-8 shipped a stale "110"
  * while the catalog had 112). */
class CatalogDocSpec extends SparkSpec {

  private def firstLine(path: String): String = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().next() finally src.close()
  }

  test("docs/catalog.md headline count equals Catalog.all.size") {
    val n = Catalog.all.size
    val head = firstLine("docs/catalog.md")
    assert(head.contains(s"($n operators") && head.contains(s"all $n "),
      s"catalog.md header out of sync with Catalog.all ($n): $head")
  }

  test("README operator count equals Catalog.all.size") {
    val n = Catalog.all.size
    val src = scala.io.Source.fromFile("README.md", "UTF-8")
    val txt = try src.mkString finally src.close()
    assert(txt.contains(s"$n operators"),
      s"README.md does not mention '$n operators'")
    // and no stale smaller count survives anywhere in the README
    val stale = "\\b(\\d{2,3}) operators\\b".r
      .findAllMatchIn(txt).map(_.group(1).toInt).filter(_ != n).toSeq
    assert(stale.isEmpty, s"stale operator counts in README: $stale")
  }

  test("every catalog query has an oracle or a documented reason not to") {
    val noOracle = Catalog.all.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty,
      s"queries without DuckDB oracle (driver downgrades to rows-only): $noOracle")
  }

  test("catalog names are unique and q_-prefixed") {
    val names = Catalog.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(names.forall(_.startsWith("q_")))
  }
}
