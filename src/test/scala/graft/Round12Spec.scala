package graft

import graft.report.HtmlReport

/** Round-12 opening wave: pins the ADVICE fixes — datasheet metric
  * formatting decided by metric NAME (not the value's floor
  * equality), and the shared gram derivation reused by the blocked
  * near-dup variant (covered by the dedup_ngram_blocked oracle; the
  * carry-column refactor is pinned there). */
class Round12Spec extends SparkSpec {

  test("datasheetHtml keeps float style for float metrics that land " +
      "on integral values, integer style for count metrics") {
    val rows = Seq(
      ("quality", "en", "avg_quality", 1.0), // integral VALUE, float METRIC
      ("quality", "de", "avg_quality", 0.83112),
      ("corpus", "web", "n_docs", 12345.0),
      ("domains", "site1.com", "is_hot", 1.0),
      ("corpus", "web", "doc_share", 0.25))
    val html = HtmlReport.datasheetHtml(rows)
    // avg_quality=1.0 must render in the same %.5g style as its
    // column-mates, not flip to the integer "1"
    assert(html.contains("<td>1.0000</td>"),
      "integral-valued float metric must keep float formatting")
    assert(html.contains("<td>0.83112</td>"))
    // count metrics render as grouped integers
    assert(html.contains("<td>12,345</td>"))
    assert(html.contains("<td>1</td>"))
    assert(html.contains("<td>25.0%</td>"))
  }
}
