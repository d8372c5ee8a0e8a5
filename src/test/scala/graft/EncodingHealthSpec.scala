package graft

import graft.ops.TextStats

/** Encoding-health: planted replacement chars, control bytes, and
  * mojibake digraphs must be counted exactly; clean text must not. */
class EncodingHealthSpec extends SparkSpec {

  import spark.implicits._

  test("encodingHealth counts planted corruption per class and " +
      "leaves clean docs at zero") {
    val docs = Seq(
      // clean ASCII
      ("en", "the quick brown fox"),
      // replacement char (decoder already gave up)
      ("en", "broken � decode � here"),
      // C0 control bleed-through (NOT \t\n\r, which are legal)
      ("en", "binarymixedin"),
      // legal whitespace controls must NOT count
      ("en", "tab\there\nnewline\rcr"),
      // mojibake: é seen through a Latin-1 decode, curly quote too
      ("fr", "cafÃ© and â€œquotedâ€"),
      // legit accented text is NOT mojibake
      ("fr", "café résumé naïve"),
      // non-ASCII heavy
      ("zh", "中文文本没有损坏"))
      .toDF("lang", "text")
    val out = TextStats.encodingHealth(docs, "text", "lang")
      .collect().map(r => r.getString(0) -> r).toMap

    val en = out("en")
    assert(en.getLong(en.fieldIndex("n_docs")) === 4L)
    assert(en.getLong(en.fieldIndex("repl_docs")) === 1L)
    assert(en.getLong(en.fieldIndex("ctrl_docs")) === 1L,
      "tab/newline/cr must not count as control corruption")
    assert(en.getLong(en.fieldIndex("moji_docs")) === 0L)

    val fr = out("fr")
    assert(fr.getLong(fr.fieldIndex("moji_docs")) === 1L,
      "Ã©/â€ digraphs are mojibake; café/résumé are not")
    assert(fr.getLong(fr.fieldIndex("repl_docs")) === 0L)

    val zh = out("zh")
    assert(zh.getDouble(zh.fieldIndex("nonascii_ratio")) === 1.0,
      "all-CJK doc is 100% non-ASCII")
    assert(zh.getLong(zh.fieldIndex("ctrl_docs")) === 0L)
    // ASCII rows: only the corrupted markers are non-ASCII
    assert(en.getDouble(en.fieldIndex("nonascii_ratio")) < 0.1)
  }
}
