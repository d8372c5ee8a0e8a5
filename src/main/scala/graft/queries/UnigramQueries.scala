package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.det.Sig
import graft.ops.UnigramLm
import Shared.t

/** Unigram-LM tokenizer queries (round 12): the SentencePiece-style
  * hard-EM trainer ([[graft.ops.UnigramLm]]) with the DuckDB oracle
  * replaying the ENTIRE pipeline — seed statistics, the Viterbi DP
  * (unrolled to [[graft.ops.UnigramLm.MaxWordLen]] position CTEs
  * with the identical (score desc, start asc) tie-break), the
  * backtrack, and the M-step — so the chosen segmentations, not
  * just their scores, are pinned value-level. */
object UnigramQueries {

  private def sig(x: String) = Sig.sql(x)

  private val MaxP = UnigramLm.MaxPieceLen
  private val MaxL = UnigramLm.MaxWordLen
  val MinCount = 2L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the trained vocabulary after one hard-EM step: piece counts
    // from the Viterbi segmentations, single chars floored (closure)
    "text_unigram_train" -> ((s, dir) =>
      UnigramLm.train(t(s, dir, "documents"), "doc_id", "text",
        MinCount).orderBy("piece")),
    // the SECOND hard-EM step — the trajectory, not just one
    // M-step, is oracle-pinned (the BPE-trainer replay standard)
    "text_unigram_train2" -> ((s, dir) =>
      UnigramLm.train(t(s, dir, "documents"), "doc_id", "text",
        MinCount, iters = 2).orderBy("piece")),
    // the tokenizer's OOV diagnostic: multi-char words ranked by
    // per-word fertility (1.0 = pure character fallback) — the
    // worst-served-words table a tokenizer owner reads first
    "text_unigram_oov" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      UnigramLm.worstServed(docs, "doc_id", "text",
        UnigramLm.train(docs, "doc_id", "text", MinCount))
    }),
    // per-LANGUAGE fertility under the trained vocabulary — which
    // languages the tokenizer serves worst (the SentencePiece
    // fairness table); the encode stats rolled up by the lang column
    "text_unigram_by_lang" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val enc = UnigramLm.encodeStats(docs, "doc_id", "text",
        UnigramLm.train(docs, "doc_id", "text", MinCount))
      docs.select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("lang"))
        .join(enc, Seq("doc_id"))
        .groupBy("lang")
        .agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_docs"),
          org.apache.spark.sql.functions.sum("n_words").cast("long")
            .as("n_words"),
          org.apache.spark.sql.functions.sum("n_pieces").cast("long")
            .as("n_pieces"),
          graft.det.Sig.sig5(
            org.apache.spark.sql.functions.sum("n_pieces")
              .cast("double") /
            org.apache.spark.sql.functions.sum("n_words"))
            .as("fertility"))
        .orderBy("lang")
    }),
    // per-doc encoding stats under the trained vocabulary —
    // tokenizer fertility, the number a pipeline owner compares
    // against the BPE twin before picking a tokenizer
    "text_unigram_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      UnigramLm.encodeStats(docs, "doc_id", "text",
        UnigramLm.train(docs, "doc_id", "text", MinCount))
    }))

  private val wordsCte: String =
    s"""wrds AS MATERIALIZED (
       |  SELECT w AS word, count(*) AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w
       |    FROM documents)
       |  WHERE length(w) BETWEEN 1 AND $MaxL GROUP BY w)""".stripMargin

  private val spansCte: String =
    s"""spn AS (SELECT word, cnt, se.s AS s, se.e AS e,
       |  substr(word, se.s + 1, se.e - se.s) AS piece
       |  FROM wrds, unnest(flatten(list_transform(
       |    range(0, length(word)),
       |    s -> list_transform(
       |      range(s + 1, least(s + $MaxP, length(word)) + 1),
       |      e -> {'s': s, 'e': e})))) u(se))""".stripMargin

  private val seedCtes: String =
    s"""v0c AS (SELECT piece, sum(cnt) AS cnt FROM spn GROUP BY piece
       |  HAVING sum(cnt) >= $MinCount OR length(piece) = 1),
       |v0t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM v0c),
       |v0 AS MATERIALIZED (SELECT piece, cnt,
       |  ${sig("ln(CAST(cnt AS DOUBLE) / tot)")} AS lp
       |  FROM v0c, v0t)""".stripMargin

  /** The unrolled Viterbi chain under vocabulary CTE `vocab`:
    * `${pfx}pc` candidates, `${pfx}cb$k` cumulative best-score
    * tables, `${pfx}st$k` backtrack steps, `${pfx}segs` the chosen
    * (word, cnt, piece) rows. Cumulative names avoid the b/B
    * case-insensitive CTE collision. */
  private def dpCtes(pfx: String, vocab: String): String = {
    val pc =
      s"""${pfx}pc AS MATERIALIZED (SELECT sp.word, sp.s, sp.e, v.lp
         |  FROM spn sp JOIN $vocab v USING (piece))""".stripMargin
    val b0 = s"${pfx}cb0 AS (SELECT word, 0 AS pos, " +
      "CAST(0.0 AS DOUBLE) AS sc, -1 AS pv FROM wrds)"
    val steps = (1 to MaxL).map { k =>
      s"""${pfx}nb$k AS MATERIALIZED (SELECT word, $k AS pos, sc, pv
         |  FROM (
         |  SELECT c.word, b.sc + c.lp AS sc, c.s AS pv,
         |    row_number() OVER (PARTITION BY c.word
         |      ORDER BY b.sc + c.lp DESC, c.s ASC) AS rn
         |  FROM ${pfx}pc c JOIN ${pfx}cb${k - 1} b
         |    ON b.word = c.word AND b.pos = c.s
         |  WHERE c.e = $k) WHERE rn = 1),
         |${pfx}cb$k AS (SELECT * FROM ${pfx}cb${k - 1}
         |  UNION ALL SELECT * FROM ${pfx}nb$k)""".stripMargin
    }
    val st0 =
      s"${pfx}st0 AS (SELECT word, cnt, length(word) AS pos FROM wrds)"
    val back = (1 to MaxL).map { k =>
      s"""${pfx}st$k AS (SELECT s.word, s.cnt, b.pv AS pos,
         |  substr(s.word, b.pv + 1, s.pos - b.pv) AS piece
         |  FROM ${pfx}st${k - 1} s JOIN ${pfx}cb$MaxL b
         |    ON b.word = s.word AND b.pos = s.pos
         |  WHERE s.pos > 0)""".stripMargin
    }
    val segs = s"${pfx}segs AS MATERIALIZED (" +
      (1 to MaxL).map(k => s"SELECT word, cnt, piece FROM ${pfx}st$k")
        .mkString(" UNION ALL ") + ")"
    (Seq(pc, b0) ++ steps ++ Seq(st0) ++ back ++ Seq(segs))
      .mkString(",\n")
  }

  /** M-step: counts from `${pfx}segs`, single chars (from the SEED
    * vocabulary — the stable closure set) floored at 1; emits CTE
    * `$out`. */
  private def emCtes(pfx: String, out: String): String =
    s"""${pfx}chr1 AS (SELECT piece FROM v0 WHERE length(piece) = 1),
       |${pfx}used AS (SELECT piece, sum(cnt) AS c FROM ${pfx}segs
       |         GROUP BY piece),
       |${out}c AS (SELECT coalesce(u.piece, ch.piece) AS piece,
       |  CASE WHEN length(coalesce(u.piece, ch.piece)) = 1
       |    THEN greatest(coalesce(c, 0), 1) ELSE c END AS cnt
       |  FROM ${pfx}used u FULL JOIN ${pfx}chr1 ch
       |    ON ch.piece = u.piece),
       |${out}t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot
       |  FROM ${out}c),
       |$out AS MATERIALIZED (SELECT piece, cnt,
       |  ${sig("ln(CAST(cnt AS DOUBLE) / tot)")} AS lp
       |  FROM ${out}c, ${out}t)""".stripMargin

  val textUnigramTrainSql: String =
    s"""WITH $wordsCte,
       |$spansCte,
       |$seedCtes,
       |${dpCtes("t_", "v0")},
       |${emCtes("t_", "v2")}
       |SELECT piece, CAST(cnt AS BIGINT) AS cnt, lp AS logp
       |FROM v2 ORDER BY piece""".stripMargin

  val textUnigramTrain2Sql: String =
    s"""WITH $wordsCte,
       |$spansCte,
       |$seedCtes,
       |${dpCtes("t_", "v0")},
       |${emCtes("t_", "v2")},
       |${dpCtes("u_", "v2")},
       |${emCtes("u_", "v3")}
       |SELECT piece, CAST(cnt AS BIGINT) AS cnt, lp AS logp
       |FROM v3 ORDER BY piece""".stripMargin

  val textUnigramEncodeSql: String =
    s"""WITH $wordsCte,
       |$spansCte,
       |$seedCtes,
       |${dpCtes("t_", "v0")},
       |${emCtes("t_", "v2")},
       |${dpCtes("e_", "v2")},
       |pw AS (SELECT word, count(*) AS np FROM e_segs
       |       GROUP BY word),
       |dw AS (SELECT doc_id, w AS word FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM documents)
       |  WHERE length(w) BETWEEN 1 AND $MaxL),
       |enc AS (SELECT doc_id, count(*) AS nw, sum(np) AS npc
       |        FROM dw JOIN pw USING (word) GROUP BY doc_id)
       |SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
       |CAST(npc AS BIGINT) AS n_pieces,
       |${sig("CAST(npc AS DOUBLE) / nw")} AS fertility
       |FROM enc ORDER BY doc_id""".stripMargin

  val textUnigramByLangSql: String =
    s"""WITH $wordsCte,
       |$spansCte,
       |$seedCtes,
       |${dpCtes("t_", "v0")},
       |${emCtes("t_", "v2")},
       |${dpCtes("e_", "v2")},
       |pw AS (SELECT word, count(*) AS np FROM e_segs
       |       GROUP BY word),
       |dw AS (SELECT doc_id, w AS word FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM documents)
       |  WHERE length(w) BETWEEN 1 AND $MaxL),
       |enc AS (SELECT doc_id, count(*) AS nw, sum(np) AS npc
       |        FROM dw JOIN pw USING (word) GROUP BY doc_id)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |CAST(sum(nw) AS BIGINT) AS n_words,
       |CAST(sum(npc) AS BIGINT) AS n_pieces,
       |${sig("CAST(sum(npc) AS DOUBLE) / sum(nw)")} AS fertility
       |FROM enc JOIN documents USING (doc_id)
       |GROUP BY lang ORDER BY lang""".stripMargin

  val textUnigramOovSql: String =
    s"""WITH $wordsCte,
       |$spansCte,
       |$seedCtes,
       |${dpCtes("t_", "v0")},
       |${emCtes("t_", "v2")},
       |${dpCtes("e_", "v2")},
       |pw AS (SELECT s.word, max(w.cnt) AS cnt, count(*) AS np
       |       FROM e_segs s JOIN wrds w ON w.word = s.word
       |       WHERE length(s.word) > 1 GROUP BY s.word)
       |SELECT word, cnt, n_pieces, word_len, fertility,
       |  char_fallback FROM (
       |  SELECT word, CAST(cnt AS BIGINT) AS cnt,
       |    CAST(np AS BIGINT) AS n_pieces,
       |    CAST(length(word) AS BIGINT) AS word_len,
       |    ${sig("CAST(np AS DOUBLE) / length(word)")} AS fertility,
       |    np = length(word) AS char_fallback,
       |    row_number() OVER (ORDER BY
       |      ${sig("CAST(np AS DOUBLE) / length(word)")} DESC,
       |      cnt DESC, word ASC) AS rn
       |  FROM pw)
       |WHERE rn <= 20
       |ORDER BY fertility DESC, cnt DESC, word ASC""".stripMargin

  val oracle: Map[String, String] = Map(
    "text_unigram_train" -> textUnigramTrainSql,
    "text_unigram_oov" -> textUnigramOovSql,
    "text_unigram_by_lang" -> textUnigramByLangSql,
    "text_unigram_train2" -> textUnigramTrain2Sql,
    "text_unigram_encode" -> textUnigramEncodeSql)
}
