package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.det.Sig
import graft.ops.WordPiece
import Shared.t

/** WordPiece tokenizer queries (round 13): likelihood-scored merge
  * training ([[graft.ops.WordPiece]]) and the greedy
  * longest-match-first encoder, each with a DuckDB oracle that
  * replays EVERYTHING — all six merge iterations as chained CTEs
  * (pair counts, symbol counts, the sig5-rounded score argmax, the
  * literal rewrite), and the greedy segmentation as a per-(word,
  * position) longest-match lattice walked by a recursive CTE.
  *
  * DuckDB hazard (the datasheet-LR precedent): the w-chain is read
  * THREE times per iteration (symbol counts, pair counts, rewrite),
  * so every chained CTE is AS MATERIALIZED — un-hinted, DuckDB
  * inlines the corpus scan 3^6 times. */
object WordPieceQueries {

  private def sig(x: String) = Sig.sql(x)

  private val M = "chr(2)"
  private val S = "chr(1)"
  val Merges = 6

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // WordPiece merge-rule TRAINING: 6 iterations of count-pairs +
    // count-symbols -> likelihood argmax -> literal rewrite; the
    // score cnt/(ca*cb) is IEEE-identical cross-engine and the
    // argmax orders by its sig5 rounding with (a, b) tie-break
    "text_wordpiece_train" -> ((s, dir) =>
      WordPiece.train(t(s, dir, "documents"), "text",
        merges = Merges)),
    // the apply side: greedy longest-match-first encoding under the
    // trained piece vocabulary (alphabet in initial + ## form, plus
    // the merged pieces); per-doc word/subword counts
    "text_wordpiece_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val rules = WordPiece.train(docs, "text", merges = Merges)
        .collect().sortBy(_.getLong(0)).map(_.getString(3)).toSeq
      WordPiece.encodeTokenCount(docs, "doc_id", "text",
        WordPiece.vocabPieces(docs, "text", rules))
    }))

  /** The chained training CTEs: w0 = ##-symbolized word-frequency
    * table; per iteration k — s_k symbol counts, p_k pair counts,
    * b_k the likelihood argmax, w_k the rewrite. */
  private val wpTrainCtes: String = {
    val base =
      s"""words AS (SELECT lower(tok) AS word FROM (
         |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         |  WHERE regexp_matches(lower(tok), '^[a-z0-9]+${"$"}')
         |    AND length(tok) <= 64),
         |voc AS (SELECT word, count(*) AS freq FROM words GROUP BY 1),
         |w0 AS (SELECT CASE WHEN length(word) = 1
         |    THEN $M || word || $M
         |  ELSE $M || substr(word, 1, 1) || $M || $S ||
         |    rtrim(regexp_replace(substr(word, 2), '(.)',
         |      $M||'##\\1'||$M||$S, 'g'), $S)
         |  END AS sym, freq FROM voc)""".stripMargin
    val steps = (1 to Merges).flatMap { k =>
      Seq(
        s"""s$k AS MATERIALIZED (SELECT t.tok AS sym,
           |  CAST(sum(freq) AS BIGINT) AS c
           |  FROM (SELECT unnest(string_split(sym, $S)) AS tok, freq
           |        FROM w${k - 1}) t GROUP BY 1)""".stripMargin,
        s"""p$k AS MATERIALIZED (SELECT toks[i] AS a, toks[i+1] AS b,
           |  CAST(sum(freq) AS BIGINT) AS cnt
           |  FROM (SELECT string_split(sym, $S) AS toks, freq
           |        FROM w${k - 1}) t, range(1, 65) r(i)
           |  WHERE i + 1 <= len(toks) GROUP BY 1, 2)""".stripMargin,
        s"""b$k AS MATERIALIZED (SELECT a, b, cnt,
           |  ${sig("raw")} AS score FROM (
           |  SELECT p.a, p.b, p.cnt AS cnt, CAST(p.cnt AS DOUBLE) /
           |    (CAST(sa.c AS DOUBLE) * CAST(sb.c AS DOUBLE)) AS raw
           |  FROM p$k p JOIN s$k sa ON sa.sym = p.a
           |  JOIN s$k sb ON sb.sym = p.b)
           |  ORDER BY score DESC, a ASC, b ASC LIMIT 1)""".stripMargin,
        s"""w$k AS MATERIALIZED (SELECT replace(sym,
           |  b$k.a || $S || b$k.b,
           |  $M || replace(b$k.a, $M, '') ||
           |  regexp_replace(replace(b$k.b, $M, ''), '^##', '')
           |  || $M) AS sym, freq
           |  FROM w${k - 1}, b$k)""".stripMargin)
    }
    s"$base,\n${steps.mkString(",\n")}"
  }

  val textWordpieceTrainSql: String = {
    val selects = (1 to Merges).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS rnk,
         |replace(a, $M, '') AS left_sym,
         |replace(b, $M, '') AS right_sym,
         |replace(a, $M, '') ||
         |  regexp_replace(replace(b, $M, ''), '^##', '') AS merged,
         |cnt AS pair_count, score FROM b$k""".stripMargin
    }
    s"WITH $wpTrainCtes\n" +
      selects.mkString("", "\nUNION ALL\n", "") + "\nORDER BY rnk"
  }

  /** Encode oracle: re-derive the rules (the training CTEs), build
    * the piece vocabulary (chars in both forms + merges), compute
    * the longest-match length per (word, position) as a lattice,
    * then walk each word's greedy chain with a recursive CTE —
    * coalesce(bestlen, 1) is the unseen-char fallback. */
  val textWordpieceEncodeSql: String = {
    val mergedSel = (1 to Merges).map { k =>
      s"""SELECT replace(a, $M, '') ||
         |  regexp_replace(replace(b, $M, ''), '^##', '') AS piece
         |  FROM b$k""".stripMargin
    }.mkString("\nUNION\n")
    val tail =
      s"""dwords AS (SELECT doc_id, lower(tok) AS word FROM (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents)
         |  WHERE regexp_matches(lower(tok), '^[a-z0-9]+${"$"}')
         |    AND length(tok) <= 64),
         |chars AS (SELECT DISTINCT substr(word, i + 1, 1) AS ch
         |  FROM voc, range(0, 64) r(i) WHERE i < length(word)),
         |wp_vocab AS (SELECT ch AS piece FROM chars
         |  UNION SELECT '##' || ch FROM chars
         |  UNION $mergedSel),
         |uw AS (SELECT DISTINCT word FROM dwords),
         |lat AS MATERIALIZED (SELECT u.word, r.i AS pos,
         |  max(CASE WHEN r.i = 0 THEN length(v.piece)
         |      ELSE length(v.piece) - 2 END) AS bestlen
         |  FROM uw u, range(0, 64) r(i), wp_vocab v
         |  WHERE r.i < length(u.word)
         |    AND CASE WHEN r.i = 0
         |      THEN v.piece NOT LIKE '##%'
         |        AND substr(u.word, 1, length(v.piece)) = v.piece
         |      ELSE v.piece LIKE '##%'
         |        AND length(v.piece) > 2
         |        AND substr(u.word, r.i + 1, length(v.piece) - 2)
         |          = substr(v.piece, 3) END
         |  GROUP BY 1, 2),
         |seg AS (SELECT word, 0 AS pos, 0 AS n FROM uw
         |  UNION ALL
         |  SELECT s.word, s.pos + coalesce(l.bestlen, 1), s.n + 1
         |  FROM seg s LEFT JOIN lat l
         |    ON l.word = s.word AND l.pos = s.pos
         |  WHERE s.pos < length(s.word)),
         |done AS (SELECT word, n FROM seg
         |         WHERE pos = length(word))
         |SELECT d.doc_id, count(*) AS n_words,
         |CAST(sum(dn.n) AS BIGINT) AS n_subwords
         |FROM dwords d JOIN done dn USING (word)
         |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
    s"WITH RECURSIVE $wpTrainCtes,\n$tail"
  }

  val oracle: Map[String, String] = Map(
    "text_wordpiece_train" -> textWordpieceTrainSql,
    "text_wordpiece_encode" -> textWordpieceEncodeSql)
}
