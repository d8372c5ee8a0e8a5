package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.det.Sig
import graft.ops.EmbedEval

/** Embedding-health queries: the per-dimension profile and the
  * anisotropy (top-PC explained-variance) diagnostic. The oracles
  * re-derive everything relationally — the anisotropy oracle replays
  * the covariance AND every power-iteration round as unrolled CTEs
  * over the sig5-rounded matrix (the embed_kmeans_convergence
  * replay pattern). */
object EmbedHealthQueries {

  private val Dim = 64
  private val Iters = 4

  private def sig(x: String) = Sig.sql(x)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ---------------------------------------------------------------- //
  // embed_dim_profile oracle
  // ---------------------------------------------------------------- //

  private val dimProfileSql: String = {
    val ex = s"""SELECT generate_subscripts(embedding, 1) - 1 AS p,
                |unnest(CAST(embedding AS DOUBLE[])) AS v
                |FROM embeddings WHERE len(embedding) = $Dim""".stripMargin
    val perDim =
      s"""SELECT dim_idx, n, mean, std, min_val, max_val, p_zero,
         |CAST(CASE WHEN std < 1e-9 THEN 1 ELSE 0 END AS BIGINT)
         |  AS is_dead
         |FROM (SELECT CAST(p AS BIGINT) AS dim_idx, count(v) AS n,
         |  ${sig("avg(v)")} AS mean, ${sig("stddev_samp(v)")} AS std,
         |  min(v) AS min_val, max(v) AS max_val,
         |  ${sig("CAST(count(CASE WHEN v = 0 THEN 1 END) AS DOUBLE)" +
             " / count(v)")} AS p_zero
         |FROM ($ex) GROUP BY p)""".stripMargin
    val normRow =
      s"""SELECT CAST(-1 AS BIGINT) AS dim_idx, count(norm) AS n,
         |${sig("avg(norm)")} AS mean, ${sig("stddev_samp(norm)")} AS std,
         |${sig("min(norm)")} AS min_val, ${sig("max(norm)")} AS max_val,
         |${sig("CAST(count(CASE WHEN norm = 0 THEN 1 END) AS DOUBLE)" +
             " / count(norm)")} AS p_zero,
         |CAST(0 AS BIGINT) AS is_dead
         |FROM (SELECT sqrt(list_aggregate(list_transform(
         |  CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')) AS norm
         |FROM embeddings WHERE len(embedding) = $Dim)""".stripMargin
    s"$perDim\nUNION ALL\n$normRow\nORDER BY dim_idx"
  }

  // ---------------------------------------------------------------- //
  // embed_anisotropy oracle: covariance + unrolled power iteration
  // ---------------------------------------------------------------- //

  private val anisotropySql: String = {
    val header =
      s"""WITH ex AS (
         |  SELECT vec_id AS rid, generate_subscripts(embedding, 1) - 1 AS i,
         |    unnest(CAST(embedding AS DOUBLE[])) AS x
         |  FROM embeddings WHERE len(embedding) = $Dim),
         |mu AS (SELECT i, avg(x) AS m FROM ex GROUP BY i),
         |pr AS (SELECT a.i AS i, b.i AS j, avg(a.x * b.x) AS p
         |  FROM ex a JOIN ex b ON a.rid = b.rid AND a.i <= b.i
         |  GROUP BY 1, 2),
         |cov AS (SELECT pr.i AS i, pr.j AS j,
         |    ${sig("pr.p - ma.m * mb.m")} AS c
         |  FROM pr JOIN mu ma ON pr.i = ma.i JOIN mu mb ON pr.j = mb.i),
         |cfull AS (SELECT i, j, c FROM cov
         |  UNION ALL SELECT j AS i, i AS j, c FROM cov WHERE i < j),
         |v0 AS (SELECT i, 1.0 AS x FROM mu)""".stripMargin
    val iterCtes = (1 to Iters).map { k =>
      s"""w$k AS (SELECT f.i AS i, sum(f.c * v.x) AS x
         |  FROM cfull f JOIN v${k - 1} v ON f.j = v.i GROUP BY f.i),
         |v$k AS (SELECT i, x / (SELECT sqrt(sum(x * x)) FROM w$k) AS x
         |  FROM w$k)""".stripMargin
    }.mkString(",\n")
    val tail =
      s"""cv AS (SELECT f.i AS i, sum(f.c * v.x) AS x
         |  FROM cfull f JOIN v$Iters v ON f.j = v.i GROUP BY f.i),
         |lam AS (SELECT sum(v.x * cv.x) AS l
         |  FROM v$Iters v JOIN cv ON v.i = cv.i),
         |tr AS (SELECT sum(c) AS t FROM cov WHERE i = j),
         |nn AS (SELECT count(*) AS n FROM embeddings
         |  WHERE len(embedding) = $Dim)
         |SELECT CAST(nn.n AS BIGINT) AS n_vectors,
         |  CAST($Dim AS BIGINT) AS dim,
         |  ${sig("tr.t")} AS trace, ${sig("lam.l")} AS lambda1,
         |  ${sig("lam.l / tr.t")} AS explained,
         |  CAST($Iters AS BIGINT) AS iters
         |FROM nn, tr, lam""".stripMargin
    s"$header,\n$iterCtes,\n$tail"
  }

  // ---------------------------------------------------------------- //

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_dim_profile" -> ((s, dir) =>
      EmbedEval.dimProfile(t(s, dir, "embeddings"), "vec_id",
        "embedding", Dim)),
    "embed_anisotropy" -> ((s, dir) =>
      EmbedEval.anisotropy(t(s, dir, "embeddings"), "embedding", Dim,
        Iters)))

  val oracle: Map[String, String] = Map(
    "embed_dim_profile" -> dimProfileSql,
    "embed_anisotropy" -> anisotropySql)
}
