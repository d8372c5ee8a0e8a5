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
  // Johnson–Lindenstrauss random projection (64 → 16 dims) and its
  // distance-distortion acceptance report. The sign matrix is the
  // SAME exact-integer xor-mix on both sides ([[graft.ops.Projection
  // .rpSign]]); 1/√16 scaling is a power of two, so per-term
  // products are bit-identical and only summation order differs
  // (bridged by sig5).
  // ---------------------------------------------------------------- //

  private val OutDim = 16
  private val RpSample = 48L
  private val RpEps = 0.5

  /** `(d, o) → ±1` as SQL over the flat index d*OutDim + o — the
    * exact-integer xor-mix twin of [[graft.ops.Projection.rpSign]]
    * (0x9E3779B9 = 2654435769, 0x85EBCA6B = 2246822507). */
  private def signSql(d: String, o: String): String = {
    val i = s"(($d) * $OutDim + ($o))"
    s"(CASE WHEN ((xor($i * 2654435769, ($i * 2246822507) >> 13)" +
      s" >> 7) & 1) = 0 THEN 1.0 ELSE -1.0 END)"
  }

  private val exCte =
    s"""SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
       |unnest(CAST(embedding AS DOUBLE[])) AS x
       |FROM embeddings WHERE len(embedding) = $Dim""".stripMargin

  private val rpSql: String =
    s"""WITH ex AS ($exCte)
       |SELECT vec_id, o AS out_dim,
       |  ${sig(s"sum(x * ${signSql("d", "o")} / sqrt(${OutDim}.0))")}
       |    AS y
       |FROM ex CROSS JOIN range(0, $OutDim) t(o)
       |GROUP BY vec_id, o
       |ORDER BY vec_id, out_dim""".stripMargin

  private val rpDistortionSql: String =
    s"""WITH ex AS ($exCte AND vec_id < $RpSample),
       |pr AS (
       |  SELECT vec_id, o, sum(x * ${signSql("d", "o")}
       |    / sqrt(${OutDim}.0)) AS y
       |  FROM ex CROSS JOIN range(0, $OutDim) t(o)
       |  GROUP BY vec_id, o),
       |dv AS (
       |  SELECT a.vec_id AS ida, b.vec_id AS idb,
       |    sum((a.x - b.x) * (a.x - b.x)) AS dv
       |  FROM ex a JOIN ex b ON a.d = b.d AND a.vec_id < b.vec_id
       |  GROUP BY 1, 2),
       |dp AS (
       |  SELECT a.vec_id AS ida, b.vec_id AS idb,
       |    sum((a.y - b.y) * (a.y - b.y)) AS dp
       |  FROM pr a JOIN pr b ON a.o = b.o AND a.vec_id < b.vec_id
       |  GROUP BY 1, 2),
       |rt AS (
       |  SELECT ${sig("dp.dp / dv.dv")} AS ratio
       |  FROM dv JOIN dp ON dv.ida = dp.ida AND dv.idb = dp.idb
       |  WHERE dv.dv > 0)
       |SELECT count(*) AS n_pairs,
       |  ${sig("avg(ratio)")} AS mean_ratio,
       |  ${sig("min(ratio)")} AS min_ratio,
       |  ${sig("max(ratio)")} AS max_ratio,
       |  ${sig(s"CAST(count(CASE WHEN ratio >= ${1.0 - RpEps} AND " +
           s"ratio <= ${1.0 + RpEps} THEN 1 END) AS DOUBLE) / count(*)")}
       |    AS p_within_eps
       |FROM rt""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_dim_profile" -> ((s, dir) =>
      EmbedEval.dimProfile(t(s, dir, "embeddings"), "vec_id",
        "embedding", Dim)),
    "embed_anisotropy" -> ((s, dir) =>
      EmbedEval.anisotropy(t(s, dir, "embeddings"), "embedding", Dim,
        Iters)),
    "embed_rp" -> ((s, dir) =>
      graft.ops.Projection.randomProject(t(s, dir, "embeddings"),
        "vec_id", "embedding", Dim, OutDim)),
    "embed_rp_distortion" -> ((s, dir) =>
      graft.ops.Projection.rpDistortion(t(s, dir, "embeddings"),
        "vec_id", "embedding", Dim, OutDim, RpSample, RpEps)))

  val oracle: Map[String, String] = Map(
    "embed_dim_profile" -> dimProfileSql,
    "embed_anisotropy" -> anisotropySql,
    "embed_rp" -> rpSql,
    "embed_rp_distortion" -> rpDistortionSql)
}
