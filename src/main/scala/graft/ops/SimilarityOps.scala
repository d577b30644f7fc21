package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>[64]`) — the [NS] similarity-search
  * family from SURVEY.md §2.2.
  *
  * q70 is the exact brute-force baseline (and the DuckDB-oracle
  * path); q71 is the IVF (inverted-file) scale path: cluster the
  * corpus once into C cells around broadcast centroids, then probe
  * only the nprobe nearest cells per query. At 100 TB the corpus
  * never self-joins: cell assignment is a broadcast map-side pass,
  * and the probe join touches nprobe/C of the data.
  */
object SimilarityOps {

  /** Number of query vectors (smallest vec_ids double as queries). */
  val nQueries = 5
  val topK = 10

  /** Corpus with per-row norm precomputed below any join (computing
    * it inside a pair expression would redo the fold O(n·q) times). */
  private def corpus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding", VectorOps.norm($"embedding").as("nrm"))
  }

  // ---------------------------------------------------------------- q70
  /** Exact kNN: broadcast the query vectors against the corpus, rank
    * by cosine (ties → lower vec_id), keep top-10 per query. The
    * per-query window is fine for a handful of queries; a large query
    * batch would use two-phase top-k (per-partition partial top-k,
    * then merge) to avoid skewing one task per query key. */
  def q70KnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = corpus(s, dir)
    val q = c.where($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"), $"nrm".as("qn"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"vec_id".asc)
    c.join(broadcast(q), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        (VectorOps.dot($"embedding", $"qv") / ($"nrm" * $"qn")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= topK)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank", $"cosine")
      .orderBy($"query_id", $"rank")
  }

  private val dotSql = (a: String, b: String) =>
    s"""list_reduce(list_transform(range(1, len($a) + 1),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  private val q70Oracle =
    s"""WITH c AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn
       |      FROM c WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT query_id, vec_id,
       |    ${dotSql("embedding", "qv")} / (nrm * qn) AS cosine
       |  FROM c JOIN q ON vec_id <> query_id),
       |ranked AS (
       |  SELECT query_id, vec_id AS neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY cosine DESC, vec_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, cosine FROM ranked
       |WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------- q71
  /** IVF-Flat ANN. Centroids = every `centroidStride`-th vector
    * (deterministic; a production build would k-means refine them —
    * same plan shape). Each corpus vector is assigned to its nearest
    * centroid in one broadcast pass; each query probes the `nprobe`
    * nearest cells and ranks exactly within the candidates.
    *
    * No SQL oracle (cell assignment isn't reasonably expressible);
    * SimilarityOpsSpec checks recall@10 against q70. */
  val centroidStride = 125
  val nprobe = 2

  def q71KnnIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = corpus(s, dir)
    val cents = c.where($"vec_id" % centroidStride === 0)
      .select($"vec_id".as("cid"), $"embedding".as("cv"), $"nrm".as("cn"))
    // nearest cell per corpus vector: one broadcast join + max_by
    val cells = c.join(broadcast(cents), lit(true))
      .select($"vec_id", $"embedding", $"nrm",
        (VectorOps.dot($"embedding", $"cv") / ($"nrm" * $"cn")).as("ccos"), $"cid")
      .groupBy($"vec_id")
      .agg(first($"embedding").as("embedding"), first($"nrm").as("nrm"),
        max_by($"cid", struct($"ccos", -$"cid")).as("cell"))
    val q = c.where($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"), $"nrm".as("qn"))
    // nprobe nearest cells per query
    val probes = q.join(broadcast(cents), lit(true))
      .select($"query_id", $"qv", $"qn", $"cid",
        (VectorOps.dot($"qv", $"cv") / ($"qn" * $"cn")).as("ccos"))
      .withColumn("r", row_number().over(
        Window.partitionBy($"query_id").orderBy($"ccos".desc, $"cid".asc)))
      .where($"r" <= nprobe)
      .select($"query_id", $"qv", $"qn", $"cid".as("cell"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"vec_id".asc)
    cells.join(broadcast(probes), Seq("cell"))
      .where($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        (VectorOps.dot($"embedding", $"qv") / ($"nrm" * $"qn")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where($"rank" <= topK)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank", $"cosine")
      .orderBy($"query_id", $"rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_knn_bruteforce" -> (q70KnnBruteForce _),
    "q71_knn_ivf"        -> (q71KnnIvf _),
  )

  val oracles: Map[String, String] = Map(
    "q70_knn_bruteforce" -> q70Oracle,
  )
}
