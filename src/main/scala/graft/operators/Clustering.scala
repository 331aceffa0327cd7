package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Distributed k-means (Lloyd) over the embeddings table — the training
  * step behind every IVF index build and corpus-partitioning pipeline
  * (cluster-then-sample, domain discovery, near-dup sharding). The
  * reference engine has no clustering surface; this is the LLM-pipeline
  * extension family (SURVEY §2.4 J), built the way Spark MLlib's KMeans
  * actually iterates: per-iteration work is ONE distributed pass
  * (assignment is a per-row map against broadcast centroids; the update
  * is a map-side-combined partial-sum aggregate), and the only driver
  * traffic is the K×dim centroid matrix itself — a bounded scalar
  * (4×64 longs here) per iteration, the CMS-sketch class of collect,
  * NEVER the corpus.
  *
  * Bit-replayability discipline (what makes this oracle-checkable): the
  * float vectors are quantized ONCE to integer micro-units, so every
  * distance is an exact BIGINT dot of differences (order-independent
  * sums), centroid updates are floor-divided integer means
  * (`Math.floorDiv` here ≡ `(s - ((s % n) + n) % n) // n` in the
  * oracle — all-BIGINT on both sides, exact at ANY magnitude; DuckDB's
  * bare `//` truncates and a double-based floor loses exactness past
  * 2^53, so neither is used), and
  * argmin ties break to the smallest centroid id (`array_position`
  * returns the FIRST index at the min). Convergence is fixed-iteration
  * (3), not threshold-based — a replayable loop count. Scale notes: K
  * centroids broadcast as literals into whole-stage codegen; the update
  * shuffle carries K×dim partial sums per partition, independent of row
  * count; inertia is in micro^2 units, so a trillion-row corpus should
  * rescale units (or widen to DECIMAL) before the BIGINT sum saturates.
  * Empty clusters keep their previous centroid (both sides replay
  * this via the coalesce-to-previous rule).
  */
object Clustering {
  private val K = 4
  private val Iters = 3
  private val Dim = 64
  private val Scale = 1000000L

  /** Quantized corpus: (vec_id, e: array<bigint> micro-units). Exposed
    * to specs so seed-inertia replays use the SAME scale constant. */
  private[operators] def quantized(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d).select($"vec_id",
      transform($"embedding", x => round(x.cast("double") * Scale).cast("bigint")).as("e"))
  }

  def kmeansEmbed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (assigned, cents) = lloyd(quantized(s, d))
    val l1ByCid = map(cents.zipWithIndex.flatMap { case (c, ci) =>
      Seq(lit(ci.toLong), lit(c.map(math.abs).sum)) }: _*)
    assigned
      .groupBy($"cluster")
      .agg(count(lit(1)).as("n"), sum($"d").as("inertia"))
      .withColumn("centroid_l1", element_at(l1ByCid, $"cluster"))
  }

  /** Core Lloyd loop over any (vec_id, e: array<bigint>) frame — exposed
    * so specs can plant separated clusters and assert recovery. Returns
    * the per-vector assignment (vec_id, cluster, d = squared distance to
    * its centroid) and the final centroid matrix. */
  private[operators] def lloyd(qIn: DataFrame): (DataFrame, Array[Seq[Long]]) = {
    val s = qIn.sparkSession
    import s.implicits._
    // the corpus is consumed by 2 + Iters actions (seed collect, one
    // aggregate per iteration, final assignment): checkpoint so the
    // scan + per-row quantization runs once, not per action — MLlib's
    // KMeans caches its input for exactly this reason
    val q = qIn.localCheckpoint()

    // deterministic seed: the K smallest vec_ids' vectors (k-means++ at
    // scale would sample by D^2 weight; a FIXED seed is what makes the
    // run replayable against the oracle, and the iteration mechanics —
    // the thing under test — are identical either way)
    var cents: Array[Seq[Long]] = q.orderBy($"vec_id").limit(K)
      .select($"e").as[Seq[Long]].collect()

    // centroids ride in as ONE broadcast single-row frame (array of K
    // arrays), not as 256 inline literals: the literal form forces a
    // multi-second whole-stage-codegen compile of the nested HOF tree on
    // EVERY action — measured 10 s/run at sf0.1, ~all of it compiler —
    // while the column form keeps the generated code size independent
    // of K×dim. Broadcast cross join of a 1-row frame = a map-side
    // closure, no shuffle, same 100 TB shape as a literal.
    def withCents(df: DataFrame): DataFrame =
      df.crossJoin(broadcast(
        Seq(Tuple1(cents.map(_.toSeq).toSeq)).toDF("cents")))
    // squared-L2 to each centroid, exact BIGINT, array order fixes the
    // summation order on both engines
    def dists = transform($"cents",
      c => aggregate(zip_with($"e", c, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v))
    // first index at the minimum = smallest-cid tie-break, 0-based
    def cid = (array_position(dists, array_min(dists)) - 1).cast("bigint")

    for (_ <- 1 to Iters) {
      // ONE aggregate carries all K×dim sums: K output rows of dim sum
      // columns regardless of corpus size (map-side combine does the
      // heavy lifting), and the collect below is that bounded matrix,
      // not data. Dim per-element sums beat posexplode here: a
      // generator would re-evaluate the cid HOF tree per EXPLODED row
      // (64× amplification — measured 4–6 s/iteration vs <1 s for this
      // shape), while GetArrayItem sums stay in whole-stage codegen.
      val sums = withCents(q)
        .groupBy(cid.as("cid"))
        .agg(count(lit(1)).as("n"),
          (0 until Dim).map(i => sum($"e"(i)).as(s"s$i")): _*)
        .collect()
      cents = cents.zipWithIndex.map { case (old, ci) =>
        sums.find(_.getLong(0) == ci.toLong).map { r =>
          val n = r.getLong(1)
          (0 until Dim).map(i => Math.floorDiv(r.getLong(i + 2), n)): Seq[Long]
        }.getOrElse(old) // empty cluster keeps its centroid
      }
    }

    (withCents(q).select($"vec_id", cid.as("cluster"), array_min(dists).as("d")),
      cents.map(_.toSeq))
  }

  /** DuckDB replay of the SAME integer algorithm, unrolled per
    * iteration (the oracle string is generated, not hand-kept, so K /
    * Iters / Dim changes cannot desynchronize the two sides): QUALIFY
    * row_number argmin ≡ array_position-first tie-break;
    * non-negative-mod floor division ≡ floorDiv (exact BIGINT at any
    * magnitude); coalesce-to-previous ≡ the empty-cluster rule. */
  private def oracleKmeans: String = {
    val dist = s"list_sum(list_transform(range(1, ${Dim + 1}), " +
      "i -> (q.e[i] - c.e[i]) * (q.e[i] - c.e[i])))"
    def assign(prev: String, a: String) = s"""
      $a AS (
        SELECT vec_id, e, cid, d FROM (
          SELECT q.vec_id, q.e, c.cid, $dist AS d
          FROM q CROSS JOIN $prev c) t
        QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) = 1)"""
    def update(prev: String, a: String, cur: String) = s"""
      ${a}_sums AS (
        SELECT cid, i.range AS dim, CAST(sum(e[i.range]) AS BIGINT) AS s,
               count(*) AS n
        FROM $a, range(1, ${Dim + 1}) i
        GROUP BY cid, i.range),
      $cur AS (
        SELECT p.cid, coalesce(u.e, p.e) AS e
        FROM $prev p
        LEFT JOIN (
          SELECT cid,
                 list((s - ((s % n) + n) % n) // n
                      ORDER BY dim) AS e
          FROM ${a}_sums GROUP BY cid) u ON u.cid = p.cid)"""
    val head = s"""
      WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * $Scale) AS BIGINT)) AS e
        FROM embeddings),
      c0 AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, e
        FROM (SELECT vec_id, e FROM q ORDER BY vec_id LIMIT $K))"""
    val iters = (1 to Iters).map { it =>
      assign(s"c${it - 1}", s"a$it") + "," + update(s"c${it - 1}", s"a$it", s"c$it")
    }.mkString(",", ",", "")
    head + iters + "," + assign(s"c$Iters", "fa") + s""",
      l1 AS (SELECT cid,
                    CAST(list_sum(list_transform(e, v -> abs(v))) AS BIGINT)
                      AS centroid_l1
             FROM c$Iters)
      SELECT f.cid AS cluster, count(*) AS n,
             CAST(sum(f.d) AS BIGINT) AS inertia,
             min(l1.centroid_l1) AS centroid_l1
      FROM fa f JOIN l1 ON l1.cid = f.cid
      GROUP BY f.cid"""
  }

  val oracle: Map[String, String] = Map(
    "ml_kmeans" -> oracleKmeans)
}
