package graft.queries

import org.apache.spark.sql.functions._
import QHelpers._
import graft.functions.TextFunctions
import graft.operators.{Curation, Dedup, Similarity}

/** Extension operators for large-scale training-data pipelines: exact and
  * approximate deduplication, similarity search over embeddings, text
  * analysis (language-ID, quality scoring, token counting, fingerprinting).
  *
  * These are first-class operators (SURVEY §7.2 M11): each query drives the
  * corresponding graft.operators/graft.functions implementation; DuckDB
  * oracles replicate the exact arithmetic (integer counts, exact divisions,
  * µs timestamps) so results hash-match bit-for-bit.
  */
object Ext {

  /** DuckDB fragment: distinct word-3-gram shingles per doc. */
  private val shinglesCte =
    """d AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i+1:i+3], ' ') AS sh
      |       FROM (SELECT doc_id, w, unnest(range(len(w) - 2)) AS i
      |             FROM d WHERE len(w) >= 3) t),
      |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id)""".stripMargin

  /** DuckDB fragment: the engine-portable MinHash banding over `sh` →
    * bk(doc_id, band, bucket) — md5-60-bit hashes mod 2³¹−1, the
    * interpolated (aᵢ, bᵢ) universal-hash fold, polynomial band buckets
    * (the exact arithmetic of `Dedup.minhashBandsPortable` at 16×4). */
  private def portableBkCte: String = {
    val (as, bs) = graft.operators.Dedup.minhashCoefs(64, 42L)
    val coefRows = (0 until 64).map(i => s"(${i}, ${as(i)}, ${bs(i)})").mkString(", ")
    s"""hp AS (SELECT doc_id,
       |    (CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT)) % 2147483647 AS hp
       |  FROM sh),
       |coef(i, a, b) AS (VALUES $coefRows),
       |sig AS (SELECT doc_id, i, MIN((hp * a + b) % 2147483647) AS s
       |  FROM hp CROSS JOIN coef GROUP BY doc_id, i),
       |piv AS (SELECT doc_id, i // 4 AS band,
       |    MAX(CASE WHEN i % 4 = 0 THEN s END) AS s0,
       |    MAX(CASE WHEN i % 4 = 1 THEN s END) AS s1,
       |    MAX(CASE WHEN i % 4 = 2 THEN s END) AS s2,
       |    MAX(CASE WHEN i % 4 = 3 THEN s END) AS s3
       |  FROM sig GROUP BY doc_id, i // 4),
       |bk AS (SELECT doc_id, band,
       |    (((((((0 * 1000003 + s0) % 2147483647) * 1000003 + s1) % 2147483647)
       |       * 1000003 + s2) % 2147483647) * 1000003 + s3) % 2147483647 AS bucket
       |  FROM piv)""".stripMargin
  }

  /** Twin corpus for the oracled ANN queries: embeddings unioned with an
    * id-shifted identical copy — every query's exact top-1 is its twin at
    * cosine 1.0, ground truth any engine can recompute. */
  private[queries] def twinCorpus(spark: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val e = t(spark, dir, "embeddings")
    val base = e.select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val corpus = base.unionAll(base.select(($"cid" + 10000).as("cid"), $"cvec"))
    val queries = e.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    (queries, corpus)
  }

  /** Exact top-1 cosine neighbor per query over the twin corpus. */
  private[queries] val twinTop1Sql: String =
    """WITH c AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 10000, embedding FROM embeddings),
      |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
      |scored AS (
      |  SELECT qid, c.vec_id AS cid,
      |    round(
      |      list_sum(list_transform(range(1, 65),
      |        i -> CAST(qv[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(range(1, 65),
      |           i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
      |         * sqrt(list_sum(list_transform(range(1, 65),
      |             i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))),
      |      4) AS sim
      |  FROM c, q WHERE c.vec_id <> qid)
      |SELECT qid, cid, sim, rank FROM (
      |  SELECT qid, cid, sim,
      |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT) AS rank
      |  FROM scored) r
      |WHERE rank <= 1 ORDER BY qid, rank""".stripMargin

  private val jaccardPairsSql =
    s"""WITH $shinglesCte,
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT doc_a, doc_b, common, sa.sz AS size_a, sb.sz AS size_b,
       |       CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) AS jaccard
       |FROM pairs
       |JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.8""".stripMargin

  /** Stratified exact-Jaccard replay of the self-maintaining crawl
    * cascade (initial index = docs < 100; fixed batch strata [100,200),
    * [200,400), [400,∞); kept(d) = no j ≥ 0.8 partner among the index
    * or any earlier-batch keeper) — shared by the no-failure parity
    * gate and the crash-injection replay gate, which must produce the
    * IDENTICAL result (that equality is the whole point of the replay
    * gate). */
  private val selfMaintainSql: String =
    s"""WITH $shinglesCte,
       |jp AS (SELECT a.doc_id AS ea, b.doc_id AS eb, COUNT(*) AS common
       |       FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
       |       GROUP BY a.doc_id, b.doc_id),
       |pe AS (SELECT ea, eb FROM jp
       |       JOIN sizes sa ON ea = sa.doc_id
       |       JOIN sizes sb ON eb = sb.doc_id
       |       WHERE CAST(common AS DOUBLE)
       |             / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.8),
       |d0 AS (SELECT doc_id FROM documents),
       |k1 AS (SELECT doc_id FROM d0 WHERE doc_id >= 100 AND doc_id < 200
       |       AND NOT EXISTS (SELECT 1 FROM pe
       |                       WHERE pe.eb = d0.doc_id AND pe.ea < 100)),
       |k2 AS (SELECT doc_id FROM d0 WHERE doc_id >= 200 AND doc_id < 400
       |       AND NOT EXISTS (SELECT 1 FROM pe
       |                       WHERE pe.eb = d0.doc_id
       |                         AND (pe.ea < 100
       |                              OR pe.ea IN (SELECT doc_id FROM k1)))),
       |k3 AS (SELECT doc_id FROM d0 WHERE doc_id >= 400
       |       AND NOT EXISTS (SELECT 1 FROM pe
       |                       WHERE pe.eb = d0.doc_id
       |                         AND (pe.ea < 100
       |                              OR pe.ea IN (SELECT doc_id FROM k1)
       |                              OR pe.ea IN (SELECT doc_id FROM k2))))
       |SELECT doc_id FROM (SELECT doc_id FROM k1
       |                    UNION ALL SELECT doc_id FROM k2
       |                    UNION ALL SELECT doc_id FROM k3) u
       |ORDER BY doc_id""".stripMargin

  /** The cascade with the opt-in WITHIN-BATCH stratum (r13 VERDICT #3):
    * per batch t, s_t = index-probe survivors (no partner in the index
    * or earlier KEEPERS), k_t = the greedy min-id rule over s_t — a doc
    * is dropped when a j ≥ 0.8 partner with a smaller id exists among
    * the SAME batch's probe survivors (non-recursive: the smaller
    * partner need not itself be kept). Appends and later strata see
    * k_t. The fixture plants within-stratum pairs in every batch
    * ([100,200) ×1, [200,400) ×3, [400,∞) ×2), so the rule bites. */
  private val selfMaintainIntraSql: String =
    s"""WITH $shinglesCte,
       |jp AS (SELECT a.doc_id AS ea, b.doc_id AS eb, COUNT(*) AS common
       |       FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
       |       GROUP BY a.doc_id, b.doc_id),
       |pe AS (SELECT ea, eb FROM jp
       |       JOIN sizes sa ON ea = sa.doc_id
       |       JOIN sizes sb ON eb = sb.doc_id
       |       WHERE CAST(common AS DOUBLE)
       |             / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.8),
       |d0 AS (SELECT doc_id FROM documents),
       |s1 AS (SELECT doc_id FROM d0 WHERE doc_id >= 100 AND doc_id < 200
       |       AND NOT EXISTS (SELECT 1 FROM pe
       |                       WHERE pe.eb = d0.doc_id AND pe.ea < 100)),
       |k1 AS (SELECT doc_id FROM s1 me WHERE NOT EXISTS (
       |         SELECT 1 FROM pe JOIN s1 p ON pe.ea = p.doc_id
       |         WHERE pe.eb = me.doc_id AND pe.ea < me.doc_id)),
       |s2 AS (SELECT doc_id FROM d0 WHERE doc_id >= 200 AND doc_id < 400
       |       AND NOT EXISTS (SELECT 1 FROM pe
       |                       WHERE pe.eb = d0.doc_id
       |                         AND (pe.ea < 100
       |                              OR pe.ea IN (SELECT doc_id FROM k1)))),
       |k2 AS (SELECT doc_id FROM s2 me WHERE NOT EXISTS (
       |         SELECT 1 FROM pe JOIN s2 p ON pe.ea = p.doc_id
       |         WHERE pe.eb = me.doc_id AND pe.ea < me.doc_id)),
       |s3 AS (SELECT doc_id FROM d0 WHERE doc_id >= 400
       |       AND NOT EXISTS (SELECT 1 FROM pe
       |                       WHERE pe.eb = d0.doc_id
       |                         AND (pe.ea < 100
       |                              OR pe.ea IN (SELECT doc_id FROM k1)
       |                              OR pe.ea IN (SELECT doc_id FROM k2)))),
       |k3 AS (SELECT doc_id FROM s3 me WHERE NOT EXISTS (
       |         SELECT 1 FROM pe JOIN s3 p ON pe.ea = p.doc_id
       |         WHERE pe.eb = me.doc_id AND pe.ea < me.doc_id))
       |SELECT doc_id FROM (SELECT doc_id FROM k1
       |                    UNION ALL SELECT doc_id FROM k2
       |                    UNION ALL SELECT doc_id FROM k3) u
       |ORDER BY doc_id""".stripMargin

  /** The tsfresh-feature oracle, shared by the narrow (BIGINT) and
    * wide (DECIMAL) gates: the SQL is engine arithmetic over exact
    * integers either way. */
  private val tsFeaturesSql: String =
    """WITH base AS (
          |  SELECT user_id, event_id,
          |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
          |  FROM events),
          |st AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
          |              CAST(SUM(c) AS BIGINT) AS s,
          |              CAST(MAX(c) AS BIGINT) AS mxc,
          |              CAST(MIN(c) AS BIGINT) AS mnc
          |       FROM base GROUP BY 1),
          |r AS (
          |  SELECT b.user_id, c, n, s, mxc, mnc,
          |    lag(c) OVER w AS prev,
          |    lag(c, 2) OVER w AS prev2,
          |    lead(c) OVER w AS nxt,
          |    row_number() OVER w AS rn,
          |    SUM(CASE WHEN c * n > s THEN 1 ELSE 0 END) OVER w AS cum_above,
          |    SUM(CASE WHEN c * n < s THEN 1 ELSE 0 END) OVER w AS cum_below,
          |    row_number() OVER (PARTITION BY b.user_id ORDER BY c, event_id) AS rnv,
          |    COUNT(*) OVER (PARTITION BY b.user_id, c) AS cntc,
          |    row_number() OVER (PARTITION BY b.user_id, c ORDER BY event_id) AS rnc
          |  FROM base b JOIN st USING (user_id)
          |  WINDOW w AS (PARTITION BY b.user_id ORDER BY event_id)),
          |str AS (
          |  SELECT user_id, CAST(MAX(len) AS BIGINT) AS strike FROM (
          |    SELECT user_id, rn - cum_above AS isl, COUNT(*) AS len
          |    FROM r WHERE c * n > s GROUP BY user_id, rn - cum_above) q
          |  GROUP BY user_id),
          |strb AS (
          |  SELECT user_id, CAST(MAX(len) AS BIGINT) AS strikeb FROM (
          |    SELECT user_id, rn - cum_below AS isl, COUNT(*) AS len
          |    FROM r WHERE c * n < s GROUP BY user_id, rn - cum_below) q
          |  GROUP BY user_id),
          |agg AS (
          |  SELECT user_id, n AS n, CAST(SUM(c) AS BIGINT) AS sum_c,
          |    CAST(SUM(c * c) AS BIGINT) AS abs_energy,
          |    CAST(MIN(c) AS BIGINT) AS min_c,
          |    CAST(MAX(c) AS BIGINT) AS max_c,
          |    CAST(SUM(CASE WHEN rnv = (n + 1) // 2 THEN c END)
          |       + SUM(CASE WHEN rnv = n // 2 + 1 THEN c END) AS BIGINT) AS med2,
          |    CAST(SUM(abs(c - prev)) AS BIGINT) AS sum_abs_change,
          |    CAST(SUM(CASE WHEN c * n > s THEN 1 ELSE 0 END) AS BIGINT)
          |      AS count_above_mean,
          |    CAST(SUM((c * n - s) * (prev * n - s)) AS BIGINT) AS acn,
          |    CAST(SUM((c * n - s) * (c * n - s)) AS BIGINT) AS acd,
          |    CAST(SUM((c - prev) * (c - prev)) AS BIGINT) AS sqch,
          |    CAST(SUM(c * prev * prev2) AS BIGINT) AS c3_sum,
          |    CAST(SUM(CASE WHEN prev IS NOT NULL
          |                   AND ((c * n > s) != (prev * n > s))
          |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_crossings,
          |    CAST(SUM(CASE WHEN c * n < s THEN 1 ELSE 0 END) AS BIGINT)
          |      AS count_below_mean,
          |    CAST(MIN(CASE WHEN c = mxc THEN rn END) AS BIGINT) AS first_loc_max,
          |    CAST(MAX(CASE WHEN c = mnc THEN rn END) AS BIGINT) AS last_loc_min,
          |    CAST(COUNT(DISTINCT c) AS BIGINT) AS n_distinct,
          |    CAST(SUM(CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL
          |                   AND c > prev AND c > nxt
          |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_peaks,
          |    CAST(SUM(CASE WHEN cntc >= 2 THEN c END) AS BIGINT)
          |      AS sum_reoccurring_points,
          |    CAST(SUM(CASE WHEN cntc >= 2 AND rnc = 1 THEN c END) AS BIGINT)
          |      AS sum_reoccurring_values,
          |    CAST(SUM(c - 2 * prev + prev2) AS BIGINT) AS msd2_num
          |  FROM r GROUP BY user_id, n, s)
          |SELECT user_id, n, sum_c, abs_energy, min_c, max_c, med2,
          |  sum_abs_change, count_above_mean,
          |  COALESCE(strike, CAST(0 AS BIGINT)) AS longest_strike_above_mean,
          |  CASE WHEN acd = 0 THEN NULL
          |       ELSE CAST(acn AS DOUBLE) / CAST(acd AS DOUBLE) END AS ac1,
          |  CAST(n * abs_energy - sum_c * sum_c AS BIGINT) AS var_num,
          |  sqrt(CAST(COALESCE(sqch, 0) AS DOUBLE)) AS cid_ce,
          |  c3_sum, n_crossings, count_below_mean,
          |  COALESCE(strikeb, CAST(0 AS BIGINT)) AS longest_strike_below_mean,
          |  first_loc_max, last_loc_min, n_distinct, n_peaks,
          |  sum_reoccurring_points, sum_reoccurring_values, msd2_num
          |FROM agg LEFT JOIN str USING (user_id) LEFT JOIN strb USING (user_id)
          |ORDER BY user_id""".stripMargin

  val all: Vector[Q] = Vector(

    // --- exact dedup on normalized-text md5 (keep lowest doc_id)
    Q("ext_dedup_exact",
      """WITH fp AS (
        |  SELECT doc_id, source,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                            ' +', ' ', 'g'))) AS f
        |  FROM documents),
        |keep AS (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f)
        |SELECT source, COUNT(*) AS kept
        |FROM fp JOIN keep USING (f, doc_id)
        |GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Dedup.exactTextDedup(t(spark, dir, "documents"), "text", "doc_id")
        .groupBy($"source").agg(count(lit(1)).as("kept"))
        .orderBy($"source")
    },

    // --- exact n-gram Jaccard near-dup pairs (library op, exact oracle).
    //     Both sides apply the default df-cap (shingles in >1000 docs are
    //     dropped before pairing; sizes measured over the capped universe)
    //     so the oracle stays exact even if the fixture grows a
    //     stop-phrase shingle.
    Q("ext_dedup_jaccard",
      s"""WITH $shinglesCte,
         |qual AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 1000),
         |shc AS (SELECT s.doc_id, s.sh FROM sh s JOIN qual q ON s.sh = q.sh),
         |csz AS (SELECT doc_id, COUNT(*) AS sz FROM shc GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
         |  FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b, common, sa.sz AS size_a, sb.sz AS size_b,
         |       CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) AS jaccard
         |FROM pairs
         |JOIN csz sa ON doc_a = sa.doc_id
         |JOIN csz sb ON doc_b = sb.doc_id
         |WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Dedup.ngramJaccardPairs(t(spark, dir, "documents"), "text", "doc_id",
          n = 3, threshold = 0.8)
        .select($"doc_a", $"doc_b", $"common",
          $"size_a", $"size_b", $"jaccard")
        .orderBy($"doc_a", $"doc_b")
    },

    // --- PPJoin prefix-filtered exact similarity join. The algorithm is
    //     LOSSLESS (prefix/length/positional filters only prune pairs the
    //     exact verify would reject; both are relaxed one count against
    //     double rounding at the threshold boundary), so the oracle is
    //     simply the UNCAPPED exact-Jaccard pair set — no filter replay
    //     needed. jaccard is an exact rational of exact ints (no
    //     rounding); ints are BIGINT both sides.
    Q("ext_dedup_ppjoin",
      s"""WITH $shinglesCte,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b, CAST(common AS BIGINT) AS common,
         |       CAST(sa.sz AS BIGINT) AS size_a, CAST(sb.sz AS BIGINT) AS size_b,
         |       CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) AS jaccard
         |FROM pairs
         |JOIN sizes sa ON doc_a = sa.doc_id
         |JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Dedup.ppjoinPairs(t(spark, dir, "documents"), "text", "doc_id",
          n = 3, threshold = 0.8)
        .orderBy($"doc_a", $"doc_b")
    },

    // --- MinHash+LSH near-dup pairs with exact verification. Oracle = the
    //     exact Jaccard pairs: the planted near-dups sit at j≈0.99 where
    //     16-band/4-row LSH recall is 1 - (1-j^4)^16 ≈ 1 - 4e-23.
    Q("ext_dedup_minhash",
      s"""$jaccardPairsSql
         |ORDER BY doc_a, doc_b""".stripMargin
        .replace("SELECT doc_a, doc_b, common, sa.sz AS size_a, sb.sz AS size_b,",
          "SELECT doc_a, doc_b,")) { (spark, dir) =>
      import spark.implicits._
      Dedup.minhashDedupPairs(t(spark, dir, "documents"), "text", "doc_id",
          n = 3, threshold = 0.8, bands = 16, rowsPerBand = 4)
        .select($"doc_a", $"doc_b", $"jaccard")
        .orderBy($"doc_a", $"doc_b")
    },

    // --- transitive duplicate-cluster resolution: MinHash pairs →
    //     connected components → (doc_id, cluster = smallest member).
    //     Oracle replays the exact-Jaccard pair list (identical to the
    //     MinHash output at the planted j≈0.99 operating point, as
    //     ext_dedup_minhash establishes) through a recursive min-label CTE.
    Q("ext_dedup_clusters",
      s"""WITH RECURSIVE $shinglesCte,
         |jp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |pe AS (
         |  SELECT doc_a, doc_b FROM jp
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id
         |  WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.8),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pe
         |          UNION SELECT doc_b, doc_a FROM pe),
         |cc AS (
         |  SELECT DISTINCT a AS node, a AS label FROM edges
         |  UNION
         |  SELECT e.b AS node, cc.label FROM cc JOIN edges e ON e.a = cc.node)
         |SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster
         |FROM cc GROUP BY node ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.operators.Components
      val pairs = Dedup.minhashDedupPairs(t(spark, dir, "documents"), "text", "doc_id",
        n = 3, threshold = 0.8, bands = 16, rowsPerBand = 4)
      Components.connectedComponents(pairs, "doc_a", "doc_b")
        .select($"node".as("doc_id"), $"cluster")
        .orderBy($"doc_id")
    },

    // --- the same components, resolved by two-phase star contraction
    //     (large-star/small-star, O(log n) rounds independent of graph
    //     diameter — the scale path for long-chain graphs where
    //     min-label's O(diameter) rounds blow up). Identical output
    //     contract, identical recursive-CTE oracle.
    Q("ext_cc_star",
      s"""WITH RECURSIVE $shinglesCte,
         |jp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |pe AS (
         |  SELECT doc_a, doc_b FROM jp
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id
         |  WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.8),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pe
         |          UNION SELECT doc_b, doc_a FROM pe),
         |cc AS (
         |  SELECT DISTINCT a AS node, a AS label FROM edges
         |  UNION
         |  SELECT e.b AS node, cc.label FROM cc JOIN edges e ON e.a = cc.node)
         |SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster
         |FROM cc GROUP BY node ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.operators.Components
      val pairs = Dedup.minhashDedupPairs(t(spark, dir, "documents"), "text", "doc_id",
        n = 3, threshold = 0.8, bands = 16, rowsPerBand = 4)
      Components.connectedComponentsStar(pairs, "doc_a", "doc_b")
        .select($"node".as("doc_id"), $"cluster")
        .orderBy($"doc_id")
    },

    // --- LSH candidate-quality audit over the ENGINE-PORTABLE MinHash
    //     (md5-60-bit shingle hashes mod 2³¹−1, universal-hash signature
    //     fold, polynomial band buckets): DuckDB replays the ENTIRE LSH
    //     pipeline — signature, banding, candidate join — with the same
    //     interpolated (aᵢ, bᵢ) literals, so candidate counts, precision
    //     and recall gate bit-exactly (counts are BIGINT; prec/rec are
    //     exact long/long rationals, unrounded). Two parameter points —
    //     the production 16×4 and a deliberately coarse 4×2 (higher
    //     collision rate, lower precision) — so the instrument shows the
    //     S-curve trade-off it exists to measure.
    Q("ext_lsh_recall", {
      val (as, bs) = graft.operators.Dedup.minhashCoefs(64, 42L)
      val coefRows = (0 until 64)
        .map(i => s"(${i}, ${as(i)}, ${bs(i)})").mkString(", ")
      // one banding chain per config; the 4×2 point reuses coefficients
      // i < 8 (minhashCoefs is per-i deterministic, so the first 8 of the
      // 64-wide table ARE the 8-wide table)
      def chain(tag: String, bands: Int, rows: Int): String = {
        val nh = bands * rows
        val ss = (0 until rows).map(j =>
          s"MAX(CASE WHEN i % $rows = $j THEN s END) AS s$j").mkString(",\n         |    ")
        val fold = (0 until rows).foldLeft("0")((acc, j) =>
          s"(($acc * 1000003 + s$j) % 2147483647)")
        s"""piv_$tag AS (SELECT doc_id, i // $rows AS band,
         |    $ss
         |  FROM sig WHERE i < $nh GROUP BY doc_id, i // $rows),
         |bk_$tag AS (SELECT doc_id, band, $fold AS bucket FROM piv_$tag),
         |cand_$tag AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk_$tag a JOIN bk_$tag b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |m_$tag AS (SELECT '$tag' AS cfg,
         |    (SELECT COUNT(*) FROM pe) AS truth_pairs,
         |    (SELECT COUNT(*) FROM cand_$tag) AS cand_pairs,
         |    (SELECT COUNT(*) FROM pe JOIN cand_$tag USING (doc_a, doc_b)) AS tp)"""
      }
      s"""WITH $shinglesCte,
         |hp AS (SELECT doc_id,
         |    (CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT)) % 2147483647 AS hp
         |  FROM sh),
         |coef(i, a, b) AS (VALUES $coefRows),
         |sig AS (SELECT doc_id, i, MIN((hp * a + b) % 2147483647) AS s
         |  FROM hp CROSS JOIN coef GROUP BY doc_id, i),
         |jp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |pe AS (SELECT doc_a, doc_b FROM jp
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id
         |  WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.8),
         |${chain("b16r4", 16, 4)},
         |${chain("b4r2", 4, 2)},
         |u AS (SELECT * FROM m_b16r4 UNION ALL SELECT * FROM m_b4r2)
         |SELECT cfg, CAST(truth_pairs AS BIGINT) AS truth_pairs,
         |  CAST(cand_pairs AS BIGINT) AS cand_pairs,
         |  CAST(tp AS BIGINT) AS tp,
         |  CAST(cand_pairs - tp AS BIGINT) AS fp,
         |  CAST(truth_pairs - tp AS BIGINT) AS fn,
         |  CAST(tp AS DOUBLE) / CAST(cand_pairs AS DOUBLE) AS prec,
         |  CAST(tp AS DOUBLE) / CAST(truth_pairs AS DOUBLE) AS rec
         |FROM u ORDER BY cfg""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      val docs = t(spark, dir, "documents")
      Dedup.lshAudit(docs, "text", "doc_id",
          n = 3, threshold = 0.8, bands = 16, rowsPerBand = 4)
        .withColumn("cfg", lit("b16r4")).select("cfg", "truth_pairs",
          "cand_pairs", "tp", "fp", "fn", "prec", "rec")
        .unionAll(Dedup.lshAudit(docs, "text", "doc_id",
            n = 3, threshold = 0.8, bands = 4, rowsPerBand = 2)
          .withColumn("cfg", lit("b4r2")).select("cfg", "truth_pairs",
            "cand_pairs", "tp", "fp", "fn", "prec", "rec"))
        .orderBy($"cfg")
    },

    // --- §2.16 streaming near-dup filter ≡ batch banding: the stateful
    //     bucket-ownership filter (flatMapGroupsWithState) run over the
    //     PORTABLE banding as a real streaming query; the per-doc verdict
    //     (some band bucket already claimed by a smaller doc) replays as
    //     the min-owner SQL over the identical bk chain.
    Q("op_stream_neardup_parity",
      s"""WITH $shinglesCte,
         |$portableBkCte,
         |own AS (SELECT band, bucket, MIN(doc_id) AS mn
         |        FROM bk GROUP BY band, bucket)
         |SELECT b.doc_id, bool_or(b.doc_id > o.mn) AS near_dup_candidate
         |FROM bk b JOIN own o ON b.band = o.band AND b.bucket = o.bucket
         |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.streaming.StreamOps
      val stageDir = OpsExtra.StreamParity.stage(spark, dir, "documents", "doc_id")
      val rawSchema = spark.read.parquet(stageDir.toString).schema
      val stream = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString)
      val sinkName = s"strm_neardup_${OpsExtra.StreamParity.next()}"
      val q = StreamOps.streamingNearDupCandidates(stream, portable = true)
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        OpsExtra.StreamParity.assertMultiBatch(q)
      } finally q.stop()
      StreamOps.nearDupVerdicts(spark.table(sinkName))
        .orderBy($"doc_id")
    },

    // --- §2.16 streaming near-dup AGAINST the static persisted LSH
    //     index (r12 VERDICT #2): history (doc_id < 400) persisted once
    //     with the PORTABLE banding (family recorded in the index's
    //     params table — the stream bands itself with those params, so
    //     family/param mismatches are impossible by construction); the
    //     crawl stream (ALL docs — a re-crawl: history pages flow
    //     through the firehose again and match themselves, which the
    //     downstream dedup rightly discards; streaming only new docs
    //     would leave a single non-empty micro-batch on the staged
    //     range files) probes it via a stateless stream-static join
    //     across ≥3 real micro-batches. Batch boundaries cannot matter
    //     (no keyed state), so the oracle is the full band-collision
    //     replay against the index side over the identical portable bk
    //     chain.
    Q("op_stream_neardup_index_parity",
      s"""WITH $shinglesCte,
         |$portableBkCte
         |SELECT b.doc_id, CAST(COUNT(DISTINCT a.doc_id) AS BIGINT) AS index_matches
         |FROM bk b JOIN bk a ON b.band = a.band AND b.bucket = a.bucket
         |WHERE a.doc_id < 400
         |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.streaming.StreamOps
      Dedup.dropIndex(spark, "graft_snd_idx")
      val docs = t(spark, dir, "documents")
      Dedup.minhashIndexPersist(docs.filter($"doc_id" < 400),
        "text", "doc_id", "graft_snd_idx", buckets = 8, portable = true)
      val stageDir = OpsExtra.StreamParity.stage(spark, dir, "documents", "doc_id")
      val rawSchema = spark.read.parquet(stageDir.toString).schema
      // restart leg (r13 VERDICT #5): first staged file → kill → restart
      // from the same checkpoint over the full set. Stateless probe, so
      // the union across the restart must equal the one-shot oracle;
      // per-batch overwrite keyed on the batch id = the exactly-once
      // foreachBatch sink recipe.
      val ckDir = java.nio.file.Files
        .createTempDirectory("graft_snd_ck").toString
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_snd_out").toString
      val liveDir = java.nio.file.Files.createTempDirectory("graft_snd_live")
      import scala.jdk.CollectionConverters._
      val staged = java.nio.file.Files.list(stageDir).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .toVector.sortBy(_.getFileName.toString)
      def copyIn(p: java.nio.file.Path): Unit =
        java.nio.file.Files.copy(p, liveDir.resolve(p.getFileName),
          java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
      copyIn(staged.head)
      def startRun() = {
        val stream = spark.readStream.schema(rawSchema)
          .option("maxFilesPerTrigger", "1").parquet(liveDir.toString)
        StreamOps.streamingNearDupAgainstIndex(stream, "graft_snd_idx")
          .writeStream
          .foreachBatch { (hits: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
            StreamOps.parquetBatchSink(outDir)(hits, bid)
          }
          .option("checkpointLocation", ckDir)
          .start()
      }
      val q1 = startRun()
      try q1.processAllAvailable() finally q1.stop()
      staged.tail.foreach(copyIn)
      val q = startRun()
      try {
        q.processAllAvailable()
        val nb = q.recentProgress.count(_.numInputRows > 0)
        require(nb >= OpsExtra.StreamParity.Parts - 1,
          s"post-restart run saw $nb non-empty batches")
      } finally q.stop()
      StreamOps.nearDupIndexVerdicts(
          spark.read.parquet(outDir).select($"doc_id", $"band", $"index_id"))
        .orderBy($"doc_id")
    },

    // --- §2.16 the FULL ingest-time dedup: every micro-batch runs the
    //     complete candidates-then-verify path against the persisted
    //     index via foreachBatch (exact Jaccard vs the index's shingle
    //     store — not just band candidates). Stateless per batch, so
    //     the oracle is the one-shot batch replay: exact Jaccard of
    //     (any stream doc, index doc < 400) pairs at >= 0.8, self-pairs
    //     included (a re-crawled history page matches itself at 1.0 —
    //     exactly what ingest dedup should flag). Same fixture gap
    //     argument as ext_dedup_incremental_lsh for banding recall.
    Q("op_stream_dedup_index_parity",
      s"""WITH $shinglesCte,
         |jp AS (
         |  SELECT b.doc_id AS new_id, a.doc_id AS index_id, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh
         |  WHERE a.doc_id < 400
         |  GROUP BY b.doc_id, a.doc_id)
         |SELECT new_id, index_id,
         |       CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) AS jaccard
         |FROM jp
         |JOIN sizes sn ON new_id = sn.doc_id
         |JOIN sizes si ON index_id = si.doc_id
         |WHERE CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) >= 0.8
         |ORDER BY new_id, index_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.streaming.StreamOps
      Dedup.dropIndex(spark, "graft_sdv_idx")
      val docs = t(spark, dir, "documents")
      Dedup.minhashIndexPersist(docs.filter($"doc_id" < 400),
        "text", "doc_id", "graft_sdv_idx", buckets = 8)
      val stageDir = OpsExtra.StreamParity.stage(spark, dir, "documents", "doc_id")
      val rawSchema = spark.read.parquet(stageDir.toString).schema
      val stream = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString)
      val outDir = java.nio.file.Files.createTempDirectory("graft_sdv_out")
        .toString
      // restart leg (r13 VERDICT #5): process the first staged file,
      // kill the query, restart from the SAME checkpoint over the full
      // file set — the stateless stream-static probe must produce the
      // identical union (per-batch overwrite keyed on the batch id =
      // the exactly-once sink recipe under foreachBatch replay)
      val ckDir = java.nio.file.Files
        .createTempDirectory("graft_sdv_ck").toString
      val liveDir = java.nio.file.Files
        .createTempDirectory("graft_sdv_live")
      import scala.jdk.CollectionConverters._
      val staged = java.nio.file.Files.list(stageDir).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .toVector.sortBy(_.getFileName.toString)
      def copyIn(p: java.nio.file.Path): Unit =
        java.nio.file.Files.copy(p, liveDir.resolve(p.getFileName),
          java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
      copyIn(staged.head)
      def mkStream() = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(liveDir.toString)
      val sink = StreamOps.parquetBatchSink(outDir)
      val q1 = StreamOps.streamingDedupVerifiedAgainstIndex(
        mkStream(), "graft_sdv_idx", checkpoint = Some(ckDir))(sink)
      try q1.processAllAvailable() finally q1.stop()
      staged.tail.foreach(copyIn)
      val q = StreamOps.streamingDedupVerifiedAgainstIndex(
        mkStream(), "graft_sdv_idx", checkpoint = Some(ckDir))(sink)
      try {
        q.processAllAvailable()
        // ≥ Parts batches moved rows ACROSS the restart in total
        val nb = q.recentProgress.count(_.numInputRows > 0)
        require(nb >= OpsExtra.StreamParity.Parts - 1,
          s"post-restart run saw $nb non-empty batches")
      } finally q.stop()
      spark.read.parquet(outDir)
        .select($"new_id", $"index_id", $"jaccard")
        .orderBy($"new_id", $"index_id")
    },

    // --- §2.16 the SELF-MAINTAINING crawl loop: each micro-batch
    //     dedups against the index, survivors append INTO the index,
    //     and later batches must see them — the cascade is the whole
    //     point, so the stage boundaries must be oracle-replayable:
    //     StreamParity.stageFixed splits at EXPLICIT doc_id bounds
    //     (200, 400) instead of repartitionByRange's sampled ones.
    //     Initial index = docs < 100 (so batch 1 re-crawls them —
    //     self-match at j = 1.0 drops them, the correct re-crawl
    //     behavior). kept(d) = no j ≥ 0.8 partner among initial-index
    //     docs or earlier-batch keepers; the oracle replays the
    //     cascade as three stratified CTE layers over exact Jaccard
    //     (same fixture gap argument as ext_dedup_incremental_lsh).
    Q("op_stream_dedup_selfmaintain_parity", selfMaintainSql) { (spark, dir) =>
      import spark.implicits._
      import graft.streaming.StreamOps
      Dedup.dropIndex(spark, "graft_ssm_idx")
      val docs = t(spark, dir, "documents")
      Dedup.minhashIndexPersist(docs.filter($"doc_id" < 100),
        "text", "doc_id", "graft_ssm_idx", buckets = 8)
      val stageDir = OpsExtra.StreamParity.stageFixed(
        spark, dir, "documents", "doc_id", Seq(200L, 400L))
      val rawSchema = spark.read.parquet(stageDir.toString).schema
      val stream = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString)
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_ssm_out").toString
      val q = StreamOps.streamingDedupSelfMaintaining(
        stream, "graft_ssm_idx")(
        StreamOps.parquetBatchSink(outDir, Seq("doc_id")))
      try {
        q.processAllAvailable()
        OpsExtra.StreamParity.assertMultiBatch(q)
      } finally q.stop()
      spark.read.parquet(outDir).select($"doc_id").orderBy($"doc_id")
    },

    // --- REPLAY IDEMPOTENCE of the self-maintaining loop (r13 VERDICT
    //     #1 / ADVICE r13 medium): the same cascade, but with crashes
    //     injected (a) after the sink write, before the append; (b)
    //     between the append's bands and shingles writes; (c) after the
    //     ledger row, before the offset commit — each followed by a
    //     restart from the SAME checkpoint. foreachBatch is
    //     at-least-once, so the final sink output must STILL equal the
    //     no-failure oracle bit-for-bit: un-ledgered replays recompute
    //     identical survivors (the ledger hides half-appended bands),
    //     re-sink by per-batch overwrite, re-append without duplicating
    //     shingles, and a fully-ledgered batch is skipped outright
    //     (its sink is NOT re-invoked — asserted by call counts).
    Q("op_stream_dedup_selfmaintain_replay", selfMaintainSql) { (spark, dir) =>
      import spark.implicits._
      import graft.streaming.StreamOps
      Dedup.dropIndex(spark, "graft_ssr_idx")
      val docs = t(spark, dir, "documents")
      Dedup.minhashIndexPersist(docs.filter($"doc_id" < 100),
        "text", "doc_id", "graft_ssr_idx", buckets = 8)
      val stageDir = OpsExtra.StreamParity.stageFixed(
        spark, dir, "documents", "doc_id", Seq(200L, 400L))
      val rawSchema = spark.read.parquet(stageDir.toString).schema
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_ssr_out").toString
      val ckDir = java.nio.file.Files
        .createTempDirectory("graft_ssr_ck").toString
      // one-shot crash switches: after-sink on ledger batch 2, after-
      // ledger on batch 2's retry, between-appends on batch 3
      val sinkCrash = new java.util.concurrent.atomic.AtomicBoolean(true)
      val ledgerCrash = new java.util.concurrent.atomic.AtomicBoolean(true)
      val bandsCrash = new java.util.concurrent.atomic.AtomicBoolean(true)
      val sinkCalls = new scala.collection.concurrent.TrieMap[Long, Int]()
      Dedup.appendFailpoint = (prefix, stage, bid) =>
        if (prefix == "graft_ssr_idx") {
          if (stage == "bands" && bid == 3L && bandsCrash.getAndSet(false))
            sys.error("injected crash between the bands and shingles writes")
          if (stage == "ledger" && bid == 2L && ledgerCrash.getAndSet(false))
            sys.error("injected crash after the ledger, before the offset commit")
        }
      try {
        def attempt(): Boolean = {
          val stream = spark.readStream.schema(rawSchema)
            .option("maxFilesPerTrigger", "1").parquet(stageDir.toString)
          val q = StreamOps.streamingDedupSelfMaintaining(
            stream, "graft_ssr_idx", checkpoint = Some(ckDir)) { (survivors, bid) =>
            sinkCalls.updateWith(bid)(c => Some(c.getOrElse(0) + 1))
            StreamOps.parquetBatchSink(outDir, Seq("doc_id"))(survivors, bid)
            if (bid == 2L && sinkCrash.getAndSet(false))
              sys.error("injected crash after the sink, before the append")
          }
          try { q.processAllAvailable(); q.exception.isEmpty }
          catch { case scala.util.control.NonFatal(_) => false }
          finally q.stop()
        }
        var runs = 1
        while (!attempt() && runs < 8) runs += 1
        require(runs == 4 && sinkCrash.get() == false &&
            ledgerCrash.get() == false && bandsCrash.get() == false,
          s"replay gate expected exactly 3 injected crashes + 1 clean run, ran $runs")
        // exactly-once where it matters: batch 2's post-ledger replay was
        // SKIPPED (2 sink calls, not 3); batches re-sank once per retry
        require(sinkCalls.get(1L).contains(1) && sinkCalls.get(2L).contains(2) &&
            sinkCalls.get(3L).contains(2),
          s"sink call counts off (ledgered-skip broken?): $sinkCalls")
      } finally Dedup.appendFailpoint = (_, _, _) => ()
      spark.read.parquet(outDir).select($"doc_id").orderBy($"doc_id")
    },

    // --- WITHIN-BATCH near-dup in the self-maintaining loop (r13
    //     VERDICT #3, opt-in intraBatch = true): a crawl batch that
    //     contains its own dups is cleaned before the append — greedy
    //     min-id rule over the batch's index-probe survivors, replayed
    //     by the oracle as per-stratum s_t → k_t layers. Same fixture
    //     gap argument as the parity gate (pairs at j ≥ 0.9, strangers
    //     ≤ 0.067).
    Q("op_stream_dedup_selfmaintain_intra", selfMaintainIntraSql) { (spark, dir) =>
      import spark.implicits._
      import graft.streaming.StreamOps
      Dedup.dropIndex(spark, "graft_ssi_idx")
      val docs = t(spark, dir, "documents")
      Dedup.minhashIndexPersist(docs.filter($"doc_id" < 100),
        "text", "doc_id", "graft_ssi_idx", buckets = 8)
      val stageDir = OpsExtra.StreamParity.stageFixed(
        spark, dir, "documents", "doc_id", Seq(200L, 400L))
      val rawSchema = spark.read.parquet(stageDir.toString).schema
      val stream = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString)
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_ssi_out").toString
      val q = StreamOps.streamingDedupSelfMaintaining(
        stream, "graft_ssi_idx", intraBatch = true)(
        StreamOps.parquetBatchSink(outDir, Seq("doc_id")))
      try {
        q.processAllAvailable()
        OpsExtra.StreamParity.assertMultiBatch(q)
      } finally q.stop()
      spark.read.parquet(outDir).select($"doc_id").orderBy($"doc_id")
    },

    // --- incremental near-dup detection: a NEW batch (doc_id >= 400)
    //     probed against the EXISTING corpus (doc_id < 400) — cross-side
    //     candidates only, exact-verified. The daily-crawl-vs-history
    //     production shape; oracle = exact cross-boundary Jaccard pairs.
    //     Recall margin: the weakest true pair in the fixture sits at
    //     j = 0.90, where 16-band/4-row LSH misses with probability
    //     (1 - 0.9^4)^16 ≈ 4e-8 — deterministic per fixture, and still
    //     vanishing even if a regenerated fixture lands pairs near the
    //     0.8 threshold (≈1e-4 per pair).
    Q("ext_dedup_incremental",
      s"""WITH $shinglesCte,
         |jp AS (
         |  SELECT b.doc_id AS new_id, a.doc_id AS index_id, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh
         |  WHERE a.doc_id < 400 AND b.doc_id >= 400
         |  GROUP BY b.doc_id, a.doc_id)
         |SELECT new_id, index_id,
         |       CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) AS jaccard
         |FROM jp
         |JOIN sizes sn ON new_id = sn.doc_id
         |JOIN sizes si ON index_id = si.doc_id
         |WHERE CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) >= 0.8
         |ORDER BY new_id, index_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = t(spark, dir, "documents")
      Dedup.minhashDedupPairsAgainst(
          docs.filter($"doc_id" >= 400), docs.filter($"doc_id" < 400),
          "text", "doc_id", n = 3, threshold = 0.8)
        .orderBy($"new_id", $"index_id")
    },

    // --- incremental near-dup against a PERSISTED LSH index (r11
    //     VERDICT #4): the history's (band, bucket, index_id) table and
    //     shingle store are written ONCE as bucketed tables; the batch
    //     path joins against them with no exchange and no re-banding on
    //     the history side (PlanShapeSpec pins the plan). Same oracle
    //     as ext_dedup_incremental: exact cross-batch Jaccard >= 0.8 —
    //     minhash banding has full recall on the fixture's near-dup
    //     structure, so candidates-then-verify equals the exact answer.
    //     Gap argument (selection-oracle convention): the fixture's
    //     near-dup pairs are word-level edits of a shared base (true
    //     j ≳ 0.9) and unrelated pairs sit at j ≲ 0.2 — nothing lives
    //     near the 0.8 threshold, where 16×4 banding misses ~1.4e-3 of
    //     borderline pairs (ext_lsh_recall gates that behavior
    //     explicitly). A fixture change planting j ≈ 0.8 pairs would
    //     red this gate spuriously; keep the gap.
    Q("ext_dedup_incremental_lsh",
      s"""WITH $shinglesCte,
         |jp AS (
         |  SELECT b.doc_id AS new_id, a.doc_id AS index_id, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh
         |  WHERE a.doc_id < 400 AND b.doc_id >= 400
         |  GROUP BY b.doc_id, a.doc_id)
         |SELECT new_id, index_id,
         |       CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) AS jaccard
         |FROM jp
         |JOIN sizes sn ON new_id = sn.doc_id
         |JOIN sizes si ON index_id = si.doc_id
         |WHERE CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) >= 0.8
         |ORDER BY new_id, index_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      // fresh catalog per JVM but persistent warehouse dir — drop both
      // the entries and any orphan locations (op_bucketed_join pattern)
      Dedup.dropIndex(spark, "graft_inc_idx")
      val docs = t(spark, dir, "documents")
      Dedup.minhashIndexPersist(docs.filter($"doc_id" < 400),
        "text", "doc_id", "graft_inc_idx", buckets = 8)
      Dedup.minhashDedupPairsAgainstIndex(docs.filter($"doc_id" >= 400),
          "text", "doc_id", "graft_inc_idx", n = 3, threshold = 0.8)
        .orderBy($"new_id", $"index_id")
    },

    // --- persisted PPJoin PREFIX index (r14): the EXACT incremental
    //     near-dup path. Unlike the LSH gates this needs NO fixture gap
    //     argument: the prefix/length/positional filter chain is
    //     LOSSLESS, so the oracle — the complete exact cross-batch
    //     Jaccard pair set — is what the operator guarantees at any
    //     corpus, not just this fixture. Batch prefixes are cut under
    //     the index's frozen token order; jaccard is an exact rational.
    Q("ext_dedup_incremental_ppjoin",
      s"""WITH $shinglesCte,
         |jp AS (
         |  SELECT b.doc_id AS new_id, a.doc_id AS index_id, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh
         |  WHERE a.doc_id < 400 AND b.doc_id >= 400
         |  GROUP BY b.doc_id, a.doc_id)
         |SELECT new_id, index_id,
         |       CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) AS jaccard
         |FROM jp
         |JOIN sizes sn ON new_id = sn.doc_id
         |JOIN sizes si ON index_id = si.doc_id
         |WHERE CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) >= 0.8
         |ORDER BY new_id, index_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Dedup.dropPpjoinIndex(spark, "graft_pp_idx")
      val docs = t(spark, dir, "documents")
      Dedup.ppjoinIndexPersist(docs.filter($"doc_id" < 400),
        "text", "doc_id", "graft_pp_idx", buckets = 8, n = 3, threshold = 0.8)
      Dedup.ppjoinPairsAgainstIndex(docs.filter($"doc_id" >= 400),
          "text", "doc_id", "graft_pp_idx", threshold = 0.8)
        .orderBy($"new_id", $"index_id")
    },

    // --- streaming EXACT ingest dedup vs the persisted PPJoin prefix
    //     index (r14): the lossless twin of op_stream_dedup_index_parity.
    //     The full doc stream (a re-crawl: history pages flow through
    //     again and must self-match at j = 1.0) probes the static index
    //     across ≥3 real micro-batches with a kill-and-restart leg;
    //     stateless per batch, so the oracle is the one-shot replay —
    //     and because the probe is LOSSLESS, the oracle (the complete
    //     exact cross-pair set, self-pairs included) holds with no
    //     fixture gap argument.
    Q("op_stream_ppjoin_index_parity",
      s"""WITH $shinglesCte,
         |jp AS (
         |  SELECT b.doc_id AS new_id, a.doc_id AS index_id, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh
         |  WHERE a.doc_id < 400
         |  GROUP BY b.doc_id, a.doc_id)
         |SELECT new_id, index_id,
         |       CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) AS jaccard
         |FROM jp
         |JOIN sizes sn ON new_id = sn.doc_id
         |JOIN sizes si ON index_id = si.doc_id
         |WHERE CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) >= 0.8
         |ORDER BY new_id, index_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.streaming.StreamOps
      Dedup.dropPpjoinIndex(spark, "graft_spp_idx")
      val docs = t(spark, dir, "documents")
      Dedup.ppjoinIndexPersist(docs.filter($"doc_id" < 400),
        "text", "doc_id", "graft_spp_idx", buckets = 8, n = 3, threshold = 0.8)
      val stageDir = OpsExtra.StreamParity.stage(spark, dir, "documents", "doc_id")
      val rawSchema = spark.read.parquet(stageDir.toString).schema
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_spp_out").toString
      val ckDir = java.nio.file.Files
        .createTempDirectory("graft_spp_ck").toString
      val liveDir = java.nio.file.Files
        .createTempDirectory("graft_spp_live")
      import scala.jdk.CollectionConverters._
      val staged = java.nio.file.Files.list(stageDir).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .toVector.sortBy(_.getFileName.toString)
      def copyIn(p: java.nio.file.Path): Unit =
        java.nio.file.Files.copy(p, liveDir.resolve(p.getFileName),
          java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
      copyIn(staged.head)
      def mkStream() = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(liveDir.toString)
      val sink = StreamOps.parquetBatchSink(outDir)
      val q1 = StreamOps.streamingExactDedupAgainstIndex(
        mkStream(), "graft_spp_idx", checkpoint = Some(ckDir))(sink)
      try q1.processAllAvailable() finally q1.stop()
      staged.tail.foreach(copyIn)
      val q = StreamOps.streamingExactDedupAgainstIndex(
        mkStream(), "graft_spp_idx", checkpoint = Some(ckDir))(sink)
      try {
        q.processAllAvailable()
        val nb = q.recentProgress.count(_.numInputRows > 0)
        require(nb >= OpsExtra.StreamParity.Parts - 1,
          s"post-restart run saw $nb non-empty batches")
      } finally q.stop()
      spark.read.parquet(outDir)
        .select($"new_id", $"index_id", $"jaccard")
        .orderBy($"new_id", $"index_id")
    },

    // --- APPEND path of the persisted LSH index (r12 VERDICT #1): the
    //     index is built from docs < 300, then docs 300–399 are
    //     insertInto-appended (banding params read from the index's own
    //     params table — an append can never diverge from the build),
    //     and batch docs >= 400 queries the combined index. The final
    //     index CONTENT equals ext_dedup_incremental_lsh's (all docs
    //     < 400), so the oracle is the same exact cross-batch Jaccard;
    //     the same fixture gap argument applies (near-dups at j ≳ 0.9,
    //     strangers at j ≲ 0.2 — nothing near the 0.8 threshold).
    //     PlanShapeSpec pins no-exchange above the history scans AFTER
    //     an append (multi-file buckets still report their hash layout).
    Q("ext_dedup_incremental_lsh_append",
      s"""WITH $shinglesCte,
         |jp AS (
         |  SELECT b.doc_id AS new_id, a.doc_id AS index_id, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh
         |  WHERE a.doc_id < 400 AND b.doc_id >= 400
         |  GROUP BY b.doc_id, a.doc_id)
         |SELECT new_id, index_id,
         |       CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) AS jaccard
         |FROM jp
         |JOIN sizes sn ON new_id = sn.doc_id
         |JOIN sizes si ON index_id = si.doc_id
         |WHERE CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) >= 0.8
         |ORDER BY new_id, index_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Dedup.dropIndex(spark, "graft_incap_idx")
      val docs = t(spark, dir, "documents")
      Dedup.minhashIndexPersist(docs.filter($"doc_id" < 300),
        "text", "doc_id", "graft_incap_idx", buckets = 8)
      Dedup.minhashIndexAppend(docs.filter($"doc_id" >= 300 && $"doc_id" < 400),
        "text", "doc_id", "graft_incap_idx")
      Dedup.minhashDedupPairsAgainstIndex(docs.filter($"doc_id" >= 400),
          "text", "doc_id", "graft_incap_idx", n = 3, threshold = 0.8)
        .orderBy($"new_id", $"index_id")
    },

    // --- COMPACTION of the persisted LSH index (r13 VERDICT #2): five
    //     small appends fragment every bucket (one file per touched
    //     bucket per append); minhashIndexCompact rewrites both tables
    //     at one file per bucket with the SAME bucket spec. The
    //     compacted index's CONTENT equals the fragmented one (docs
    //     < 400), so the oracle is the same exact cross-batch Jaccard
    //     as ext_dedup_incremental_lsh_append — query(compacted) must
    //     equal the exact answer, and PlanShapeSpec separately pins
    //     query(compacted) ≡ query(fragmented) + the no-exchange layout
    //     surviving the rewrite.
    Q("ext_dedup_incremental_lsh_compact",
      s"""WITH $shinglesCte,
         |jp AS (
         |  SELECT b.doc_id AS new_id, a.doc_id AS index_id, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh
         |  WHERE a.doc_id < 400 AND b.doc_id >= 400
         |  GROUP BY b.doc_id, a.doc_id)
         |SELECT new_id, index_id,
         |       CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) AS jaccard
         |FROM jp
         |JOIN sizes sn ON new_id = sn.doc_id
         |JOIN sizes si ON index_id = si.doc_id
         |WHERE CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) >= 0.8
         |ORDER BY new_id, index_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Dedup.dropIndex(spark, "graft_cmp_idx")
      val docs = t(spark, dir, "documents")
      Dedup.minhashIndexPersist(docs.filter($"doc_id" < 300),
        "text", "doc_id", "graft_cmp_idx", buckets = 8)
      // five daily appends → ≥6 write jobs' worth of files per table
      (0 until 5).foreach { k =>
        Dedup.minhashIndexAppend(
          docs.filter($"doc_id" >= 300 + 20 * k && $"doc_id" < 320 + 20 * k),
          "text", "doc_id", "graft_cmp_idx")
      }
      Dedup.minhashIndexCompact(spark, "graft_cmp_idx")
      Dedup.minhashDedupPairsAgainstIndex(docs.filter($"doc_id" >= 400),
          "text", "doc_id", "graft_cmp_idx", n = 3, threshold = 0.8)
        .orderBy($"new_id", $"index_id")
    },

    // --- DELETE path of the persisted LSH index (r13 VERDICT #2):
    //     retire docs [200, 300) from a docs-<400 index (takedown /
    //     expiry), then query the new batch — pairs with the retired
    //     docs must be gone, everything else untouched. Oracle = exact
    //     cross-batch Jaccard against the surviving index members.
    Q("ext_dedup_index_delete",
      s"""WITH $shinglesCte,
         |jp AS (
         |  SELECT b.doc_id AS new_id, a.doc_id AS index_id, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh
         |  WHERE a.doc_id < 400 AND NOT (a.doc_id >= 200 AND a.doc_id < 300)
         |    AND b.doc_id >= 400
         |  GROUP BY b.doc_id, a.doc_id)
         |SELECT new_id, index_id,
         |       CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) AS jaccard
         |FROM jp
         |JOIN sizes sn ON new_id = sn.doc_id
         |JOIN sizes si ON index_id = si.doc_id
         |WHERE CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) >= 0.8
         |ORDER BY new_id, index_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Dedup.dropIndex(spark, "graft_del_idx")
      val docs = t(spark, dir, "documents")
      Dedup.minhashIndexPersist(docs.filter($"doc_id" < 400),
        "text", "doc_id", "graft_del_idx", buckets = 8)
      Dedup.minhashIndexDelete(spark, "graft_del_idx",
        docs.filter($"doc_id" >= 200 && $"doc_id" < 300).select($"doc_id"))
      Dedup.minhashDedupPairsAgainstIndex(docs.filter($"doc_id" >= 400),
          "text", "doc_id", "graft_del_idx", n = 3, threshold = 0.8)
        .orderBy($"new_id", $"index_id")
    },

    // --- CRASH RECOVERY of the index rewrite (r15 VERDICT #3 — the
    //     append path got its replay gate in r14; this closes the
    //     compact/delete swap): a compaction is crashed at EVERY
    //     rewrite failpoint in turn (both __rw writes, the commit
    //     marker, both drops, both renames, done), recovered with
    //     minhashIndexRecover (roll-back before the marker, roll-forward
    //     after), and the index probe is required BIT-EQUAL to the
    //     pre-crash answer after every cycle. Starting a new rewrite on
    //     a crashed (marker-present) index must refuse loudly. The
    //     final probe gates against the same exact-Jaccard oracle as
    //     the compact gate — content never changes, whatever crashed.
    Q("ext_dedup_index_recover",
      s"""WITH $shinglesCte,
         |jp AS (
         |  SELECT b.doc_id AS new_id, a.doc_id AS index_id, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh
         |  WHERE a.doc_id < 400 AND b.doc_id >= 400
         |  GROUP BY b.doc_id, a.doc_id)
         |SELECT new_id, index_id,
         |       CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) AS jaccard
         |FROM jp
         |JOIN sizes sn ON new_id = sn.doc_id
         |JOIN sizes si ON index_id = si.doc_id
         |WHERE CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) >= 0.8
         |ORDER BY new_id, index_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val nm = "graft_rcv_idx"
      Dedup.dropIndex(spark, nm)
      val docs = t(spark, dir, "documents")
      Dedup.minhashIndexPersist(docs.filter($"doc_id" < 300),
        "text", "doc_id", nm, buckets = 8)
      (0 until 5).foreach { k =>
        Dedup.minhashIndexAppend(
          docs.filter($"doc_id" >= 300 + 20 * k && $"doc_id" < 320 + 20 * k),
          "text", "doc_id", nm)
      }
      // materialize probes to LOCAL rows before comparing: a DataFrame
      // planned pre-rewrite holds the old file listing and would read
      // dropped files when re-executed post-swap (bounded collect —
      // tens of pairs at gate scale)
      def probe(): Seq[(Long, Long, Double)] = Dedup
        .minhashDedupPairsAgainstIndex(
          docs.filter($"doc_id" >= 400), "text", "doc_id", nm,
          n = 3, threshold = 0.8)
        .orderBy($"new_id", $"index_id")
        .as[(Long, Long, Double)].collect().toSeq
      val want = probe()
      val stages = Seq(
        s"rw:${nm}_bands" -> "rolled_back",
        s"rw:${nm}_shingles" -> "rolled_back",
        "commit" -> "completed",
        s"drop:${nm}_bands" -> "completed",
        s"rename:${nm}_bands" -> "completed",
        s"drop:${nm}_shingles" -> "completed",
        s"rename:${nm}_shingles" -> "completed",
        "done" -> "clean")
      for ((stage, expect) <- stages) {
        Dedup.rewriteFailpoint = (m, s) =>
          if (s == stage && m.startsWith(nm))
            throw new RuntimeException("graft-rewrite-crash")
        val crashed =
          try { Dedup.minhashIndexCompact(spark, nm); false }
          catch {
            case e: RuntimeException
                if e.getMessage == "graft-rewrite-crash" => true
          } finally Dedup.rewriteFailpoint = (_, _) => ()
        require(crashed || stage == "done",
          s"failpoint $stage did not fire")
        if (expect == "completed") {
          // a new rewrite on a crashed index must refuse loudly
          val refused =
            try { Dedup.minhashIndexCompact(spark, nm); false }
            catch { case e: IllegalArgumentException
                if e.getMessage.contains("crashed rewrite") => true }
          require(refused, s"rewrite after crash at $stage did not refuse")
        }
        val outcome = Dedup.minhashIndexRecover(spark, nm)
        require(outcome == expect,
          s"recover after crash at $stage: got $outcome, want $expect")
        require(probe() == want,
          s"probe diverged after crash at $stage + recover")
      }
      Dedup.minhashDedupPairsAgainstIndex(
          docs.filter($"doc_id" >= 400), "text", "doc_id", nm,
          n = 3, threshold = 0.8)
        .orderBy($"new_id", $"index_id")
    },

    // --- DELETE path of the persisted PPJoin prefix index (r15 VERDICT
    //     #4): retire docs [200, 300) from a docs-<400 exact index, then
    //     probe the new batch — LOSSLESS, so the oracle (the complete
    //     exact cross-pair set against the SURVIVING members) needs no
    //     fixture gap argument: retired docs' pairs must vanish and
    //     everything else stay bit-equal. _ppdf keeps the frozen token
    //     order (documented selectivity staleness, never recall).
    //     PlanShapeSpec pins the post-delete no-exchange layout; the
    //     crash-recovery machinery is shared with (and gated by)
    //     ext_dedup_index_recover, plus a ppjoin-specific failpoint
    //     cycle in DedupSpec.
    Q("ext_dedup_ppjoin_delete",
      s"""WITH $shinglesCte,
         |jp AS (
         |  SELECT b.doc_id AS new_id, a.doc_id AS index_id, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh
         |  WHERE a.doc_id < 400 AND NOT (a.doc_id >= 200 AND a.doc_id < 300)
         |    AND b.doc_id >= 400
         |  GROUP BY b.doc_id, a.doc_id)
         |SELECT new_id, index_id,
         |       CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) AS jaccard
         |FROM jp
         |JOIN sizes sn ON new_id = sn.doc_id
         |JOIN sizes si ON index_id = si.doc_id
         |WHERE CAST(common AS DOUBLE) / CAST(sn.sz + si.sz - common AS DOUBLE) >= 0.8
         |ORDER BY new_id, index_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Dedup.dropPpjoinIndex(spark, "graft_ppdel_idx")
      val docs = t(spark, dir, "documents")
      Dedup.ppjoinIndexPersist(docs.filter($"doc_id" < 400),
        "text", "doc_id", "graft_ppdel_idx", buckets = 8, n = 3, threshold = 0.8)
      Dedup.ppjoinIndexDelete(spark, "graft_ppdel_idx",
        docs.filter($"doc_id" >= 200 && $"doc_id" < 300).select($"doc_id"))
      Dedup.ppjoinPairsAgainstIndex(docs.filter($"doc_id" >= 400),
          "text", "doc_id", "graft_ppdel_idx", threshold = 0.8)
        .orderBy($"new_id", $"index_id")
    },

    // --- quality-aware cluster representative selection: same transitive
    //     clusters as ext_dedup_clusters, but the KEPT member is the
    //     highest-n_chars doc (ties -> smallest id), the rule a real
    //     curation pipeline uses instead of min-id.
    Q("ext_dedup_best",
      s"""WITH RECURSIVE $shinglesCte,
         |jp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |pe AS (
         |  SELECT doc_a, doc_b FROM jp
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id
         |  WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.8),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pe
         |          UNION SELECT doc_b, doc_a FROM pe),
         |cc AS (
         |  SELECT DISTINCT a AS node, a AS label FROM edges
         |  UNION
         |  SELECT e.b AS node, cc.label FROM cc JOIN edges e ON e.a = cc.node),
         |members AS (SELECT node AS doc_id, min(label) AS cluster FROM cc GROUP BY node),
         |win AS (
         |  SELECT doc_id FROM (
         |    SELECT m.doc_id,
         |           row_number() OVER (PARTITION BY m.cluster
         |                              ORDER BY d.n_chars DESC, m.doc_id) AS rk
         |    FROM members m JOIN documents d ON m.doc_id = d.doc_id) r
         |  WHERE rk = 1),
         |losers AS (SELECT doc_id FROM members
         |           WHERE doc_id NOT IN (SELECT doc_id FROM win))
         |SELECT d.doc_id, d.n_chars FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
         |ORDER BY d.doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.operators.Components
      val docs = t(spark, dir, "documents")
      val pairs = Dedup.minhashDedupPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.8, bands = 16, rowsPerBand = 4)
      graft.api.GraftFrame(
          Components.dedupByClusterBest(docs, pairs, "doc_id", "n_chars"))
        .select("doc_id", "n_chars")
        .sortValues(Seq("doc_id"))
        .df
    },

    // --- SimHash near-dup candidates at the classic radius-3 setting
    //     (4 disjoint bands are complete for Hamming ≤ 3). The query runs
    //     the engine-portable md5 token-hash family (60 effective bits) so
    //     the oracle recomputes the identical signatures from scratch —
    //     per-bit ±1 votes, sign-packed, all-pairs Hamming ≤ 3 — making the
    //     banding pipeline fully differential-checked. The xxhash64 family
    //     stays the performance path (DedupSpec covers its completeness).
    Q("ext_dedup_simhash",
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |th AS (
        |  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        |  FROM toks),
        |votes AS (
        |  SELECT doc_id, b,
        |         SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS v
        |  FROM th, (SELECT unnest(range(60)) AS b) bits
        |  GROUP BY doc_id, b),
        |sigs AS (
        |  SELECT doc_id,
        |         SUM(CASE WHEN v >= 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS sig
        |  FROM votes GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
        |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Dedup.simhashNearDupPairsPortable(t(spark, dir, "documents"), "text", "doc_id",
          maxHamming = 3)
        .select($"doc_a", $"doc_b", $"hamming".cast("long").as("hamming"))
        .orderBy($"doc_a", $"doc_b")
    },

    // --- brute-force exact top-5 cosine neighbors for query vectors
    Q("ext_ann_topk",
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding AS qv FROM e WHERE vec_id < 10),
        |scored AS (
        |  SELECT qid, e.vec_id AS cid,
        |    round(
        |      list_sum(list_transform(range(1, 65),
        |        i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, 65),
        |           i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(range(1, 65),
        |             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))),
        |      4) AS sim
        |  FROM e, q WHERE e.vec_id <> qid)
        |SELECT qid, cid, sim, rank FROM (
        |  SELECT qid, cid, sim,
        |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT) AS rank
        |  FROM scored) r
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir, "embeddings")
      val queries = e.filter($"vec_id" < 10)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      val corpus = e.select($"vec_id".as("cid"), $"embedding".as("cvec"))
      Similarity.bruteForceTopK(queries, corpus, k = 5)
        .select($"qid", $"cid", $"sim", $"rank".cast("long").as("rank"))
        .orderBy($"qid", $"rank")
    },

    // --- kneighbors_graph (mars/learn/neighbors/_kneighbors_graph.py):
    //     the corpus's own kNN adjacency in COO form, mode="distance"
    //     (weight = 1 − round-4 cosine), self excluded — the oracle
    //     replays the full self-join, ranking, and distance transform.
    //     The gate runs the exact baseline; the IVF scale path (corpus
    //     never broadcasts or self-joins) is spec-checked on the
    //     planted-twin corpus in SimilaritySpec.
    Q("ext_knn_graph",
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 30),
        |scored AS (
        |  SELECT q.vec_id AS row_id, e.vec_id AS col_id,
        |    round(
        |      list_sum(list_transform(range(1, 65),
        |        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, 65),
        |           i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(range(1, 65),
        |             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))),
        |      4) AS sim
        |  FROM e q, e WHERE e.vec_id <> q.vec_id)
        |SELECT row_id, col_id, CAST(1.0 AS DOUBLE) - sim AS weight, rank FROM (
        |  SELECT row_id, col_id, sim,
        |         CAST(row_number() OVER (PARTITION BY row_id ORDER BY sim DESC, col_id) AS BIGINT) AS rank
        |  FROM scored) r
        |WHERE rank <= 3 ORDER BY row_id, rank""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val corpus = t(spark, dir, "embeddings").filter($"vec_id" < 30)
        .select($"vec_id".as("cid"), $"embedding".as("cvec"))
      Similarity.kneighborsGraph(corpus, k = 3, mode = "distance",
        exact = true)
        .select($"row".as("row_id"), $"col".as("col_id"), $"weight",
          $"rank".cast("long").as("rank"))
        .orderBy($"row_id", $"rank")
    },

    // --- LSH-bucketed approximate ANN over a planted-twin corpus: each
    //     query's true nearest neighbor is its identical copy, which shares
    //     every hyperplane sign bit — so LSH recall is structurally 1 and
    //     the oracle can compute the exact top-1 independently (a genuine
    //     differential check of the bucket-join + scoring + ranking
    //     pipeline). General-recall-vs-brute on clustered data stays in
    //     src/test/scala/graft/SimilaritySpec.scala.
    Q("ext_ann_lsh", Ext.twinTop1Sql) { (spark, dir) =>
      import spark.implicits._
      val (queries, corpus) = Ext.twinCorpus(spark, dir)
      Similarity.lshTopK(queries, corpus, dim = 64, k = 1, nBits = 16)
        .select($"qid", $"cid", $"sim", $"rank".cast("long").as("rank"))
        .orderBy($"qid", $"rank")
    },

    // --- IVF approximate ANN over the same planted-twin corpus: the twin
    //     lands in the query's own nearest KMeans cell, so probing nprobe≥1
    //     cells must retrieve it — the oracle recomputes the exact top-1
    //     (fit/probe split exercised: one ivfFit, one ivfProbe).
    Q("ext_ann_ivf", Ext.twinTop1Sql) { (spark, dir) =>
      import spark.implicits._
      val (queries, corpus) = Ext.twinCorpus(spark, dir)
      val index = Similarity.ivfFit(corpus, nlist = 16, seed = 42L)
      Similarity.ivfProbe(index, queries, k = 1, nprobe = 4)
        .select($"qid", $"cid", $"sim", $"rank".cast("long").as("rank"))
        .orderBy($"qid", $"rank")
    },

    // --- PQ-ADC approximate ANN over the planted-twin corpus: a query's
    //     identical twin shares every per-subspace argmin code, so its
    //     ADC distance is globally minimal (pqProbe doc) and must appear
    //     in the top-5 — recall@5 = 1.0 is the planted invariant the
    //     oracle states directly (KMeans codebooks themselves are not
    //     engine-replayable; the invariant holds for ANY fitted
    //     codebook, which is what makes this a sound differential).
    //     Code-collision ties (same 8 codes as the twin) are why top-5,
    //     not top-1: ≥5 colliders ahead of the twin would be needed.
    Q("ext_ann_pq",
      """SELECT vec_id AS qid, TRUE AS twin_hit
        |FROM embeddings WHERE vec_id < 10 ORDER BY qid""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val (queries, corpus) = Ext.twinCorpus(spark, dir)
      val index = Similarity.pqFit(corpus, dim = 64, m = 8, kCodes = 16)
      Similarity.pqProbe(index, queries, k = 5)
        .groupBy($"qid")
        .agg(bool_or($"cid" === $"qid" + lit(10000L)).as("twin_hit"))
        .orderBy($"qid")
    },

    // --- the ANN recall harness's ground TRUTH, oracled (r13 VERDICT
    //     #8): ScaleBench's aux_ann_recall cell grades IVF/PQ recall
    //     against a brute-force top-10 over the JITTERED corpus (the
    //     deterministic ±0.05 per-element jitter that de-dups staged
    //     copies) — this gate pins that exact truth computation against
    //     drift: same jitter arithmetic (int pmod → double divide →
    //     float round-trip, identical op order both engines), same
    //     round-4 cosine, same (sim DESC, cid) tie rule. Sims are
    //     bit-identical both sides (per-row fold, fixed order), so the
    //     top-10 selection needs no key-gap argument.
    Q("ext_ann_recall_truth",
      """WITH jc AS (
        |  SELECT vec_id AS cid,
        |    list_transform(range(1, 65), j ->
        |      CAST(CAST(embedding[j] AS DOUBLE)
        |           + CAST((vec_id * 31 + (j - 1)) % 1000 AS DOUBLE)
        |             / CAST(10000.0 AS DOUBLE)
        |           - CAST(0.05 AS DOUBLE) AS REAL)) AS cvec
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |      WHERE vec_id < 50),
        |scored AS (
        |  SELECT qid, cid,
        |    round(
        |      list_sum(list_transform(range(1, 65),
        |        i -> CAST(qv[i] AS DOUBLE) * CAST(cvec[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, 65),
        |           i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(range(1, 65),
        |             i -> CAST(cvec[i] AS DOUBLE) * CAST(cvec[i] AS DOUBLE))))),
        |      4) AS sim
        |  FROM jc, q WHERE cid <> qid)
        |SELECT qid, cid, sim, rank FROM (
        |  SELECT qid, cid, sim,
        |         CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT) AS rank
        |  FROM scored) r
        |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir, "embeddings")
      // the EXACT jitter ScaleBench.aux_ann_recall applies to the corpus
      val jit = transform($"embedding", (x, i) =>
        (x.cast("double") +
          pmod($"vec_id" * 31 + i, lit(1000)).cast("double") / 10000.0
          - 0.05).cast("float"))
      val corpus = e.select($"vec_id".as("cid"), jit.as("cvec"))
      val queries = e.filter($"vec_id" < 50)
        .select($"vec_id".as("qid"), $"embedding".as("qvec"))
      Similarity.bruteForceTopK(queries, corpus, k = 10)
        .select($"qid", $"cid", $"sim", $"rank".cast("long").as("rank"))
        .orderBy($"qid", $"rank")
    },

    // --- embedding near-dup detection at scale: LSH-bucketed candidates +
    //     exact cosine verify. The corpus is embeddings unioned with an
    //     id-shifted copy of itself (a cross-source dedup scenario whose
    //     ground truth is exactly the 500 identity pairs); identical vectors
    //     share all hyperplane sign bits, so bucketing recall is 1.
    Q("ext_embed_neardup",
      """WITH c AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000, embedding FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(
        |      list_sum(list_transform(range(1, 65),
        |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, 65),
        |           i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(range(1, 65),
        |             i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))),
        |      4) AS sim
        |  FROM c a JOIN c b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, sim FROM p WHERE sim >= 0.999
        |ORDER BY id_a, id_b""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir, "embeddings")
        .select($"vec_id".as("cid"), $"embedding".as("cvec"))
      val corpus = e.unionAll(e.select(($"cid" + 10000).as("cid"), $"cvec"))
      Similarity.nearDupPairsLsh(corpus, dim = 64, threshold = 0.999, nBits = 16)
        .orderBy($"id_a", $"id_b")
    },

    // --- exact all-pairs embedding near-dup baseline (the recall anchor
    //     the LSH variant is judged against) on the same twin corpus —
    //     small-corpus-only by design (O(n²)); oracle = the identical
    //     all-pairs cosine SQL
    Q("ext_embed_neardup_exact",
      """WITH c AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
        |  UNION ALL
        |  SELECT vec_id + 10000, embedding FROM embeddings WHERE vec_id < 300),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(
        |      list_sum(list_transform(range(1, 65),
        |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, 65),
        |           i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(range(1, 65),
        |             i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))),
        |      4) AS sim
        |  FROM c a JOIN c b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, sim FROM p WHERE sim >= 0.999
        |ORDER BY id_a, id_b""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir, "embeddings").filter($"vec_id" < 300)
        .select($"vec_id".as("cid"), $"embedding".as("cvec"))
      val corpus = e.unionAll(e.select(($"cid" + 10000).as("cid"), $"cvec"))
      Similarity.nearDupPairsExact(corpus, threshold = 0.999)
        .orderBy($"id_a", $"id_b")
    },

    // --- per-doc text quality metrics (identical exact arithmetic)
    Q("ext_text_quality",
      """SELECT doc_id, lang,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS DOUBLE)
        |    / CAST(greatest(len(string_split(text, ' ')), 1) AS DOUBLE) AS mean_word_len,
        |  least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.5
        |    + least(CAST(len(list_filter(string_split(lower(text), ' '),
        |        w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w))) AS DOUBLE)
        |      / CAST(greatest(len(string_split(lower(text), ' ')), 1) AS DOUBLE) * 4.0, 1.0) * 0.3
        |    + (1.0 - least(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
        |      / CAST(greatest(length(text), 1) AS DOUBLE) * 5.0, 1.0)) * 0.2 AS quality
        |FROM documents WHERE doc_id < 20
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "documents").filter($"doc_id" < 20)
        .select($"doc_id", $"lang",
          TextFunctions.tokenCount($"text").as("n_tokens"),
          length($"text").cast("long").as("n_chars"),
          TextFunctions.meanWordLen($"text").as("mean_word_len"),
          TextFunctions.qualityScoreFast(spark, $"text").as("quality"))
        .orderBy($"doc_id")
    },

    // --- Gopher/MassiveText repetition filters (Rae et al. 2021 table A1):
    //     unique-word fraction, most-frequent-2-gram char coverage,
    //     duplicate-5-gram occurrence fraction. All integer counts divided
    //     once — bit-exact across engines, no rounding needed.
    Q("ext_repetition",
      """WITH w AS (
        |  SELECT doc_id, CAST(n_chars AS DOUBLE) AS n_chars,
        |         string_split(text, ' ') AS ws
        |  FROM documents WHERE doc_id < 250),
        |uniq AS (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(ws)) AS DOUBLE) / CAST(len(ws) AS DOUBLE)
        |      AS uniq_word_frac
        |  FROM w),
        |bgx AS (
        |  SELECT doc_id, n_chars,
        |    unnest(list_transform(generate_series(1, len(ws) - 1),
        |      i -> ws[i] || ' ' || ws[i + 1])) AS g
        |  FROM w),
        |bgc AS (
        |  SELECT doc_id, n_chars, g, COUNT(*) AS c
        |  FROM bgx GROUP BY doc_id, n_chars, g),
        |top2 AS (
        |  SELECT doc_id,
        |    CAST(c AS DOUBLE) * CAST(length(g) AS DOUBLE) / n_chars AS top2_frac
        |  FROM (SELECT *, row_number() OVER (
        |          PARTITION BY doc_id ORDER BY c DESC, g) AS rn FROM bgc)
        |  WHERE rn = 1),
        |g5x AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(ws) - 4),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
        |           || ws[i+3] || ' ' || ws[i+4])) AS g
        |  FROM w),
        |g5c AS (SELECT doc_id, g, COUNT(*) AS c FROM g5x GROUP BY doc_id, g),
        |d5 AS (
        |  SELECT doc_id,
        |    CAST(COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS DOUBLE)
        |      / CAST(SUM(c) AS DOUBLE) AS dup5_frac
        |  FROM g5c GROUP BY doc_id)
        |SELECT u.doc_id, u.uniq_word_frac, t.top2_frac, d.dup5_frac
        |FROM uniq u
        |LEFT JOIN top2 t ON u.doc_id = t.doc_id
        |LEFT JOIN d5 d ON u.doc_id = d.doc_id
        |ORDER BY u.doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.operators.Repetition
      Repetition.signals(
          t(spark, dir, "documents").filter($"doc_id" < 250),
          "text", "doc_id", "n_chars")
        .orderBy($"doc_id")
    },

    // --- PII scrubbing: synthesize deterministic emails/phones/IPs into the
    //     fixture text (both engines build the identical string), then
    //     redact with the shared Java/RE2-portable regex family and count
    //     hits per category. Exact string compare — no rounding anywhere.
    Q("ext_pii_redact",
      """WITH synth AS (
        |  SELECT doc_id,
        |    'contact user' || CAST(doc_id AS VARCHAR) || '@example.com call '
        |      || '+1 555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0') || ' from 10.0.'
        |      || CAST(doc_id % 256 AS VARCHAR) || '.1 ' || substr(text, 1, 50) AS t
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+?[0-9][0-9 -]{6,}[0-9]', '<PHONE>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(t,
        |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
        |  CAST(len(regexp_extract_all(t,
        |    '\+?[0-9][0-9 -]{6,}[0-9]')) AS BIGINT) AS n_phone
        |FROM synth ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val synth = t(spark, dir, "documents").filter($"doc_id" < 100)
        .select($"doc_id", concat(
          lit("contact user"), $"doc_id".cast("string"), lit("@example.com call "),
          lit("+1 555-"), lpad($"doc_id".cast("string"), 4, "0"), lit(" from 10.0."),
          ($"doc_id" % 256).cast("string"), lit(".1 "),
          substring($"text", 1, 50)).as("t"))
      val counted = TextFunctions.piiCounts($"t")
        .foldLeft(synth.withColumn("redacted", TextFunctions.redactPii($"t"))) {
          case (d, (n, c)) => d.withColumn(n, c)
        }
      counted.select($"doc_id", $"redacted", $"n_email", $"n_ip", $"n_phone")
        .orderBy($"doc_id")
    },

    // --- token counting per source (whitespace + BPE-ish regex)
    Q("ext_token_count",
      """SELECT source,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
        |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))) AS BIGINT) AS re_tokens,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "documents")
        .groupBy($"source")
        .agg(
          sum(TextFunctions.tokenCount($"text")).as("ws_tokens"),
          sum(TextFunctions.regexTokenCountFast(spark, $"text")).as("re_tokens"),
          count(lit(1)).as("n_docs"))
        .orderBy($"source")
    },

    // --- REAL BPE token counting (r14): the exact token count a classic
    //     BPE tokenizer with the PINNED merge table produces (PinnedBpe,
    //     48 merges trained on the fixture lexicon and committed as
    //     source — the PinnedForest convention: training is
    //     data-dependent, a committed constant is just arithmetic). The
    //     oracle replays the identical double-spaced string encoding and
    //     merge replaces as staged CTEs (24 merges per stage keeps the
    //     nesting under DuckDB's 128-deep binder). Everything is exact
    //     integer string arithmetic — UNROUNDED. The id-weighted
    //     checksum makes per-doc miscounts visible even if a plain SUM
    //     would cancel them.
    Q("ext_bpe_tokens", {
      val staged = TextFunctions.sqlBpeTokens(
        "text", Seq("source", "doc_id"),
        "SELECT source, doc_id, text FROM documents")
      s"""SELECT source,
         |  CAST(SUM(__bpe) AS BIGINT) AS bpe_tokens,
         |  CAST(SUM(__bpe * (doc_id % 1000 + 1)) AS BIGINT) AS bpe_checksum,
         |  COUNT(*) AS n_docs
         |FROM ($staged) t
         |GROUP BY source ORDER BY source""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      val bpe = TextFunctions.bpeTokenCount($"text")
      t(spark, dir, "documents")
        .groupBy($"source")
        .agg(
          sum(bpe).as("bpe_tokens"),
          sum(bpe * (($"doc_id" % 1000L) + 1L)).as("bpe_checksum"),
          count(lit(1)).as("n_docs"))
        .orderBy($"source")
    },

    // --- the FAST (native merge-loop) BPE encoder against the SAME
    //     staged-replace oracle as ext_bpe_tokens (r15 VERDICT #2): this
    //     differentially gates graft_bpe_count/BpeEncode end-to-end —
    //     the greedy lowest-rank loop must produce the identical counts
    //     the rank-ordered replace chain (and its DuckDB replay) does on
    //     the pinned table. Tokenizer-scale tables are spec-pinned
    //     (BpeSpec) since a 10k-merge oracle SQL would be megabytes; the
    //     two paths share only the merge table, not the algorithm shape.
    Q("ext_bpe_tokens_fast", {
      val staged = TextFunctions.sqlBpeTokens(
        "text", Seq("source", "doc_id"),
        "SELECT source, doc_id, text FROM documents")
      s"""SELECT source,
         |  CAST(SUM(__bpe) AS BIGINT) AS bpe_tokens,
         |  CAST(SUM(__bpe * (doc_id % 1000 + 1)) AS BIGINT) AS bpe_checksum,
         |  COUNT(*) AS n_docs
         |FROM ($staged) t
         |GROUP BY source ORDER BY source""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      val bpe = TextFunctions.bpeTokenCountFast(spark, $"text")
      t(spark, dir, "documents")
        .groupBy($"source")
        .agg(
          sum(bpe).as("bpe_tokens"),
          sum(bpe * (($"doc_id" % 1000L) + 1L)).as("bpe_checksum"),
          count(lit(1)).as("n_docs"))
        .orderBy($"source")
    },

    // --- BPE ENCODING — the full subword SEQUENCE, not just the count
    //     (r15): per doc, the '|'-joined token stream's md5 plus its
    //     length, against a DuckDB replay that derives the identical
    //     sequence from the staged merged string: strip boundary-mark
    //     RUNS of any length in one regexp pass ('(  M)+  ' -> '  ' --
    //     r15 ADVICE: the old two-replace strip left residual marks on
    //     4+ consecutive spaces), then double-space -> '|'. md5 is the engine-portable
    //     digest convention; tokens are exact strings — UNROUNDED.
    Q("ext_bpe_encode", {
      val staged = TextFunctions.sqlBpeMerged(
        "text", Seq("doc_id"), "SELECT doc_id, text FROM documents")
      s"""SELECT doc_id, n_tok, md5(tok_str) AS tok_md5 FROM (
         |  SELECT doc_id,
         |    (len(__d) - len(replace(__d, ' ', ''))) // 2 - 1
         |      - (len(text) - len(replace(text, ' ', ''))) AS n_tok,
         |    replace(trim(
         |      regexp_replace(__d, '(  ' || chr(31) || ')+  ', '  ', 'g')),
         |      '  ', '|') AS tok_str
         |  FROM ($staged) t) s
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      val toks = TextFunctions.bpeTokenize(spark, $"text")
      t(spark, dir, "documents")
        .select($"doc_id",
          size(toks).cast("long").as("n_tok"),
          md5(array_join(toks, "|").cast("binary")).as("tok_md5"))
        .orderBy($"doc_id")
    },

    // --- BPE over MULTI-LINE documents (r16 VERDICT #1): the fixture is
    //     single-line, so multi-line docs are synthesized in-query (the
    //     ext_line_dedup chr(10) convention) with tabs and punct/digits
    //     mixed in — newlines/tabs/CRs are word BOUNDARIES now (the
    //     whitespace-CLASS split; r15 split on ' ' alone and merged
    //     across newlines, which no production tokenizer does). Gates
    //     the native graft_bpe_tokenize sequence AND count end-to-end
    //     against the staged-replace DuckDB replay whose boundary
    //     translate mirrors the Spark one char-for-char. UNROUNDED.
    Q("ext_bpe_multiline", {
      val inner =
        """SELECT doc_id % 40 AS gid,
          |  'hdr ' || CAST(doc_id % 40 AS VARCHAR) || '!' || chr(10) ||
          |    string_agg(text, chr(10) || chr(9) ORDER BY doc_id) AS text
          |FROM documents GROUP BY doc_id % 40""".stripMargin
      val staged = TextFunctions.sqlBpeMerged("text", Seq("gid"), inner)
      s"""SELECT gid, n_tok, md5(tok_str) AS tok_md5 FROM (
         |  SELECT gid,
         |    (len(__d) - len(replace(__d, ' ', ''))) // 2 - 1
         |      - (len(text) - len(translate(text,
         |           ' ' || chr(9) || chr(10) || chr(13), ''))) AS n_tok,
         |    replace(trim(
         |      regexp_replace(__d, '(  ' || chr(31) || ')+  ', '  ', 'g')),
         |      '  ', '|') AS tok_str
         |  FROM ($staged) t) s
         |ORDER BY gid""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      val synth = t(spark, dir, "documents")
        .groupBy(($"doc_id" % 40).as("gid"))
        .agg(array_join(transform(
          sort_array(collect_list(struct($"doc_id", $"text"))),
          s => s.getField("text")), "\n\t").as("body"))
        .select($"gid", concat(lit("hdr "), $"gid".cast("string"),
          lit("!\n"), $"body").as("text"))
      val toks = TextFunctions.bpeTokenize(spark, $"text")
      synth
        .select($"gid",
          size(toks).cast("long").as("n_tok"),
          md5(array_join(toks, "|").cast("binary")).as("tok_md5"))
        .orderBy($"gid")
    },

    // --- BPE behind the GPT-2-style PRETOKENIZER (r16 VERDICT #1b):
    //     punct/digit-laced text is synthesized per doc (the fixture is
    //     pure lowercase words), pretokenized into category-pure runs on
    //     BOTH sides (bpePretokenize / its RE2 mirror — insertion-only,
    //     so it composes with the unchanged count paths), then counted
    //     by the NATIVE merge loop vs the staged-replace replay. The
    //     id-weighted checksum makes per-doc miscounts visible.
    Q("ext_bpe_pretok", {
      val pre = TextFunctions.sqlBpePretokenize(
        "CAST(doc_id AS VARCHAR) || 'x,' || replace(text, 'table', 'tab1e!')")
      val inner =
        s"SELECT source, doc_id, $pre AS text FROM documents"
      val staged = TextFunctions.sqlBpeTokens("text", Seq("source", "doc_id"), inner)
      s"""SELECT source,
         |  CAST(SUM(__bpe) AS BIGINT) AS bpe_tokens,
         |  CAST(SUM(__bpe * (doc_id % 1000 + 1)) AS BIGINT) AS bpe_checksum,
         |  COUNT(*) AS n_docs
         |FROM ($staged) t
         |GROUP BY source ORDER BY source""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      val laced = concat($"doc_id".cast("string"), lit("x,"),
        regexp_replace($"text", "table", "tab1e!"))
      val bpe = TextFunctions.bpeTokenCountFast(spark,
        TextFunctions.bpePretokenizeFast(spark, laced))
      t(spark, dir, "documents")
        .groupBy($"source")
        .agg(
          sum(bpe).as("bpe_tokens"),
          sum(bpe * (($"doc_id" % 1000L) + 1L)).as("bpe_checksum"),
          count(lit(1)).as("n_docs"))
        .orderBy($"source")
    },

    // --- BPE token IDS over multi-line docs (r16 VERDICT #1c): the id
    //     stream a pipeline actually feeds to packing/training — the
    //     native graft_bpe_ids expression (merge table AND vocab as two
    //     foldable literals) vs a DuckDB replay that maps the replayed
    //     token stream through the SAME deterministic id assignment as a
    //     CASE table (BpeVocab.sqlIdCase; ELSE −1 so any divergence
    //     breaks the hash instead of being absorbed). The printable-ASCII
    //     alphabet covers the synth corpus, so ids are 1:1 with tokens —
    //     n_ids/id_sum/ids_md5 are all exact integers/strings. UNROUNDED.
    Q("ext_bpe_ids", {
      val inner =
        """SELECT doc_id % 40 AS gid,
          |  'hdr ' || CAST(doc_id % 40 AS VARCHAR) || '!' || chr(10) ||
          |    string_agg(text, chr(10) || chr(9) ORDER BY doc_id) AS text
          |FROM documents GROUP BY doc_id % 40""".stripMargin
      val staged = TextFunctions.sqlBpeMerged("text", Seq("gid"), inner)
      val idCase = graft.functions.BpeVocab.sqlIdCase("t",
        graft.functions.PinnedBpe.merges)
      s"""SELECT gid,
         |  CAST(len(ids) AS BIGINT) AS n_ids,
         |  CAST(list_sum(ids) AS BIGINT) AS id_sum,
         |  md5(array_to_string(ids, ',')) AS ids_md5
         |FROM (
         |  SELECT gid,
         |    list_transform(string_split(tok_str, '|'), t -> $idCase) AS ids
         |  FROM (
         |    SELECT gid,
         |      replace(trim(
         |        regexp_replace(__d, '(  ' || chr(31) || ')+  ', '  ', 'g')),
         |        '  ', '|') AS tok_str
         |    FROM ($staged) t) s) z
         |ORDER BY gid""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      val synth = t(spark, dir, "documents")
        .groupBy(($"doc_id" % 40).as("gid"))
        .agg(array_join(transform(
          sort_array(collect_list(struct($"doc_id", $"text"))),
          s => s.getField("text")), "\n\t").as("body"))
        .select($"gid", concat(lit("hdr "), $"gid".cast("string"),
          lit("!\n"), $"body").as("text"))
      synth
        .withColumn("ids", TextFunctions.bpeEncodeIds(spark, $"text"))
        .select($"gid",
          size($"ids").cast("long").as("n_ids"),
          aggregate($"ids", lit(0L), (a, x) => a + x.cast("long")).as("id_sum"),
          md5(array_join(transform($"ids", _.cast("string")), ",")
            .cast("binary")).as("ids_md5"))
        .orderBy($"gid")
    },

    // --- packing consumes the BPE ID stream end-to-end (r16 VERDICT
    //     #1d): docs encode to ids (native graft_bpe_ids), the packer
    //     packs by size(ids) (packSequencesByLen), and the oracle
    //     replays the identical shard-local first-fit fold over the
    //     replayed BPE token counts (ids are 1:1 with tokens — full
    //     alphabet coverage) with the ext_packing recursive CTE.
    Q("ext_bpe_pack_ids", {
      val staged = TextFunctions.sqlBpeTokens(
        "text", Seq("doc_id"), "SELECT doc_id, text FROM documents")
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, CAST(${graft.functions.PortableHash.sqlBucket("doc_id", 4)} AS BIGINT) AS shard,
         |         CAST(__bpe AS BIGINT) AS n_tokens
         |  FROM ($staged) tt),
         |r AS (SELECT doc_id, shard, n_tokens,
         |        CAST(row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS rn
         |      FROM d),
         |rec AS (
         |  SELECT doc_id, shard, n_tokens, rn,
         |         CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS pack_offset,
         |         n_tokens AS used
         |  FROM r WHERE rn = 1
         |  UNION ALL
         |  SELECT r.doc_id, r.shard, r.n_tokens, r.rn,
         |         CASE WHEN rec.used + r.n_tokens > 128 THEN rec.pack_id + 1
         |              ELSE rec.pack_id END,
         |         CASE WHEN rec.used + r.n_tokens > 128 THEN CAST(0 AS BIGINT)
         |              ELSE rec.used END,
         |         CASE WHEN rec.used + r.n_tokens > 128 THEN r.n_tokens
         |              ELSE rec.used + r.n_tokens END
         |  FROM rec JOIN r ON r.shard = rec.shard AND r.rn = rec.rn + 1)
         |SELECT doc_id, shard, n_tokens, pack_id, pack_offset
         |FROM rec ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      val withIds = t(spark, dir, "documents")
        .withColumn("ids", TextFunctions.bpeEncodeIds(spark, $"text"))
      Curation.packSequencesByLen(withIds, size($"ids").cast("long"),
          "doc_id", capacity = 128, nShards = 4)
        .select($"doc_id", $"shard", $"n_tokens", $"pack_id", $"pack_offset")
        .orderBy($"doc_id")
    },

    // --- PERSISTED tokenizer (r17 VERDICT #5): the (merges, vocab)
    //     recipe round-trips through the catalog table contract
    //     (BpeStore.persist → load — including the replay-idempotent
    //     same-content re-persist exercised in-query) and the LOADED
    //     tokenizer encodes the multi-line synth docs to the SAME id
    //     stream as the in-driver table: the oracle is the identical
    //     sqlIdCase replay as ext_bpe_ids. Loud-mismatch and integrity
    //     legs are spec-gated (BpeSpec — intercepts don't fit a query).
    Q("ext_bpe_ids_persisted", {
      val inner =
        """SELECT doc_id % 40 AS gid,
          |  'hdr ' || CAST(doc_id % 40 AS VARCHAR) || '!' || chr(10) ||
          |    string_agg(text, chr(10) || chr(9) ORDER BY doc_id) AS text
          |FROM documents GROUP BY doc_id % 40""".stripMargin
      val staged = TextFunctions.sqlBpeMerged("text", Seq("gid"), inner)
      val idCase = graft.functions.BpeVocab.sqlIdCase("t",
        graft.functions.PinnedBpe.merges)
      s"""SELECT gid,
         |  CAST(len(ids) AS BIGINT) AS n_ids,
         |  CAST(list_sum(ids) AS BIGINT) AS id_sum,
         |  md5(array_to_string(ids, ',')) AS ids_md5
         |FROM (
         |  SELECT gid,
         |    list_transform(string_split(tok_str, '|'), t -> $idCase) AS ids
         |  FROM (
         |    SELECT gid,
         |      replace(trim(
         |        regexp_replace(__d, '(  ' || chr(31) || ')+  ', '  ', 'g')),
         |        '  ', '|') AS tok_str
         |    FROM ($staged) t) s) z
         |ORDER BY gid""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.{BpeStore, PinnedBpe}
      val tok = BpeStore.Tokenizer(PinnedBpe.merges)
      BpeStore.drop(spark, "graft_gate_tok")
      BpeStore.persist(spark, "graft_gate_tok", tok)
      BpeStore.persist(spark, "graft_gate_tok", tok) // idempotent re-persist
      val loaded = BpeStore.load(spark, "graft_gate_tok")
      val synth = t(spark, dir, "documents")
        .groupBy(($"doc_id" % 40).as("gid"))
        .agg(array_join(transform(
          sort_array(collect_list(struct($"doc_id", $"text"))),
          s => s.getField("text")), "\n\t").as("body"))
        .select($"gid", concat(lit("hdr "), $"gid".cast("string"),
          lit("!\n"), $"body").as("text"))
      synth
        .withColumn("ids", loaded.encodeIds(spark, $"text"))
        .select($"gid",
          size($"ids").cast("long").as("n_ids"),
          aggregate($"ids", lit(0L), (a, x) => a + x.cast("long")).as("id_sum"),
          md5(array_join(transform($"ids", _.cast("string")), ",")
            .cast("binary")).as("ids_md5"))
        .orderBy($"gid")
    },

    // --- STREAMING re-tokenization against the persisted tokenizer
    //     (r17 VERDICT #5): the crawl-loop shape — batches arrive as ≥3
    //     real micro-batches and each is encoded with the tokenizer
    //     LOADED from the store (not a driver literal). Stateless
    //     projection, so batch boundaries cannot matter; the oracle is
    //     the per-doc batch replay through the identical sqlIdCase map.
    Q("op_stream_bpe_persisted", {
      val staged = TextFunctions.sqlBpeMerged(
        "text", Seq("doc_id"), "SELECT doc_id, text FROM documents")
      val idCase = graft.functions.BpeVocab.sqlIdCase("t",
        graft.functions.PinnedBpe.merges)
      s"""SELECT doc_id,
         |  CAST(len(ids) AS BIGINT) AS n_ids,
         |  CAST(list_sum(ids) AS BIGINT) AS id_sum,
         |  md5(array_to_string(ids, ',')) AS ids_md5
         |FROM (
         |  SELECT doc_id,
         |    list_transform(string_split(tok_str, '|'), t -> $idCase) AS ids
         |  FROM (
         |    SELECT doc_id,
         |      replace(trim(
         |        regexp_replace(__d, '(  ' || chr(31) || ')+  ', '  ', 'g')),
         |        '  ', '|') AS tok_str
         |    FROM ($staged) t) s) z
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      import graft.functions.{BpeStore, PinnedBpe}
      BpeStore.drop(spark, "graft_stream_tok")
      BpeStore.persist(spark, "graft_stream_tok",
        BpeStore.Tokenizer(PinnedBpe.merges))
      val loaded = BpeStore.load(spark, "graft_stream_tok")
      val stageDir = OpsExtra.StreamParity.stage(spark, dir, "documents", "doc_id")
      val rawSchema = spark.read.parquet(stageDir.toString).schema
      val stream = spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString)
      val sinkName = s"strm_bpe_${OpsExtra.StreamParity.next()}"
      val enc = stream
        .select($"doc_id", loaded.encodeIds(spark, $"text").as("ids"))
        .select($"doc_id",
          size($"ids").cast("long").as("n_ids"),
          aggregate($"ids", lit(0L), (a, x) => a + x.cast("long")).as("id_sum"),
          md5(array_join(transform($"ids", _.cast("string")), ",")
            .cast("binary")).as("ids_md5"))
      val q = enc.writeStream.format("memory").queryName(sinkName)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        OpsExtra.StreamParity.assertMultiBatch(q)
      } finally q.stop()
      spark.table(sinkName).orderBy($"doc_id")
    },

    // --- MATERIALIZED packed sequences (r17 VERDICT #2): the loader-
    //     ready output — per pack, member docs' ids concatenated in doc
    //     order with the EOS special (id 0) appended after every doc,
    //     plus (doc_id, start, len) spans over the emitted array. The
    //     oracle replays the first-fit fold (capacity reserve = count+1
    //     per doc for the EOS slot) as the ext_bpe_pack_ids recursive
    //     CTE, then assembles packs with flatten(list(... ORDER BY
    //     doc_id)) and spans with a 1-PRECEDING window sum — exact
    //     integers end to end, UNROUNDED.
    Q("ext_bpe_pack_seqs", {
      import graft.functions.{BpeVocab, PinnedBpe, PortableHash}
      val staged = TextFunctions.sqlBpeMerged(
        "text", Seq("doc_id"), "SELECT doc_id, text FROM documents")
      val idCase = BpeVocab.sqlIdCase("t", PinnedBpe.merges,
        specials = Vector("</s>"))
      s"""WITH RECURSIVE base AS (
         |  SELECT doc_id,
         |    list_transform(string_split(tok_str, '|'), t -> $idCase) AS ids
         |  FROM (
         |    SELECT doc_id,
         |      replace(trim(
         |        regexp_replace(__d, '(  ' || chr(31) || ')+  ', '  ', 'g')),
         |        '  ', '|') AS tok_str
         |    FROM ($staged) t) s),
         |d AS (
         |  SELECT doc_id,
         |    CAST(${PortableHash.sqlBucket("doc_id", 4)} AS BIGINT) AS shard,
         |    CAST(len(ids) AS BIGINT) AS n_tokens
         |  FROM base),
         |r AS (SELECT doc_id, shard, n_tokens,
         |        CAST(row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS rn
         |      FROM d),
         |rec AS (
         |  SELECT doc_id, shard, n_tokens, rn,
         |         CAST(0 AS BIGINT) AS pack_id,
         |         n_tokens + 1 AS used
         |  FROM r WHERE rn = 1
         |  UNION ALL
         |  SELECT r.doc_id, r.shard, r.n_tokens, r.rn,
         |         CASE WHEN rec.used + r.n_tokens + 1 > 128 THEN rec.pack_id + 1
         |              ELSE rec.pack_id END,
         |         CASE WHEN rec.used + r.n_tokens + 1 > 128 THEN r.n_tokens + 1
         |              ELSE rec.used + r.n_tokens + 1 END
         |  FROM rec JOIN r ON r.shard = rec.shard AND r.rn = rec.rn + 1),
         |sp AS (
         |  SELECT doc_id, shard, n_tokens, pack_id,
         |    CAST(COALESCE(SUM(n_tokens + 1) OVER (
         |      PARTITION BY shard, pack_id ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS start
         |  FROM rec),
         |packs AS (
         |  SELECT shard, pack_id,
         |    flatten(list(list_append(b.ids, 0) ORDER BY sp.doc_id)) AS pids,
         |    string_agg(sp.doc_id || ':' || start || ':' || sp.n_tokens,
         |      ';' ORDER BY sp.doc_id) AS spans,
         |    COUNT(*) AS nd
         |  FROM sp JOIN base b ON sp.doc_id = b.doc_id
         |  GROUP BY shard, pack_id)
         |SELECT shard, pack_id,
         |  CAST(nd AS BIGINT) AS n_docs,
         |  CAST(len(pids) AS BIGINT) AS n_tokens,
         |  md5(array_to_string(pids, ',')) AS ids_md5,
         |  md5(spans) AS spans_md5
         |FROM packs ORDER BY shard, pack_id""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      val withIds = t(spark, dir, "documents")
        .withColumn("ids", TextFunctions.bpeEncodeIds(spark, $"text",
          specials = Vector("</s>")))
      Curation.packSequencesEmit(withIds, "ids", "doc_id",
          capacity = 128, nShards = 4, eosId = 0)
        .select($"shard", $"pack_id", $"n_docs", $"n_tokens",
          md5(array_join(transform($"ids", _.cast("string")), ",")
            .cast("binary")).as("ids_md5"),
          md5(array_join(transform($"doc_spans", s => concat_ws(":",
            s.getField("doc_id"), s.getField("start"), s.getField("len"))),
            ";").cast("binary")).as("spans_md5"))
        .orderBy($"shard", $"pack_id")
    },

    // --- END-TO-END loader round trip (r17): encode (with the <ws>
    //     boundary special) → pack with EOS separators → UNPACK each
    //     document by its (start, len) span → decode — must reproduce
    //     every document's whitespace-collapsed text exactly. This is
    //     the proof the packed artifact is loader-READY: the spans
    //     address the id arrays correctly, EOS never leaks into a span,
    //     and decode inverts the vocabulary. Oracle: DuckDB computes
    //     the normalization directly from the corpus. UNROUNDED.
    Q("ext_bpe_pack_roundtrip",
      """SELECT doc_id,
        |  CAST(len(norm) AS BIGINT) AS n_chars,
        |  md5(norm) AS dec_md5
        |FROM (
        |  SELECT doc_id,
        |    trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')) AS norm
        |  FROM documents) s
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val sp = Vector("</s>", "<ws>")
      val ws = Some("<ws>")
      val withIds = t(spark, dir, "documents")
        .withColumn("ids", TextFunctions.bpeEncodeIds(spark, $"text",
          specials = sp, wordSep = ws))
      val packed = Curation.packSequencesEmit(withIds, "ids", "doc_id",
        capacity = 128, nShards = 4, eosId = 0)
      val perDoc = packed
        .select(explode($"doc_spans").as("s"), $"ids")
        .select($"s.doc_id".as("doc_id"),
          slice($"ids", $"s.start" + 1, $"s.len").as("dids"))
      val decoded = TextFunctions.bpeDecodeIds(spark, $"dids",
        specials = sp, wordSep = ws)
      perDoc
        .select($"doc_id",
          length(decoded).cast("long").as("n_chars"),
          md5(decoded.cast("binary")).as("dec_md5"))
        .orderBy($"doc_id")
    },

    // --- BYTE-FALLBACK token ids (r16): every doc gets two
    //     out-of-alphabet code points appended in-query (U+00E9, two
    //     UTF-8 bytes, and U+1F600, four bytes — a surrogate PAIR on
    //     the Spark side, so this also gates code-point symbol
    //     splitting end-to-end); the native encoder decomposes them to
    //     reserved byte ids (no unk in the vocab — nothing can drop),
    //     and the DuckDB replay maps each replayed token to a LIST of
    //     ids (single-element for vocab symbols, the UTF-8 byte ids for
    //     the injected code points) and flattens. ELSE [-1]. UNROUNDED.
    Q("ext_bpe_ids_bytes", {
      import graft.functions.{BpeVocab, PinnedBpe}
      val inner =
        """SELECT doc_id,
          |  text || ' caf' || chr(233) || ' ' || chr(128512) AS text
          |FROM documents WHERE doc_id < 120""".stripMargin
      val staged = TextFunctions.sqlBpeMerged("text", Seq("doc_id"), inner)
      val byteBase = BpeVocab.symbols(PinnedBpe.merges,
        BpeVocab.asciiAlphabet, Vector.empty, byteFallback = true)
        .indexOf("<0x00>")
      val idCase = BpeVocab.sqlIdListCase("t", PinnedBpe.merges,
        byteFallback = true,
        oovTokens = Seq(
          "chr(233)" -> BpeVocab.byteIdsOf(0xE9, byteBase),
          "chr(128512)" -> BpeVocab.byteIdsOf(0x1F600, byteBase)))
      s"""SELECT doc_id,
         |  CAST(len(ids) AS BIGINT) AS n_ids,
         |  CAST(list_sum(ids) AS BIGINT) AS id_sum,
         |  md5(array_to_string(ids, ',')) AS ids_md5
         |FROM (
         |  SELECT doc_id,
         |    flatten(list_transform(string_split(tok_str, '|'), t -> $idCase)) AS ids
         |  FROM (
         |    SELECT doc_id,
         |      replace(trim(
         |        regexp_replace(__d, '(  ' || chr(31) || ')+  ', '  ', 'g')),
         |        '  ', '|') AS tok_str
         |    FROM ($staged) t) s) z
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      val laced = concat($"text", lit(" caf\u00E9 \uD83D\uDE00"))
      val ids = TextFunctions.bpeEncodeIds(spark, laced,
        byteFallback = true)
      t(spark, dir, "documents")
        .filter($"doc_id" < 120)
        .withColumn("ids", ids)
        .select($"doc_id",
          size($"ids").cast("long").as("n_ids"),
          aggregate($"ids", lit(0L), (a, x) => a + x.cast("long")).as("id_sum"),
          md5(array_join(transform($"ids", _.cast("string")), ",")
            .cast("binary")).as("ids_md5"))
        .orderBy($"doc_id")
    },

    // --- BPE DECODE round trip (r17 VERDICT #1): the id stream inverts
    //     back to text. Two directions in one gate, over the multi-line
    //     synth docs: (a) decode(encode(text)) with the word-boundary
    //     special "<ws>" designated == the text with every whitespace
    //     run collapsed to one space (DuckDB computes that normalization
    //     DIRECTLY from text — any encode/decode asymmetry, id-map or
    //     boundary bug breaks the hash); (b) the FLAT stream (no
    //     wordSep): decode concatenates words, and DuckDB replays
    //     token→id (sqlIdCase) then id→symbol (sqlSymCase, the reverse
    //     CASE) over the replayed token stream and joins — the id↔symbol
    //     consistency replayed relationally. All exact strings/ints,
    //     UNROUNDED.
    Q("ext_bpe_decode", {
      import graft.functions.{BpeVocab, PinnedBpe}
      val inner =
        """SELECT doc_id % 40 AS gid,
          |  'hdr ' || CAST(doc_id % 40 AS VARCHAR) || '!' || chr(10) ||
          |    string_agg(text, chr(10) || chr(9) ORDER BY doc_id) AS text
          |FROM documents GROUP BY doc_id % 40""".stripMargin
      val staged = TextFunctions.sqlBpeMerged("text", Seq("gid"), inner)
      val idCase = BpeVocab.sqlIdCase("t", PinnedBpe.merges)
      val symCase = BpeVocab.sqlSymCase("i", PinnedBpe.merges)
      s"""SELECT d.gid, d.n_chars, d.dec_md5, f.flat_md5 FROM (
         |  SELECT gid,
         |    CAST(len(norm) AS BIGINT) AS n_chars,
         |    md5(norm) AS dec_md5
         |  FROM (
         |    SELECT gid,
         |      trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g')) AS norm
         |    FROM ($inner) i0) n) d
         |JOIN (
         |  SELECT gid,
         |    md5(array_to_string(list_transform(
         |      list_transform(string_split(tok_str, '|'), t -> $idCase),
         |      i -> $symCase), '')) AS flat_md5
         |  FROM (
         |    SELECT gid,
         |      replace(trim(
         |        regexp_replace(__d, '(  ' || chr(31) || ')+  ', '  ', 'g')),
         |        '  ', '|') AS tok_str
         |    FROM ($staged) t) s) f
         |ON d.gid = f.gid
         |ORDER BY d.gid""".stripMargin
    }) { (spark, dir) =>
      import spark.implicits._
      val synth = t(spark, dir, "documents")
        .groupBy(($"doc_id" % 40).as("gid"))
        .agg(array_join(transform(
          sort_array(collect_list(struct($"doc_id", $"text"))),
          s => s.getField("text")), "\n\t").as("body"))
        .select($"gid", concat(lit("hdr "), $"gid".cast("string"),
          lit("!\n"), $"body").as("text"))
      val sp = Vector("<ws>")
      val ws = Some("<ws>")
      val decoded = TextFunctions.bpeDecodeIds(spark,
        TextFunctions.bpeEncodeIds(spark, $"text",
          specials = sp, wordSep = ws),
        specials = sp, wordSep = ws)
      val decodedFlat = TextFunctions.bpeDecodeIds(spark,
        TextFunctions.bpeEncodeIds(spark, $"text"))
      synth
        .select($"gid",
          length(decoded).cast("long").as("n_chars"),
          md5(decoded.cast("binary")).as("dec_md5"),
          md5(decodedFlat.cast("binary")).as("flat_md5"))
        .orderBy($"gid")
    },

    // --- BPE DECODE with BYTE-FALLBACK runs (r17): out-of-alphabet code
    //     points (U+00E9, two UTF-8 bytes; U+1F600, four — a surrogate
    //     pair, glued to an in-alphabet 'x' so a byte run sits mid-word
    //     against a normal symbol) encode to reserved byte ids and must
    //     reassemble EXACTLY on decode. The oracle computes the
    //     whitespace-collapsed laced text directly; byte counts via
    //     octet_length/strlen (UTF-8 bytes both engines — len() would
    //     disagree on the surrogate pair). UNROUNDED.
    Q("ext_bpe_decode_bytes",
      """SELECT doc_id,
        |  CAST(strlen(norm) AS BIGINT) AS n_bytes,
        |  md5(norm) AS dec_md5
        |FROM (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      text || ' caf' || chr(233) || ' ' || chr(128512) || 'x',
        |      '[ \t\n\r]+', ' ', 'g')) AS norm
        |  FROM documents WHERE doc_id < 120) s
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val laced = concat($"text", lit(" caf\u00E9 \uD83D\uDE00x"))
      val sp = Vector("<ws>")
      val ws = Some("<ws>")
      val decoded = TextFunctions.bpeDecodeIds(spark,
        TextFunctions.bpeEncodeIds(spark, laced,
          specials = sp, byteFallback = true, wordSep = ws),
        specials = sp, byteFallback = true, wordSep = ws)
      t(spark, dir, "documents")
        .filter($"doc_id" < 120)
        .select($"doc_id",
          octet_length(decoded).cast("long").as("n_bytes"),
          md5(decoded.cast("binary")).as("dec_md5"))
        .orderBy($"doc_id")
    },

    // --- language-ID heuristic vs labeled lang (confusion counts)
    Q("ext_lang_id",
      """SELECT lang, pred_lang, COUNT(*) AS cnt FROM (
        |  SELECT lang,
        |    CASE WHEN en >= es AND en >= fr AND en >= de THEN 'en'
        |         WHEN es >= fr AND es >= de THEN 'es'
        |         WHEN fr >= de THEN 'fr'
        |         ELSE 'de' END AS pred_lang
        |  FROM (
        |    SELECT lang,
        |      (CASE WHEN contains(t, ' the ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' and ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' of ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' is ') THEN 1 ELSE 0 END) AS en,
        |      (CASE WHEN contains(t, ' el ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' la ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' de ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' que ') THEN 1 ELSE 0 END) AS es,
        |      (CASE WHEN contains(t, ' le ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' la ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' et ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' est ') THEN 1 ELSE 0 END) AS fr,
        |      (CASE WHEN contains(t, ' der ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' die ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' und ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' ist ') THEN 1 ELSE 0 END) AS de
        |    FROM (SELECT lang, lower(text) AS t FROM documents) x) s) p
        |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "documents")
        .select($"lang", TextFunctions.langIdHeuristic($"text").as("pred_lang"))
        .groupBy($"lang", $"pred_lang").agg(count(lit(1)).as("cnt"))
        .orderBy($"lang", $"pred_lang")
    },

    // --- TF-IDF featurization (sklearn smooth_idf arithmetic on both sides)
    Q("ext_tfidf",
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
        |dfc AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY token),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents)
        |SELECT doc_id, token, tf,
        |       round(ln((nd + 1.0) / (df + 1.0)) + 1.0, 6) AS idf,
        |       round(tf * (ln((nd + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
        |FROM tf JOIN dfc USING (token), n
        |WHERE doc_id < 5
        |ORDER BY doc_id, token""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Dedup.tfidf(t(spark, dir, "documents"), "text", "doc_id")
        .filter($"doc_id" < 5)
        .select($"doc_id", $"token", $"tf",
          round($"idf", 6).as("idf"), round($"tfidf", 6).as("tfidf"))
        .orderBy($"doc_id", $"token")
    },

    // --- end-to-end curation pipeline through the fluent API: quality +
    //     language scoring → filters → exact dedup → per-language stats —
    //     the canonical training-data curation chain as ONE declarative plan
    Q("ext_curation",
      """WITH scored AS (
        |  SELECT doc_id, source, text,
        |    CASE WHEN en >= es AND en >= fr AND en >= de THEN 'en'
        |         WHEN es >= fr AND es >= de THEN 'es'
        |         WHEN fr >= de THEN 'fr' ELSE 'de' END AS pred_lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.5
        |      + least(CAST(len(list_filter(string_split(lower(text), ' '),
        |          w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w))) AS DOUBLE)
        |        / CAST(greatest(len(string_split(lower(text), ' ')), 1) AS DOUBLE) * 4.0, 1.0) * 0.3
        |      + (1.0 - least(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
        |        / CAST(greatest(length(text), 1) AS DOUBLE) * 5.0, 1.0)) * 0.2 AS quality
        |  FROM (
        |    SELECT doc_id, source, text,
        |      (CASE WHEN contains(t, ' the ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' and ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' of ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' is ') THEN 1 ELSE 0 END) AS en,
        |      (CASE WHEN contains(t, ' el ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' la ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' de ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' que ') THEN 1 ELSE 0 END) AS es,
        |      (CASE WHEN contains(t, ' le ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' la ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' et ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' est ') THEN 1 ELSE 0 END) AS fr,
        |      (CASE WHEN contains(t, ' der ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' die ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' und ') THEN 1 ELSE 0 END)
        |        + (CASE WHEN contains(t, ' ist ') THEN 1 ELSE 0 END) AS de
        |    FROM (SELECT doc_id, source, text, lower(text) AS t FROM documents) x) s),
        |filtered AS (
        |  SELECT * FROM scored WHERE quality > 0.5 AND n_tokens >= 30),
        |fp AS (
        |  SELECT doc_id, source, pred_lang, n_tokens, quality,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                            ' +', ' ', 'g'))) AS f
        |  FROM filtered),
        |keep AS (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f)
        |SELECT source, pred_lang, COUNT(*) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |       round(avg(quality), 6) AS avg_quality
        |FROM fp JOIN keep USING (f, doc_id)
        |GROUP BY source, pred_lang ORDER BY source, pred_lang""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      gt(spark, dir, "documents")
        .assign(
          "pred_lang" -> TextFunctions.langIdHeuristic($"text"),
          "n_tokens" -> TextFunctions.tokenCount($"text"),
          "quality" -> TextFunctions.qualityScoreFast(spark, $"text"))
        .filter($"quality" > 0.5 && $"n_tokens" >= 30)
        .assign("__fp" -> TextFunctions.md5FingerprintFast(spark, $"text"))
        .drop("text") // rows are narrow post-scoring → single-pass dedup
        .dropDuplicatesNarrow(Seq("__fp"), keepFirstBy = "doc_id")
        .groupby("source", "pred_lang")
        .agg(
          ("n_docs", "count", "pred_lang"),
          ("total_tokens", "sum", "n_tokens"),
          ("avg_quality_raw", "mean", "quality"))
        .assign("avg_quality" -> round($"avg_quality_raw", 6))
        .drop("avg_quality_raw")
        .sortValues(Seq("source", "pred_lang"))
        .df
    },

    // --- prefix-fingerprint clustering per source
    Q("ext_fingerprint",
      """SELECT source,
        |  COUNT(DISTINCT md5(array_to_string((string_split(text, ' '))[1:8], ' '))) AS n_clusters,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "documents")
        .groupBy($"source")
        .agg(
          countDistinct(TextFunctions.prefixFingerprint($"text", 8)).as("n_clusters"),
          count(lit(1)).as("n_docs"))
        .orderBy($"source")
    },

    // --- curation pipeline v2: the full modern stack in one verified
    //     chain — quality filter + Gopher repetition filter → MinHash-LSH
    //     near-dup pairs → connected components → keep one representative
    //     per cluster → per-source corpus stats. The oracle recomputes the
    //     identical pipeline from scratch: the quality/repetition math,
    //     the exact-Jaccard pair list at the planted j≈0.99 operating
    //     point (≡ the MinHash output, per ext_dedup_minhash), and a
    //     recursive min-label CTE for the clusters.
    Q("ext_curation2",
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, source, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS uniq,
        |    least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.5
        |      + least(CAST(len(list_filter(string_split(lower(text), ' '),
        |          w -> list_contains(['the','a','an','and','or','of','to','in','is','it'], w))) AS DOUBLE)
        |        / CAST(greatest(len(string_split(lower(text), ' ')), 1) AS DOUBLE) * 4.0, 1.0) * 0.3
        |      + (1.0 - least(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
        |        / CAST(greatest(length(text), 1) AS DOUBLE) * 5.0, 1.0)) * 0.2 AS quality
        |  FROM documents),
        |filtered AS (
        |  SELECT * FROM base
        |  WHERE quality > 0.5 AND n_tokens >= 30 AND uniq >= 0.35),
        |d AS (SELECT doc_id, string_split(text, ' ') AS w FROM filtered),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i+1:i+3], ' ') AS sh
        |       FROM (SELECT doc_id, w, unnest(range(len(w) - 2)) AS i
        |             FROM d WHERE len(w) >= 3) t),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        |jp AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pe AS (
        |  SELECT doc_a, doc_b FROM jp
        |  JOIN sizes sa ON doc_a = sa.doc_id
        |  JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.8),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pe
        |          UNION SELECT doc_b, doc_a FROM pe),
        |cc AS (
        |  SELECT DISTINCT a AS node, a AS label FROM edges
        |  UNION
        |  SELECT e.b AS node, cc.label FROM cc JOIN edges e ON e.a = cc.node),
        |dropids AS (
        |  SELECT node AS doc_id FROM cc GROUP BY node
        |  HAVING node <> min(label)),
        |kept AS (
        |  SELECT f.* FROM filtered f
        |  LEFT JOIN dropids dr ON f.doc_id = dr.doc_id
        |  WHERE dr.doc_id IS NULL)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(min(doc_id) AS BIGINT) AS first_doc,
        |  round(SUM(quality) / COUNT(*), 6) + CAST(0.0 AS DOUBLE) AS avg_quality
        |FROM kept GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.operators.{Components, Repetition}
      val docs = t(spark, dir, "documents")
      val scored = docs.select($"doc_id", $"source", $"text", $"n_chars",
        TextFunctions.tokenCount($"text").as("n_tokens"),
        TextFunctions.qualityScoreFast(spark, $"text").as("quality"))
      val rep = Repetition.signals(docs, "text", "doc_id", "n_chars")
        .select($"doc_id", $"uniq_word_frac")
      val filtered = scored.join(rep, Seq("doc_id"))
        .filter($"quality" > 0.5 && $"n_tokens" >= 30 && $"uniq_word_frac" >= 0.35)
      val pairs = Dedup.minhashDedupPairs(filtered, "text", "doc_id",
        n = 3, threshold = 0.8, bands = 16, rowsPerBand = 4)
      Components.dedupByCluster(filtered, pairs, "doc_id")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          min($"doc_id").as("first_doc"),
          (round(sum($"quality") / count(lit(1)), 6) + lit(0.0)).as("avg_quality"))
        .orderBy($"source")
    },

    // --- curation pipeline v3 — this round's operators composed
    //     end-to-end: Bloom-prefiltered decontamination (exact result) →
    //     quality filter → MinHash cluster dedup keeping the BEST (longest)
    //     member → context-window chunking. The oracle replays every stage
    //     exactly (bloom's verify join makes stage 1 exact; minhash ≡ exact
    //     Jaccard at the planted operating point, as ext_dedup_minhash
    //     establishes).
    Q("ext_curation3",
      """WITH RECURSIVE
        |d0 AS (SELECT doc_id, source, text, n_chars, string_split(text, ' ') AS w
        |       FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, array_to_string(w[i+1:i+3], ' ') AS sh
        |        FROM (SELECT doc_id, w, unnest(range(len(w) - 2)) AS i
        |              FROM d0 WHERE len(w) >= 3) t),
        |bsh AS (SELECT DISTINCT sh FROM sh0 WHERE doc_id < 20),
        |hits AS (SELECT s.doc_id, COUNT(*) AS nh
        |         FROM sh0 s JOIN bsh USING (sh) WHERE s.doc_id >= 20
        |         GROUP BY s.doc_id),
        |clean AS (SELECT d.* FROM d0 d LEFT JOIN hits h USING (doc_id)
        |          WHERE d.doc_id >= 20 AND COALESCE(h.nh, 0) < 3),
        |f AS (
        |  SELECT * FROM (
        |    SELECT *,
        |      least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.5
        |        + least(CAST(len(list_filter(string_split(lower(text), ' '),
        |            x -> list_contains(['the','a','an','and','or','of','to','in','is','it'], x))) AS DOUBLE)
        |          / CAST(greatest(len(string_split(lower(text), ' ')), 1) AS DOUBLE) * 4.0, 1.0) * 0.3
        |      + (1.0 - least(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
        |          / CAST(greatest(length(text), 1) AS DOUBLE) * 5.0, 1.0)) * 0.2 AS quality
        |    FROM clean) qq
        |  WHERE quality > 0.5),
        |sh AS (SELECT s.doc_id, s.sh FROM sh0 s JOIN f USING (doc_id)),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        |jp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        |       FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |       GROUP BY a.doc_id, b.doc_id),
        |pe AS (SELECT doc_a, doc_b FROM jp
        |       JOIN sizes sa ON doc_a = sa.doc_id
        |       JOIN sizes sb ON doc_b = sb.doc_id
        |       WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.8),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pe
        |          UNION SELECT doc_b, doc_a FROM pe),
        |cc AS (SELECT DISTINCT a AS node, a AS label FROM edges
        |       UNION
        |       SELECT e.b AS node, cc.label FROM cc JOIN edges e ON e.a = cc.node),
        |members AS (SELECT node AS doc_id, min(label) AS cluster FROM cc GROUP BY node),
        |win AS (SELECT doc_id FROM (
        |          SELECT m.doc_id,
        |                 row_number() OVER (PARTITION BY m.cluster
        |                                    ORDER BY f.n_chars DESC, m.doc_id) AS rk
        |          FROM members m JOIN f USING (doc_id)) r
        |        WHERE rk = 1),
        |losers AS (SELECT doc_id FROM members
        |           WHERE doc_id NOT IN (SELECT doc_id FROM win)),
        |kept AS (SELECT * FROM f WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
        |n AS (SELECT doc_id, source, w,
        |        CASE WHEN len(w) <= 16 THEN 1 ELSE (len(w) - 16 + 11) // 12 + 1 END AS nc
        |      FROM kept),
        |c AS (SELECT doc_id, source, w, unnest(range(nc)) AS i FROM n)
        |SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(len(string_split(array_to_string(w[i*12+1 : i*12+16], ' '), ' ')))
        |       AS BIGINT) AS n_chunk_tokens
        |FROM c GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.operators.Components
      val docs = t(spark, dir, "documents")
      val clean = Curation.decontaminateBloom(
          docs.filter($"doc_id" >= 20), docs.filter($"doc_id" < 20),
          "text", "doc_id", n = 3, minOverlap = 3)
        .filter(!$"contaminated")
      val f = clean
        .withColumn("quality", TextFunctions.qualityScoreFast(spark, $"text"))
        .filter($"quality" > 0.5)
      val pairs = Dedup.minhashDedupPairs(f, "text", "doc_id",
        n = 3, threshold = 0.8, bands = 16, rowsPerBand = 4)
      val kept = Components.dedupByClusterBest(f, pairs, "doc_id", "n_chars")
      Curation.chunkWords(kept, "text", "doc_id", chunkSize = 16, overlap = 4)
        .join(kept.select($"doc_id", $"source"), Seq("doc_id"))
        .groupBy($"source")
        .agg(countDistinct($"doc_id").as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum($"n_tokens").as("n_chunk_tokens"))
        .orderBy($"source")
    },

    // --- multimodal plumbing, differential-checked: a deterministic media
    //     frame is derived from documents (dims / frame counts / sample
    //     counts from n_chars arithmetic), then the three modality paths
    //     run for real — image resize dims through the mapPartitions decode
    //     path (graft.multimodal.Multimodal.imageFeatures), video frame
    //     sampling and audio chunking through their explode plans. DuckDB
    //     replays the integer arithmetic and the IEEE floor(x*scale+0.5)
    //     resize rounding exactly. (The stubbed embedding bytes are the one
    //     part no SQL engine can replay — MultimodalSpec covers them.)
    Q("ext_multimodal",
      """WITH docs AS (
        |  SELECT doc_id AS media_id, doc_id % 3 AS m, n_chars
        |  FROM documents WHERE doc_id < 300),
        |img AS (
        |  SELECT media_id, 'resize' AS kind,
        |    CAST(greatest(1, floor(w * least(1.0, 256.0 / greatest(w, h)) + 0.5)) AS BIGINT) AS a,
        |    CAST(greatest(1, floor(h * least(1.0, 256.0 / greatest(w, h)) + 0.5)) AS BIGINT) AS b
        |  FROM (SELECT media_id,
        |          CAST(n_chars % 1000 + 100 AS DOUBLE) AS w,
        |          CAST((n_chars * 7) % 800 + 50 AS DOUBLE) AS h
        |        FROM docs WHERE m = 0) s),
        |aud AS (
        |  SELECT media_id, 'chunk' AS kind, CAST(ci AS BIGINT) AS a,
        |    CAST(least(ns, (ci + 1) * 32000) AS BIGINT) AS b
        |  FROM (SELECT media_id, n_chars * 50 AS ns,
        |          unnest(generate_series(0, greatest((n_chars * 50 - 1) // 32000, 0))) AS ci
        |        FROM docs WHERE m = 1) s),
        |vid AS (
        |  SELECT media_id, 'frame' AS kind, CAST(fi AS BIGINT) AS a, CAST(-1 AS BIGINT) AS b
        |  FROM (SELECT media_id, unnest(generate_series(0, greatest(n_chars % 300, 0), 7)) AS fi
        |        FROM docs WHERE m = 2) s)
        |SELECT * FROM (SELECT * FROM img UNION ALL SELECT * FROM aud
        |               UNION ALL SELECT * FROM vid) u
        |ORDER BY media_id, kind, a""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.multimodal.Multimodal
      val media = t(spark, dir, "documents").filter($"doc_id" < 300)
        .select(
          $"doc_id".as("media_id"),
          lit(null).cast("string").as("uri"),
          encode($"text", "UTF-8").as("data"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            ($"doc_id" % 3).cast("int") + 1).as("modality"),
          struct(
            (($"n_chars" % 1000) + 100).cast("int").as("width"),
            ((($"n_chars" * 7) % 800) + 50).cast("int").as("height"),
            lit(16000).cast("int").as("sample_rate"),
            when($"doc_id" % 3 === 1, ($"n_chars" * 50).cast("int"))
              .otherwise((($"n_chars" % 300) + 1).cast("int")).as("n_frames")).as("meta"))
      val img = Multimodal.imageFeatures(media, dim = 4, maxSide = 256)
        .select($"media_id", lit("resize").as("kind"),
          $"out_w".cast("long").as("a"), $"out_h".cast("long").as("b"))
      val aud = Multimodal.audioChunks(media, sampleRate = 16000, chunkSeconds = 2)
        .select($"media_id", lit("chunk").as("kind"),
          $"chunk_idx".cast("long").as("a"), $"end_sample".cast("long").as("b"))
      val vid = Multimodal.videoFrameSample(media, everyN = 7)
        .select($"media_id", lit("frame").as("kind"),
          $"frame_idx".cast("long").as("a"), lit(-1L).as("b"))
      img.unionAll(aud).unionAll(vid).orderBy($"media_id", $"kind", $"a")
    },

    // --- REAL audio decode through javax.sound.sampled (r12 VERDICT
    //     #7): per doc a deterministic int16 PCM signal
    //     s_k = ((media_id·31 + k·17) mod 2001) − 1000 is containerized
    //     as a canonical WAV (Multimodal.wavPcm16Bytes), decoded by the
    //     REAL JDK reader on the executors, and folded to exact-integer
    //     features — PCM16 is lossless, so the decode must reproduce
    //     the synthesis bit-for-bit for the gate to pass. DuckDB
    //     replays the synthesis arithmetic directly (it never sees the
    //     bytes); every gate column is BIGINT/BOOLEAN → UNROUNDED. The
    //     FFT spectral centroid is libm → spec-pinned (MultimodalSpec),
    //     excluded here.
    Q("ext_multimodal_audio",
      """WITH d AS (SELECT doc_id AS media_id, (n_chars % 500) + 32 AS ns
        |           FROM documents WHERE doc_id < 120),
        |s AS (SELECT media_id, ns, k,
        |             ((media_id * 31 + k * 17) % 2001) - 1000 AS v
        |      FROM (SELECT media_id, ns, unnest(range(ns)) AS k FROM d) t),
        |w AS (SELECT media_id, ns, k, v,
        |             lag(v) OVER (PARTITION BY media_id ORDER BY k) AS prev
        |      FROM s)
        |SELECT media_id, CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(ns AS BIGINT) AS n_samples,
        |  CAST(ns AS BIGINT) * 125 AS duration_us,
        |  CAST(SUM(abs(v)) AS BIGINT) AS sum_abs,
        |  CAST(SUM(v * v) AS BIGINT) AS energy,
        |  CAST(MIN(v) AS BIGINT) AS min_s,
        |  CAST(MAX(v) AS BIGINT) AS max_s,
        |  CAST(SUM(CASE WHEN prev IS NOT NULL AND ((v > 0) != (prev > 0))
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross,
        |  TRUE AS decoded
        |FROM w GROUP BY media_id, ns ORDER BY media_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.catalyst.encoders.RowEncoder
      import graft.multimodal.Multimodal
      implicit val enc = RowEncoder.encoderFor(Multimodal.mediaSchema)
      val media = t(spark, dir, "documents").filter($"doc_id" < 120)
        .select($"doc_id", (($"n_chars" % 500) + 32).cast("int").as("ns"))
        .as[(Long, Int)]
        .mapPartitions(_.map { case (id, ns) =>
          val samples = Array.tabulate(ns)(k =>
            (((id * 31 + k * 17) % 2001) - 1000).toShort)
          Row(id, null, Multimodal.wavPcm16Bytes(samples, 8000), "audio",
            Row(null, null, 8000, ns))
        })
      Multimodal.audioDecodeFeatures(media)
        .select($"media_id", $"sample_rate".cast("long").as("sample_rate"),
          $"n_samples", $"duration_us", $"sum_abs", $"energy",
          $"min_s", $"max_s", $"n_zero_cross", $"decoded")
        .orderBy($"media_id")
    },

    // --- REAL video decode (r13, completing the image/audio pattern):
    //     per doc a deterministic gray pixel field
    //     v(f, p) = (media_id·7 + f·13 + p·3) mod 251 is packed as
    //     UNCOMPRESSED 24-bit DIB frames in a canonical AVI container
    //     (Multimodal.aviBytes — lossless, unlike MJPEG), parsed and
    //     decoded for REAL on the executors (RIFF walk → strf dims →
    //     movi '00db' chunks → bottom-up BGR rows → integer gray), and
    //     frame-sampled at everyN = 2. Exact BIGINT per-frame gray
    //     statistics — DuckDB replays the pixel synthesis arithmetic,
    //     never the container. MJPEG ('00dc' via javax.imageio) is
    //     spec-pinned in MultimodalSpec (JPEG is lossy).
    Q("ext_multimodal_video",
      """WITH d AS (SELECT doc_id AS media_id, (n_chars % 4) + 2 AS nf
        |           FROM documents WHERE doc_id < 80),
        |f AS (SELECT media_id, nf, unnest(range(nf)) AS fi FROM d),
        |sf AS (SELECT * FROM f WHERE fi % 2 = 0),
        |px AS (SELECT media_id, nf, fi,
        |              ((media_id * 7 + fi * 13 + p * 3) % 251) AS v
        |       FROM (SELECT media_id, nf, fi, unnest(range(128)) AS p
        |             FROM sf) t)
        |SELECT media_id, CAST(fi AS BIGINT) AS frame_idx,
        |  CAST(16 AS BIGINT) AS w, CAST(8 AS BIGINT) AS h,
        |  CAST(nf AS BIGINT) AS n_frames,
        |  CAST(SUM(v) AS BIGINT) AS gray_sum,
        |  CAST(MIN(v) AS BIGINT) AS gray_min,
        |  CAST(MAX(v) AS BIGINT) AS gray_max,
        |  TRUE AS decoded
        |FROM px GROUP BY media_id, nf, fi
        |ORDER BY media_id, frame_idx""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.catalyst.encoders.RowEncoder
      import graft.multimodal.Multimodal
      implicit val enc = RowEncoder.encoderFor(Multimodal.mediaSchema)
      val media = t(spark, dir, "documents").filter($"doc_id" < 80)
        .select($"doc_id", (($"n_chars" % 4) + 2).cast("int").as("nf"))
        .as[(Long, Int)]
        .mapPartitions(_.map { case (id, nf) =>
          val frames = (0 until nf).map { f =>
            val gray = Array.tabulate(16 * 8)(p =>
              ((id * 7 + f * 13 + p * 3) % 251).toInt)
            Multimodal.dib24GrayFrame(gray, 16, 8)
          }
          Row(id, null,
            Multimodal.aviBytes(frames, 16, 8, compressed = false),
            "video", Row(16, 8, null, nf))
        })
      Multimodal.videoDecodeFeatures(media, everyN = 2)
        .select($"media_id", $"frame_idx".cast("long").as("frame_idx"),
          $"w".cast("long").as("w"), $"h".cast("long").as("h"),
          $"n_frames".cast("long").as("n_frames"),
          $"gray_sum", $"gray_min", $"gray_max", $"decoded")
        .orderBy($"media_id", $"frame_idx")
    },

    // --- benchmark decontamination: corpus docs flagged by distinct
    //     word-3-gram overlap with the (broadcast) benchmark set. Spark
    //     intersects xxhash64 shingle hashes, DuckDB intersects shingle
    //     strings — the match COUNTS are equal (2^-64 collision odds), and
    //     only counts are emitted.
    Q("ext_decontaminate",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i+1:i+3], ' ') AS sh
        |       FROM (SELECT doc_id, w, unnest(range(len(w) - 2)) AS i
        |             FROM d WHERE len(w) >= 3) t),
        |bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20),
        |hits AS (SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated_ngrams
        |         FROM sh s JOIN bsh ON s.sh = bsh.sh
        |         WHERE s.doc_id >= 20 GROUP BY s.doc_id)
        |SELECT c.doc_id,
        |       COALESCE(h.n_contaminated_ngrams, 0) AS n_contaminated_ngrams,
        |       COALESCE(h.n_contaminated_ngrams, 0) >= 3 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id >= 20) c
        |LEFT JOIN hits h ON c.doc_id = h.doc_id
        |ORDER BY c.doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = t(spark, dir, "documents")
      Curation.decontaminate(
          docs.filter($"doc_id" >= 20), docs.filter($"doc_id" < 20),
          "text", "doc_id", n = 3, minOverlap = 3)
        .select($"doc_id", $"n_contaminated_ngrams", $"contaminated")
        .orderBy($"doc_id")
    },

    // --- Bloom-prefiltered decontamination: the same EXACT answer as
    //     ext_decontaminate (the verify join removes every Bloom false
    //     positive — candidates-then-verify), so the exact-overlap oracle
    //     applies unchanged; what the Bloom bitset changes is the scale
    //     shape (clean shingles die at the scan, not in the join).
    Q("ext_decontaminate_bloom",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i+1:i+3], ' ') AS sh
        |       FROM (SELECT doc_id, w, unnest(range(len(w) - 2)) AS i
        |             FROM d WHERE len(w) >= 3) t),
        |bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 30),
        |hits AS (SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated_ngrams
        |         FROM sh s JOIN bsh ON s.sh = bsh.sh
        |         WHERE s.doc_id >= 30 GROUP BY s.doc_id)
        |SELECT c.doc_id,
        |       COALESCE(h.n_contaminated_ngrams, 0) AS n_contaminated_ngrams,
        |       COALESCE(h.n_contaminated_ngrams, 0) >= 2 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE doc_id >= 30) c
        |LEFT JOIN hits h ON c.doc_id = h.doc_id
        |ORDER BY c.doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = t(spark, dir, "documents")
      Curation.decontaminateBloom(
          docs.filter($"doc_id" >= 30), docs.filter($"doc_id" < 30),
          "text", "doc_id", n = 3, minOverlap = 2)
        .select($"doc_id", $"n_contaminated_ngrams", $"contaminated")
        .orderBy($"doc_id")
    },

    // --- SEMANTIC benchmark decontamination (r10): the embedding analog
    //     of the n-gram filter — corpus vectors whose max cosine against
    //     any benchmark vector reaches 0.999 are contaminated. Corpus =
    //     embeddings + exact twins (+10000), bench = vec_id < 100, so
    //     every bench member and its twin scores exactly 1.0; round-4
    //     sims are bit-identical ordered folds on both engines, so the
    //     threshold comparison can never disagree even at a boundary.
    //     Scale shape: bench broadcasts, corpus never self-joins.
    Q("ext_semantic_decon",
      """WITH c AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000, embedding FROM embeddings),
        |b AS (SELECT embedding AS bvec FROM embeddings WHERE vec_id < 100),
        |p AS (
        |  SELECT c.vec_id,
        |    max(round(
        |      list_sum(list_transform(range(1, 65),
        |        i -> CAST(c.embedding[i] AS DOUBLE) * CAST(b.bvec[i] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(range(1, 65),
        |           i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(range(1, 65),
        |             i -> CAST(b.bvec[i] AS DOUBLE) * CAST(b.bvec[i] AS DOUBLE))))),
        |      4)) AS max_sim
        |  FROM c CROSS JOIN b GROUP BY c.vec_id)
        |SELECT vec_id, max_sim + CAST(0.0 AS DOUBLE) AS max_sim,
        |       max_sim >= 0.999 AS contaminated
        |FROM p ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir, "embeddings")
      val corpus = e.select($"vec_id".as("cid"), $"embedding".as("cvec"))
        .unionAll(e.select(($"vec_id" + 10000).as("cid"), $"embedding".as("cvec")))
      val bench = e.filter($"vec_id" < 100).select($"embedding".as("bvec"))
      Similarity.semanticDecontaminate(corpus, bench, threshold = 0.999)
        .select($"cid".as("vec_id"), $"max_sim", $"contaminated")
        .orderBy($"vec_id")
    },

    // --- per-doc cross-entropy vs the corpus unigram distribution (the
    //     CCNet-style LM quality signal): the Σ c·log2(p) term is summed
    //     as exact scaled integers on BOTH sides (ext_entropy pattern —
    //     raw double sums are summation-order-dependent and flipped
    //     across DuckDB builds at round-4 in r6); token counts exact.
    Q("ext_unigram_xent",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |             FROM documents),
        |dc AS (SELECT doc_id, w, COUNT(*) AS c FROM tok
        |       WHERE doc_id < 200 GROUP BY doc_id, w),
        |cw AS (SELECT w, COUNT(*) AS cw FROM tok GROUP BY w),
        |tot AS (SELECT COUNT(*) AS n FROM tok)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS tokens,
        |  round(-(CAST(CAST(SUM(CAST(floor(
        |        CAST(c AS DOUBLE)
        |          * log2(CAST(cw.cw AS DOUBLE) / CAST(tot.n AS DOUBLE))
        |          * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |        AS BIGINT)) AS BIGINT) AS DOUBLE)
        |      / CAST(1000000.0 AS DOUBLE) / CAST(SUM(c) AS DOUBLE)), 4)
        |    + CAST(0.0 AS DOUBLE) AS xent
        |FROM dc JOIN cw USING (w), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = t(spark, dir, "documents")
      graft.api.GraftFrame(TextFunctions.unigramCrossEntropy(
          docs.filter($"doc_id" < 200), "doc_id", "text", corpus = docs))
        .assign("xent" -> (round(col("xent"), 4) + lit(0.0)))
        .sortValues(Seq("doc_id"))
        .df
    },

    // --- per-domain cap: keep 10 docs per source in PortableHash order
    //     (rerun- and engine-stable); the oracle replays the identical
    //     avalanche hash rank.
    Q("ext_domain_cap",
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY ${graft.functions.PortableHash.sqlHash32("doc_id")}, doc_id) AS rn
         |  FROM documents) t
         |WHERE rn <= 10 ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      gt(spark, dir, "documents")
        .domainCap("source", "doc_id", cap = 10)
        .df.select($"doc_id", $"source")
        .orderBy($"doc_id")
    },

    // --- stratified domain sampling: per-source keep fractions through
    //     the portable uniform (src2's 0.0 drops the whole source on both
    //     engines; absent groups stay absent on both sides).
    Q("ext_stratified",
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n, min(doc_id) AS first_doc
         |FROM documents
         |WHERE ${graft.functions.PortableHash.sqlUniform01("doc_id")} <
         |  (CASE source WHEN 'src0' THEN CAST(0.9 AS DOUBLE)
         |               WHEN 'src1' THEN CAST(0.5 AS DOUBLE)
         |               WHEN 'src2' THEN CAST(0.0 AS DOUBLE)
         |               ELSE CAST(0.2 AS DOUBLE) END)
         |GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Curation.stratifiedSample(t(spark, dir, "documents"), "source", "doc_id",
          Map("src0" -> 0.9, "src1" -> 0.5, "src2" -> 0.0), defaultFrac = 0.2)
        .groupBy($"source")
        .agg(count(lit(1)).as("n"), min($"doc_id").as("first_doc"))
        .orderBy($"source")
    },

    // --- mixture-matching sample: exact per-domain target counts
    //     (floor(totalN·w_d), exact binary weights 0.5/0.25/0.25 so the
    //     driver-side floor is unambiguous), hash-ordered take per domain
    //     — the count-targeted sibling of ext_stratified
    Q("ext_mixture_sample",
      s"""WITH r AS (
         |  SELECT source, doc_id,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ${graft.functions.PortableHash.sqlHash32("doc_id")},
         |               doc_id) AS rn
         |  FROM documents WHERE source IN ('src0', 'src1', 'src2')),
         |k AS (SELECT source, doc_id FROM r
         |  WHERE rn <= CASE source WHEN 'src0' THEN 20
         |                          WHEN 'src1' THEN 10 ELSE 10 END)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM k GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Curation.mixtureSample(t(spark, dir, "documents"), "source", "doc_id",
          Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25), totalN = 40L)
        .groupBy($"source")
        .agg(count(lit(1)).as("n"), min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .orderBy($"source")
    },

    // --- temperature-based re-mixing (p_d ∝ n_d^α, α = 0.5): the corpus
    //     is skewed first (src0 full, src1 1-in-2, src2 1-in-5) so the
    //     counts differ, then targets floor(totalN·√n_d / Σ√n) are
    //     recomputed from scratch in SQL. √n is IEEE correctly-rounded
    //     and the normalizer folds in sorted domain order on BOTH sides,
    //     so the floor inputs are bit-identical — no boundary risk.
    Q("ext_temperature_sample",
      s"""WITH sub AS (
         |  SELECT source, doc_id FROM documents
         |  WHERE source = 'src0' OR (source = 'src1' AND doc_id % 40 = 1)
         |     OR (source = 'src2' AND doc_id % 100 = 2)),
         |cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
         |        FROM sub GROUP BY source),
         |w AS (SELECT source, sqrt(CAST(n AS DOUBLE)) AS w FROM cnt),
         |s AS (SELECT list_sum(list(w ORDER BY source)) AS wsum FROM w),
         |tgt AS (SELECT source,
         |          CAST(floor(CAST(30 AS DOUBLE) * w / wsum) AS BIGINT) AS tgt
         |        FROM w, s),
         |r AS (SELECT source, doc_id,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ${graft.functions.PortableHash.sqlHash32("doc_id")},
         |               doc_id) AS rn
         |  FROM sub),
         |k AS (SELECT r.source, doc_id FROM r JOIN tgt USING (source)
         |      WHERE rn <= tgt)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM k GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val sub = t(spark, dir, "documents").filter(
        $"source" === "src0" || ($"source" === "src1" && $"doc_id" % 40 === 1) ||
          ($"source" === "src2" && $"doc_id" % 100 === 2))
      Curation.temperatureSample(sub, "source", "doc_id", alpha = 0.5, totalN = 30L)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_kept"), min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .orderBy($"source")
    },

    // --- token-budget sample: per-domain first-fit prefix in hash order
    //     under an exact BIGINT running total of n_chars — the
    //     token-denominated sibling of ext_mixture_sample
    Q("ext_token_budget",
      s"""WITH r AS (
         |  SELECT source, doc_id, n_chars,
         |    SUM(n_chars) OVER (PARTITION BY source
         |      ORDER BY ${graft.functions.PortableHash.sqlHash32("doc_id")},
         |               doc_id) AS cum
         |  FROM documents WHERE source IN ('src0', 'src1')),
         |k AS (SELECT source, doc_id, n_chars FROM r
         |  WHERE cum <= CASE source WHEN 'src0' THEN 3000 ELSE 1500 END)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         |       CAST(SUM(n_chars) AS BIGINT) AS kept_tokens,
         |       min(doc_id) AS first_doc
         |FROM k GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Curation.tokenBudgetSample(t(spark, dir, "documents"), "source",
          "doc_id", "n_chars", Map("src0" -> 3000L, "src1" -> 1500L))
        .groupBy($"source")
        .agg(count(lit(1)).as("n"),
          sum($"n_chars").cast("long").as("kept_tokens"),
          min($"doc_id").as("first_doc"))
        .orderBy($"source")
    },

    // --- quality-weighted importance resampling: keep-probability
    //     n_chars/400 clamped to [0,1]; identical IEEE division and
    //     compare on both engines (exact — no rounding needed).
    Q("ext_importance",
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM documents
         |WHERE ${graft.functions.PortableHash.sqlUniform01("doc_id")} <
         |  least(CAST(1.0 AS DOUBLE), greatest(CAST(0.0 AS DOUBLE),
         |        CAST(n_chars AS DOUBLE) / CAST(400.0 AS DOUBLE)))
         |GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = t(spark, dir, "documents")
        .withColumn("w", $"n_chars".cast("double") / lit(400.0))
      Curation.importanceResample(docs, "w", "doc_id")
        .groupBy($"source")
        .agg(count(lit(1)).as("n"), min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .orderBy($"source")
    },

    // --- sequence packing: shard-local greedy first-fit into 256-token
    //     context windows. The recursive CTE replays the identical
    //     sequential fold per shard (exact integer arithmetic — same
    //     pattern as the op_ewm recurrence oracle).
    Q("ext_packing",
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, CAST(${graft.functions.PortableHash.sqlBucket("doc_id", 4)} AS BIGINT) AS shard,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |r AS (SELECT doc_id, shard, n_tokens,
         |        CAST(row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS rn
         |      FROM d),
         |rec AS (
         |  SELECT doc_id, shard, n_tokens, rn,
         |         CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS pack_offset,
         |         n_tokens AS used
         |  FROM r WHERE rn = 1
         |  UNION ALL
         |  SELECT r.doc_id, r.shard, r.n_tokens, r.rn,
         |         CASE WHEN rec.used + r.n_tokens > 256 THEN rec.pack_id + 1
         |              ELSE rec.pack_id END,
         |         CASE WHEN rec.used + r.n_tokens > 256 THEN CAST(0 AS BIGINT)
         |              ELSE rec.used END,
         |         CASE WHEN rec.used + r.n_tokens > 256 THEN r.n_tokens
         |              ELSE rec.used + r.n_tokens END
         |  FROM rec JOIN r ON r.shard = rec.shard AND r.rn = rec.rn + 1)
         |SELECT doc_id, shard, n_tokens, pack_id, pack_offset
         |FROM rec ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      gt(spark, dir, "documents")
        .packSequences("text", "doc_id", capacity = 256, nShards = 4)
        .df.select($"doc_id", $"shard", $"n_tokens", $"pack_id", $"pack_offset")
        .orderBy($"doc_id")
    },

    // --- overlapping context-window chunking (pretraining/RAG tokenize-
    //     and-chunk): 16-word windows advancing by 12; the final window is
    //     the last full stride. Exact string/integer outputs.
    Q("ext_chunking",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
        |           FROM documents WHERE doc_id < 100),
        |n AS (SELECT doc_id, w,
        |        CASE WHEN len(w) <= 16 THEN 1
        |             ELSE (len(w) - 16 + 11) // 12 + 1 END AS nc
        |      FROM d),
        |c AS (SELECT doc_id, w, unnest(range(nc)) AS i FROM n)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  CAST(len(string_split(array_to_string(w[i*12+1 : i*12+16], ' '), ' '))
        |       AS BIGINT) AS n_tokens,
        |  array_to_string(w[i*12+1 : i*12+16], ' ') AS chunk
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Curation.chunkWords(t(spark, dir, "documents").filter($"doc_id" < 100),
          "text", "doc_id", chunkSize = 16, overlap = 4)
        .orderBy($"doc_id", $"chunk_idx")
    },

    // --- exact line-level dedup (RefinedWeb/CCNet boilerplate pass):
    //     multi-line docs are built identically by both engines (40
    //     synthetic docs sharing one boilerplate header line), every line
    //     survives only at its first (gid, position) occurrence, docs are
    //     reassembled in order and fingerprinted.
    Q("ext_line_dedup",
      """WITH synth AS (
        |  SELECT doc_id % 40 AS gid,
        |         'common boilerplate header' || chr(10)
        |           || string_agg(text, chr(10) ORDER BY doc_id) AS text
        |  FROM documents GROUP BY doc_id % 40),
        |l AS (SELECT gid, i, ls[i+1] AS line
        |      FROM (SELECT gid, string_split(text, chr(10)) AS ls,
        |                   unnest(range(len(string_split(text, chr(10))))) AS i
        |            FROM synth) t),
        |k AS (SELECT gid, i, line FROM (
        |        SELECT gid, i, line,
        |               row_number() OVER (PARTITION BY line ORDER BY gid, i) AS rn
        |        FROM l) r WHERE rn = 1)
        |SELECT gid, CAST(COUNT(*) AS BIGINT) AS n_lines_kept,
        |       md5(string_agg(line, chr(10) ORDER BY i)) AS fp
        |FROM k GROUP BY gid ORDER BY gid""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val synth = t(spark, dir, "documents")
        .groupBy(($"doc_id" % 40).as("gid"))
        .agg(concat(lit("common boilerplate header\n"),
          array_join(transform(
            sort_array(collect_list(struct($"doc_id", $"text"))),
            s => s.getField("text")), "\n")).as("text"))
      Dedup.lineDedup(synth, "text", "gid")
        .select($"gid", $"n_lines_kept", md5($"text".cast("binary")).as("fp"))
        .orderBy($"gid")
    },

    // --- feature hashing (hashing trick / HashingTF): per-doc term
    //     frequency of 64 md5-bucketed features — exact integer counts,
    //     the engine-portable hash family on both sides.
    Q("ext_hashing_tf",
      """SELECT doc_id,
        |  CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 64 AS bucket,
        |  COUNT(*) AS tf
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |      FROM documents WHERE doc_id < 50) t
        |GROUP BY doc_id, bucket
        |ORDER BY doc_id, bucket""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      TextFunctions.hashingTf(
          t(spark, dir, "documents").filter($"doc_id" < 50), "doc_id", "text", dim = 64)
        .orderBy($"doc_id", $"bucket")
    },

    // --- corpus-wide top-k word bigrams: explode non-distinct 2-gram
    //     shingles → ONE partial+final count aggregate → distributed
    //     TakeOrdered top-20 (count desc, gram asc tiebreak). The classic
    //     corpus-statistics pass; integer counts compare exactly.
    Q("ext_ngram_topk",
      """WITH d AS (SELECT string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT array_to_string(w[i+1:i+2], ' ') AS gram
        |      FROM (SELECT w, unnest(range(len(w) - 1)) AS i
        |            FROM d WHERE len(w) >= 2) t)
        |SELECT gram, COUNT(*) AS cnt FROM g GROUP BY gram
        |ORDER BY cnt DESC, gram LIMIT 20""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      t(spark, dir, "documents")
        .select(explode(TextFunctions.shingles($"text", 2)).as("gram"))
        .groupBy($"gram").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"gram")
        .limit(20)
    },

    // --- per-document unigram diversity: token count, distinct types,
    //     the exact scaled-integer Σ c·log2 c term (per-word
    //     floor(c·log2 c·1e6 + 0.5) BIGINTs — order-free), and the
    //     type-token ratio as an exact integer rational
    //     (types·1e6 div tokens). Gate columns are ALL BIGINT: r7's red
    //     was the uncast DuckDB SUM(c) — SUM over BIGINT returns HUGEINT
    //     (int128), which the driver's fetch path renders differently
    //     than BIGINT (r7's only 5 reds were exactly the 5 oracles with
    //     HUGEINT output columns). The derived doubles (ttr, entropy)
    //     stay on the operator and are asserted in ReshapeSpec
    //     ("unigramStats: entropy of a uniform 2-word doc ...").
    Q("ext_entropy",
      """WITH wc AS (
        |  SELECT doc_id, w, COUNT(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents WHERE doc_id < 200) t
        |  GROUP BY doc_id, w)
        |SELECT doc_id,
        |  CAST(SUM(c) AS BIGINT) AS tokens,
        |  COUNT(*) AS types,
        |  CAST(SUM(CAST(floor(
        |      CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))
        |        * CAST(1000000.0 AS DOUBLE)
        |        + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS slc,
        |  (COUNT(*) * CAST(1000000 AS BIGINT)) // CAST(SUM(c) AS BIGINT)
        |    AS ttr_micro
        |FROM wc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.api.GraftFrame(TextFunctions.unigramStats(
          t(spark, dir, "documents").filter($"doc_id" < 200), "doc_id", "text"))
        .assign("ttr_micro" ->
          expr("(types * CAST(1000000 AS BIGINT)) div tokens"))
        .select("doc_id", "tokens", "types", "slc", "ttr_micro")
        .sortValues(Seq("doc_id"))
        .df
    },

    // --- SemDeDup-style semantic dedup on the twin corpus: deterministic
    //     pivots (k smallest avalanche-hash ids), round-4 argmax cell
    //     assignment, within-cell pairwise cosine at 0.999 — every doc's
    //     identical twin shares its cell, so each cluster keeps ~half.
    //     Output is integer counts per cluster; the oracle replays pivot
    //     selection, assignment, and pairing from scratch.
    Q("ext_semantic_dedup",
      s"""WITH c AS (
         |  SELECT vec_id AS cid, embedding AS cvec FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 10000, embedding FROM embeddings),
         |p AS (SELECT cid AS pid, cvec AS pvec FROM c
         |      ORDER BY ${graft.functions.PortableHash.sqlHash32("cid")}, cid
         |      LIMIT 16),
         |asg AS (
         |  SELECT cid, pid AS cluster FROM (
         |    SELECT c.cid, p.pid,
         |      row_number() OVER (PARTITION BY c.cid
         |        ORDER BY ${sqlCos("c.cvec", "p.pvec")} DESC, p.pid) AS rn
         |    FROM c, p) s
         |  WHERE rn = 1),
         |dup AS (
         |  SELECT DISTINCT b.cid AS cid
         |  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.cid < b.cid
         |  JOIN c ca ON ca.cid = a.cid
         |  JOIN c cb ON cb.cid = b.cid
         |  WHERE ${sqlCos("ca.cvec", "cb.cvec")} >= 0.999)
         |SELECT cluster, COUNT(*) AS n_docs,
         |  COUNT(*) FILTER (WHERE cid NOT IN (SELECT cid FROM dup)) AS n_kept
         |FROM asg GROUP BY cluster ORDER BY cluster""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val e = t(spark, dir, "embeddings")
        .select($"vec_id".as("cid"), $"embedding".as("cvec"))
      val corpus = e.unionAll(e.select(($"cid" + 10000).as("cid"), $"cvec"))
      Similarity.semanticDedup(corpus, k = 16, tau = 0.999)
        .groupBy($"cluster")
        .agg(count(lit(1)).as("n_docs"),
          count(when($"keep", lit(1))).as("n_kept"))
        .orderBy($"cluster")
    },

    // --- DSIR importance weights: log-likelihood ratio of the src0 slice
    //     (the "target" domain) vs the whole corpus over 256 portable-md5
    //     bigram buckets, Laplace-smoothed. Per-doc Σ nb·λ(b) sums exact
    //     scaled integers on BOTH sides (ext_entropy pattern — raw double
    //     sums are order-dependent, and the weight is the top-20
    //     selection key, so a 1-ulp flip could swap rank 20/21). +0.0:
    //     weights cross zero, and round preserves -0.0.
    Q("ext_dsir",
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w
        |           FROM documents),
        |g AS (SELECT doc_id, source, array_to_string(w[i+1:i+2], ' ') AS gm
        |      FROM (SELECT doc_id, source, w, unnest(range(len(w) - 1)) AS i
        |            FROM d WHERE len(w) >= 2) t),
        |b AS (SELECT doc_id, source,
        |             CAST('0x' || substr(md5(gm), 1, 15) AS BIGINT) % 256 AS bucket
        |      FROM g),
        |tc AS (SELECT bucket, COUNT(*) AS ct FROM b WHERE source = 'src0'
        |       GROUP BY bucket),
        |rc AS (SELECT bucket, COUNT(*) AS cr FROM b GROUP BY bucket),
        |tt AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt FROM tc),
        |tr AS (SELECT CAST(SUM(cr) AS BIGINT) AS tr FROM rc),
        |lam AS (SELECT rc.bucket,
        |          ln(CAST(COALESCE(tc.ct, 0) + 1 AS DOUBLE)
        |             / CAST(tt.tt + 256 AS DOUBLE))
        |          - ln(CAST(rc.cr + 1 AS DOUBLE) / CAST(tr.tr + 256 AS DOUBLE))
        |            AS lam
        |        FROM rc LEFT JOIN tc USING (bucket), tt, tr),
        |db AS (SELECT doc_id, bucket, COUNT(*) AS nb FROM b
        |       GROUP BY doc_id, bucket)
        |SELECT doc_id,
        |       round(CAST(CAST(SUM(CAST(floor(
        |           nb * lam * CAST(1000000.0 AS DOUBLE)
        |             + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS DOUBLE)
        |         / CAST(1000000.0 AS DOUBLE), 4)
        |         + CAST(0.0 AS DOUBLE) AS dsir_weight
        |FROM db JOIN lam USING (bucket)
        |GROUP BY doc_id
        |ORDER BY dsir_weight DESC, doc_id LIMIT 20""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = t(spark, dir, "documents")
      Curation.dsirWeights(docs, docs.filter($"source" === "src0"),
          "text", "doc_id", dim = 256)
        .withColumn("dsir_weight", $"dsir_weight" + lit(0.0))
        .orderBy($"dsir_weight".desc, $"doc_id")
        .limit(20)
    },

    // --- Okapi BM25 top-20 for a fixed 3-term query; the oracle mirrors
    //     the exact arithmetic shape (left-assoc, every literal cast to
    //     DOUBLE — bare DuckDB decimals are DECIMAL). Per-doc Σ over
    //     terms sums exact scaled integers on BOTH sides (ext_entropy
    //     pattern; the score is also the top-20 selection key).
    Q("ext_bm25",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM d),
        |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |                 CAST(SUM(dl) AS BIGINT) AS sdl FROM dl),
        |tf AS (SELECT doc_id, tm, COUNT(*) AS tf
        |       FROM (SELECT doc_id, unnest(w) AS tm FROM d) t
        |       WHERE tm IN ('vector', 'merge', 'window')
        |       GROUP BY doc_id, tm),
        |idf AS (SELECT tm,
        |          ln(CAST(1.0 AS DOUBLE)
        |             + (stats.n - COUNT(*) + CAST(0.5 AS DOUBLE))
        |               / (COUNT(*) + CAST(0.5 AS DOUBLE))) AS idf
        |        FROM tf, stats GROUP BY tm, stats.n)
        |SELECT tf.doc_id,
        |  round(CAST(CAST(SUM(CAST(floor(
        |      (idf.idf * (tf.tf * (CAST(1.2 AS DOUBLE) + 1))
        |        / (tf.tf + CAST(1.2 AS DOUBLE)
        |            * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
        |               + CAST(0.75 AS DOUBLE) * CAST(dl.dl AS DOUBLE)
        |                 / (CAST(stats.sdl AS DOUBLE) / CAST(stats.n AS DOUBLE)))))
        |      * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))
        |      AS BIGINT) AS DOUBLE) / CAST(1000000.0 AS DOUBLE),
        |    4) AS score
        |FROM tf JOIN idf USING (tm) JOIN dl USING (doc_id), stats
        |GROUP BY tf.doc_id
        |ORDER BY score DESC, tf.doc_id LIMIT 20""".stripMargin) { (spark, dir) =>
      TextFunctions.bm25(t(spark, dir, "documents"), "doc_id", "text",
          Seq("vector", "merge", "window"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    },

    // --- weighted k-step walk-count centrality over the event-transition
    //     graph (the exact-integer Katz/PageRank cousin): three
    //     join-aggregate steps against the pre-aggregated frontier.
    //     All-BIGINT — no rounding anywhere.
    Q("ext_graph_centrality",
      """WITH e AS (
        |  SELECT from_type AS src, to_type AS dst, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM (SELECT event_type AS from_type,
        |               lead(event_type) OVER (PARTITION BY user_id
        |                                      ORDER BY ts, event_id) AS to_type
        |        FROM events) t
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |f1 AS (SELECT dst AS node, CAST(SUM(w) AS BIGINT) AS walks_1
        |       FROM e GROUP BY dst),
        |f2 AS (SELECT e.dst AS node, CAST(SUM(e.w * f.walks_1) AS BIGINT) AS walks_2
        |       FROM e JOIN f1 f ON f.node = e.src GROUP BY e.dst),
        |f3 AS (SELECT e.dst AS node, CAST(SUM(e.w * f.walks_2) AS BIGINT) AS walks_3
        |       FROM e JOIN f2 f ON f.node = e.src GROUP BY e.dst)
        |SELECT node,
        |  COALESCE(walks_1, CAST(0 AS BIGINT)) AS walks_1,
        |  COALESCE(walks_2, CAST(0 AS BIGINT)) AS walks_2,
        |  COALESCE(walks_3, CAST(0 AS BIGINT)) AS walks_3
        |FROM f1 FULL JOIN f2 USING (node) FULL JOIN f3 USING (node)
        |ORDER BY node""".stripMargin) { (spark, dir) =>
      val edges = graft.operators.Sessionize.transitionCounts(
        t(spark, dir, "events"), "user_id", "ts", "event_id", "event_type")
      graft.operators.Components
        .pathCentrality(edges, "from_type", "to_type", "n", steps = 3)
        .orderBy(col("node"))
    },

    // --- PageRank over the event-type transition graph
    //     (Components.pagerank — the float cousin of pathCentrality,
    //     the harvest-ranking signal of web curation): 5 damped rounds
    //     from the uniform start, dangling self-loop completion. Every
    //     float sum is a sort-then-fold (LabelProp recipe), so the
    //     oracle replays the iteration round-for-round via
    //     list_sum(list(x ORDER BY key)) — bit-identical folds, round 6
    //     only as belt-and-braces on the final rank.
    Q("ext_pagerank", {
      val iters = (1 to 5).map { t =>
        s"""c$t AS (SELECT g.dst, list_sum(list(g.p * r.r ORDER BY g.src)) AS cs
           |  FROM g JOIN r${t - 1} r ON g.src = r.node GROUP BY g.dst),
           |r$t AS (SELECT nodes.node,
           |  (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(nn.n AS DOUBLE)
           |    + CAST(0.85 AS DOUBLE) * COALESCE(c.cs, CAST(0.0 AS DOUBLE)) AS r
           |  FROM nodes CROSS JOIN nn LEFT JOIN c$t c ON nodes.node = c.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (
         |  SELECT from_type AS src, to_type AS dst, CAST(COUNT(*) AS DOUBLE) AS w
         |  FROM (SELECT event_type AS from_type,
         |               lead(event_type) OVER (PARTITION BY user_id
         |                                      ORDER BY ts, event_id) AS to_type
         |        FROM events) t
         |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |nodes AS (SELECT src AS node FROM e0 UNION SELECT dst FROM e0),
         |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
         |dang AS (SELECT node AS src, node AS dst, CAST(1.0 AS DOUBLE) AS w
         |         FROM nodes WHERE node NOT IN (SELECT src FROM e0)),
         |e AS (SELECT * FROM e0 UNION ALL SELECT * FROM dang),
         |ow AS (SELECT src, list_sum(list(w ORDER BY dst)) AS ow FROM e GROUP BY src),
         |g AS (SELECT e.src, e.dst, e.w / ow.ow AS p FROM e JOIN ow ON e.src = ow.src),
         |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / CAST(nn.n AS DOUBLE) AS r
         |       FROM nodes CROSS JOIN nn),
         |$iters
         |SELECT node, round(r, 6) AS r FROM r5 ORDER BY node""".stripMargin
    }) { (spark, dir) =>
      val edges = graft.operators.Sessionize.transitionCounts(
        t(spark, dir, "events"), "user_id", "ts", "event_id", "event_type")
      graft.operators.Components
        .pagerank(edges, "from_type", "to_type", "n", iters = 5)
        .select(col("node"), round(col("r"), 6).as("r"))
        .orderBy(col("node"))
    },

    // --- exact duplicated-substring removal (Lee et al. ExactSubstr as
    //     n-gram coverage, keep-first): the oracle replays gram hashing,
    //     keep-first ranking, the interval-merge coverage window, and the
    //     ordered reassembly from scratch; fingerprints compare the full
    //     surviving text. The fixture's planted duplicate docs erase to
    //     n_words_kept = 0 on both sides.
    Q("ext_substring_dedup",
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id, j AS s,
        |             CAST('0x' || substr(md5(array_to_string(ws[j+1:j+8], ' ')), 1, 15)
        |                  AS BIGINT) AS gh
        |      FROM (SELECT doc_id, ws, unnest(range(len(ws) - 7)) AS j
        |            FROM base WHERE len(ws) >= 8) t),
        |d AS (SELECT doc_id, s FROM (
        |        SELECT doc_id, s,
        |               row_number() OVER (PARTITION BY gh ORDER BY doc_id, s) AS rn
        |        FROM g) r WHERE rn > 1),
        |w AS (SELECT doc_id, i, ws[i+1] AS w
        |      FROM (SELECT doc_id, ws, unnest(range(len(ws))) AS i FROM base) t),
        |u AS (SELECT doc_id, i, w, 0 AS isstart FROM w
        |      UNION ALL
        |      SELECT doc_id, s AS i, NULL AS w, 1 AS isstart FROM d),
        |c AS (SELECT doc_id, i, w, isstart,
        |             MAX(CASE WHEN isstart = 1 THEN i + 7 ELSE -1 END)
        |               OVER (PARTITION BY doc_id ORDER BY i, isstart DESC
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS covend
        |      FROM u),
        |k AS (SELECT doc_id, COUNT(*) AS n,
        |             md5(string_agg(w, ' ' ORDER BY i)) AS fp
        |      FROM c WHERE isstart = 0 AND covend < i GROUP BY doc_id)
        |SELECT d0.doc_id, CAST(COALESCE(k.n, 0) AS BIGINT) AS n_words_kept,
        |       COALESCE(k.fp, md5('')) AS fp
        |FROM (SELECT doc_id FROM documents) d0 LEFT JOIN k USING (doc_id)
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Dedup.substringSpanDedup(t(spark, dir, "documents"), "text", "doc_id", n = 8)
        .select($"doc_id", $"n_words_kept",
          md5($"text".cast("binary")).as("fp"))
        .orderBy($"doc_id")
    },

    // --- deterministic training-shard export: the oracle replays the
    //     PortableHash shard assignment AND the within-shard (hash, id)
    //     row order contract of Curation.writeShards as an ordered
    //     fingerprint per shard.
    Q("ext_shards",
      s"""SELECT shard, CAST(COUNT(*) AS BIGINT) AS n, min(doc_id) AS first_doc,
         |       md5(string_agg(CAST(doc_id AS VARCHAR), ','
         |           ORDER BY ${graft.functions.PortableHash.sqlHash32("doc_id")}, doc_id)) AS fp
         |FROM (SELECT doc_id,
         |             ${graft.functions.PortableHash.sqlBucket("doc_id", 16)} AS shard
         |      FROM documents) t
         |GROUP BY shard ORDER BY shard""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.operators.Curation
        .shardAssign(t(spark, dir, "documents"), "doc_id", nShards = 16)
        .groupBy($"shard")
        .agg(count(lit(1)).as("n"), min($"doc_id").as("first_doc"),
          md5(array_join(transform(
            sort_array(collect_list(struct(
              graft.functions.PortableHash.hash32($"doc_id").as("h"),
              $"doc_id".as("d")))),
            s => s.getField("d").cast("string")), ",").cast("binary")).as("fp"))
        .orderBy($"shard")
    },

    // --- interpolated bigram-LM cross-entropy (KenLM-style quality
    //     signal, one order above ext_unigram_xent): per-row arithmetic
    //     mirrors exactly; the cross-row Σ sums exact scaled integers
    //     (ext_entropy pattern). oov counts bigrams whose second word is
    //     corpus-absent (always 0 here: docs ⊆ corpus — exercised in
    //     CurationSpec with a disjoint corpus).
    Q("ext_bigram_xent",
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (SELECT doc_id, ws[i] AS v, ws[i+1] AS w
        |       FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
        |             FROM base WHERE len(ws) >= 2) t),
        |dbg AS (SELECT doc_id, v, w, COUNT(*) AS c FROM bg
        |        WHERE doc_id < 200 GROUP BY doc_id, v, w),
        |cbg AS (SELECT v, w, COUNT(*) AS cvw FROM bg GROUP BY v, w),
        |ctx AS (SELECT v, CAST(SUM(cvw) AS BIGINT) AS cv FROM cbg GROUP BY v),
        |tok AS (SELECT unnest(ws) AS w FROM base),
        |uni AS (SELECT w, COUNT(*) AS cw FROM tok GROUP BY w),
        |tot AS (SELECT COUNT(*) AS n FROM tok)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS bigrams,
        |  CAST(COALESCE(SUM(c) FILTER (WHERE cw IS NULL), 0) AS BIGINT) AS oov,
        |  round(-(CAST(CAST(SUM(CAST(floor(
        |      CAST(c AS DOUBLE) * log2(
        |        CAST(0.75 AS DOUBLE)
        |          * COALESCE(CAST(cvw AS DOUBLE) / CAST(cv AS DOUBLE),
        |                     CAST(0.0 AS DOUBLE))
        |        + (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE))
        |          * COALESCE(CAST(cw AS DOUBLE), CAST(0.0 AS DOUBLE))
        |          / CAST(n AS DOUBLE))
        |      * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))
        |      FILTER (WHERE cw IS NOT NULL) AS BIGINT) AS DOUBLE)
        |    / CAST(1000000.0 AS DOUBLE)
        |    / CAST(SUM(c) FILTER (WHERE cw IS NOT NULL) AS DOUBLE)), 4)
        |    + CAST(0.0 AS DOUBLE) AS xent
        |FROM dbg LEFT JOIN cbg USING (v, w) LEFT JOIN ctx USING (v)
        |     LEFT JOIN uni USING (w), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = t(spark, dir, "documents")
      graft.api.GraftFrame(TextFunctions.bigramCrossEntropy(
          docs.filter($"doc_id" < 200), "doc_id", "text",
          corpus = docs, lambda = 0.75))
        .assign("xent" -> (round(col("xent"), 4) + lit(0.0)))
        .sortValues(Seq("doc_id"))
        .df
    },

    // --- CCNet-style perplexity bucketing (the head/middle/tail split
    //     of Wenzek et al.): per-doc LM cross-entropy (the
    //     ext_bigram_xent machinery, UNROUNDED — exact scaled-integer
    //     sums divided by exact counts, bit-identical both sides) →
    //     ntile(3) over the (xent, doc_id) total order → per-bucket
    //     counts, id range and the scaled-integer mean. Safe as a
    //     selection-by-computed-double: adjacent doc xents differ by
    //     ~1e-3 while the worst floor-boundary wobble is ~1e-6/bigrams.
    //     Scale shape: the corpus-wide joins are the audited xent shape;
    //     the ntile window runs on the ≤200-row per-doc summary.
    Q("ext_ccnet_buckets",
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (SELECT doc_id, ws[i] AS v, ws[i+1] AS w
        |       FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
        |             FROM base WHERE len(ws) >= 2) t),
        |dbg AS (SELECT doc_id, v, w, COUNT(*) AS c FROM bg
        |        WHERE doc_id < 200 GROUP BY doc_id, v, w),
        |cbg AS (SELECT v, w, COUNT(*) AS cvw FROM bg GROUP BY v, w),
        |ctx AS (SELECT v, CAST(SUM(cvw) AS BIGINT) AS cv FROM cbg GROUP BY v),
        |tok AS (SELECT unnest(ws) AS w FROM base),
        |uni AS (SELECT w, COUNT(*) AS cw FROM tok GROUP BY w),
        |tot AS (SELECT COUNT(*) AS n FROM tok),
        |sc AS (SELECT doc_id,
        |  -(CAST(CAST(SUM(CAST(floor(
        |      CAST(c AS DOUBLE) * log2(
        |        CAST(0.75 AS DOUBLE)
        |          * COALESCE(CAST(cvw AS DOUBLE) / CAST(cv AS DOUBLE),
        |                     CAST(0.0 AS DOUBLE))
        |        + (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE))
        |          * COALESCE(CAST(cw AS DOUBLE), CAST(0.0 AS DOUBLE))
        |          / CAST(n AS DOUBLE))
        |      * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))
        |      FILTER (WHERE cw IS NOT NULL) AS BIGINT) AS DOUBLE)
        |    / CAST(1000000.0 AS DOUBLE)
        |    / CAST(SUM(c) FILTER (WHERE cw IS NOT NULL) AS DOUBLE)) AS xent
        |  FROM dbg LEFT JOIN cbg USING (v, w) LEFT JOIN ctx USING (v)
        |       LEFT JOIN uni USING (w), tot
        |  GROUP BY doc_id),
        |b AS (SELECT doc_id, xent,
        |        ntile(3) OVER (ORDER BY xent, doc_id) AS bucket
        |      FROM sc WHERE xent IS NOT NULL)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(MIN(doc_id) AS BIGINT) AS min_doc,
        |  CAST(MAX(doc_id) AS BIGINT) AS max_doc,
        |  round(CAST(SUM(CAST(floor(xent * 1000000.0 + 0.5) AS BIGINT))
        |          AS BIGINT) / 1000000.0 / COUNT(*), 6)
        |    + CAST(0.0 AS DOUBLE) AS mean_xent
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = t(spark, dir, "documents")
      val scored = TextFunctions.bigramCrossEntropy(
          docs.filter($"doc_id" < 200), "doc_id", "text",
          corpus = docs, lambda = 0.75)
        .filter($"xent".isNotNull)
      scored
        .withColumn("bucket",
          ntile(3).over(Window.orderBy($"xent", $"doc_id")))
        .groupBy($"bucket".cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min($"doc_id").cast("long").as("min_doc"),
          max($"doc_id").cast("long").as("max_doc"),
          (round(sum(floor($"xent" * 1000000.0 + 0.5).cast("long"))
            .cast("double") / 1000000.0 / count(lit(1)), 6) + lit(0.0))
            .as("mean_xent"))
        .orderBy($"bucket")
    },

    // --- Gopher quality-rule flags: every rule replayed as identical
    //     per-row arithmetic (exact integer counts and IEEE divisions on
    //     both engines — booleans compare bit-exact).
    Q("ext_gopher",
      """WITH e AS (SELECT doc_id, text, string_split(text, ' ') AS ws,
        |                  string_split(text, chr(10)) AS ls FROM documents),
        |m AS (SELECT doc_id, len(ws) AS nwi,
        |  CAST(len(ws) AS DOUBLE) AS nw,
        |  CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
        |    / CAST(greatest(len(ws), 1) AS DOUBLE) AS mwl,
        |  CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE) AS hashes,
        |  CAST(length(text) - length(regexp_replace(text, '\.\.\.', '', 'g'))
        |       AS DOUBLE) / CAST(3 AS DOUBLE)
        |    + CAST(length(text) - length(replace(text, chr(8230), ''))
        |           AS DOUBLE) AS ell,
        |  CAST(len(list_filter(ls, l -> starts_with(l, '- ')
        |       OR starts_with(l, '* ') OR starts_with(l, '• '))) AS DOUBLE) AS nbul,
        |  CAST(len(list_filter(ls, l -> ends_with(l, '...')
        |       OR ends_with(l, chr(8230)))) AS DOUBLE) AS nelll,
        |  CAST(len(ls) AS DOUBLE) AS nl,
        |  CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
        |       AS DOUBLE) AS nalpha,
        |  (CAST(list_contains(ws, 'the') AS INT) + CAST(list_contains(ws, 'a') AS INT)
        |   + CAST(list_contains(ws, 'and') AS INT) + CAST(list_contains(ws, 'of') AS INT)
        |   + CAST(list_contains(ws, 'to') AS INT) + CAST(list_contains(ws, 'in') AS INT)
        |   + CAST(list_contains(ws, 'is') AS INT) + CAST(list_contains(ws, 'that') AS INT)) AS nstop,
        |  CAST(len(list_distinct(ws)) AS DOUBLE) AS nuniq
        | FROM e),
        |f AS (SELECT doc_id, CAST(nwi AS BIGINT) AS n_words,
        |  (nwi >= 50 AND nwi <= 100000) AS f_words,
        |  (mwl >= CAST(3.0 AS DOUBLE) AND mwl <= CAST(10.0 AS DOUBLE)) AS f_word_len,
        |  ((hashes + ell) / nw < CAST(0.1 AS DOUBLE)) AS f_symbol,
        |  (nbul / nl < CAST(0.9 AS DOUBLE)) AS f_bullet,
        |  (nelll / nl < CAST(0.3 AS DOUBLE)) AS f_ellipsis,
        |  (nalpha / nw > CAST(0.8 AS DOUBLE)) AS f_alpha,
        |  (nstop >= 2) AS f_stop,
        |  (nuniq / nw >= CAST(0.2 AS DOUBLE)) AS f_uniq
        | FROM m)
        |SELECT doc_id, n_words, f_words, f_word_len, f_symbol, f_bullet,
        |       f_ellipsis, f_alpha, f_stop, f_uniq,
        |       (f_words AND f_word_len AND f_symbol AND f_bullet AND f_ellipsis
        |        AND f_alpha AND f_stop AND f_uniq) AS pass
        |FROM f ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.operators.Curation
        .gopherFlags(t(spark, dir, "documents"), "text", "doc_id")
        .orderBy($"doc_id")
    },

    // --- curation pipeline v5, this round's ops end-to-end: URL dedup
    //     (two crawl variants per page) → C4 line/document rules (a
    //     brace page and a two-sentence page per 10 ids drop) →
    //     temperature re-mix (α = 0.5, totalN = 60). Every stage is
    //     replayed from scratch in SQL — url regex chain, line filter,
    //     sentence count, √n targets through the sorted-domain fold.
    Q("ext_curation5",
      s"""WITH b AS (SELECT doc_id, source,
         |    CASE WHEN doc_id < 250
         |         THEN 'http://site.com/p/' || CAST(doc_id % 250 AS VARCHAR)
         |         ELSE 'https://site.com/p/' || CAST(doc_id % 250 AS VARCHAR)
         |              || '/?utm_source=x' END AS url,
         |    CASE WHEN doc_id % 10 = 3
         |         THEN text || '.' || chr(10) || 'var x = { y };' || chr(10)
         |              || text || '!'
         |         WHEN doc_id % 10 = 7
         |         THEN text || '.' || chr(10) || text || '!'
         |         ELSE text || '.' || chr(10) || text || '!' || chr(10)
         |              || 'is it ' || text || '?' END AS page
         |  FROM documents WHERE doc_id < 500),
         |n0 AS (SELECT doc_id,
         |    lower(regexp_extract(url, '^([^/?#]*//[^/?#]*)', 1))
         |      || regexp_replace(url, '^[^/?#]*//[^/?#]*', '') AS s FROM b),
         |n3 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
         |    regexp_replace(regexp_replace(s, '^https://', 'http://'),
         |      '#.*$$', ''),
         |    '[?&](utm_[a-z]+|fbclid|gclid|ref)=[^&#]*', '', 'g'),
         |    '\\?$$', ''), '([^/])/$$', '\\1') AS url_norm FROM n0),
         |uk AS (SELECT url_norm, min(doc_id) AS doc_id FROM n3
         |       GROUP BY url_norm),
         |ud AS (SELECT b.doc_id, b.source, b.page FROM b
         |       JOIN uk ON b.doc_id = uk.doc_id),
         |c AS (SELECT doc_id, source,
         |    array_to_string(list_filter(string_split(page, chr(10)), l ->
         |      (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
         |        OR ends_with(l, '"'))
         |      AND len(string_split(l, ' ')) >= 5
         |      AND NOT contains(lower(l), 'javascript')), chr(10)) AS clean,
         |    contains(page, '{') AS hb,
         |    contains(lower(page), 'lorem ipsum') AS hp
         |  FROM ud),
         |k AS (SELECT doc_id, source FROM c
         |      WHERE NOT hb AND NOT hp
         |        AND length(clean) - length(translate(clean, '.!?', '')) >= 3),
         |cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
         |        FROM k GROUP BY source),
         |w AS (SELECT source, sqrt(CAST(n AS DOUBLE)) AS w FROM cnt),
         |sm AS (SELECT list_sum(list(w ORDER BY source)) AS wsum FROM w),
         |tgt AS (SELECT source,
         |          CAST(floor(CAST(60 AS DOUBLE) * w / wsum) AS BIGINT) AS tgt
         |        FROM w, sm),
         |r AS (SELECT source, doc_id,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY ${graft.functions.PortableHash.sqlHash32("doc_id")},
         |               doc_id) AS rn
         |  FROM k),
         |f AS (SELECT r.source, doc_id FROM r JOIN tgt USING (source)
         |      WHERE rn <= tgt)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM f GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val gidS = ($"doc_id" % 250).cast("string")
      val url = when($"doc_id" < 250,
          concat(lit("http://site.com/p/"), gidS))
        .otherwise(concat(lit("https://site.com/p/"), gidS,
          lit("/?utm_source=x")))
      val page = when($"doc_id" % 10 === 3,
          concat($"text", lit(".\nvar x = { y };\n"), $"text", lit("!")))
        .when($"doc_id" % 10 === 7,
          concat($"text", lit(".\n"), $"text", lit("!")))
        .otherwise(concat($"text", lit(".\n"), $"text", lit("!\nis it "),
          $"text", lit("?")))
      val base = t(spark, dir, "documents").filter($"doc_id" < 500)
        .select($"doc_id", $"source", url.as("url"), page.as("text"))
      val afterUrl = Dedup.urlDedup(base, "url", "doc_id")
        .select($"doc_id", $"source", $"text")
      val kept = afterUrl.join(
        graft.operators.Curation.c4Clean(afterUrl, "text", "doc_id")
          .filter($"kept").select($"doc_id"),
        Seq("doc_id"), "left_semi")
      graft.operators.Curation
        .temperatureSample(kept, "source", "doc_id", alpha = 0.5, totalN = 60)
        .groupBy($"source")
        .agg(count(lit(1)).as("n_kept"), min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .orderBy($"source")
    },

    // --- curation pipeline v6, session-4 composition: PORTABLE-LSH
    //     candidates → exact-Jaccard verification → star-contraction
    //     connected components → quality-aware best-member keep (longest
    //     text, ties → smallest id). Every stage replays in SQL: the
    //     banding chain, the candidate∩verified intersection, the
    //     recursive-CTE min-label (≡ star output), and the integer-argmax
    //     keep rule (len·100000 + (99999 − id); doc_id < 100000, len
    //     < ~10⁴ in the fixture → no overflow, ties exact).
    Q("ext_curation6",
      s"""WITH RECURSIVE $shinglesCte,
         |$portableBkCte,
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bk a JOIN bk b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |jp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |pe AS (SELECT doc_a, doc_b FROM jp
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id
         |  WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.8),
         |vp AS (SELECT doc_a, doc_b FROM pe JOIN cand USING (doc_a, doc_b)),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM vp
         |          UNION SELECT doc_b, doc_a FROM vp),
         |cc AS (
         |  SELECT DISTINCT a AS node, a AS label FROM edges
         |  UNION
         |  SELECT e.b AS node, cc.label FROM cc JOIN edges e ON e.a = cc.node),
         |cl AS (SELECT node AS doc_id, min(label) AS cluster FROM cc GROUP BY node),
         |sc AS (SELECT cl.cluster, cl.doc_id, length(d.text) AS len
         |       FROM cl JOIN documents d USING (doc_id))
         |SELECT CAST(cluster AS BIGINT) AS cluster,
         |  CAST(COUNT(*) AS BIGINT) AS members,
         |  CAST(99999 - (MAX(len * 100000 + (99999 - doc_id)) % 100000) AS BIGINT)
         |    AS keep_doc
         |FROM sc GROUP BY cluster ORDER BY cluster""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      import graft.operators.{Components, Dedup}
      val docs = t(spark, dir, "documents")
      val cands = Dedup.minhashCandidatesPortable(docs, "text", "doc_id")
      val pairs = Dedup.verifyCandidatePairs(docs, cands, "text", "doc_id",
        n = 3, threshold = 0.8)
      val members = Components.connectedComponentsStar(pairs, "doc_a", "doc_b")
        .select($"node".as("doc_id"), $"cluster")
      docs.select($"doc_id", length($"text").cast("long").as("len"))
        .join(members, Seq("doc_id"))
        .groupBy($"cluster")
        .agg(count(lit(1)).as("members"),
          (lit(99999L) - pmod(max($"len" * 100000L + (lit(99999L) - $"doc_id")),
            lit(100000L))).as("keep_doc"))
        .orderBy($"cluster")
    },

    // --- URL canonicalization + dedup (the CCNet/RefinedWeb first pass):
    //     five crawl variants of each page — host case, https, tracking
    //     params (a run of two), fragment, and a REAL query param that
    //     must survive — are synthesized identically; both engines
    //     normalize and keep the min-id doc per canonical URL. Expected:
    //     variants 0–3 collapse, the ?a=1 variant stays distinct.
    Q("ext_url_dedup",
      """WITH u AS (SELECT doc_id,
        |    CASE CAST(doc_id // 100 AS BIGINT)
        |      WHEN 0 THEN 'http://Example.COM/page/' || CAST(doc_id % 100 AS VARCHAR)
        |      WHEN 1 THEN 'https://example.com/page/' || CAST(doc_id % 100 AS VARCHAR) || '/'
        |      WHEN 2 THEN 'http://example.com/page/' || CAST(doc_id % 100 AS VARCHAR)
        |                  || '?utm_source=feed&utm_medium=rss'
        |      WHEN 3 THEN 'http://example.com/page/' || CAST(doc_id % 100 AS VARCHAR)
        |                  || '#section-2'
        |      ELSE 'http://example.com/page/' || CAST(doc_id % 100 AS VARCHAR)
        |           || '?a=1&gclid=xyz' END AS url
        |  FROM documents WHERE doc_id < 500),
        |n0 AS (SELECT doc_id,
        |    lower(regexp_extract(url, '^([^/?#]*//[^/?#]*)', 1))
        |      || regexp_replace(url, '^[^/?#]*//[^/?#]*', '') AS s FROM u),
        |n1 AS (SELECT doc_id, regexp_replace(regexp_replace(s,
        |    '^https://', 'http://'), '#.*$', '') AS s FROM n0),
        |n2 AS (SELECT doc_id, regexp_replace(regexp_replace(s,
        |    '([?&])(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*&', '\1', 'g'),
        |    '([?&])(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*&', '\1', 'g') AS s
        |  FROM n1),
        |n3 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(s,
        |    '[?&](utm_[a-z]+|fbclid|gclid|ref)=[^&#]*', '', 'g'),
        |    '\?$', ''), '([^/])/$', '\1') AS url_norm FROM n2),
        |k AS (SELECT url_norm, min(doc_id) AS doc_id
        |      FROM n3 GROUP BY url_norm)
        |SELECT doc_id, url_norm FROM k ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val gidS = ($"doc_id" % 100).cast("string")
      val url = when(($"doc_id" / 100).cast("long") === 0,
          concat(lit("http://Example.COM/page/"), gidS))
        .when(($"doc_id" / 100).cast("long") === 1,
          concat(lit("https://example.com/page/"), gidS, lit("/")))
        .when(($"doc_id" / 100).cast("long") === 2,
          concat(lit("http://example.com/page/"), gidS,
            lit("?utm_source=feed&utm_medium=rss")))
        .when(($"doc_id" / 100).cast("long") === 3,
          concat(lit("http://example.com/page/"), gidS, lit("#section-2")))
        .otherwise(concat(lit("http://example.com/page/"), gidS,
          lit("?a=1&gclid=xyz")))
      Dedup.urlDedup(
          t(spark, dir, "documents").filter($"doc_id" < 500)
            .select($"doc_id", url.as("url")),
          "url", "doc_id")
        .select($"doc_id", $"url_norm")
        .orderBy($"doc_id")
    },

    // --- C4 line+document cleaning rules (Raffel et al. 2020 §2.2):
    //     fixture texts are single-line and unpunctuated, so multi-line
    //     pages are synthesized identically by both engines — each source
    //     doc contributes one line whose ending cycles through the rule
    //     space on doc_id % 7 (terminal '.', '!', '?', none, a short
    //     line, a javascript line, a quote ending), and two gids get a brace /
    //     lorem-ipsum line appended to trip the document rules. Every
    //     output is exact string/integer arithmetic; the cleaned page is
    //     fingerprinted.
    Q("ext_c4_rules",
      """WITH d AS (
        |  SELECT doc_id, CASE doc_id % 7
        |    WHEN 0 THEN text || '.'
        |    WHEN 1 THEN text || '!'
        |    WHEN 2 THEN text || '?'
        |    WHEN 3 THEN text || ' and more'
        |    WHEN 4 THEN 'short one.'
        |    WHEN 5 THEN 'please enable JavaScript to view the page content.'
        |    ELSE text || '."' END AS line
        |  FROM documents WHERE doc_id < 240),
        |synth AS (
        |  SELECT gid, body || CASE
        |      WHEN gid = 0 THEN chr(10) || 'var x = { code: 1 };'
        |      WHEN gid = 1 THEN chr(10) ||
        |        'this filler is Lorem Ipsum dolor sit amet placeholder text.'
        |      ELSE '' END AS text
        |  FROM (SELECT doc_id % 30 AS gid,
        |               string_agg(line, chr(10) ORDER BY doc_id) AS body
        |        FROM d GROUP BY doc_id % 30) b),
        |k AS (
        |  SELECT gid, string_split(text, chr(10)) AS ls,
        |    list_filter(string_split(text, chr(10)), l ->
        |      (ends_with(l, '.') OR ends_with(l, '!') OR ends_with(l, '?')
        |        OR ends_with(l, '"'))
        |      AND len(string_split(l, ' ')) >= 5
        |      AND NOT contains(lower(l), 'javascript')) AS kl,
        |    contains(text, '{') AS hb,
        |    contains(lower(text), 'lorem ipsum') AS hp
        |  FROM synth),
        |c AS (SELECT gid, ls, kl, hb, hp,
        |             array_to_string(kl, chr(10)) AS clean,
        |             CAST(length(array_to_string(kl, chr(10)))
        |               - length(translate(array_to_string(kl, chr(10)), '.!?', ''))
        |               AS BIGINT) AS ns
        |      FROM k)
        |SELECT gid, CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(kl) AS BIGINT) AS n_lines_kept, ns AS n_sentences,
        |  hb AS has_brace, hp AS has_phrase,
        |  (NOT hb AND NOT hp AND ns >= 3) AS kept,
        |  md5(clean) AS fp
        |FROM c ORDER BY gid""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val line = when($"doc_id" % 7 === 0, concat($"text", lit(".")))
        .when($"doc_id" % 7 === 1, concat($"text", lit("!")))
        .when($"doc_id" % 7 === 2, concat($"text", lit("?")))
        .when($"doc_id" % 7 === 3, concat($"text", lit(" and more")))
        .when($"doc_id" % 7 === 4, lit("short one."))
        .when($"doc_id" % 7 === 5,
          lit("please enable JavaScript to view the page content."))
        .otherwise(concat($"text", lit(".\"")))
      val synth = t(spark, dir, "documents").filter($"doc_id" < 240)
        .withColumn("line", line)
        .groupBy(($"doc_id" % 30).as("gid"))
        .agg(array_join(transform(
          sort_array(collect_list(struct($"doc_id", $"line"))),
          s => s.getField("line")), "\n").as("body"))
        .select($"gid", concat($"body",
          when($"gid" === 0, lit("\nvar x = { code: 1 };"))
            .when($"gid" === 1,
              lit("\nthis filler is Lorem Ipsum dolor sit amet placeholder text."))
            .otherwise(lit(""))).as("text"))
      graft.operators.Curation.c4Clean(synth, "text", "gid")
        .select($"gid", $"n_lines", $"n_lines_kept", $"n_sentences",
          $"has_brace", $"has_phrase", $"kept",
          md5($"text_clean".cast("binary")).as("fp"))
        .orderBy($"gid")
    },

    // --- linear quality-classifier inference (fastText-style): literal
    //     weight vector over portable md5 hash buckets, sigmoid score.
    //     Per-doc Σ w·tf is an order-dependent double sum → round 4.
    Q("ext_classifier_score",
      """WITH tfs AS (SELECT doc_id,
        |    CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 64 AS bucket,
        |    COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents WHERE doc_id < 200) t
        |  GROUP BY doc_id, bucket),
        |n AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |      FROM documents WHERE doc_id < 200),
        |d AS (SELECT doc_id,
        |    SUM((CASE bucket WHEN 3 THEN CAST(1.5 AS DOUBLE)
        |                     WHEN 11 THEN CAST(-2.0 AS DOUBLE)
        |                     WHEN 17 THEN CAST(0.75 AS DOUBLE)
        |                     WHEN 29 THEN CAST(0.25 AS DOUBLE)
        |                     WHEN 42 THEN CAST(-0.5 AS DOUBLE)
        |                     WHEN 57 THEN CAST(3.0 AS DOUBLE)
        |                     ELSE CAST(0.0 AS DOUBLE) END) * CAST(tf AS DOUBLE)) AS dot
        |  FROM tfs GROUP BY doc_id)
        |SELECT doc_id,
        |  round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
        |    + exp(-(CAST(-0.5 AS DOUBLE) + dot / CAST(nt AS DOUBLE)))), 4) AS score
        |FROM d JOIN n USING (doc_id) ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.operators.Curation.linearTextScore(
          t(spark, dir, "documents").filter($"doc_id" < 200), "text", "doc_id",
          weights = Map(3 -> 1.5, 11 -> -2.0, 17 -> 0.75, 29 -> 0.25,
            42 -> -0.5, 57 -> 3.0),
          bias = -0.5, dim = 64)
        .select($"doc_id", round($"score", 4).as("score"))
        .orderBy($"doc_id")
    },

    // --- Gopher duplicate-line fractions (the line-granularity rows of
    //     table A1): synthetic multi-line docs (same gid construction as
    //     ext_line_dedup, plus a guaranteed duplicated header); exact
    //     BIGINT/BIGINT rationals — no rounding.
    Q("ext_dup_lines",
      """WITH synth AS (
        |  SELECT doc_id % 40 AS gid,
        |         'hdr one' || chr(10) || 'hdr one' || chr(10)
        |           || string_agg(text, chr(10) ORDER BY doc_id) AS text
        |  FROM documents GROUP BY doc_id % 40),
        |l AS (SELECT gid, unnest(string_split(text, chr(10))) AS line FROM synth),
        |c AS (SELECT gid, line, CAST(COUNT(*) AS BIGINT) AS c,
        |             CAST(length(line) AS BIGINT) AS len
        |      FROM l GROUP BY gid, line)
        |SELECT gid,
        |  CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(c) AS DOUBLE) AS dup_line_frac,
        |  CAST(SUM(CASE WHEN c > 1 THEN c * len ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(c * len) AS DOUBLE) AS dup_line_char_frac
        |FROM c GROUP BY gid ORDER BY gid""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val synth = t(spark, dir, "documents")
        .groupBy(($"doc_id" % 40).as("gid"))
        .agg(concat(lit("hdr one\nhdr one\n"),
          array_join(transform(
            sort_array(collect_list(struct($"doc_id", $"text"))),
            s => s.getField("text")), "\n")).as("text"))
      graft.operators.Repetition.lineSignals(synth, "text", "gid")
        .select($"doc_id".as("gid"), $"dup_line_frac", $"dup_line_char_frac")
        .orderBy($"gid")
    },

    // --- weighted sampling without replacement (Efraimidis–Spirakis
    //     A-Res over the portable uniform): the oracle replays the
    //     u^(1/w) keys and the same top-k selection. Key gaps between
    //     rank-k and rank-k+1 are ~1e-3 at this corpus size — far above
    //     any libm pow ulp divergence, so selection is engine-stable.
    Q("ext_weighted_sample",
      s"""SELECT doc_id, source FROM (
         |  SELECT doc_id, source,
         |         pow(${graft.functions.PortableHash.sqlUniform01("doc_id")},
         |             CAST(1.0 AS DOUBLE) / CAST(n_chars AS DOUBLE)) AS wkey
         |  FROM documents
         |  ORDER BY wkey DESC, doc_id LIMIT 25) t
         |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      graft.operators.Curation
        .weightedSample(t(spark, dir, "documents"), "n_chars", "doc_id", k = 25)
        .select($"doc_id", $"source")
        .orderBy($"doc_id")
    },

    // --- Zipf exponent of the corpus word-frequency curve: log-log OLS
    //     over the top-100 words via the moment-sum closed form (shared
    //     with learn_grouped_ols); round-4 for the log2 sums.
    Q("ext_zipf",
      """WITH c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
        |           FROM (SELECT unnest(string_split(text, ' ')) AS w
        |                 FROM documents) t
        |           GROUP BY w ORDER BY c DESC, w LIMIT 100),
        |r AS (SELECT log2(CAST(row_number() OVER (ORDER BY c DESC, w)
        |                       AS DOUBLE)) AS x,
        |             log2(CAST(c AS DOUBLE)) AS y FROM c),
        |m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |             SUM(x * x) AS sxx, SUM(x * y) AS sxy FROM r)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
        |    + CAST(0.0 AS DOUBLE) AS slope,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
        |    + CAST(0.0 AS DOUBLE) AS intercept
        |FROM m""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      TextFunctions.zipfSlope(t(spark, dir, "documents"), "text", topN = 100)
        .select($"n",
          (round($"slope", 4) + lit(0.0)).as("slope"),
          (round($"intercept", 4) + lit(0.0)).as("intercept"))
    },

    // --- portable count-min sketch: the md5 hash family makes every
    //     sketch CELL engine-reproducible, so the oracle rebuilds the
    //     identical depth×width sketch and the identical min-over-rows
    //     estimates — a differential test of a sketch, not just of exact
    //     counts. Estimates are exact BIGINTs.
    Q("ext_cms_counts",
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |rows_ AS (SELECT unnest(range(4)) AS r),
        |sk AS (SELECT r, CAST('0x' || substr(md5('cm' || r || '|' || w), 1, 15)
        |                     AS BIGINT) % 256 AS bucket,
        |              CAST(COUNT(*) AS BIGINT) AS c
        |       FROM tok, rows_ GROUP BY 1, 2),
        |exact AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY w
        |          ORDER BY n DESC, w LIMIT 20),
        |probe AS (SELECT e.w, e.n, r.r,
        |    CAST('0x' || substr(md5('cm' || r.r || '|' || e.w), 1, 15)
        |         AS BIGINT) % 256 AS bucket
        |  FROM exact e, rows_ r)
        |SELECT p.w, p.n, MIN(COALESCE(sk.c, 0)) AS est
        |FROM probe p LEFT JOIN sk ON p.r = sk.r AND p.bucket = sk.bucket
        |GROUP BY p.w, p.n ORDER BY p.n DESC, p.w""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val tok = t(spark, dir, "documents")
        .select(explode(TextFunctions.words($"text")).as("w"))
      val sketch = graft.operators.Sketches.countMinBuild(tok, "w", depth = 4, width = 256)
      val exact = tok.groupBy($"w").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"w").limit(20)
      graft.operators.Sketches
        .countMinEstimate(sketch, exact, "w", depth = 4, width = 256)
        .join(exact, Seq("w"))
        .select($"w", $"n", $"est")
        .orderBy($"n".desc, $"w")
    },

    // --- tsfresh-style per-series features (reference
    //     mars/learn/contrib/tsfresh/core.py fans tsfresh extraction
    //     out by key — here the exactly-computable canonical set runs
    //     native): per user over events.value cents, ordered by
    //     event_id (unique, so the series order is identical on both
    //     engines — ts stays out of the gate per the nanos/micros
    //     convention). Everything is BIGINT arithmetic (mean-relative
    //     tests multiplied through by n; median as the 2× lo+hi middle
    //     order statistics; lag-1 autocorrelation from n-scaled
    //     deviations) → UNROUNDED gate; ac1 is one exact-BIGINT
    //     division, bit-identical both sides.
    Q("ext_ts_features",
      tsFeaturesSql) { (spark, dir) =>
      import spark.implicits._
      val base = t(spark, dir, "events").select($"user_id", $"event_id",
        (dec12($"value") * 100).cast("long").as("c"))
      graft.operators.Sessionize
        .tsFeatures(base, "user_id", Seq("event_id"), "c")
        .select($"user_id", $"n", $"sum_c", $"abs_energy", $"min_c",
          $"max_c", $"med2", $"sum_abs_change", $"count_above_mean",
          $"longest_strike_above_mean", $"ac1", $"var_num", $"cid_ce",
          $"c3_sum", $"n_crossings", $"count_below_mean",
          $"longest_strike_below_mean", $"first_loc_max", $"last_loc_min",
          $"n_distinct", $"n_peaks", $"sum_reoccurring_points",
          $"sum_reoccurring_values", $"msd2_num")
        .orderBy($"user_id")
    },

    // --- the WIDE (DECIMAL(38,0)) tsFeatures path differentially
    //     certified end-to-end against the identical oracle: same
    //     series, wide = true, the exact-decimal outputs cast back to
    //     the gate's BIGINT/DOUBLE types (values are far inside long
    //     range at this SF — the decimal-vs-long ARITHMETIC is what's
    //     under test, and it must be value-identical).
    Q("ext_ts_features_wide", tsFeaturesSql) { (spark, dir) =>
      import spark.implicits._
      val base = t(spark, dir, "events").select($"user_id", $"event_id",
        (dec12($"value") * 100).cast("long").as("c"))
      val f = graft.operators.Sessionize
        .tsFeatures(base, "user_id", Seq("event_id"), "c", wide = true)
      def L(c: String) = f(c).cast("long").as(c)
      f.select($"user_id", $"n", L("sum_c"), L("abs_energy"), L("min_c"),
          L("max_c"), L("med2"), L("sum_abs_change"), $"count_above_mean",
          $"longest_strike_above_mean", $"ac1", L("var_num"), $"cid_ce",
          L("c3_sum"), $"n_crossings", $"count_below_mean",
          $"longest_strike_below_mean", $"first_loc_max", $"last_loc_min",
          $"n_distinct", $"n_peaks", L("sum_reoccurring_points"),
          L("sum_reoccurring_values"), L("msd2_num"))
        .orderBy($"user_id")
    },

    // --- curation pipeline v4: Gopher rule filter → exact substring
    //     dedup over the survivors → deterministic shard assignment.
    //     The oracle replays every stage from scratch (rules, gram
    //     ranking, interval-merge coverage, shard buckets) and
    //     fingerprints per-shard membership + kept-word counts.
    Q("ext_curation4",
      s"""WITH e AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
         |m AS (SELECT doc_id, ws, len(ws) AS nwi, CAST(len(ws) AS DOUBLE) AS nw,
         |  CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
         |    / CAST(greatest(len(ws), 1) AS DOUBLE) AS mwl,
         |  CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE) AS hashes,
         |  CAST(length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))
         |       AS DOUBLE) / CAST(3 AS DOUBLE) AS ell,
         |  CAST(len(list_filter(string_split(text, chr(10)), l -> starts_with(l, '- ')
         |       OR starts_with(l, '* ') OR starts_with(l, '• '))) AS DOUBLE) AS nbul,
         |  CAST(len(list_filter(string_split(text, chr(10)),
         |       l -> ends_with(l, '...'))) AS DOUBLE) AS nelll,
         |  CAST(len(string_split(text, chr(10))) AS DOUBLE) AS nl,
         |  CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) AS nalpha,
         |  (CAST(list_contains(ws, 'the') AS INT) + CAST(list_contains(ws, 'a') AS INT)
         |   + CAST(list_contains(ws, 'and') AS INT) + CAST(list_contains(ws, 'of') AS INT)
         |   + CAST(list_contains(ws, 'to') AS INT) + CAST(list_contains(ws, 'in') AS INT)
         |   + CAST(list_contains(ws, 'is') AS INT) + CAST(list_contains(ws, 'that') AS INT)) AS nstop,
         |  CAST(len(list_distinct(ws)) AS DOUBLE) AS nuniq
         | FROM e),
         |surv AS (SELECT doc_id, ws FROM m WHERE
         |  nwi >= 50 AND nwi <= 100000
         |  AND mwl >= CAST(3.0 AS DOUBLE) AND mwl <= CAST(10.0 AS DOUBLE)
         |  AND (hashes + ell) / nw < CAST(0.1 AS DOUBLE)
         |  AND nbul / nl < CAST(0.9 AS DOUBLE)
         |  AND nelll / nl < CAST(0.3 AS DOUBLE)
         |  AND nalpha / nw > CAST(0.8 AS DOUBLE)
         |  AND nstop >= 2 AND nuniq / nw >= CAST(0.2 AS DOUBLE)),
         |g AS (SELECT doc_id, j AS s,
         |        CAST('0x' || substr(md5(array_to_string(ws[j+1:j+8], ' ')), 1, 15)
         |             AS BIGINT) AS gh
         |      FROM (SELECT doc_id, ws, unnest(range(len(ws) - 7)) AS j
         |            FROM surv WHERE len(ws) >= 8) t),
         |d AS (SELECT doc_id, s FROM (
         |        SELECT doc_id, s,
         |               row_number() OVER (PARTITION BY gh ORDER BY doc_id, s) AS rn
         |        FROM g) r WHERE rn > 1),
         |w AS (SELECT doc_id, i
         |      FROM (SELECT doc_id, ws, unnest(range(len(ws))) AS i FROM surv) t),
         |u AS (SELECT doc_id, i, 0 AS isstart FROM w
         |      UNION ALL SELECT doc_id, s AS i, 1 AS isstart FROM d),
         |c AS (SELECT doc_id, i, isstart,
         |             MAX(CASE WHEN isstart = 1 THEN i + 7 ELSE -1 END)
         |               OVER (PARTITION BY doc_id ORDER BY i, isstart DESC
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS covend
         |      FROM u),
         |k AS (SELECT doc_id, COUNT(*) AS nk FROM c
         |      WHERE isstart = 0 AND covend < i GROUP BY doc_id),
         |res AS (SELECT s.doc_id, CAST(COALESCE(k.nk, 0) AS BIGINT) AS n_words_kept
         |        FROM (SELECT doc_id FROM surv) s LEFT JOIN k USING (doc_id)),
         |sh AS (SELECT doc_id, n_words_kept,
         |              ${graft.functions.PortableHash.sqlBucket("doc_id", 8)} AS shard
         |       FROM res)
         |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_words_kept) AS BIGINT) AS words_kept,
         |       md5(string_agg(CAST(doc_id AS VARCHAR) || ':'
         |           || CAST(n_words_kept AS VARCHAR), ',' ORDER BY doc_id)) AS fp
         |FROM sh GROUP BY shard ORDER BY shard""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val docs = t(spark, dir, "documents")
      val surv = docs.join(
        graft.operators.Curation.gopherFlags(docs, "text", "doc_id")
          .filter($"pass").select($"doc_id"),
        Seq("doc_id"), "left_semi")
      val deduped = Dedup.substringSpanDedup(surv, "text", "doc_id", n = 8)
      graft.operators.Curation.shardAssign(deduped, "doc_id", nShards = 8)
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_words_kept").cast("long").as("words_kept"),
          md5(array_join(transform(
            sort_array(collect_list(struct($"doc_id",
              concat($"doc_id".cast("string"), lit(":"),
                $"n_words_kept".cast("string")).as("kv")))),
            s => s.getField("kv")), ",").cast("binary")).as("fp"))
        .orderBy($"shard")
    }
  )

  /** DuckDB fragment: round-4 cosine between two 64-dim float lists. */
  private def sqlCos(a: String, b: String): String =
    s"""round(
       |      list_sum(list_transform(range(1, 65),
       |        i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       |      / (sqrt(list_sum(list_transform(range(1, 65),
       |           i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       |         * sqrt(list_sum(list_transform(range(1, 65),
       |             i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))))),
       |      4)""".stripMargin
}
