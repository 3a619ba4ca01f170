package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, T}
import graft.ops.{GraphOps, LinkageOps}

/** Record-linkage gate: deletion-neighborhood blocked fuzzy matching over
  * customer names, verified by exact levenshtein — both engines implement
  * the standard edit distance, so the whole operator (blocking recall
  * included) hash-gates.
  *
  * Blocking keys are the name with ONE digit position masked out
  * (positions 14-18, the five that vary in the 9-digit suffix): two rows
  * differing by a single substitution at position p collide exactly on
  * the pass that masks p, so recall for distance-1 pairs is EXACT — and
  * each block pins every unmasked character, so block size is bounded by
  * the alphabet (<=10 rows here) NO MATTER how large the table grows.
  * Fixed-position blocking (share digits 7-8, say) inverts that: block
  * size grows with the keyspace and the pair space reverts to quadratic —
  * the classic blocking mistake this gate's plan avoids by construction.
  */
object LinkageQueries {

  /** `c_name` with character position `p` deleted. */
  private def mask(p: Int) =
    concat(substring(col("c_name"), 1, p - 1),
      substring(col("c_name"), p + 1, 19 - p))

  private def maskSql(p: Int, t: String) =
    s"substr($t.c_name, 1, ${p - 1}) || substr($t.c_name, ${p + 1}, ${19 - p})"

  /** [[pairCtes]] with matching blocked WITHIN c_nationkey — the
    * golden-record gate's variant (name variant + same country). */
  private def natPairCtes: String = {
    val passes = (14 to 18).map { p =>
      s"""  SELECT l.c_custkey AS a, r.c_custkey AS b,
         |         l.c_name AS a_name, r.c_name AS b_name
         |  FROM customer l JOIN customer r
         |    ON l.c_nationkey = r.c_nationkey
         |   AND ${maskSql(p, "l")} = ${maskSql(p, "r")}
         |   AND l.c_custkey < r.c_custkey""".stripMargin
    }.mkString("\n  UNION\n")
    s"""cand AS (
       |$passes),
       |pairs AS (
       |  SELECT a, b, a_name, b_name,
       |    CAST(levenshtein(a_name, b_name) AS INTEGER) AS dist
       |  FROM cand
       |  WHERE levenshtein(a_name, b_name) <= 1)""".stripMargin
  }

  /** The fuzzy pair graph as CTEs (`pairs(a, b)`) — shared by the pair
    * gate and the entity-resolution composition below. */
  private def pairCtes: String = {
    val passes = (14 to 18).map { p =>
      s"""  SELECT l.c_custkey AS a, r.c_custkey AS b,
         |         l.c_name AS a_name, r.c_name AS b_name
         |  FROM customer l JOIN customer r
         |    ON ${maskSql(p, "l")} = ${maskSql(p, "r")}
         |   AND l.c_custkey < r.c_custkey""".stripMargin
    }.mkString("\n  UNION\n")
    s"""cand AS (
       |$passes),
       |pairs AS (
       |  SELECT a, b, a_name, b_name,
       |    CAST(levenshtein(a_name, b_name) AS INTEGER) AS dist
       |  FROM cand
       |  WHERE levenshtein(a_name, b_name) <= 1)""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q(
      "linkage_fuzzy_blocked",
      (s, d) =>
        LinkageOps
          .sharedBlockedFuzzyPairs(T(s, d, "customer"), "c_custkey", "c_name",
            (14 to 18).map(mask), maxDistance = 1)
          .orderBy("a", "b"),
      Some(s"""WITH $pairCtes
             |SELECT a, b, a_name, b_name, dist FROM pairs
             |ORDER BY a, b""".stripMargin),
      "deletion-neighborhood blocked fuzzy matching: bounded blocks, exact d<=1 recall"),

    // Entity resolution end-to-end: the fuzzy pair graph collapses to
    // canonical entity ids via connected components (min-label
    // propagation, [[GraphOps.connectedComponents]]) completed over the
    // whole customer universe ([[GraphOps.withSingletons]]) — every
    // customer gets exactly one entity id, matched groups share theirs.
    // The composition every MDM/dedup pipeline runs after pair scoring;
    // both building blocks are separately gated, this gates the
    // composition itself against a recursive-CTE oracle.
    Q(
      "linkage_entity_resolve",
      (s, d) => {
        // the SAME staged pair frame as the pair gate above, so its
        // identity also keys sharedComponents — pairs and the CC loop
        // each run once per corpus snapshot however many consumers
        val pairs = LinkageOps
          .sharedBlockedFuzzyPairs(T(s, d, "customer"), "c_custkey", "c_name",
            (14 to 18).map(mask), maxDistance = 1)
        GraphOps
          .withSingletons(
            GraphOps.sharedComponents(pairs, "a", "b"),
            T(s, d, "customer"), "c_custkey")
          .withColumnRenamed("component", "entity_id")
          .orderBy("id")
      },
      Some(s"""WITH RECURSIVE $pairCtes,
             |edges AS (SELECT a AS u, b AS v FROM pairs
             |  UNION SELECT b AS u, a AS v FROM pairs),
             |reach AS (
             |  SELECT u AS id, v AS r FROM edges
             |  UNION
             |  SELECT reach.id, e.v AS r FROM reach JOIN edges e ON reach.r = e.u),
             |comp AS (SELECT id, least(id, min(r)) AS component FROM reach GROUP BY id)
             |SELECT c.c_custkey AS id,
             |  coalesce(comp.component, c.c_custkey) AS entity_id
             |FROM customer c LEFT JOIN comp ON comp.id = c.c_custkey
             |ORDER BY id""".stripMargin),
      "entity resolution: fuzzy pairs → connected components → universe-complete canonical ids"),

    // SURVIVORSHIP ([[LinkageOps.goldenRecords]]): each resolved entity
    // collapses to ONE golden record — mode-with-smallest-tie-break for
    // name and market segment (one keyed rollup per attribute, no
    // window), max for account balance (stored-value comparison, no
    // float arithmetic), plus cluster size. The MDM step after
    // linkage_entity_resolve. Matching here is blocked WITHIN
    // c_nationkey (name variant + same country — the realistic MDM
    // rule): the unconstrained distance-1 graph over sequential
    // synthetic names chains the whole table into one entity, which
    // would make survivorship vacuous. Different blocking, same frame —
    // the pair cache keys on the blocking expressions, so this variant
    // never collides with the name-only gate's entry. The oracle
    // replays the nation-blocked pairs, component CTEs, per-attribute
    // mode ranks, and the measure rollup.
    Q(
      "linkage_golden_record",
      (s, d) => {
        val natMask = (14 to 18).map(p =>
          concat(col("c_nationkey").cast("string"), lit("|"), mask(p)))
        val pairs = LinkageOps
          .sharedBlockedFuzzyPairs(T(s, d, "customer"), "c_custkey", "c_name",
            natMask, maxDistance = 1)
        val labels = GraphOps.withSingletons(
          GraphOps.sharedComponents(pairs, "a", "b"),
          T(s, d, "customer"), "c_custkey")
        LinkageOps.goldenRecords(T(s, d, "customer"), "c_custkey", labels,
          modeCols = Seq("c_name", "c_mktsegment"),
          maxCols = Seq("c_acctbal"))
          .orderBy("entity_id")
      },
      Some(s"""WITH RECURSIVE $natPairCtes,
             |edges AS (SELECT a AS u, b AS v FROM pairs
             |  UNION SELECT b AS u, a AS v FROM pairs),
             |reach AS (
             |  SELECT u AS id, v AS r FROM edges
             |  UNION
             |  SELECT reach.id, e.v AS r FROM reach JOIN edges e ON reach.r = e.u),
             |comp AS (SELECT id, least(id, min(r)) AS component FROM reach GROUP BY id),
             |lab AS (SELECT c.*, coalesce(comp.component, c.c_custkey) AS entity_id
             |        FROM customer c LEFT JOIN comp ON comp.id = c.c_custkey),
             |head AS (SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members,
             |           max(c_acctbal) AS c_acctbal
             |         FROM lab GROUP BY entity_id),
             |mname AS (SELECT entity_id, c_name FROM (
             |  SELECT entity_id, c_name, ROW_NUMBER() OVER (
             |    PARTITION BY entity_id ORDER BY count(*) DESC, c_name ASC) AS rn
             |  FROM lab GROUP BY entity_id, c_name) q WHERE rn = 1),
             |mseg AS (SELECT entity_id, c_mktsegment FROM (
             |  SELECT entity_id, c_mktsegment, ROW_NUMBER() OVER (
             |    PARTITION BY entity_id ORDER BY count(*) DESC, c_mktsegment ASC) AS rn
             |  FROM lab GROUP BY entity_id, c_mktsegment) q WHERE rn = 1)
             |SELECT h.entity_id, h.n_members, h.c_acctbal,
             |  mname.c_name, mseg.c_mktsegment
             |FROM head h JOIN mname USING (entity_id) JOIN mseg USING (entity_id)
             |ORDER BY entity_id""".stripMargin),
      "survivorship golden records: per-entity mode/max/count rules after resolution"),

    // Transposition-aware pair scoring ([[LinkageOps.blockedDamerauPairs]]
    // over the native [[graft.expr.DamerauLevenshtein]] expression):
    // customers blocked on (nation, last-2-digits), every in-block pair
    // scored with UNRESTRICTED Damerau-Levenshtein and kept under
    // distance 4. DuckDB implements the same unrestricted variant
    // natively, so the oracle is a fully independent second
    // implementation — the strongest kind of gate the suite has.
    Q(
      "linkage_damerau_pairs",
      (s, d) =>
        LinkageOps
          .blockedDamerauPairs(T(s, d, "customer"), "c_custkey", "c_name",
            struct(col("c_nationkey"), substring(col("c_name"), 17, 2)),
            maxDist = 4)
          .orderBy("a", "b"),
      Some("""SELECT l.c_custkey AS a, r.c_custkey AS b,
             |  l.c_name AS a_name, r.c_name AS b_name,
             |  CAST(damerau_levenshtein(l.c_name, r.c_name) AS INTEGER)
             |    AS dist
             |FROM customer l JOIN customer r
             |  ON l.c_nationkey = r.c_nationkey
             | AND substr(l.c_name, 17, 2) = substr(r.c_name, 17, 2)
             | AND l.c_custkey < r.c_custkey
             |WHERE damerau_levenshtein(l.c_name, r.c_name) <= 4
             |ORDER BY a, b""".stripMargin),
      "blocked Damerau-Levenshtein pairs: transposition-aware edit distance, independent oracle"),

    // Jaro-Winkler pair scoring ([[LinkageOps.blockedJaroWinklerPairs]]
    // over the native [[graft.expr.JaroSimilarity]]): the same blocked
    // candidates scored with the Fellegi-Sunter name-field similarity.
    // Like the Damerau gate, DuckDB's native jaro_winkler_similarity is
    // an INDEPENDENT second implementation — the engine's pinned
    // floating-op order was fuzz-matched to it bit-for-bit, and this
    // gate re-proves that on every run over real pair data.
    Q(
      "linkage_jaro_winkler",
      (s, d) =>
        LinkageOps
          .blockedJaroWinklerPairs(T(s, d, "customer"), "c_custkey",
            "c_name",
            struct(col("c_nationkey"), substring(col("c_name"), 17, 2)),
            minSim = 0.95)
          .orderBy("a", "b"),
      Some("""SELECT l.c_custkey AS a, r.c_custkey AS b,
             |  l.c_name AS a_name, r.c_name AS b_name,
             |  jaro_winkler_similarity(l.c_name, r.c_name) AS jw
             |FROM customer l JOIN customer r
             |  ON l.c_nationkey = r.c_nationkey
             | AND substr(l.c_name, 17, 2) = substr(r.c_name, 17, 2)
             | AND l.c_custkey < r.c_custkey
             |WHERE jaro_winkler_similarity(l.c_name, r.c_name) >= 0.95
             |ORDER BY a, b""".stripMargin),
      "blocked Jaro-Winkler pairs: pinned float-op order vs DuckDB's independent native scorer"),

    // Modularity audit of the resolved entities
    // ([[GraphOps.modularity]]): how much denser the nation-blocked
    // fuzzy-match clusters are than chance. Shares BOTH staged frames
    // with linkage_golden_record (same pair cache key, same component
    // cache key), so the audit adds two rollups, not a re-resolution.
    Q(
      "graph_modularity",
      (s, d) => {
        val natMask = (14 to 18).map(p =>
          concat(col("c_nationkey").cast("string"), lit("|"), mask(p)))
        val pairs = LinkageOps
          .sharedBlockedFuzzyPairs(T(s, d, "customer"), "c_custkey",
            "c_name", natMask, maxDistance = 1)
        GraphOps
          .modularity(pairs, GraphOps.sharedComponents(pairs, "a", "b"))
          .orderBy("m")
      },
      Some(s"""WITH RECURSIVE $natPairCtes,
             |edges AS (SELECT a AS u, b AS v FROM pairs
             |  UNION SELECT b AS u, a AS v FROM pairs),
             |reach AS (
             |  SELECT u AS id, v AS r FROM edges
             |  UNION
             |  SELECT reach.id, e.v AS r FROM reach
             |  JOIN edges e ON reach.r = e.u),
             |comp AS (SELECT id, least(id, min(r)) AS component
             |         FROM reach GROUP BY id),
             |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
             |mc AS (SELECT ca.component, CAST(count(*) AS BIGINT) AS m_c
             |       FROM pairs p
             |       JOIN comp ca ON ca.id = p.a
             |       JOIN comp cb ON cb.id = p.b
             |       WHERE ca.component = cb.component GROUP BY 1),
             |deg AS (SELECT u AS id, CAST(count(*) AS BIGINT) AS d
             |        FROM edges GROUP BY 1),
             |dc AS (SELECT c.component, CAST(sum(deg.d) AS BIGINT) AS d_c
             |       FROM deg JOIN comp c ON c.id = deg.id GROUP BY 1),
             |t AS (SELECT dc.component,
             |    CAST(coalesce(m_c, 0) AS DOUBLE) / CAST(m AS DOUBLE) -
             |      (CAST(d_c AS DOUBLE) / CAST(2 * m AS DOUBLE)) *
             |      (CAST(d_c AS DOUBLE) / CAST(2 * m AS DOUBLE)) AS term
             |  FROM dc LEFT JOIN mc USING (component), mm)
             |SELECT (SELECT m FROM mm) AS m,
             |  CAST(count(*) AS BIGINT) AS n_communities,
             |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |      list(term ORDER BY component)),
             |    (acc, x) -> acc + x) AS q
             |FROM t ORDER BY m""".stripMargin),
      "Newman modularity of resolved clusters: exact integer rollups, component-ordered fold")
  )
}
