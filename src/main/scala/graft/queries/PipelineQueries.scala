package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.{Q, T}
import graft.expr.GraftFunctions

/** GitHub-pipeline-shaped operators phrased over testdata: deterministic
  * surrogate keys (E1), conditional key guard (F7), composite natural keys.
  *
  * Two key flavors:
  *  - `uuid5` (SHA-1, RFC-exact, the reference's scheme) — verified against
  *    the reference's committed GUIDs in NamespacedUuidSpec, and hash-gated
  *    by `e1_uuid5_keys` whose oracle is a VALUES literal of those same
  *    committed GUIDs (DuckDB has no sha1, so the reference's own output
  *    IS the oracle).
  *  - `uuid3Label` (MD5 under a string namespace) — same operator shape,
  *    fully expressible in DuckDB SQL, so the hash gate covers the
  *    key-derivation logic end to end.
  */
object PipelineQueries {

  /** DuckDB rendering of the md5-based surrogate key: `x` is an md5-hex
    * SQL expression; the 13th hex digit becomes the version nibble '3' and
    * the 17th maps through (v & 3) | 8 → one of 8/9/a/b (RFC variant). */
  private def duckUuid3(x: String): String =
    s"substr($x,1,8) || '-' || substr($x,9,4) || '-3' || substr($x,14,3) || '-' || " +
      s"substr('89ab', (strpos('0123456789abcdef', substr($x,17,1)) - 1) % 4 + 1, 1) || " +
      s"substr($x,18,3) || '-' || substr($x,21,12)"

  val all: Seq[Q] = Seq(
    // E1: deterministic surrogate key over a composite natural key
    Q(
      "e1_surrogate_key",
      (s, d) =>
        T(s, d, "customer")
          .select(
            col("c_custkey"),
            GraftFunctions
              .uuid3Label("github.user|", col("c_name"))
              .as("user_key"),
            GraftFunctions
              .uuid3Label(
                "github.repo|",
                concat_ws("|", col("c_mktsegment"), col("c_name")))
              .as("segment_key"))
          .orderBy("c_custkey"),
      Some {
        val userK = duckUuid3("md5('github.user|' || c_name)")
        val segK = duckUuid3("md5('github.repo|' || c_mktsegment || '|' || c_name)")
        s"""SELECT c_custkey, $userK AS user_key, $segK AS segment_key
           |FROM customer ORDER BY c_custkey""".stripMargin
      },
      "deterministic namespaced surrogate keys over natural keys (md5 flavor)"),

    // E1 (reference-exact uuid5 flavor). DuckDB 1.0.0 has no sha1, so the
    // oracle is a VALUES literal of the reference's own committed GUIDs
    // (owners_clean.csv / repos_clean.csv / branches_clean.csv /
    // issues_clean.csv) over the same fixed natural keys — the engine's
    // uuid5 is hash-gated against the reference's output, per namespace.
    Q(
      "e1_uuid5_keys",
      (s, d) => {
        import s.implicits._
        Seq(
          ("owner", "microsoft"),
          ("repo", "microsoft|.github"),
          ("branch", ".github|DragosDanielBoia-patch-1"),
          ("issue", ".github|449"),
          ("user", "yasinduksiye1212-stack"))
          .toDF("kind", "natural_key")
          .select(col("kind"), col("natural_key"),
            when(col("kind") === "owner", GraftFunctions.ownerKey(col("natural_key")))
              .when(col("kind") === "repo", GraftFunctions.repoKey(col("natural_key")))
              .when(col("kind") === "branch", GraftFunctions.branchKey(col("natural_key")))
              .when(col("kind") === "issue", GraftFunctions.issueKey(col("natural_key")))
              .otherwise(GraftFunctions.userKey(col("natural_key")))
              .as("uuid"))
          .orderBy("kind")
      },
      Some("""SELECT * FROM (VALUES
             |  ('branch', '.github|DragosDanielBoia-patch-1', '007f7c0f-6276-5eae-a8db-e292f7ff3916'),
             |  ('issue', '.github|449', 'da33bf29-9415-5d28-8475-d5dd2093296e'),
             |  ('owner', 'microsoft', '0dd58109-d16c-5fac-9308-c895180d7869'),
             |  ('repo', 'microsoft|.github', 'ed35ef31-1edc-5cd0-a250-d62d346f2a86'),
             |  ('user', 'yasinduksiye1212-stack', '780d978c-ab7e-58dc-8428-1a8c0a39f43c')
             |) t(kind, natural_key, uuid) ORDER BY kind""".stripMargin),
      "RFC-exact uuid5 surrogate keys vs the reference's committed GUIDs"),

    // F7: conditional scalar guard — key only when the driving column exists
    Q(
      "f7_conditional_key",
      (s, d) =>
        T(s, d, "events")
          .select(
            col("event_id"),
            when(
              col("event_type") === "signup",
              GraftFunctions.uuid3Label(
                "github.user|",
                col("user_id").cast(StringType)))
              .otherwise(lit(null).cast(StringType))
              .as("assignee_key"))
          .orderBy("event_id"),
      Some {
        val k = duckUuid3("md5('github.user|' || CAST(user_id AS VARCHAR))")
        s"""SELECT event_id,
           |  CASE WHEN event_type = 'signup' THEN $k ELSE NULL END AS assignee_key
           |FROM events ORDER BY event_id""".stripMargin
      },
      "conditional surrogate key: null unless the natural key is present"),

    // MERGE idempotence, read-only: the Spark side applies
    // Sinks.mergeFrames TWICE with the same batch (updates to %7 keys,
    // inserts at shifted %13 keys); the oracle merges ONCE. Hash equality
    // between the two IS the idempotence proof — re-delivering a batch to
    // the warehouse is a no-op, the invariant at-least-once ingestion
    // relies on. (The storage-backed path over this same plan is
    // exercised in SinksMergeSpec.)
    Q(
      "merge_upsert_idempotent",
      (s, d) => {
        val base = T(s, d, "customer").select("c_custkey", "c_name", "c_acctbal")
        // def, not val: each reference is a fresh plan, so the second
        // merge's anti-join never self-references the first's subtree.
        def upd = base.filter(col("c_custkey") % 7 === 0)
          .withColumn("c_acctbal", col("c_acctbal") + 100.0)
          .unionByName(base.filter(col("c_custkey") % 13 === 0)
            .withColumn("c_custkey", col("c_custkey") + 10000000L))
        val once = graft.pipeline.Sinks.mergeFrames(base, upd, Seq("c_custkey"))
        graft.pipeline.Sinks.mergeFrames(once, upd, Seq("c_custkey"))
          .orderBy("c_custkey")
      },
      Some("""WITH upd AS (
             |  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
             |  FROM customer WHERE c_custkey % 7 = 0
             |  UNION ALL
             |  SELECT c_custkey + 10000000 AS c_custkey, c_name, c_acctbal
             |  FROM customer WHERE c_custkey % 13 = 0)
             |SELECT c_custkey, c_name, c_acctbal FROM (
             |  SELECT c.c_custkey, c.c_name, c.c_acctbal
             |  FROM customer c ANTI JOIN upd u ON u.c_custkey = c.c_custkey
             |  UNION ALL
             |  SELECT c_custkey, c_name, c_acctbal FROM upd)
             |ORDER BY c_custkey""".stripMargin),
      "MERGE applied twice == once: keyed upsert idempotence, read-only formulation")
  )
}
