package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic namespaced UUID (RFC 4122 §4.3) as a native Catalyst
  * expression with whole-stage codegen: `uuid5` = SHA-1, `uuid3` = MD5 over
  * `namespaceBytes ++ utf8(name)`, with version/variant bit-twiddling and
  * canonical 8-4-4-4-12 formatting.
  *
  * This is the engine's surrogate-key primitive, replacing the reference's
  * row-wise `uuid.uuid5(namespace, natural_key)` (reference:
  * utils/guid_gen.py:9-10, applied at transform.py:147-161, 266-288,
  * 383-389). Deterministic by construction — same natural key always yields
  * the same key, which is what makes re-runs of the pipeline idempotent and
  * warehouse upserts possible.
  *
  * The namespace is carried as a hex string (stable case-class equality →
  * plan canonicalization works); the decoded bytes ride along to codegen as
  * a reference object.
  */
case class NamespacedUuid(child: Expression, namespaceHex: String, version: Int)
    extends UnaryExpression {

  require(version == 3 || version == 5, s"unsupported UUID version $version")

  @transient private lazy val nsBytes: Array[Byte] =
    NamespacedUuid.hexToBytes(namespaceHex)

  override def dataType: DataType = StringType
  override def prettyName: String = s"uuid$version"

  override def nullSafeEval(input: Any): Any =
    NamespacedUuid.compute(nsBytes, input.asInstanceOf[UTF8String], version)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("ns", nsBytes, "byte[]")
    defineCodeGen(ctx, ev,
      c => s"graft.expr.NamespacedUuid$$.MODULE$$.compute($nsRef, $c, $version)")
  }

  override protected def withNewChildInternal(newChild: Expression): NamespacedUuid =
    copy(child = newChild)
}

object NamespacedUuid {

  /** RFC 4122 Appendix C DNS namespace. */
  val NamespaceDnsHex = "6ba7b8109dad11d180b400c04fd430c8"

  // GitHub-entity namespaces, derived exactly as the reference does
  // (guid_gen.py:3-7): uuid5(NAMESPACE_DNS, "github.<entity>").
  lazy val NsOwner: String = deriveNamespaceHex("github.owner")
  lazy val NsRepo: String = deriveNamespaceHex("github.repo")
  lazy val NsIssue: String = deriveNamespaceHex("github.issue")
  lazy val NsBranch: String = deriveNamespaceHex("github.branch")
  lazy val NsUser: String = deriveNamespaceHex("github.user")

  def deriveNamespaceHex(name: String): String =
    bytesToHex(uuidBytes(hexToBytes(NamespaceDnsHex),
      name.getBytes("UTF-8"), 5))

  private val sha1Local = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("SHA-1"))
  private val md5Local = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Digest, set version/variant bits, return the 16 UUID bytes. */
  def uuidBytes(ns: Array[Byte], name: Array[Byte], version: Int): Array[Byte] = {
    val md = if (version == 5) sha1Local.get() else md5Local.get()
    md.reset()
    md.update(ns)
    md.update(name)
    val d = java.util.Arrays.copyOf(md.digest(), 16) // SHA-1 is 20 bytes
    d(6) = ((d(6) & 0x0f) | (version << 4)).toByte
    d(8) = ((d(8) & 0x3f) | 0x80).toByte
    d
  }

  /** Codegen/eval entry point: canonical lowercase 8-4-4-4-12 string. */
  def compute(ns: Array[Byte], name: UTF8String, version: Int): UTF8String = {
    val d = uuidBytes(ns, name.getBytes, version)
    val sb = new java.lang.StringBuilder(36)
    var i = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) sb.append('-')
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def hexToBytes(hex: String): Array[Byte] = {
    val out = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  def bytesToHex(b: Array[Byte]): String =
    b.map(x => f"$x%02x").mkString
}

/** Column-level API for the engine's custom expressions. */
object GraftFunctions {

  /** RFC-exact UUIDv5 under a hex-encoded 16-byte namespace. */
  def uuid5(namespaceHex: String, c: Column): Column =
    GraftColumnBridge.column(
      NamespacedUuid(GraftColumnBridge.expression(c), namespaceHex, 5))

  /** MD5-based UUIDv3 under a hex-encoded namespace. The namespace may be
    * any byte string — including a UTF-8 label like `"github.user|"` —
    * which keeps the scheme expressible in engines whose md5 only accepts
    * strings (the DuckDB oracle). */
  def uuid3(namespaceHex: String, c: Column): Column =
    GraftColumnBridge.column(
      NamespacedUuid(GraftColumnBridge.expression(c), namespaceHex, 3))

  def uuid3Label(label: String, c: Column): Column =
    uuid3(NamespacedUuid.bytesToHex(label.getBytes("UTF-8")), c)

  // Reference-parity helpers: uuid5 under the GitHub entity namespaces.
  def ownerKey(c: Column): Column = uuid5(NamespacedUuid.NsOwner, c)
  def repoKey(c: Column): Column = uuid5(NamespacedUuid.NsRepo, c)
  def issueKey(c: Column): Column = uuid5(NamespacedUuid.NsIssue, c)
  def branchKey(c: Column): Column = uuid5(NamespacedUuid.NsBranch, c)
  def userKey(c: Column): Column = uuid5(NamespacedUuid.NsUser, c)

  /** SQL surface for every engine-native expression — ONE definition
    * list serving both registration paths:
    *
    *  - [[register]] installs them into an existing session's
    *    `FunctionRegistry` (notebook / library use);
    *  - [[graft.GraftExtensions]] injects the same list through
    *    `SparkSessionExtensions`, so a SQL-first deployment reaches them
    *    with nothing but `--conf spark.sql.extensions=graft.GraftExtensions`
    *    — no Scala imports, and `newSession()` children inherit them.
    *
    * Functions: `uuid5('<hex-ns>', col)`, `uuid3('<hex-ns>', col)`,
    * `simhash64(array<string>)`, `fingerprint64(str[, k])`,
    * `winnow_set(str[, k[, w]])`,
    * `dot_product(array<double>, array<double>)`,
    * `sign_sketch64(array<double>)`,
    * `lexicon_votes(array<string>, array<array<string>>)`,
    * `lexicon_best(array<string>, array<array<string>>, array<string>)`,
    * `bpe_apply(str, array<array<string>>)` (each inner array =
    * [pair, merged] in table order), `nfc_normalize(str)`,
    * `damerau_levenshtein(str, str)`, `hilbert_index(x, y, bits)`,
    * `jaro_similarity(str, str)`, `jaro_winkler_similarity(str, str)`,
    * `portable_ln(a, b)` (the engine-portable ln(a/b)).
    * Config-like arguments (namespace, k/w, lexicons, labels) must be
    * literals — they parameterize the expression instance itself. */
  val descriptions: Seq[(String, Seq[Expression] => Expression)] = {
    def uuidBuilder(version: Int): Seq[Expression] => Expression = { exprs =>
      require(exprs.length == 2, s"uuid$version(namespaceHex, name)")
      NamespacedUuid(exprs(1), litValue(exprs.head, "namespaceHex").toString, version)
    }
    Seq(
      "uuid5" -> uuidBuilder(5),
      "uuid3" -> uuidBuilder(3),
      "simhash64" -> { exprs =>
        require(exprs.length == 1, "simhash64(tokens)")
        SimHash64(exprs.head)
      },
      "fingerprint64" -> { exprs =>
        require(exprs.length == 1 || exprs.length == 2, "fingerprint64(text[, k])")
        Fingerprint64(exprs.head, litInt(exprs, 1, default = 8))
      },
      "hash64" -> { exprs =>
        require(exprs.length == 1, "hash64(text)")
        StringHash64(exprs.head)
      },
      "winnow_set" -> { exprs =>
        require(exprs.nonEmpty && exprs.length <= 3, "winnow_set(text[, k[, w]])")
        WinnowSet(exprs.head, litInt(exprs, 1, default = 8), litInt(exprs, 2, default = 4))
      },
      "dot_product" -> { exprs =>
        require(exprs.length == 2, "dot_product(a, b)")
        DotProduct(exprs(0), exprs(1))
      },
      "sign_sketch64" -> { exprs =>
        require(exprs.length == 1, "sign_sketch64(vec)")
        SignSketch64(exprs.head)
      },
      "lexicon_votes" -> { exprs =>
        require(exprs.length == 2, "lexicon_votes(tokens, lexicons)")
        LexiconVotes(exprs.head, litStringSeqSeq(exprs(1), "lexicons"))
      },
      "lexicon_best" -> { exprs =>
        require(exprs.length == 3, "lexicon_best(tokens, lexicons, labels)")
        LexiconBest(exprs.head, litStringSeqSeq(exprs(1), "lexicons"),
          litStringSeq(exprs(2), "labels"))
      },
      "bpe_apply" -> { exprs =>
        require(exprs.length == 2, "bpe_apply(text, merges)")
        val table = litStringSeqSeq(exprs(1), "merges").map { m =>
          require(m.length == 2,
            "each merge must be array(pair, merged)")
          (m(0), m(1))
        }
        BpeApply(exprs.head, table)
      },
      "nfc_normalize" -> { exprs =>
        require(exprs.length == 1, "nfc_normalize(text)")
        NfcNormalize(exprs.head)
      },
      "damerau_levenshtein" -> { exprs =>
        require(exprs.length == 2, "damerau_levenshtein(a, b)")
        DamerauLevenshtein(exprs(0), exprs(1))
      },
      "hilbert_index" -> { exprs =>
        require(exprs.length == 3, "hilbert_index(x, y, bits)")
        HilbertIndex(exprs(0), exprs(1), litInt(exprs, 2, default = 16))
      },
      "jaro_similarity" -> { exprs =>
        require(exprs.length == 2, "jaro_similarity(a, b)")
        JaroSimilarity(exprs(0), exprs(1), winkler = false)
      },
      "jaro_winkler_similarity" -> { exprs =>
        require(exprs.length == 2, "jaro_winkler_similarity(a, b)")
        JaroSimilarity(exprs(0), exprs(1), winkler = true)
      },
      "portable_ln" -> { exprs =>
        require(exprs.length == 2, "portable_ln(a, b) = ln(a/b), a,b > 0")
        PortableLnRatio(exprs(0), exprs(1))
      })
  }

  /** Install [[descriptions]] into an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    descriptions.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  private def litValue(e: Expression, what: String): Any = {
    require(e.foldable, s"$what must be a literal")
    val v = e.eval(null)
    require(v != null, s"$what must not be NULL")
    v
  }

  private def litInt(exprs: Seq[Expression], idx: Int, default: Int): Int =
    if (exprs.length > idx)
      litValue(exprs(idx), s"argument ${idx + 1}").asInstanceOf[Number].intValue()
    else default

  private def litStringSeq(e: Expression, what: String): Seq[String] = {
    val ad = litValue(e, what)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until ad.numElements()).map(i => ad.getUTF8String(i).toString)
  }

  private def litStringSeqSeq(e: Expression, what: String): Seq[Seq[String]] = {
    val ad = litValue(e, what)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until ad.numElements()).map { i =>
      val inner = ad.getArray(i)
      (0 until inner.numElements()).map(j => inner.getUTF8String(j).toString)
    }
  }
}
