package graft.ops

/** JVM replicas of the exact string semantics the one-task tiers must
  * reproduce bit-for-bit (shared by [[Dedup.maintainedMinHashPairsLocal]]
  * and [[CorpusMaintain.manifestLocal]] — the guarded single-task shapes
  * whose outputs are spec- and oracle-asserted equal to the distributed
  * plans):
  *
  *   - Spark's `trim` strips U+0020 ONLY (not Java String.trim's
  *     <= 0x20);
  *   - Spark's `split(str, regex)` keeps trailing empty strings
  *     (Pattern.split limit -1), unlike Java's default String.split;
  *   - `lower` delegates to String.toLowerCase() (no locale argument —
  *     UTF8String's own non-ASCII path) after the ASCII fast path,
  *     replicated by calling the same method;
  *   - `md5` is the hex digest of the UTF-8 bytes, lowercase.
  *
  * All members are pure functions on a top-level object, so closures
  * using them serialize as object references.
  */
private[ops] object LocalText {

  /** Spark `trim`: strip leading/trailing U+0020 only. */
  def trimSpaces(s: String): String = {
    var a = 0; var z = s.length
    while (a < z && s.charAt(a) == ' ') a += 1
    while (z > a && s.charAt(z - 1) == ' ') z -= 1
    s.substring(a, z)
  }

  /** Spark `split(trim(c), "\s+")` — [[graft.ops.TextStats.words]]. */
  def words(s: String): Array[String] = trimSpaces(s).split("\\s+", -1)

  /** [[graft.ops.TextStats.normalize]]: ws-collapse, trim, lower. */
  def normalize(s: String): String =
    trimSpaces(s.replaceAll("\\s+", " ")).toLowerCase()

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Spark `md5(col)`: lowercase hex of the UTF-8 bytes. */
  def md5Hex(s: String): String = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    d.foreach { b =>
      sb.append(Character.forDigit((b >> 4) & 0xf, 16))
        .append(Character.forDigit(b & 0xf, 16))
    }
    sb.toString
  }

  /** [[graft.ops.TextStats.contentHash]]: md5 of the normalized text. */
  def contentHash(s: String): String = md5Hex(normalize(s))
}
