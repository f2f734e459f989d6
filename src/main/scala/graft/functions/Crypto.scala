package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

/** Crypto/auth long tail (SURVEY §2.3: hmac flavors of `hash`
  * — methods_strings.go:757; JWT HS family — impl/crypto/jwt_parse.go:80,
  * jwt_sign.go:76; id generators — functions.go:944-982,
  * impl/lang/bloblang.go:104-281). Pure-JDK implementations (javax.crypto
  * + SecureRandom); RS/ES JWT variants need key infrastructure and stay
  * out of scope, as does argon2/bcrypt (no public-jar dependency here).
  */
object Crypto {

  // ===== HMAC (hash(algorithm, key) — methods_strings.go:757) ===============

  private def hmac(alg: String)(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance(alg)
    mac.init(new javax.crypto.spec.SecretKeySpec(key, alg))
    mac.doFinal(data)
  }
  val hmacSha1: (Array[Byte], Array[Byte]) => Array[Byte] = hmac("HmacSHA1")
  val hmacSha256: (Array[Byte], Array[Byte]) => Array[Byte] = hmac("HmacSHA256")
  val hmacSha512: (Array[Byte], Array[Byte]) => Array[Byte] = hmac("HmacSHA512")

  // ===== JWT HS256/384/512 ===================================================

  private def b64url(b: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)
  private def unb64url(s: String): Array[Byte] = java.util.Base64.getUrlDecoder.decode(s)
  private def jwtAlg(name: String): String = name match {
    case "HS256" => "HmacSHA256"
    case "HS384" => "HmacSHA384"
    case "HS512" => "HmacSHA512"
    case other => throw new IllegalArgumentException(s"unsupported JWT alg $other")
  }

  /** sign_jwt_hs* (jwt_sign.go:76): claims JSON + secret → compact JWT. */
  def signJwtHs(alg: String)(claimsJson: String, secret: String): String = {
    val header = s"""{"alg":"$alg","typ":"JWT"}"""
    val signingInput = b64url(header.getBytes("UTF-8")) + "." + b64url(claimsJson.getBytes("UTF-8"))
    val sig = hmac(jwtAlg(alg))(secret.getBytes("UTF-8"), signingInput.getBytes("UTF-8"))
    signingInput + "." + b64url(sig)
  }

  /** parse_jwt_hs* (jwt_parse.go:80): verify signature, return claims
    * JSON; null on verification failure (pair with errorWhere/not_null for
    * the error-facet contract). */
  def parseJwtHs(alg: String)(token: String, secret: String): String = {
    if (token == null) return null
    token.split('.') match {
      case Array(h, p, s) =>
        val expect = hmac(jwtAlg(alg))(secret.getBytes("UTF-8"), (h + "." + p).getBytes("UTF-8"))
        if (java.security.MessageDigest.isEqual(expect, unb64url(s)))
          new String(unb64url(p), "UTF-8")
        else null
      case _ => null
    }
  }

  // ===== id generators (ksuid/ulid/snowflake — functions.go:944-982) ========

  private val crockford = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"

  /** ULID: 48-bit ms timestamp + 80 random bits, Crockford base32. */
  def ulid(): String = {
    val rnd = java.util.concurrent.ThreadLocalRandom.current()
    val ts = System.currentTimeMillis()
    val sb = new StringBuilder(26)
    var t = ts
    val tsChars = new Array[Char](10)
    for (i <- 9 to 0 by -1) { tsChars(i) = crockford(((t & 0x1F)).toInt); t >>= 5 }
    sb.appendAll(tsChars)
    for (_ <- 0 until 16) sb += crockford(rnd.nextInt(32))
    sb.toString
  }

  private val base62 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

  /** KSUID: 32-bit seconds since 2014-05-13 epoch + 128 random bits,
    * base62, 27 chars. */
  def ksuid(): String = {
    val epoch = 1400000000L
    val ts = System.currentTimeMillis() / 1000L - epoch
    val payload = new Array[Byte](20)
    java.util.concurrent.ThreadLocalRandom.current().nextBytes(payload)
    payload(0) = (ts >> 24).toByte; payload(1) = (ts >> 16).toByte
    payload(2) = (ts >> 8).toByte; payload(3) = ts.toByte
    var n = BigInt(1, payload)
    val sb = new StringBuilder
    while (n > 0) { sb += base62((n % 62).toInt); n /= 62 }
    while (sb.length < 27) sb += '0'
    sb.reverse.toString
  }

  /** Snowflake id: 41-bit ms timestamp | 10-bit node | 12-bit sequence. */
  private val snowSeq = new java.util.concurrent.atomic.AtomicLong(0)
  def snowflakeId(nodeId: Long = 0L): Long = {
    val ts = System.currentTimeMillis() - 1288834974657L // twitter epoch
    (ts << 22) | ((nodeId & 0x3FF) << 12) | (snowSeq.incrementAndGet() & 0xFFF)
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("blob_hmac_sha1", udf(hmacSha1))
    spark.udf.register("blob_hmac_sha256", udf(hmacSha256))
    spark.udf.register("blob_hmac_sha512", udf(hmacSha512))
    spark.udf.register("blob_sign_jwt_hs256", udf(signJwtHs("HS256") _))
    spark.udf.register("blob_sign_jwt_hs384", udf(signJwtHs("HS384") _))
    spark.udf.register("blob_sign_jwt_hs512", udf(signJwtHs("HS512") _))
    spark.udf.register("blob_parse_jwt_hs256", udf(parseJwtHs("HS256") _))
    spark.udf.register("blob_parse_jwt_hs384", udf(parseJwtHs("HS384") _))
    spark.udf.register("blob_parse_jwt_hs512", udf(parseJwtHs("HS512") _))
    spark.udf.register("blob_ulid", udf(() => ulid()).asNondeterministic())
    spark.udf.register("blob_ksuid", udf(() => ksuid()).asNondeterministic())
    spark.udf.register("blob_snowflake_id", udf((n: Long) => snowflakeId(n)).asNondeterministic())
  }
}
