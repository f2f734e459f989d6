package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

/** Crypto/auth long tail (SURVEY §2.3: hmac flavors of `hash`
  * — methods_strings.go:757; JWT HS/RS/ES families — impl/crypto/
  * jwt_parse.go:80, jwt_sign.go:76; id generators — functions.go:944-982,
  * impl/lang/bloblang.go:104-281). Pure-JDK implementations (javax.crypto
  * + java.security; PEM PKCS#8/X.509 key parsing, ES raw↔DER signature
  * conversion per RFC 7518 §3.4). bcrypt and argon2 are pure-Scala
  * ([[Bcrypt]], [[Argon2]]) — no external jars needed.
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

  // ===== JWT RS256/384/512 + ES256/384/512 (jwt_sign.go:76, jwt_parse.go:80)

  private def pemBody(pem: String): Array[Byte] =
    java.util.Base64.getMimeDecoder.decode(
      pem.replaceAll("-----[A-Z ]+-----", "").replaceAll("\\s", ""))

  private def privateKey(pem: String, family: String): java.security.PrivateKey =
    java.security.KeyFactory.getInstance(family)
      .generatePrivate(new java.security.spec.PKCS8EncodedKeySpec(pemBody(pem)))

  private def publicKey(pem: String, family: String): java.security.PublicKey =
    java.security.KeyFactory.getInstance(family)
      .generatePublic(new java.security.spec.X509EncodedKeySpec(pemBody(pem)))

  private def sigAlg(alg: String): (String, String) = alg match {
    case "RS256" => ("SHA256withRSA", "RSA")
    case "RS384" => ("SHA384withRSA", "RSA")
    case "RS512" => ("SHA512withRSA", "RSA")
    case "ES256" => ("SHA256withECDSA", "EC")
    case "ES384" => ("SHA384withECDSA", "EC")
    case "ES512" => ("SHA512withECDSA", "EC")
    case other => throw new IllegalArgumentException(s"unsupported JWT alg $other")
  }

  /** JWS ES signatures are raw R||S (RFC 7518 §3.4); the JDK speaks DER. */
  private def esFieldLen(alg: String): Int = alg match {
    case "ES256" => 32; case "ES384" => 48; case "ES512" => 66
  }
  private def derToRaw(der: Array[Byte], fieldLen: Int): Array[Byte] = {
    // SEQUENCE { INTEGER r, INTEGER s }
    var i = 2
    if ((der(1) & 0x80) != 0) i += (der(1) & 0x7F) // long-form length
    def int(): Array[Byte] = {
      require(der(i) == 2, "ES signature: expected DER INTEGER"); i += 1
      val len = der(i) & 0xFF; i += 1
      val v = java.util.Arrays.copyOfRange(der, i, i + len); i += len
      v.dropWhile(_ == 0.toByte) // strip sign padding
    }
    val (r, s) = (int(), int())
    val out = new Array[Byte](fieldLen * 2)
    System.arraycopy(r, 0, out, fieldLen - r.length, r.length)
    System.arraycopy(s, 0, out, 2 * fieldLen - s.length, s.length)
    out
  }
  private def rawToDer(raw: Array[Byte]): Array[Byte] = {
    val fieldLen = raw.length / 2
    def int(v0: Array[Byte]): Array[Byte] = {
      val v = v0.dropWhile(_ == 0.toByte) match { case e if e.isEmpty => Array(0.toByte) case e => e }
      val padded = if ((v(0) & 0x80) != 0) 0.toByte +: v else v
      Array(2.toByte, padded.length.toByte) ++ padded
    }
    val body = int(raw.take(fieldLen)) ++ int(raw.drop(fieldLen))
    val header =
      if (body.length < 128) Array(0x30.toByte, body.length.toByte)
      else Array(0x30.toByte, 0x81.toByte, body.length.toByte)
    header ++ body
  }

  /** sign_jwt RS/ES families: claims JSON + PEM private key → compact JWT. */
  def signJwtPk(alg: String)(claimsJson: String, privateKeyPem: String): String = {
    val (jdkAlg, family) = sigAlg(alg)
    val header = s"""{"alg":"$alg","typ":"JWT"}"""
    val signingInput = b64url(header.getBytes("UTF-8")) + "." + b64url(claimsJson.getBytes("UTF-8"))
    val signer = java.security.Signature.getInstance(jdkAlg)
    signer.initSign(privateKey(privateKeyPem, family))
    signer.update(signingInput.getBytes("UTF-8"))
    val sig0 = signer.sign()
    val sig = if (family == "EC") derToRaw(sig0, esFieldLen(alg)) else sig0
    signingInput + "." + b64url(sig)
  }

  /** parse_jwt RS/ES families: verify with the PEM public key, return claims
    * JSON; null on verification failure. */
  def parseJwtPk(alg: String)(token: String, publicKeyPem: String): String = {
    if (token == null) return null
    token.split('.') match {
      case Array(h, p, s) =>
        val (jdkAlg, family) = sigAlg(alg)
        val verifier = java.security.Signature.getInstance(jdkAlg)
        verifier.initVerify(publicKey(publicKeyPem, family))
        verifier.update((h + "." + p).getBytes("UTF-8"))
        val sig = if (family == "EC") rawToDer(unb64url(s)) else unb64url(s)
        val ok = try verifier.verify(sig) catch { case _: Exception => false }
        if (ok) new String(unb64url(p), "UTF-8") else null
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
    for (alg <- Seq("RS256", "RS384", "RS512", "ES256", "ES384", "ES512")) {
      spark.udf.register(s"blob_sign_jwt_${alg.toLowerCase}", udf(signJwtPk(alg) _))
      spark.udf.register(s"blob_parse_jwt_${alg.toLowerCase}", udf(parseJwtPk(alg) _))
    }
    spark.udf.register("blob_ulid", udf(() => ulid()).asNondeterministic())
    spark.udf.register("blob_ksuid", udf(() => ksuid()).asNondeterministic())
    spark.udf.register("blob_snowflake_id", udf((n: Long) => snowflakeId(n)).asNondeterministic())
    spark.udf.register("blob_compare_bcrypt",
      udf((pw: String, h: String) => Bcrypt.check(pw, h)))
    spark.udf.register("blob_compare_argon2",
      udf((pw: String, h: String) => Argon2.check(pw, h)))
  }
}
