package graft

import graft.functions.{Blob, Crypto}
import graft.operators.Archives
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases for the crypto/id/archive long tail (beyond oracle queries). */
class CryptoArchiveSpec extends SparkSpec {
  import spark.implicits._

  test("hmac-sha256 matches RFC 4231 test vector #2") {
    val got = Crypto.hmacSha256("Jefe".getBytes, "what do ya want for nothing?".getBytes)
      .map("%02x".format(_)).mkString
    assert(got == "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
  }

  test("bcrypt: published crypt_blowfish vectors, round-trip, and rejection") {
    import graft.functions.Bcrypt
    // Public test vectors from the crypt_blowfish / jBCrypt test suites.
    assert(Bcrypt.hash("", "$2a$06$DCq7YPn5Rq63x1Lad4cll.") ===
      "$2a$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s.")
    assert(Bcrypt.hash("a", "$2a$06$m0CrhHm10qJ3lXRY.5zDGO") ===
      "$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe")
    // hashing with a full previous hash as the salt reproduces it (crypt(3))
    val h = Bcrypt.hash("s3cret", Bcrypt.saltFromSeed(4, 7L))
    assert(Bcrypt.hash("s3cret", h) === h)
    assert(Bcrypt.check("s3cret", h))
    assert(!Bcrypt.check("s3cret!", h))
    assert(!Bcrypt.check("s3cret", h.replace(h.takeRight(1), if (h.endsWith("a")) "b" else "a")))
    // ancient "$2$" form is rejected loudly (it would re-serialize ambiguously)
    intercept[IllegalArgumentException](Bcrypt.hash("x", "$2$06$DCq7YPn5Rq63x1Lad4cll."))
    assert(!Bcrypt.check("x", "$2$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s."))
    // deterministic salt → deterministic hash; different seed → different hash
    assert(Bcrypt.hash("x", Bcrypt.saltFromSeed(4, 1L)) ===
      Bcrypt.hash("x", Bcrypt.saltFromSeed(4, 1L)))
    assert(Bcrypt.hash("x", Bcrypt.saltFromSeed(4, 1L)) !==
      Bcrypt.hash("x", Bcrypt.saltFromSeed(4, 2L)))
  }

  test("argon2: RFC 7693 blake2b vector and RFC 9106 d/i/id vectors") {
    import graft.functions.Argon2
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    // RFC 7693 appendix A: BLAKE2b-512("abc")
    assert(hex(Argon2.blake2b(64, "abc".getBytes("US-ASCII"))) ===
      "ba80a53f981c4d0d6a2797b69f12f6e94c212f14685ac4b74b12bb6fdbffa2d1" +
      "7d87c5392aab792dc252d5de4533cc9518d38aa8dbf1925ab92386edd4009923")
    // RFC 9106 §5: t=3, m=32 KiB, p=4, 32-byte tag, P=32×01, S=16×02,
    // K=8×03, X=12×04
    val pw = Array.fill[Byte](32)(1)
    val salt = Array.fill[Byte](16)(2)
    val secret = Array.fill[Byte](8)(3)
    val ad = Array.fill[Byte](12)(4)
    def run(v: Int) = hex(Argon2.rawHash(v, pw, salt, t = 3, mKiB = 32, p = 4,
      tagLen = 32, secret = secret, ad = ad))
    assert(run(0) === "512b391b6f1162975371d30919734294f868e3be3984f3c1a13a4db9fabe4acb") // §5.1 argon2d
    assert(run(1) === "c814d9d1dc7f37aa13f0d77f2494bda1c8de6b016dd388d29952a4c4672b6ce8") // §5.2 argon2i
    assert(run(2) === "0d640df58d78766c08c037a34a8b53c9d01ef0452d75b65eb52520e96b01e659") // §5.3 argon2id
    // PHC round-trip + rejection (small params for speed)
    val phc = Argon2.hash("s3cret", Argon2.saltFromSeed(1L), variant = 2,
      t = 1, mKiB = 64, p = 2)
    assert(Argon2.check("s3cret", phc))
    assert(!Argon2.check("wrong", phc))
    assert(!Argon2.check("s3cret", phc.dropRight(4) + "AAAA"))
  }

  test("argon2: blake2b non-64 digest lengths and H' tags not divisible by 32") {
    import graft.functions.Argon2
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    // Published BLAKE2b-256/384("abc") vectors — digest length is part of
    // the IV, so these catch truncation-vs-parameterization confusion.
    assert(hex(Argon2.blake2b(32, "abc".getBytes("US-ASCII"))) ===
      "bddd813c634239723171ef3fee98579b94964e3bb1cb3e427262c8c068d52319")
    assert(hex(Argon2.blake2b(48, "abc".getBytes("US-ASCII"))) ===
      "6f56a82c8e7ef526dfe182eb5212f7db9df1317e57815dbda46083fc30f54ee6" +
      "c66ba83be64b302d7cba6ce15bb556f4")
    // H' (RFC 9106 §3.3) replayed with an independent implementation
    // (python hashlib.blake2b): the final block for T>64, T%32!=0 is a
    // Blake2b with digest length T-32r, NOT a truncated Blake2b-64.
    val a = Array.tabulate[Byte](7)(_.toByte)
    assert(hex(Argon2.hPrime(100, a)) ===
      "e3f58f7f14840e7db25f5061c87ddd7d3a63e2027d23a45d493493d5be73267b" +
      "c2cbd3b302683db3e285e87705005edd62d2650566da2c6c77f2171bfefc8ddd" +
      "22dcd23e6c1e3d10605e9d450007048ecea0f47f166b197cacd9a7e39115ff9a" +
      "79f5d40e")
    assert(hex(Argon2.hPrime(72, a)) ===
      "bc6ffb096b3194e111a575730e3be4acdde22c7da49c9b91d294c61ab654718f" +
      "e141bac4825672c6a5c7c40ea556142088988effe844a4e988cf447292d70ae0" +
      "2b4c9b51aedc01ec")
    assert(hex(Argon2.hPrime(64, a)) ===
      "931405e64800f9d0665e00165486b43954dc62252d93c9f7b7e18510f8723da3" +
      "5ad63adf0d2311dd144153f56148a762e87d5320314b0d40a3882fb09791c3f2")
    // PHC round-trip at a 100-byte tag (the previously-broken length class)
    val phc100 = Argon2.hash("s3cret", Argon2.saltFromSeed(2L), variant = 2,
      t = 1, mKiB = 16, p = 1, tagLen = 100)
    assert(Argon2.check("s3cret", phc100))
    assert(!Argon2.check("wrong", phc100))
  }

  test("jwt: tampered token and wrong secret are rejected") {
    val tok = Crypto.signJwtHs("HS256")("""{"sub":"u1","n":7}""", "k")
    assert(Crypto.parseJwtHs("HS256")(tok, "k") == """{"sub":"u1","n":7}""")
    assert(Crypto.parseJwtHs("HS256")(tok, "wrong") == null)
    val parts = tok.split('.')
    val tampered = parts(0) + "." + java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString("""{"sub":"u2","n":7}""".getBytes) + "." + parts(2)
    assert(Crypto.parseJwtHs("HS256")(tampered, "k") == null)
    // HS384/512 round-trip
    for (alg <- Seq("HS384", "HS512")) {
      val t2 = Crypto.signJwtHs(alg)("""{"a":1}""", "s")
      assert(Crypto.parseJwtHs(alg)(t2, "s") == """{"a":1}""")
    }
  }

  test("jwt RS/ES: sign with PEM private key, verify with public; wrong key rejected") {
    def pem(label: String, der: Array[Byte]): String =
      s"-----BEGIN $label-----\n" +
        java.util.Base64.getMimeEncoder(64, "\n".getBytes).encodeToString(der) +
        s"\n-----END $label-----\n"
    val rsaGen = java.security.KeyPairGenerator.getInstance("RSA")
    rsaGen.initialize(2048)
    val rsa = rsaGen.generateKeyPair()
    val rsa2 = rsaGen.generateKeyPair()
    val claims = """{"sub":"u1","scope":"read"}"""
    for (alg <- Seq("RS256", "RS384", "RS512")) {
      val tok = Crypto.signJwtPk(alg)(claims, pem("PRIVATE KEY", rsa.getPrivate.getEncoded))
      assert(Crypto.parseJwtPk(alg)(tok, pem("PUBLIC KEY", rsa.getPublic.getEncoded)) == claims)
      assert(Crypto.parseJwtPk(alg)(tok, pem("PUBLIC KEY", rsa2.getPublic.getEncoded)) == null)
    }
    for ((alg, curve) <- Seq("ES256" -> "secp256r1", "ES384" -> "secp384r1", "ES512" -> "secp521r1")) {
      val ecGen = java.security.KeyPairGenerator.getInstance("EC")
      ecGen.initialize(new java.security.spec.ECGenParameterSpec(curve))
      val ec = ecGen.generateKeyPair()
      val tok = Crypto.signJwtPk(alg)(claims, pem("PRIVATE KEY", ec.getPrivate.getEncoded))
      // ES signature must be raw R||S of exactly 2*fieldLen bytes (RFC 7518)
      val sigLen = java.util.Base64.getUrlDecoder.decode(tok.split('.')(2)).length
      val expect = alg match { case "ES256" => 64; case "ES384" => 96; case _ => 132 }
      assert(sigLen == expect, s"$alg signature length $sigLen")
      assert(Crypto.parseJwtPk(alg)(tok, pem("PUBLIC KEY", ec.getPublic.getEncoded)) == claims)
      val tampered = tok.dropRight(4) + "AAAA"
      assert(Crypto.parseJwtPk(alg)(tampered, pem("PUBLIC KEY", ec.getPublic.getEncoded)) == null)
    }
  }

  test("ulid/ksuid/snowflake have correct shape and are time-sortable") {
    val u1 = Crypto.ulid(); Thread.sleep(2); val u2 = Crypto.ulid()
    assert(u1.length == 26 && u1.matches("[0-9A-HJKMNP-TV-Z]{26}"))
    assert(u1.substring(0, 10) <= u2.substring(0, 10), "ulid timestamp prefix sorts")
    val k = Crypto.ksuid()
    assert(k.length == 27 && k.matches("[0-9A-Za-z]{27}"))
    val s1 = Crypto.snowflakeId(3)
    val s2 = Crypto.snowflakeId(3)
    assert(s1 != s2 && ((s1 >> 12) & 0x3FF) == 3)
  }

  test("tar and zip round-trip unicode names and binary content") {
    val entries = Seq(("héllo 中.txt", Array[Byte](0, 1, 2, -1)), ("b/c.bin", Array[Byte]()))
    val rows = entries.map { case (n, c) =>
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](n, c), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
      ): org.apache.spark.sql.Row
    }
    for ((create, extract) <- Seq(
        (Archives.tarCreate, Archives.tarExtract),
        (Archives.zipCreate, Archives.zipExtract))) {
      val rt = extract(create(rows))
      assert(rt.map(_._1) == entries.map(_._1))
      assert(rt.map(_._2.toSeq) == entries.map(_._2.toSeq))
    }
  }

  test("re_find_object / re_find_all_object extract named groups") {
    val df = Seq("k=a v=1; k=b v=2").toDF("s")
    val obj = df.select(Blob.reFindObject(col("s"), "k=(?<key>\\w+) v=(?<num>\\d+)"))
      .as[Map[String, String]].collect().head
    assert(obj == Map("key" -> "a", "num" -> "1"))
    val all = df.select(Blob.reFindAllObject(col("s"), "k=(?<key>\\w+) v=(?<num>\\d+)"))
      .as[Seq[Map[String, String]]].collect().head
    assert(all == Seq(Map("key" -> "a", "num" -> "1"), Map("key" -> "b", "num" -> "2")))
  }

  test("strftime translation formats correctly and rejects unknown tokens") {
    val got = Seq("2024-03-05 10:20:30").toDF("s")
      .select(Blob.tsStrftime(col("s").cast("timestamp"), "%d/%b/%Y %H:%M"))
      .as[String].collect().head
    assert(got == "05/Mar/2024 10:20")
    intercept[IllegalArgumentException] { Blob.tsStrftime(lit("x"), "%Q") }
  }
}
