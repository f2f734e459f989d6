package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.{Aws, Dynamo, Lambda}
import graft.conn.Aws.SigV4
import org.scalatest.funsuite.AnyFunSuite

/** DynamoDB JSON protocol over MiniDynamo (AttributeValue encoding,
  * conditional-put add semantics, TTL expiry) and the Lambda Invoke API
  * over MiniLambda (payload replacement, function-error metadata). */
class DynamoSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(UTF_8)

  private def withDynamo[T](f: (Dynamo.MiniDynamo, Dynamo.Cache) => T): T = {
    val srv = new Dynamo.MiniDynamo().start()
    val setup = new Dynamo.Client(srv.endpoint)
    setup.createTable("cache", "key"); setup.close()
    val cache = new Dynamo.Cache(srv.endpoint, "cache")
    try f(srv, cache) finally { cache.close(); srv.stop() }
  }

  test("get/set/delete round-trip through AttributeValue B encoding") {
    withDynamo { (srv, c) =>
      assert(c.get("k").isEmpty)
      c.set("k", b("v1"))
      assert(c.get("k").map(new String(_, UTF_8)).contains("v1"))
      c.set("k", Array.tabulate[Byte](64)(_.toByte)) // binary survives base64
      assert(c.get("k").get.toSeq == Array.tabulate[Byte](64)(_.toByte).toSeq)
      c.delete("k")
      assert(c.get("k").isEmpty && srv.itemCount("cache") == 0)
    }
  }

  test("add is conditional PutItem: ConditionalCheckFailedException maps to false") {
    withDynamo { (_, c) =>
      assert(c.add("k", b("v1")))
      assert(!c.add("k", b("v2")), "attribute_not_exists guard rejects the second add")
      assert(c.get("k").map(new String(_, UTF_8)).contains("v1"))
      c.delete("k")
      assert(c.add("k", b("v3")), "add succeeds again after delete")
    }
  }

  test("TTL attribute expires items lazily (cache_dynamodb.go ttl_key contract)") {
    withDynamo { (_, c) =>
      // 3 s TTL, not 1 s: the first read must land INSIDE the ttl window,
      // and under the 32-way-parallel suite a GC pause can eat >1 s
      // between set and get (the in-suite flake)
      c.set("short", b("v"), ttlMs = 3000)
      assert(c.get("short").isDefined)
      Thread.sleep(4100) // epoch-second granularity: sleep past the boundary
      assert(c.get("short").isEmpty, "expired item reads as absent")
      assert(c.add("short", b("v2")), "add treats the expired item as absent")
    }
  }

  test("unknown table errors; wrong secret is rejected") {
    val srv = new Dynamo.MiniDynamo().start()
    try {
      val c = new Dynamo.Cache(srv.endpoint, "nope")
      val e = intercept[IllegalArgumentException](c.set("k", b("v")))
      assert(e.getMessage.contains("ResourceNotFoundException"))
      c.close()
      val bad = new Dynamo.Cache(srv.endpoint, "cache",
        creds = SigV4.Credentials(Aws.testCreds.accessKey, "wrong"))
      val e2 = intercept[IllegalArgumentException](bad.set("k", b("v")))
      assert(e2.getMessage.contains("SignatureDoesNotMatch"))
      bad.close()
    } finally srv.stop()
  }

  // ------------------------------------------------------------- lambda
  test("lambda invoke: result payload replaces content; prefix-encoded path signs correctly") {
    val srv = new Lambda.MiniLambda(Map(
      "upper" -> (p => Right(new String(p, UTF_8).toUpperCase.getBytes(UTF_8))))).start()
    val c = new Lambda.Client(srv.endpoint)
    try {
      val r = c.invoke("upper", b("hello lambda"))
      assert(new String(r.payload, UTF_8) == "HELLO LAMBDA")
      assert(r.functionError.isEmpty)
    } finally { c.close(); srv.stop() }
  }

  test("lambda function error: 200 + X-Amz-Function-Error + error JSON payload (processor_lambda.go:29)") {
    val srv = new Lambda.MiniLambda(Map(
      "boom" -> (_ => Left("division by zero")))).start()
    val c = new Lambda.Client(srv.endpoint)
    try {
      val r = c.invoke("boom", b("{}"))
      assert(r.functionError.contains("Unhandled"))
      assert(new String(r.payload, UTF_8).contains("division by zero"))
      val e = intercept[IllegalArgumentException](c.invoke("absent", b("{}")))
      assert(e.getMessage.contains("404"))
    } finally { c.close(); srv.stop() }
  }

  test("output: BatchWriteItem puts+deletes in one batch; UnprocessedItems re-driven") {
    import scala.collection.immutable.VectorMap
    val srv = new Dynamo.MiniDynamo().start()
    val c = new Dynamo.Client(srv.endpoint)
    try {
      c.createTable("t", "id")
      def key(k: String) = VectorMap[String, Any]("id" -> Dynamo.toAttributeValue(k, numbersAsN = true))
      def item(k: String, n: Long) = key(k) ++ VectorMap[String, Any](
        "n" -> Dynamo.toAttributeValue(n, numbersAsN = true))
      // seed, then one mixed batch: put 3 new, delete 1 seeded
      c.batchWrite("t", Seq(Right(item("a", 1)), Right(item("b", 2))))
      srv.unprocessedOnce = 2 // next call throttles its 2 trailing requests
      c.batchWrite("t", Seq(Right(item("c", 3)), Right(item("d", 4)), Left(key("a"))))
      assert(srv.itemCount("t") == 3, "a deleted; b,c,d live after the re-drive")
      val ids = c.scan("t").map(i => Dynamo.fromAttributeValue(
        graft.conn.Aws.Json.asObj(i("id")))).toSet
      assert(ids == Set("b", "c", "d"))
    } finally { c.close(); srv.stop() }
  }

  test("output: BatchWriteItem validates atomically — no partial mutation on error") {
    import scala.collection.immutable.VectorMap
    import graft.conn.Aws.Json
    val srv = new Dynamo.MiniDynamo().start()
    val c = new Dynamo.Client(srv.endpoint)
    try {
      c.createTable("t", "id")
      c.createTable("u", "id")
      def put(k: String) = Json.obj("PutRequest" -> Json.obj("Item" ->
        VectorMap[String, Any]("id" -> Dynamo.toAttributeValue(k, numbersAsN = true))))
      // a valid table listed BEFORE a missing one: the whole request must
      // be rejected with nothing applied (real DynamoDB validates first)
      val r1 = c.call("BatchWriteItem", Json.obj("RequestItems" ->
        Json.obj("t" -> Vector[Any](put("a")), "missing" -> Vector[Any](put("b")))))
      assert(r1.isLeft && r1.swap.toOption.get.contains("ResourceNotFoundException"))
      assert(srv.itemCount("t") == 0, "no write lands before validation fails")
      // the 25-request cap is on the REQUEST total across tables
      val r2 = c.call("BatchWriteItem", Json.obj("RequestItems" -> Json.obj(
        "t" -> (1 to 13).map(i => put(s"t$i")).toVector.map(x => x: Any),
        "u" -> (1 to 13).map(i => put(s"u$i")).toVector.map(x => x: Any))))
      assert(r2.isLeft && r2.swap.toOption.get.contains("ValidationException"))
      assert(srv.itemCount("t") == 0 && srv.itemCount("u") == 0)
    } finally { c.close(); srv.stop() }
  }

  test("output: AttributeValue tree round-trips nested maps/lists; json_number_type both modes") {
    import scala.collection.immutable.VectorMap
    val doc = VectorMap[String, Any]("s" -> "x", "n" -> 7L, "d" -> 2.5, "b" -> true,
      "z" -> null, "m" -> VectorMap[String, Any]("inner" -> 1L),
      "l" -> Vector[Any]("a", 9L))
    val avN = Dynamo.toAttributeValue(doc, numbersAsN = true)
    assert(Dynamo.fromAttributeValue(avN) == doc)
    // the default "string" mode renders numbers as S (output_dynamodb.go json_number_type)
    val avS = graft.conn.Aws.Json.asObj(
      graft.conn.Aws.Json.asObj(Dynamo.toAttributeValue(doc, numbersAsN = false)("M"))("n"))
    assert(avS == VectorMap[String, Any]("S" -> "7"))
  }
}
