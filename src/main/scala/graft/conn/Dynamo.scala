package graft.conn

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.{TrieMap => CTrieMap}
import scala.collection.immutable.VectorMap

import graft.conn.Aws.{AwsHttp, Json, MiniAwsService, SigV4}

/** Amazon DynamoDB (cache-backend subset) over the PUBLIC DynamoDB JSON
  * protocol (Content-Type application/x-amz-json-1.0, X-Amz-Target
  * DynamoDB_20120810.&lt;Action&gt;), SigV4-signed and verified per request.
  *
  * Reference surface being re-expressed: cache_dynamodb.go — a table
  * with a `hash_key` string attribute and a `data_key` binary attribute
  * acts as a KV cache; Get is a consistent-read GetItem, Set is PutItem,
  * Add is PutItem guarded by `attribute_not_exists(hash_key)` (the
  * ConditionalCheckFailedException → ErrKeyAlreadyExists mapping), TTL
  * writes an epoch-seconds number under `ttl_key`. AttributeValue
  * encoding ({"S": …}, {"B": base64}, {"N": "…"}) follows the public API
  * reference; the Go reference wraps aws-sdk-go-v2/service/dynamodb.
  */
object Dynamo {

  // ------------------------------------------------------------- fixture
  final class MiniDynamo(creds: SigV4.Credentials = Aws.testCreds)
      extends MiniAwsService("dynamodb", creds) {
    // table -> hashKeyValue -> item (attribute name -> AttributeValue map)
    private val tables = new CTrieMap[String, (String, CTrieMap[String, VectorMap[String, Any]])]()

    def createTableDirect(name: String, hashKey: String): Unit =
      tables.putIfAbsent(name, (hashKey, new CTrieMap[String, VectorMap[String, Any]]()))
    def itemCount(table: String): Int = tables.get(table).map(_._2.size).getOrElse(0)
    /** throttle knob: the NEXT BatchWriteItem call holds back up to n
      * trailing requests as UnprocessedItems (then auto-resets) */
    @volatile var unprocessedOnce: Int = 0

    private def ok(body: VectorMap[String, Any]) =
      (200, Seq("Content-Type" -> "application/x-amz-json-1.0"), Json.render(body).getBytes(UTF_8))
    private def err(typ: String, msg: String) =
      (400, Seq("Content-Type" -> "application/x-amz-json-1.0"),
        Json.render(Json.obj("__type" -> s"com.amazonaws.dynamodb.v20120810#$typ", "message" -> msg)).getBytes(UTF_8))

    private def sOf(av: Any): String = Json.str(Json.asObj(av), "S")

    /** lazily expire items whose ttl attribute (epoch seconds, {"N": …})
      * has passed — the service's TTL sweeper contract */
    private def live(item: VectorMap[String, Any], now: Long): Boolean =
      item.collectFirst {
        case ("_ttl_epoch", v) => Json.str(Json.asObj(v), "N").toLong
      } match {
        case Some(at) => at > now / 1000
        case None => true
      }

    protected def handle(method: String, path: String, query: String,
                         headers: Map[String, String], body: Array[Byte]): (Int, Seq[(String, String)], Array[Byte]) = {
      val target = headers.getOrElse("x-amz-target", "")
      val req = Json.asObj(Json.parse(new String(body, UTF_8)))
      def table() = tables.get(Json.str(req, "TableName"))

      target.stripPrefix("DynamoDB_20120810.") match {
        case "CreateTable" =>
          val schema = Json.asArr(req("KeySchema")).map(Json.asObj)
          createTableDirect(Json.str(req, "TableName"), Json.str(schema.head, "AttributeName"))
          ok(Json.obj("TableDescription" -> Json.obj("TableStatus" -> "ACTIVE")))

        case "PutItem" => table() match {
          case Some((hashKey, items)) =>
            val item = Json.asObj(req("Item"))
            val k = sOf(item(hashKey))
            val conditional = Json.strOpt(req, "ConditionExpression").exists(_.contains("attribute_not_exists"))
            if (conditional) {
              val now = System.currentTimeMillis()
              val existed = items.get(k).exists(live(_, now))
              if (existed) err("ConditionalCheckFailedException", k)
              else { items.put(k, item); ok(Json.obj()) }
            } else { items.put(k, item); ok(Json.obj()) }
          case None => err("ResourceNotFoundException", Json.str(req, "TableName"))
        }

        case "GetItem" => table() match {
          case Some((hashKey, items)) =>
            val k = sOf(Json.asObj(req("Key"))(hashKey))
            items.get(k).filter(live(_, System.currentTimeMillis())) match {
              case Some(item) => ok(Json.obj("Item" -> item))
              case None => ok(Json.obj()) // absent Item = not found (public contract)
            }
          case None => err("ResourceNotFoundException", Json.str(req, "TableName"))
        }

        case "DeleteItem" => table() match {
          case Some((hashKey, items)) =>
            items.remove(sOf(Json.asObj(req("Key"))(hashKey))); ok(Json.obj())
          case None => err("ResourceNotFoundException", Json.str(req, "TableName"))
        }

        // BatchWriteItem (output_dynamodb.go:483): ≤25 put/delete requests
        // per table, applied in order; the throttle knob returns the tail
        // of the batch in UnprocessedItems so clients exercise their
        // re-drive loop exactly as the public contract demands
        case "BatchWriteItem" =>
          val reqItems = Json.asObj(req("RequestItems"))
          // validate the WHOLE request before applying anything — real
          // DynamoDB rejects atomically; an error response must not
          // leave the store partially mutated (the ≤25 cap is on the
          // request total across tables, not per table)
          reqItems.keys.find(!tables.contains(_)) match {
            case Some(missing) => return err("ResourceNotFoundException", missing)
            case None => ()
          }
          if (reqItems.values.map(Json.asArr(_).size).sum > 25)
            return err("ValidationException", "Too many items requested")
          var unprocessed = VectorMap.empty[String, Any]
          reqItems.foreach { case (tableName, reqsAny) =>
            tables.get(tableName) match {
              case None => return err("ResourceNotFoundException", tableName)
              case Some((hashKey, items)) =>
                val reqs = Json.asArr(reqsAny)
                val holdBack =
                  if (unprocessedOnce > 0) { val n = math.min(unprocessedOnce, reqs.size - 1); unprocessedOnce = 0; n }
                  else 0
                val (apply, defer) = reqs.splitAt(reqs.size - holdBack)
                apply.foreach { wr =>
                  val w = Json.asObj(wr)
                  w.get("PutRequest").map(Json.asObj).foreach { pr =>
                    val item = Json.asObj(pr("Item"))
                    items.put(sOf(item(hashKey)), item)
                  }
                  w.get("DeleteRequest").map(Json.asObj).foreach { dr =>
                    items.remove(sOf(Json.asObj(dr("Key"))(hashKey))); ()
                  }
                }
                if (defer.nonEmpty) unprocessed = unprocessed.updated(tableName, defer)
            }
          }
          ok(if (unprocessed.isEmpty) Json.obj("UnprocessedItems" -> Json.obj())
             else Json.obj("UnprocessedItems" -> unprocessed))

        // Scan (bounded read-back for gates; no paging at fixture scale)
        case "Scan" => table() match {
          case Some((_, items)) =>
            val now = System.currentTimeMillis()
            val live0 = items.values.filter(live(_, now)).toVector
            ok(Json.obj("Items" -> live0.map(x => x: Any), "Count" -> live0.size.toLong))
          case None => err("ResourceNotFoundException", Json.str(req, "TableName"))
        }

        case other => err("UnknownOperationException", other)
      }
    }
  }

  // -------------------------------------------------------------- client
  final class Client(endpoint: String, creds: SigV4.Credentials = Aws.testCreds,
                     region: String = Aws.testRegion) extends AutoCloseable {
    private val aws = new AwsHttp(endpoint, region, "dynamodb", creds)

    def call(action: String, body: VectorMap[String, Any]): Either[String, VectorMap[String, Any]] = {
      val r = aws.request("POST", "/", extraHeaders = Seq(
        "content-type" -> "application/x-amz-json-1.0",
        "x-amz-target" -> s"DynamoDB_20120810.$action"),
        body = Json.render(body).getBytes(UTF_8))
      if (r.status == 200) Right(Json.asObj(Json.parse(r.bodyStr)))
      else Left(r.bodyStr)
    }
    def callOk(action: String, body: VectorMap[String, Any]): VectorMap[String, Any] =
      call(action, body).fold(e => throw new IllegalArgumentException(s"$action: $e"), identity)

    def createTable(name: String, hashKey: String): Unit = {
      callOk("CreateTable", Json.obj("TableName" -> name,
        "KeySchema" -> Vector[Any](Json.obj("AttributeName" -> hashKey, "KeyType" -> "HASH")),
        "AttributeDefinitions" -> Vector[Any](Json.obj("AttributeName" -> hashKey, "AttributeType" -> "S")),
        "BillingMode" -> "PAY_PER_REQUEST")); ()
    }

    /** aws_dynamodb OUTPUT write path (output_dynamodb.go:395-607):
      * ≤25 put/delete WriteRequests per BatchWriteItem call, and the
      * response's UnprocessedItems re-driven with bounded backoff —
      * the public throttling contract. Each element is Right(item) for
      * a put, Left(key) for a delete (the delete_condition arm). */
    def batchWrite(tableName: String,
                   reqs: Seq[Either[VectorMap[String, Any], VectorMap[String, Any]]],
                   maxRedrives: Int = 4): Unit = {
      def toWr(r: Either[VectorMap[String, Any], VectorMap[String, Any]]): Any = r match {
        case Right(item) => Json.obj("PutRequest" -> Json.obj("Item" -> item))
        case Left(key) => Json.obj("DeleteRequest" -> Json.obj("Key" -> key))
      }
      reqs.grouped(25).foreach { chunk =>
        var pending: Vector[Any] = chunk.toVector.map(toWr)
        var attempt = 0
        while (pending.nonEmpty) {
          val resp = callOk("BatchWriteItem",
            Json.obj("RequestItems" -> Json.obj(tableName -> pending)))
          pending = resp.get("UnprocessedItems").map(Json.asObj)
            .flatMap(_.get(tableName)).map(Json.asArr).getOrElse(Vector.empty)
          if (pending.nonEmpty) {
            attempt += 1
            require(attempt <= maxRedrives,
              s"BatchWriteItem: ${pending.size} unprocessed after $maxRedrives re-drives")
            Thread.sleep(math.min(50L << (attempt - 1), 1000L))
          }
        }
      }
    }

    /** bounded read-back for gates */
    def scan(tableName: String): Vector[VectorMap[String, Any]] =
      callOk("Scan", Json.obj("TableName" -> tableName))
        .get("Items").map(Json.asArr).getOrElse(Vector.empty).map(Json.asObj)

    override def close(): Unit = aws.close()
  }

  /** JSON tree → DynamoDB AttributeValue tree (output_dynamodb.go
    * anyToAttributeValue:340-385): string→S, bool→BOOL, null→NULL,
    * number→N when `numbersAsN` ("json_number_type: number") else S
    * ("string", the default), object→M, array→L. */
  def toAttributeValue(v: Any, numbersAsN: Boolean): VectorMap[String, Any] = v match {
    case null => Json.obj("NULL" -> true)
    case b: Boolean => Json.obj("BOOL" -> b)
    case s: String => Json.obj("S" -> s)
    case m: VectorMap[String @unchecked, Any @unchecked] =>
      Json.obj("M" -> VectorMap(m.toSeq.map { case (k, x) =>
        k -> (toAttributeValue(x, numbersAsN): Any) }: _*))
    case a: Vector[Any @unchecked] =>
      Json.obj("L" -> a.map(x => toAttributeValue(x, numbersAsN): Any))
    case n @ (_: Long | _: Int | _: Double) =>
      val rendered = n match {
        case d: Double => if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString
        case other => other.toString
      }
      if (numbersAsN) Json.obj("N" -> rendered) else Json.obj("S" -> rendered)
    case other => Json.obj("S" -> String.valueOf(other))
  }

  /** AttributeValue tree → plain JSON values (gate read-back). */
  def fromAttributeValue(av: VectorMap[String, Any]): Any = av.head match {
    case ("S", s) => s
    case ("N", s: String) => if (s.contains('.') || s.contains('e') || s.contains('E')) s.toDouble else s.toLong
    case ("BOOL", b) => b
    case ("NULL", _) => null
    case ("M", m) => VectorMap(Json.asObj(m).toSeq.map { case (k, x) =>
      k -> fromAttributeValue(Json.asObj(x)) }: _*)
    case ("L", a) => Json.asArr(a).map(x => fromAttributeValue(Json.asObj(x)))
    case (t, _) => throw new IllegalArgumentException(s"unsupported AttributeValue type $t")
  }

  // ------------------------------------------------------- cache backend
  /** cache_dynamodb.go mapped onto the repo's KvBackend verb set. */
  final class Cache(endpoint: String, table: String, hashKey: String = "key",
                    dataKey: String = "data", prefix: String = "",
                    creds: SigV4.Credentials = Aws.testCreds)
      extends graft.operators.CacheBackends.KvBackend {
    private val c = new Client(endpoint, creds)
    private def keyAv(key: String) = Json.obj(hashKey -> Json.obj("S" -> (prefix + key)))

    private def itemFor(key: String, value: Array[Byte], ttlMs: Long): VectorMap[String, Any] = {
      var item = Json.obj(
        hashKey -> Json.obj("S" -> (prefix + key)),
        dataKey -> Json.obj("B" -> java.util.Base64.getEncoder.encodeToString(value)))
      if (ttlMs > 0) // ttl_key: epoch-seconds expiry attribute (cache_dynamodb.go:31)
        item = item.updated("_ttl_epoch",
          Json.obj("N" -> ((System.currentTimeMillis() + ttlMs) / 1000).toString))
      item
    }

    def get(key: String): Option[Array[Byte]] =
      c.callOk("GetItem", Json.obj("TableName" -> table, "Key" -> keyAv(key),
        "ConsistentRead" -> true)).get("Item").map { item =>
        java.util.Base64.getDecoder.decode(Json.str(Json.asObj(Json.asObj(item)(dataKey)), "B"))
      }

    def set(key: String, value: Array[Byte], ttlMs: Long = 0): Unit = {
      c.callOk("PutItem", Json.obj("TableName" -> table, "Item" -> itemFor(key, value, ttlMs))); ()
    }

    def add(key: String, value: Array[Byte], ttlMs: Long = 0): Boolean =
      c.call("PutItem", Json.obj("TableName" -> table, "Item" -> itemFor(key, value, ttlMs),
        "ConditionExpression" -> s"attribute_not_exists(#k)",
        "ExpressionAttributeNames" -> Json.obj("#k" -> hashKey))) match {
        case Right(_) => true
        case Left(e) if e.contains("ConditionalCheckFailedException") => false
        case Left(e) => throw new IllegalArgumentException(s"PutItem: $e")
      }

    def delete(key: String): Unit = {
      c.callOk("DeleteItem", Json.obj("TableName" -> table, "Key" -> keyAv(key))); ()
    }
    override def close(): Unit = c.close()
  }
}

/** AWS Lambda `Invoke` (impl/aws/processor_lambda.go): the message body
  * is the request payload, the invocation result REPLACES the content,
  * and a function-side error surfaces as the error payload plus a
  * `lambda_function_error` metadata marker (X-Amz-Function-Error). The
  * REST shape is the public Invoke API:
  * POST /2015-03-31/functions/{name}/invocations.
  */
object Lambda {

  /** fixture: named functions are server-side payload transforms;
    * Left(msg) models a function that threw (Unhandled error). */
  final class MiniLambda(functions: Map[String, Array[Byte] => Either[String, Array[Byte]]],
                         creds: SigV4.Credentials = Aws.testCreds)
      extends MiniAwsService("lambda", creds) {
    protected def handle(method: String, path: String, query: String,
                         headers: Map[String, String], body: Array[Byte]): (Int, Seq[(String, String)], Array[Byte]) = {
      val re = "/2015-03-31/functions/([^/]+)/invocations".r
      path match {
        case re(name) => functions.get(name) match {
          case Some(f) => f(body) match {
            case Right(out) => (200, Seq("Content-Type" -> "application/json"), out)
            case Left(errMsg) =>
              // function-level failure: HTTP 200 + X-Amz-Function-Error (public contract)
              (200, Seq("Content-Type" -> "application/json", "X-Amz-Function-Error" -> "Unhandled"),
                Aws.Json.render(Aws.Json.obj("errorMessage" -> errMsg, "errorType" -> "Error")).getBytes(UTF_8))
          }
          case None => (404, Nil, Aws.Json.render(Aws.Json.obj(
            "Message" -> s"Function not found: $name")).getBytes(UTF_8))
        }
        case _ => (400, Nil, Array.emptyByteArray)
      }
    }
  }

  final case class Result(payload: Array[Byte], functionError: Option[String])

  final class Client(endpoint: String, creds: SigV4.Credentials = Aws.testCreds,
                     region: String = Aws.testRegion) extends AutoCloseable {
    private val aws = new AwsHttp(endpoint, region, "lambda", creds)
    def invoke(function: String, payload: Array[Byte]): Result = {
      val r = aws.request("POST",
        s"/2015-03-31/functions/${SigV4.uriEncode(function, encodeSlash = true)}/invocations",
        body = payload)
      require(r.status == 200, s"Invoke $function: ${r.status} ${r.bodyStr}")
      Result(r.body, r.header("x-amz-function-error"))
    }
    override def close(): Unit = aws.close()
  }
}
