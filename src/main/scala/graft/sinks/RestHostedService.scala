package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.Row
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DataType, StructType}

import graft.core.{RetryPolicy, WriteMode}

/** HTTP implementation of the sink seam — the production counterpart of
  * [[HostedStore]], speaking the portal protocol served by
  * [[LocalPortalServer]] (and shaped after the remote REST surface the
  * reference drives: search-by-title, addItem/publish, truncate,
  * addToDefinition(indexes), paged query, batched append —
  * `/root/reference/src/agol_pandas.py:246,293,395,445,519,592`).
  *
  * Executor-side usage: `queryPage` and `appendBatch` are called from
  * read/write tasks — each task issues its own HTTP call (the paged-read
  * and batched-write parallelism the reference lacked), with `retry`
  * providing the reference's jittered backoff (`src/agol_pandas.py:8-43`)
  * locally per task, not via global mutable state. The class is
  * serializable-free by design: tasks construct it from connector options
  * (url + token), never ship it.
  *
  * Error contract: transport errors and 5xx retry under the policy; 4xx
  * surface immediately (a bad request never heals); 404 on lookups maps to
  * None/false, mirroring the in-process fake's semantics.
  */
class RestHostedService(portalUrl: String, token: String,
                        retry: RetryPolicy = RetryPolicy(maxBackoffSec = 2.0))
    extends HostedTableSink {

  private val base = portalUrl.stripSuffix("/")
  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  /** One retried HTTP exchange. Returns None for 404 when `allow404`. */
  private def call(method: String, path: String, body: Option[JsonNode],
                   allow404: Boolean = false): Option[JsonNode] = {
    val attempt: () => Option[JsonNode] = () => {
      val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
        .timeout(Duration.ofSeconds(60))
        .header("X-Portal-Token", token)
        .header("Content-Type", "application/json")
      val req = (method match {
        case "GET"    => b.GET()
        case "DELETE" => b.DELETE()
        case m => b.method(m, body match {
          case Some(j) => HttpRequest.BodyPublishers.ofString(PortalJson.write(j))
          case None    => HttpRequest.BodyPublishers.noBody()
        })
      }).build()
      val resp: HttpResponse[String] = client.send(req, HttpResponse.BodyHandlers.ofString())
      resp.statusCode() match {
        case 200 | 201 =>
          Some(PortalJson.parse(resp.body()))
        case 404 if allow404 => None
        case c if c >= 500 =>
          throw new java.io.IOException(s"portal $c on $method $path: ${resp.body()}")
        case c =>
          throw new IllegalArgumentException(s"portal $c on $method $path: ${resp.body()}")
      }
    }
    // 4xx (IllegalArgumentException) is a contract violation that will
    // never heal — surface immediately; only transport/5xx retry.
    retry.retry(attempt(), retryOn = !_.isInstanceOf[IllegalArgumentException]) match {
      case Right(r)                          => r
      case Left(e: RuntimeException)         => throw e
      case Left(e)                           => throw new RuntimeException(e)
    }
  }

  private def get(path: String, allow404: Boolean = false): Option[JsonNode] =
    call("GET", path, None, allow404)
  private def post(path: String, body: JsonNode): JsonNode =
    call("POST", path, Some(body)).get

  override def resolveByTitle(title: String): Option[String] =
    get(s"/search?title=${java.net.URLEncoder.encode(title, "UTF-8")}", allow404 = true)
      .map(_.get("id").asText())

  override def create(title: String, schema: StructType,
                      properties: Map[String, String]): String = {
    val b = PortalJson.obj()
    b.put("title", title)
    b.put("schema", schema.json)
    b.set[JsonNode]("properties", PortalJson.encodeStringMap(properties))
    post("/items", b).get("id").asText()
  }

  override def truncate(itemId: String): Unit = {
    post(s"/items/$itemId/truncate", PortalJson.obj()); ()
  }

  override def addUniqueIndex(itemId: String, field: String): String = {
    val b = PortalJson.obj(); b.put("field", field)
    post(s"/items/$itemId/indexes", b).get("name").asText()
  }

  override def fieldHasUniqueIndex(itemId: String, field: String): Boolean =
    get(s"/items/$itemId/indexes/$field").exists(_.get("visible").asBoolean())

  override def setProperties(itemId: String, props: Map[String, String]): Unit = {
    post(s"/items/$itemId/properties", PortalJson.encodeStringMap(props)); ()
  }

  override def propertiesOf(itemId: String): Map[String, String] =
    PortalJson.decodeStringMap(get(s"/items/$itemId/properties").get)

  override def queryCount(itemId: String, filters: Array[Filter]): Long = {
    val b = PortalJson.obj()
    b.set[JsonNode]("filters", PortalJson.encodeFilters(filters))
    post(s"/items/$itemId/count", b).get("count").asLong()
  }

  override def queryPage(itemId: String, offset: Long, count: Long,
                         requiredCols: Array[String],
                         filters: Array[Filter]): Iterator[Row] = {
    val b = PortalJson.obj()
    b.put("offset", offset).put("count", count)
    val cols = PortalJson.arr(); requiredCols.foreach(cols.add); b.set[JsonNode]("cols", cols)
    b.set[JsonNode]("filters", PortalJson.encodeFilters(filters))
    post(s"/items/$itemId/query", b).get("rows")
      .elements().asScala.map(PortalJson.decodeRow)
  }

  override def appendBatch(itemId: String, batch: Seq[Row], mode: WriteMode,
                           key: Option[String], batchId: Option[String]): Long = {
    val b = PortalJson.obj()
    b.put("mode", mode.name)
    key.foreach(b.put("key", _))
    batchId.foreach(b.put("batchId", _))
    val rows = PortalJson.arr(); batch.foreach(r => rows.add(PortalJson.encodeRow(r)))
    b.set[JsonNode]("rows", rows)
    post(s"/items/$itemId/append", b).get("affected").asLong()
  }

  override def deleteByKey(itemId: String, keyField: String, keys: Seq[Any],
                           batchId: Option[String]): Long = {
    val b = PortalJson.obj()
    b.put("keyField", keyField)
    batchId.foreach(b.put("batchId", _))
    val ks = PortalJson.arr(); keys.foreach(k => ks.add(PortalJson.encodeValue(k)))
    b.set[JsonNode]("keys", ks)
    post(s"/items/$itemId/deleteByKey", b).get("affected").asLong()
  }

  override def stageBatch(itemId: String, partKey: String, attemptId: Long,
                          chunkId: Int, batch: Seq[Row]): Unit = {
    val b = PortalJson.obj()
    b.put("partKey", partKey).put("attemptId", attemptId).put("chunkId", chunkId)
    val rows = PortalJson.arr(); batch.foreach(r => rows.add(PortalJson.encodeRow(r)))
    b.set[JsonNode]("rows", rows)
    post(s"/items/$itemId/stage", b); ()
  }

  override def commitStaged(itemId: String, partKey: String, attemptId: Long,
                            mode: WriteMode, key: Option[String]): Long = {
    val b = PortalJson.obj()
    b.put("partKey", partKey).put("attemptId", attemptId).put("mode", mode.name)
    key.foreach(b.put("key", _))
    post(s"/items/$itemId/commitStaged", b).get("affected").asLong()
  }

  override def discardStaged(itemId: String, partKey: String, attemptId: Long): Unit = {
    val b = PortalJson.obj()
    b.put("partKey", partKey).put("attemptId", attemptId)
    post(s"/items/$itemId/discardStaged", b); ()
  }

  override def queryMinMax(itemId: String, filters: Array[Filter],
                           field: String, isMin: Boolean): Any = {
    val b = PortalJson.obj()
    b.put("field", field).put("op", if (isMin) "min" else "max")
    b.set[JsonNode]("filters", PortalJson.encodeFilters(filters))
    PortalJson.decodeValue(post(s"/items/$itemId/stats", b).get("value"))
  }

  override def queryGroupedStats(itemId: String, filters: Array[Filter],
                                 groupFields: Seq[String],
                                 specs: Seq[(String, Option[String])]): Seq[Row] = {
    val b = PortalJson.obj()
    val gf = PortalJson.arr(); groupFields.foreach(gf.add); b.set[JsonNode]("groupFields", gf)
    val sp = PortalJson.arr()
    specs.foreach { case (op, fld) =>
      val s = PortalJson.obj(); s.put("op", op); fld.foreach(s.put("field", _)); sp.add(s)
    }
    b.set[JsonNode]("specs", sp)
    b.set[JsonNode]("filters", PortalJson.encodeFilters(filters))
    post(s"/items/$itemId/groupedStats", b).get("rows")
      .elements().asScala.map(PortalJson.decodeRow).toSeq
  }

  override def exists(itemId: String): Boolean =
    get(s"/items/$itemId", allow404 = true).isDefined

  override def schemaOf(itemId: String): StructType =
    DataType.fromJson(get(s"/items/$itemId").get.get("schema").asText())
      .asInstanceOf[StructType]

  override def titles: Seq[String] =
    get("/items").get.get("titles").elements().asScala.map(_.asText()).toSeq

  override def drop(itemId: String): Boolean =
    call("DELETE", s"/items/$itemId", None).get.get("existed").asBoolean()
}
