package graft.sinks

import java.util.Base64

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.Row
import org.apache.spark.sql.sources._

/** Wire codec for the hosted-portal HTTP protocol spoken between
  * [[RestHostedService]] (client) and [[LocalPortalServer]] (in-process
  * double). Values are *type-tagged* JSON objects (`{"t":"i64","v":"…"}`)
  * so rows and filter constants decode without consulting the schema —
  * the same self-describing shape ArcGIS-style REST services use for
  * feature attributes. Schemas travel as Spark's own `StructType.json`.
  *
  * Uses Jackson's tree API (on Spark's classpath) — no data-binding, no
  * extra dependencies.
  */
object PortalJson {
  val mapper = new ObjectMapper()

  def obj(): ObjectNode = mapper.createObjectNode()
  def arr(): ArrayNode = mapper.createArrayNode()
  def parse(s: String): JsonNode = mapper.readTree(s)
  def write(n: JsonNode): String = mapper.writeValueAsString(n)

  // ------------------------------------------------------------- values

  /** Encode one external-Row value. Longs ride as strings (JSON numbers
    * lose precision past 2^53 in sloppy intermediaries); doubles as JSON
    * numbers (Jackson round-trips them bit-exactly).
    */
  def encodeValue(v: Any): ObjectNode = {
    val n = obj()
    v match {
      case null                  => n.put("t", "null")
      case x: java.lang.Boolean  => n.put("t", "bool").put("v", x.booleanValue())
      case x: java.lang.Byte     => n.put("t", "i8").put("v", x.toString)
      case x: java.lang.Short    => n.put("t", "i16").put("v", x.toString)
      case x: java.lang.Integer  => n.put("t", "i32").put("v", x.toString)
      case x: java.lang.Long     => n.put("t", "i64").put("v", x.toString)
      // Non-finite floats ride as strings — as bare JSON numbers Jackson
      // would write them in a form the tree reader hands back as a text
      // node whose numeric accessors return 0.0 (silent corruption).
      case x: java.lang.Float =>
        if (java.lang.Float.isFinite(x)) n.put("t", "f32").put("v", x.floatValue())
        else n.put("t", "f32").put("v", x.toString)
      case x: java.lang.Double =>
        if (java.lang.Double.isFinite(x)) n.put("t", "f64").put("v", x.doubleValue())
        else n.put("t", "f64").put("v", x.toString)
      case x: String             => n.put("t", "str").put("v", x)
      case x: java.math.BigDecimal => n.put("t", "dec").put("v", x.toString)
      case x: BigDecimal         => n.put("t", "dec").put("v", x.underlying.toString)
      case x: java.sql.Timestamp =>
        // epoch micros preserves Spark's TimestampType precision; floor
        // division — getTime/1000 truncates toward zero, shifting
        // pre-epoch fractional-second values forward a full second
        n.put("t", "ts").put("v",
          (Math.floorDiv(x.getTime, 1000L) * 1000000L + x.getNanos / 1000L).toString)
      case x: java.time.Instant =>
        n.put("t", "ts").put("v",
          (x.getEpochSecond * 1000000L + x.getNano / 1000L).toString)
      case x: java.sql.Date      => n.put("t", "date").put("v", x.toLocalDate.toEpochDay.toString)
      case x: java.time.LocalDate => n.put("t", "date").put("v", x.toEpochDay.toString)
      case x: Array[Byte]        => n.put("t", "bin").put("v", Base64.getEncoder.encodeToString(x))
      case x: scala.collection.Seq[_] =>
        val a = arr(); x.foreach(e => a.add(encodeValue(e))); n.put("t", "seq"); n.set("v", a); n
      case x: Array[_] =>
        val a = arr(); x.foreach(e => a.add(encodeValue(e))); n.put("t", "seq"); n.set("v", a); n
      case x: Row =>
        val a = arr(); x.toSeq.foreach(e => a.add(encodeValue(e))); n.put("t", "row"); n.set("v", a); n
      case other => throw new IllegalArgumentException(
        s"unsupported portal value type: ${other.getClass.getName}")
    }
    n
  }

  /** Decode to the canonical external types Spark's Row converters accept
    * (java.sql.Timestamp / java.sql.Date on the temporal side).
    */
  def decodeValue(n: JsonNode): Any = n.get("t").asText() match {
    case "null" => null
    case "bool" => n.get("v").asBoolean()
    case "i8"   => n.get("v").asText().toByte
    case "i16"  => n.get("v").asText().toShort
    case "i32"  => n.get("v").asText().toInt
    case "i64"  => n.get("v").asText().toLong
    case "f32" =>
      val v = n.get("v")
      if (v.isTextual) java.lang.Float.parseFloat(v.asText()) else v.floatValue()
    case "f64" =>
      val v = n.get("v")
      if (v.isTextual) java.lang.Double.parseDouble(v.asText()) else v.doubleValue()
    case "str"  => n.get("v").asText()
    case "dec"  => new java.math.BigDecimal(n.get("v").asText())
    case "ts" =>
      val micros = n.get("v").asText().toLong
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case "date" => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(n.get("v").asText().toLong))
    case "bin"  => Base64.getDecoder.decode(n.get("v").asText())
    case "seq"  => n.get("v").elements().asScala.map(decodeValue).toSeq
    case "row"  => Row.fromSeq(n.get("v").elements().asScala.map(decodeValue).toSeq)
    case t      => throw new IllegalArgumentException(s"unknown portal value tag '$t'")
  }

  def encodeRow(r: Row): ArrayNode = {
    val a = arr()
    r.toSeq.foreach(v => a.add(encodeValue(v)))
    a
  }

  def decodeRow(n: JsonNode): Row =
    Row.fromSeq(n.elements().asScala.map(decodeValue).toSeq)

  // ------------------------------------------------------------ filters

  /** Structural encoding of the supported source-filter algebra (the
    * subset [[FilterEval.supports]] admits — the connector never pushes
    * anything else over the seam).
    */
  def encodeFilter(f: Filter): ObjectNode = {
    val n = obj()
    def leaf(op: String, attr: String, v: Any): ObjectNode = {
      n.put("op", op).put("attr", attr); n.set("value", encodeValue(v)); n
    }
    f match {
      case EqualTo(a, v)            => leaf("eq", a, v)
      case GreaterThan(a, v)        => leaf("gt", a, v)
      case GreaterThanOrEqual(a, v) => leaf("ge", a, v)
      case LessThan(a, v)           => leaf("lt", a, v)
      case LessThanOrEqual(a, v)    => leaf("le", a, v)
      case In(a, vs) =>
        n.put("op", "in").put("attr", a)
        val arr0 = arr(); vs.foreach(v => arr0.add(encodeValue(v))); n.set("values", arr0); n
      case IsNull(a)              => n.put("op", "isnull").put("attr", a)
      case IsNotNull(a)           => n.put("op", "isnotnull").put("attr", a)
      case StringStartsWith(a, p) => n.put("op", "startswith").put("attr", a).put("s", p)
      case StringEndsWith(a, p)   => n.put("op", "endswith").put("attr", a).put("s", p)
      case StringContains(a, p)   => n.put("op", "contains").put("attr", a).put("s", p)
      case And(l, r) => n.put("op", "and"); n.set("l", encodeFilter(l)); n.set("r", encodeFilter(r)); n
      case Or(l, r)  => n.put("op", "or"); n.set("l", encodeFilter(l)); n.set("r", encodeFilter(r)); n
      case Not(c)    => n.put("op", "not"); n.set("c", encodeFilter(c)); n
      case other => throw new IllegalArgumentException(s"unsupported filter $other")
    }
  }

  def decodeFilter(n: JsonNode): Filter = {
    def attr = n.get("attr").asText()
    def value = decodeValue(n.get("value"))
    n.get("op").asText() match {
      case "eq" => EqualTo(attr, value)
      case "gt" => GreaterThan(attr, value)
      case "ge" => GreaterThanOrEqual(attr, value)
      case "lt" => LessThan(attr, value)
      case "le" => LessThanOrEqual(attr, value)
      case "in" => In(attr, n.get("values").elements().asScala.map(decodeValue).toArray)
      case "isnull"     => IsNull(attr)
      case "isnotnull"  => IsNotNull(attr)
      case "startswith" => StringStartsWith(attr, n.get("s").asText())
      case "endswith"   => StringEndsWith(attr, n.get("s").asText())
      case "contains"   => StringContains(attr, n.get("s").asText())
      case "and" => And(decodeFilter(n.get("l")), decodeFilter(n.get("r")))
      case "or"  => Or(decodeFilter(n.get("l")), decodeFilter(n.get("r")))
      case "not" => Not(decodeFilter(n.get("c")))
      case op    => throw new IllegalArgumentException(s"unknown filter op '$op'")
    }
  }

  def encodeFilters(fs: Array[Filter]): ArrayNode = {
    val a = arr(); fs.foreach(f => a.add(encodeFilter(f))); a
  }

  def decodeFilters(n: JsonNode): Array[Filter] =
    n.elements().asScala.map(decodeFilter).toArray

  // -------------------------------------------------------------- maps

  def encodeStringMap(m: Map[String, String]): ObjectNode = {
    val n = obj(); m.foreach { case (k, v) => n.put(k, v) }; n
  }

  def decodeStringMap(n: JsonNode): Map[String, String] =
    n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
}
