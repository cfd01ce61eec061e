package graft.engine

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.types._

/** S11: dtype-map JSON ↔ `StructType` (reference
  * `filestorage_helper.py:159-176`, applied at `transform.py:272-289`).
  *
  * The reference persists schemas as a flat JSON object of
  * `column name → pandas dtype string` (e.g. `"float64"`,
  * `"datetime64[ns]"`). We keep that exact wire format for config fidelity
  * and map it onto Spark types; Jackson comes from Spark's own classpath.
  */
object SchemaIO {
  private val mapper = new ObjectMapper()

  def toSparkType(dtype: String): DataType = dtype match {
    case "float64" | "float32" | "float"        => DoubleType
    case "int64" | "Int64" | "int32" | "int"    => LongType
    case s if s.startsWith("datetime64")        => TimestampType
    case "bool" | "boolean"                     => BooleanType
    case _                                      => StringType // object/string/category
  }

  def toPandasDtype(dt: DataType): String = dt match {
    case DoubleType | FloatType                    => "float64"
    case LongType | IntegerType | ShortType        => "int64"
    case _: DecimalType                            => "float64"
    case TimestampType | DateType                  => "datetime64[ns]"
    case BooleanType                               => "bool"
    case _                                         => "string"
  }

  /** Parse `{col: dtype}` JSON into a StructType, preserving column order. */
  def schemaFromDtypeJson(json: String): StructType = {
    val m = mapper.readValue(json, classOf[java.util.LinkedHashMap[String, String]])
    StructType(m.asScala.toSeq.map { case (n, t) => StructField(n, toSparkType(t)) })
  }

  def schemaToDtypeJson(schema: StructType): String = {
    val node = mapper.createObjectNode()
    schema.fields.foreach(f => node.put(f.name, toPandasDtype(f.dataType)))
    mapper.writeValueAsString(node)
  }

  /** Schema drift between two schemas (e.g. yesterday's persisted dtype
    * JSON vs today's landed batch): added / removed / type-changed
    * columns, name-keyed and order-insensitive. The pre-flight check an
    * ingest pipeline runs BEFORE the coercing schema apply — silent
    * upstream drift (a renamed column, an int that became a string)
    * surfaces as an explicit diff instead of a column of nulls.
    * Pure metadata — no jobs, no data read. */
  final case class SchemaDiff(
      added: Seq[(String, String)],
      removed: Seq[(String, String)],
      typeChanged: Seq[(String, String, String)]) {
    def isEmpty: Boolean =
      added.isEmpty && removed.isEmpty && typeChanged.isEmpty
  }

  def diffSchemas(before: StructType, after: StructType): SchemaDiff = {
    val b = before.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val a = after.fields.map(f => f.name -> f.dataType.simpleString).toMap
    SchemaDiff(
      added = after.fields.collect {
        case f if !b.contains(f.name) => f.name -> f.dataType.simpleString
      }.toSeq.sortBy(_._1),
      removed = before.fields.collect {
        case f if !a.contains(f.name) => f.name -> f.dataType.simpleString
      }.toSeq.sortBy(_._1),
      typeChanged = before.fields.collect {
        case f if a.contains(f.name) && a(f.name) != f.dataType.simpleString =>
          (f.name, f.dataType.simpleString, a(f.name))
      }.toSeq.sortBy(_._1))
  }

  def save(schema: StructType, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      schemaToDtypeJson(schema))

  def load(path: String): StructType =
    schemaFromDtypeJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  /** The reference's six-entity gold-model contract
    * (`config/schema_golden_data_api_old.json`, data not code: column
    * names/types/defaults ARE the interface a reference user's config
    * carries), bundled so `Entities.splitAll` can consume it unchanged. */
  def referenceGoldEntities: Seq[Entities.EntitySpec] = {
    val in = getClass.getResourceAsStream("/schema_golden_data.json")
    require(in != null, "bundled schema_golden_data.json missing")
    val json = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    entitiesFromConfigJson(json)
  }

  /** Parse the reference's golden-entity config
    * (`config/schema_golden_data_api_old.json`, read at
    * `transform.py:215-236`): `{"schema-<entity>": {"cols": {name:
    * {type, default}}, "required": [...]}}`. */
  def entitiesFromConfigJson(json: String): Seq[Entities.EntitySpec] = {
    val root = mapper.readTree(json)
    root.properties().asScala.toSeq.map { e =>
      val name = e.getKey.stripPrefix("schema-")
      val colsNode = e.getValue.path("cols")
      val cols = colsNode.properties().asScala.toSeq.map { c =>
        val tpe = c.getValue.path("type").asText("string")
        val defNode = c.getValue.path("default")
        val default: Any =
          if (defNode.isMissingNode || defNode.isNull) "N/C"
          else if (defNode.isNumber) defNode.asDouble()
          else defNode.asText()
        c.getKey -> Entities.ColSpec(tpe, default)
      }
      val required = e.getValue.path("required").elements().asScala
        .map(_.asText()).toSeq
      Entities.EntitySpec(name, cols, required)
    }
  }
}
