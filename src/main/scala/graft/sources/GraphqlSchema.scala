package graft.sources

import scala.util.matching.Regex

/** GraphQL entity-schema model + parser (SURVEY.md §1 stage 4;
  * reference schema/entities.go:12-57,138-227).
  *
  * The reference derives an `EntityDesc` per `@entity` object type from
  * the subgraph's GraphQL schema: typed fields
  * (ID/String/Int/Float/Boolean/BigInt/BigDecimal/Bytes, plus
  * list-of-T and nullability from `!`), `@derivedFrom` fields skipped,
  * `@entity(immutable: true)` marking append-only entities, and all
  * names normalized to snake_case.
  *
  * This parser covers that subset of the SDL grammar (object types,
  * field defs, list/non-null wrappers, the two directives) — enough to
  * load every schema shape the reference's own pipeline handles, with
  * no external parser dependency.
  */
object GraphqlSchema {

  sealed abstract class FieldType(val name: String)
  object FieldType {
    case object Id         extends FieldType("ID")
    case object Str        extends FieldType("String")
    case object Int32      extends FieldType("Int")
    case object Float64    extends FieldType("Float")
    case object Bool       extends FieldType("Boolean")
    case object BigInt     extends FieldType("BigInt")
    case object BigDecimal extends FieldType("BigDecimal")
    case object Bytes      extends FieldType("Bytes")

    /** Unknown names are entity references, stored as ID (reference
      * entities.go toFieldType default). */
    def of(s: String): FieldType = s match {
      case "ID" => Id
      case "String" => Str
      case "Int" => Int32
      case "Float" => Float64
      case "Boolean" => Bool
      case "BigInt" => BigInt
      case "BigDecimal" => BigDecimal
      case "Bytes" => Bytes
      case _ => Id
    }
  }

  /** One entity field: snake_cased name, scalar type, wrappers. */
  case class Field(name: String, fieldType: FieldType, nullable: Boolean, array: Boolean)

  /** One `@entity` type: snake_cased name, fields by name, orderedFields
    * = name-sorted (reference entities.go OrderedFields). */
  case class EntityDesc(name: String, fields: Map[String, Field], immutable: Boolean) {
    def orderedFields: Seq[Field] = fields.values.toSeq.sortBy(_.name)
  }

  /** Scala-side snake_case for schema/field names — full strcase parity
    * with the reference's configured caser
    * ([[graft.functions.Normalize.toSnakeExact]], schema/normalize.go).
    * The column expression [[graft.functions.Normalize.toSnake]] stays
    * on the documented oracle-portable subset; names the two disagree
    * on (digit boundaries, delimiters) only arise in schema text, which
    * is normalized here. */
  def toSnake(s: String): String = graft.functions.Normalize.toSnakeExact(s)

  private val TypeRe: Regex =
    """(?s)type\s+(\w+)([^{]*)\{(.*?)\}""".r
  private val EntityDirRe: Regex = """@entity(\s*\(([^)]*)\))?""".r
  private val FieldRe: Regex =
    """(?m)^\s*(\w+)\s*:\s*(\[?\s*\w+\s*!?\s*\]?\s*!?)\s*(@\w+(\s*\([^)]*\))?)?\s*$""".r

  /** The synthetic proof-of-indexing entity graph-node stores beside
    * user entities (reference schema/const.go:3, entities.go:108-124):
    * every schema implicitly carries `poi2$(id: ID!, digest: Bytes!)`. */
  val PoiEntityName = "poi2$"
  val poiEntity: EntityDesc = EntityDesc(PoiEntityName, Map(
    "id" -> Field("id", FieldType.Id, nullable = false, array = false),
    "digest" -> Field("digest", FieldType.Bytes, nullable = false, array = false)
  ), immutable = false)

  /** The reference's GetEntitiesFromSchema: the parsed entities plus
    * the implicit poi2$ (entities.go:104-124). */
  def parseWithPoi(sdl: String): Seq[EntityDesc] = parse(sdl) :+ poiEntity

  /** `list-entities` parity (reference list-entities.go:25-33): the
    * names a tocsv run must process, poi2$ included. */
  def entityNames(sdl: String): Seq[String] = parseWithPoi(sdl).map(_.name)

  /** Parse every `@entity` type out of an SDL document. */
  def parse(sdl: String): Seq[EntityDesc] = {
    val noComments = sdl.linesIterator.map(l => l.takeWhile(_ != '#')).mkString("\n")
    TypeRe.findAllMatchIn(noComments).flatMap { m =>
      val (typeName, header, body) = (m.group(1), m.group(2), m.group(3))
      EntityDirRe.findFirstMatchIn(header).map { dir =>
        val immutable = Option(dir.group(2)).exists(_.contains("immutable"))
        val fields = FieldRe.findAllMatchIn(body).flatMap { fm =>
          val (fname, ftype, fdir) = (fm.group(1), fm.group(2), Option(fm.group(3)))
          if (fdir.exists(_.startsWith("@derivedFrom"))) None // reference skips these
          else Some(parseField(fname, ftype))
        }.toSeq
        EntityDesc(toSnake(typeName), fields.map(f => f.name -> f).toMap, immutable)
      }
    }.toSeq
  }

  /** `[T!]!` wrappers → (array, element/field nullability); for arrays
    * the reference takes nullability from the ELEMENT type
    * (entities.go:193-197). */
  private def parseField(rawName: String, rawType: String): Field = {
    val t = rawType.replaceAll("\\s", "")
    val array = t.startsWith("[")
    val nullable =
      if (array) !t.stripPrefix("[").takeWhile(_ != ']').endsWith("!")
      else !t.endsWith("!")
    val scalar = t.replaceAll("[\\[\\]!]", "")
    Field(toSnake(rawName), FieldType.of(scalar), nullable, array)
  }
}
