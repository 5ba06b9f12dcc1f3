package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The validated predicate-spec layer (SURVEY §2.2, P14): the engine's
  * analog of the reference's `RestrictedQueryMixin`
  * (/root/reference/tantalus/api/views.py:53-82) + per-entity FilterSet
  * declarations (/root/reference/tantalus/api/filters.py): every entity
  * declares exactly which (field, lookup) pairs are legal; anything else
  * is rejected before planning.
  */
object Predicates {

  sealed abstract class Lookup(val name: String)
  object Lookup {
    case object Exact       extends Lookup("exact")
    case object In          extends Lookup("in")
    case object StartsWith  extends Lookup("startswith")
    case object IStartsWith extends Lookup("istartswith")
    case object EndsWith    extends Lookup("endswith")
    case object Contains    extends Lookup("contains")
    case object IContains   extends Lookup("icontains")
    case object IsNull      extends Lookup("isnull")
    case object Lte         extends Lookup("lte")
    case object Gte         extends Lookup("gte")
  }
  import Lookup._

  /** One `field__lookup=value` predicate. */
  final case class Pred(field: String, lookup: Lookup, value: Any = null)

  /** Rejection analog of the reference's APIException on unknown params. */
  final class UnknownFilterException(msg: String) extends IllegalArgumentException(msg)

  /** Validate specs against an entity's allowlist; throws on any
    * undeclared (field, lookup) — mirrors RestrictedQueryMixin.
    */
  def validate(allowed: Map[String, Set[Lookup]], preds: Seq[Pred]): Unit =
    preds.foreach { p =>
      if (!allowed.get(p.field).exists(_.contains(p.lookup)))
        throw new UnknownFilterException(
          s"filter ${p.field}__${p.lookup.name} is not declared for this entity")
    }

  /** Compile one predicate to a Column expression. */
  def toColumn(p: Pred): Column = {
    val c = col(p.field)
    p.lookup match {
      case Exact       => c === lit(p.value)
      case In          => c.isin(p.value.asInstanceOf[Seq[Any]]: _*)
      case StartsWith  => c.startsWith(p.value.toString)
      case IStartsWith => lower(c).startsWith(p.value.toString.toLowerCase)
      case EndsWith    => c.endsWith(p.value.toString)
      case Contains    => c.contains(p.value.toString)
      case IContains   => lower(c).contains(p.value.toString.toLowerCase)
      case IsNull      => if (p.value == true) c.isNull else c.isNotNull
      case Lte         => c <= lit(p.value)
      case Gte         => c >= lit(p.value)
    }
  }

  /** Validate then apply: AND of all predicates (Django filter chain). */
  def apply(df: DataFrame, allowed: Map[String, Set[Lookup]], preds: Seq[Pred]): DataFrame = {
    validate(allowed, preds)
    if (preds.isEmpty) df else df.filter(preds.map(toColumn).reduce(_ && _))
  }
}
