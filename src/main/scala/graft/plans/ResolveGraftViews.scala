package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier

/** Resolution rule: FULLY-QUALIFIED references to GraftCatalog VIEWS
  * (`cat.ns.v`) substitute their stored SQL into the plan — the
  * analyzer extension that makes the V2 ViewCatalog readable, since
  * Spark's built-in resolution does not consult ViewCatalog for
  * relations (the same gap the Iceberg Spark extensions fill with
  * their ResolveViews rule).
  *
  * Contract (enforced at create_view): every relation inside a stored
  * view is itself catalog-qualified, so re-parsing under ANY session
  * context resolves identically. Column aliases project the stored
  * query column names. Nested views resolve through repeated rule
  * application (the analyzer's fixpoint); a self-referencing cycle
  * grows until the analyzer's iteration cap and fails loudly rather
  * than looping forever. Only 3+-part names are considered — a 1/2-part
  * name belongs to the session catalog's own resolution.
  */
case class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation if u.multipartIdentifier.length >= 3 =>
      lookup(u.multipartIdentifier).map { v =>
        val parsed = spark.sessionState.sqlParser.parsePlan(v.query())
        val aliases = Option(v.columnAliases()).getOrElse(Array.empty[String])
        val qcols = Option(v.queryColumnNames()).getOrElse(Array.empty[String])
        val body =
          if (aliases.nonEmpty && qcols.length == aliases.length &&
              !qcols.sameElements(aliases)) {
            Project(qcols.zip(aliases).map { case (q, a) =>
              Alias(UnresolvedAttribute.quoted(q), a)()
            }.toIndexedSeq, parsed)
          } else parsed
        SubqueryAlias(u.multipartIdentifier.last, body)
      }.getOrElse(u)
  }

  private def lookup(parts: Seq[String])
      : Option[org.apache.spark.sql.connector.catalog.View] =
    try {
      spark.sessionState.catalogManager.catalog(parts.head) match {
        case g: graft.sources.GraftCatalog =>
          val ident = Identifier.of(parts.tail.init.toArray, parts.last)
          if (g.viewExists(ident)) Some(g.loadView(ident)) else None
        case _ => None
      }
    } catch { case _: Exception => None }
}
