package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  ExprId, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Column-level lineage lifted from a query's ANALYZED plan (no
  * execution): every output column maps to the set of source
  * (table, column) pairs that contribute to it, tagged with HOW the
  * value travels — `direct` (pure attribute chain), `expression`
  * (row-local computation), `aggregate`, `window`, or `generator`
  * (explode-family fan-out).
  *
  * The governance primitive every warehouse grows eventually: impact
  * analysis ("which dashboards break if l_discount changes semantics"),
  * PII propagation ("does user_id reach this export"), and audit
  * evidence — here it costs one plan traversal, driver-side, output
  * rows ∝ columns not data. The reference has no counterpart; this is
  * the Spark-native bonus of owning the logical plan.
  *
  * Provenance folds bottom-up over the plan: relation outputs seed
  * themselves, Project/Aggregate/Window/Generate aliases union their
  * children's provenance and escalate the `via` tag (direct <
  * expression < generator < window < aggregate); joins, filters, and
  * the rest pass attributes through untouched. Set-ops union
  * positionally.
  */
object Lineage {

  private val ViaRank = Map("direct" -> 0, "expression" -> 1,
    "generator" -> 2, "window" -> 3, "aggregate" -> 4)

  private case class Src(table: String, col: String, via: String)

  private def escalate(s: Src, via: String): Src =
    if (ViaRank(via) > ViaRank(s.via)) s.copy(via = via) else s

  def columnLineage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val prov = scala.collection.mutable.Map[ExprId, Set[Src]]()

    def relName(l: LogicalRelation): String = l.relation match {
      case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        fs.location.rootPaths.headOption.map(_.getName.stripSuffix(".parquet"))
          .getOrElse("unknown")
      case other => other.getClass.getSimpleName
    }

    def exprSources(ex: Expression): Set[Src] = {
      val hasAgg = ex.exists(_.isInstanceOf[AggregateExpression])
      val isDirect = ex.isInstanceOf[AttributeReference]
      val baseVia = if (hasAgg) "aggregate"
        else if (isDirect) "direct" else "expression"
      ex.references.toSeq.flatMap(r => prov.getOrElse(r.exprId, Set.empty))
        .map(escalate(_, baseVia)).toSet
    }

    def addNamed(nes: Seq[NamedExpression], forceVia: Option[String]): Unit =
      nes.foreach {
        case _: AttributeReference => () // passthrough, provenance kept
        case al: Alias =>
          val srcs = exprSources(al.child)
          prov(al.exprId) =
            forceVia.map(v => srcs.map(escalate(_, v))).getOrElse(srcs)
        case ne =>
          prov(ne.exprId) = exprSources(ne)
      }

    df.queryExecution.analyzed.foreachUp {
      case l: LogicalRelation =>
        val t = relName(l)
        l.output.foreach(a => prov(a.exprId) = Set(Src(t, a.name, "direct")))
      case lr: LocalRelation =>
        lr.output.foreach(a =>
          prov(a.exprId) = Set(Src("inline", a.name, "direct")))
      case p: Project => addNamed(p.projectList, None)
      case a: Aggregate => addNamed(a.aggregateExpressions, None)
      case w: Window => addNamed(w.windowExpressions, Some("window"))
      case g: Generate =>
        g.generatorOutput.foreach(a =>
          prov(a.exprId) = exprSources(g.generator).map(escalate(_, "generator")))
      case e: Expand =>
        e.output.zipWithIndex.foreach { case (a, i) =>
          if (!prov.contains(a.exprId)) {
            prov(a.exprId) = e.projections
              .flatMap(row => exprSources(row(i))).toSet
          }
        }
      case u: Union =>
        u.output.zipWithIndex.foreach { case (a, i) =>
          prov(a.exprId) = u.children
            .flatMap(c => prov.getOrElse(c.output(i).exprId, Set.empty)).toSet
        }
      case s: SubqueryAlias => () // attrs pass through by ExprId
      case _ => () // joins, filters, sorts, limits: attrs pass through
    }

    import spark.implicits._
    df.queryExecution.analyzed.output.flatMap { out =>
      val srcs = prov.getOrElse(out.exprId, Set.empty[Src])
      // a column with no source references (count(*), literals) still
      // shows up in the report, flagged as literal-derived
      if (srcs.isEmpty) Seq((out.name, "", "", "literal"))
      else srcs.toSeq.map(s => (out.name, s.table, s.col, s.via))
    }.sortBy(r => (r._1, r._2, r._3))
      .toDF("out_col", "src_table", "src_col", "via")
  }

  /** #316 Registered query: lineage of the Q5-family star aggregate —
    * grouping key traces `direct` to nation, the money measure traces
    * `aggregate` to the two lineitem price columns, the join keys do
    * NOT appear (they carry no output value). Output is a deterministic
    * function of the plan, so the oracle pins it literally.
    */
  def lineageDemo(spark: SparkSession, dir: String): DataFrame =
    columnLineage(Mv.starQuery(spark, dir))
}
