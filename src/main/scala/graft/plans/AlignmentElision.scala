package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, JoinType, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Index-alignment elision (SURVEY §4 custom-work item 4 — the per-op
  * cost pandas users feel most; reference: frame.py:9701
  * `_align_for_op`, reindex-optimized fast path :9607).
  *
  * A pandas binary op between two frames aligns both sides on the
  * union of their indexes; translated to Spark that alignment IS a
  * full-outer equi-join on the index column (join_aligned_add). But
  * pandas' own fast path — `self.index is other.index` skips the
  * align — has a plan-level analogue: when both join inputs are
  * projections of the SAME underlying plan and the join key is that
  * plan's unique grouping key, every row matches exactly itself, so
  * the join is the identity and both sides' columns can be computed
  * in ONE pass over the shared child. At 100 TB the elision removes a
  * self-shuffle of the whole frame per arithmetic op.
  *
  * Fires only when equivalence is PROVABLE:
  *  - both inputs are (optionally Project-topped) plans whose stripped
  *    children are canonically equal and fully deterministic;
  *  - the condition is a single equality on the same child column,
  *    null-safely (`<=>` — pandas alignment matches NaN index labels,
  *    so the aligned-op translation uses it anyway) or on a
  *    non-nullable key (plain `=` drops/duplicates null keys, which
  *    the identity projection would not);
  *  - the key is provably unique per child row: the child (through
  *    filters/projections) is an Aggregate grouped by exactly that
  *    column, or a single-key Deduplicate. Without uniqueness a
  *    self-join on the key fans out quadratically per group and is
  *    NOT the identity.
  *
  * Inner/full/left/right all elide (with a unique key and the same
  * key set on both sides there is no unmatched row on either side).
  * The right side's expressions are remapped to the kept child's
  * attributes position-by-position, preserving the original output
  * exprIds so parent operators resolve unchanged.
  *
  * Runs as a POST-HOC RESOLUTION rule (analysis time), not an
  * optimizer rule: the optimizer's column pruning rewrites the two
  * branches into separately-pruned subtrees before any injected
  * operator-optimization rule fires, destroying the canonical
  * equality the proof needs — at analysis the shared subtree is still
  * shared verbatim (modulo the self-join exprId dedup, which
  * canonicalization normalizes). Installed via
  * [[graft.GraftExtensions]]; pinned by AlignmentElisionSpec and the
  * join_aligned_elide oracle row.
  */
object AlignmentElision extends Rule[LogicalPlan] {

  private def elidable(jt: JoinType): Boolean = jt match {
    case Inner | FullOuter | LeftOuter | RightOuter => true
    case _ => false
  }

  /** (projection list, stripped child) — a missing Project means the
    * plan projects itself. SubqueryAlias layers (from `.as` / named
    * frames) are transparent. */
  private def strip(p: LogicalPlan): (Seq[NamedExpression], LogicalPlan) =
    p match {
      case SubqueryAlias(_, child) => strip(child)
      case Project(list, SubqueryAlias(_, child)) => (list, child)
      case Project(list, child) => (list, child)
      case other => (other.output, other)
    }

  /** Resolve an output attribute of (proj over child) back to the
    * child attribute it passes through, if it is a pure passthrough. */
  private def sourceAttr(proj: Seq[NamedExpression], child: LogicalPlan,
      a: Attribute): Option[Attribute] =
    proj.collectFirst { case ne if ne.exprId == a.exprId => ne }.flatMap {
      case ar: AttributeReference => Some(ar)
      case Alias(ar: AttributeReference, _) => Some(ar)
      case _ => None
    }.filter(child.outputSet.contains)

  /** Key uniqueness proof: walk through row-preserving/row-filtering
    * operators to an Aggregate grouped by exactly this column (or a
    * single-key Deduplicate). */
  private def uniqueOn(plan: LogicalPlan, key: Attribute): Boolean =
    plan match {
      case Project(list, child) =>
        list.collectFirst { case ne if ne.exprId == key.exprId => ne } match {
          case Some(ar: AttributeReference) => uniqueOn(child, ar)
          case Some(Alias(ar: AttributeReference, _)) => uniqueOn(child, ar)
          case _ => false
        }
      case Filter(_, child) => uniqueOn(child, key)
      case agg: Aggregate => agg.groupingExpressions match {
        case Seq(g) =>
          agg.aggregateExpressions.collectFirst {
            case ne if ne.exprId == key.exprId => ne
          }.exists {
            case ar: AttributeReference => g.semanticEquals(ar)
            case Alias(e, _) => g.semanticEquals(e)
            case _ => false
          }
        case _ => false
      }
      case Deduplicate(keys, _) =>
        keys.size == 1 && keys.head.exprId == key.exprId
      case Distinct(child) =>
        // distinct() rows are unique as tuples; the key alone is unique
        // only when it is the whole row
        child.output.size == 1 && child.output.head.exprId == key.exprId
      case _ => false
    }

  private def deterministicTree(p: LogicalPlan): Boolean =
    p.find(n => !n.expressions.forall(_.deterministic)).isEmpty

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, jt, Some(cond), _) if elidable(jt) =>
      val keyPair = cond match {
        case EqualNullSafe(l: AttributeReference, r: AttributeReference) => Some((l, r, true))
        case EqualTo(l: AttributeReference, r: AttributeReference) => Some((l, r, false))
        case _ => None
      }
      val rewritten = keyPair.flatMap { case (c1, c2, nullSafe) =>
        // orient: l from the left side, r from the right
        val oriented =
          if (left.outputSet.contains(c1) && right.outputSet.contains(c2)) Some((c1, c2))
          else if (left.outputSet.contains(c2) && right.outputSet.contains(c1)) Some((c2, c1))
          else None
        oriented.flatMap { case (lAttr, rAttr) =>
          val (lProj, lChild) = strip(left)
          val (rProj, rChild) = strip(right)
          val sameLineage = lChild.canonicalized == rChild.canonicalized &&
            deterministicTree(lChild)
          if (!sameLineage) None
          else for {
            lk <- sourceAttr(lProj, lChild, lAttr)
            rk <- sourceAttr(rProj, rChild, rAttr)
            lPos = lChild.output.indexWhere(_.exprId == lk.exprId)
            rPos = rChild.output.indexWhere(_.exprId == rk.exprId)
            if lPos >= 0 && lPos == rPos
            if nullSafe || !lk.nullable
            if uniqueOn(lChild, lk)
          } yield {
            // remap the right projection onto the kept (left) child,
            // keeping every original output exprId
            val attrMap = rChild.output.zip(lChild.output).toMap
            val remapped = rProj.map { ne =>
              val sub = ne.transform {
                case a: AttributeReference => attrMap.getOrElse(a, a)
              }
              sub match {
                case al: Alias => al // Alias keeps its exprId through transform
                case a: AttributeReference =>
                  Alias(a, ne.name)(exprId = ne.exprId)
                case other => Alias(other, ne.name)(exprId = ne.exprId)
              }
            }
            Project(lProj ++ remapped, lChild)
          }
        }
      }
      rewritten.getOrElse(j)
  }
}
