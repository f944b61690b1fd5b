package graft.ml

import org.apache.spark.ml.tree.{ContinuousSplit, InternalNode, LeafNode, Node}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Decision-tree → Column compiler: batch INFERENCE without the ML runtime.
  *
  * `model.transform` drags the whole spark.ml stack (vector assembly, Row →
  * Vector conversion, per-row predictor dispatch) through the scoring scan;
  * a depth-d tree is just d nested comparisons, which compile to a single
  * codegen'd `when` chain that scores 100 TB inside whole-stage codegen
  * with zero ML-runtime overhead — and, being plain relational algebra, the
  * scored pipeline replays on any SQL engine (CASE WHEN), which is what
  * lets the m3 query oracle the ML family's inference path in DuckDB.
  *
  * The reference's serving story exports its model behind a web service
  * (`README.md:785-792` scoring discussion); this is the engine-native
  * equivalent for bulk scoring.
  */
object TreeScorer {

  /** Engine-neutral tree: either a leaf emitting a score, or a binary
    * continuous split — rows with `col(feature) <= threshold` go LEFT
    * (spark.ml `ContinuousSplit` semantics; a null comparison is false, so
    * nulls fall RIGHT — impute upstream if that matters). */
  sealed trait TreeSpec
  final case class Leaf(value: Double) extends TreeSpec
  final case class SplitLE(feature: String, threshold: Double,
      left: TreeSpec, right: TreeSpec) extends TreeSpec

  /** Compile to a nested `when` chain (one Column, codegen-friendly). */
  def compile(t: TreeSpec): Column = compile(t, col(_))

  /** Compile against an explicit feature resolver — lets several scoring
    * variants share ONE scan (e.g. m22 scores the same tree on original
    * and permuted columns side by side without re-reading the corpus). */
  def compile(t: TreeSpec, resolve: String => Column): Column = t match {
    case Leaf(v) => lit(v)
    case SplitLE(f, thr, l, r) =>
      when(resolve(f) <= lit(thr), compile(l, resolve))
        .otherwise(compile(r, resolve))
  }

  /** The same tree as an ANSI SQL CASE chain, for cross-engine replay of a
    * FITTED tree's scoring (the m4 oracle): thresholds render via
    * `Double.toString`, which round-trips the exact double, so any engine
    * parsing the literal compares against bit-identical values. */
  def toSql(t: TreeSpec): String = t match {
    case Leaf(v) => java.lang.Double.toString(v)
    case SplitLE(f, thr, l, r) =>
      s"(CASE WHEN $f <= ${java.lang.Double.toString(thr)} " +
        s"THEN ${toSql(l)} ELSE ${toSql(r)} END)"
  }

  /** Depth of the spec (root-only tree = 0). */
  def depth(t: TreeSpec): Int = t match {
    case Leaf(_) => 0
    case SplitLE(_, _, l, r) => 1 + math.max(depth(l), depth(r))
  }

  /** [[fromModel]] with leaf values = the model's RAW class-1 count
    * (`rawPrediction(1)`) instead of the class prediction — the exact
    * ranking score `CohortClassifier.metricsOf` computes AUC over, so a
    * SQL replay of this spec reproduces the pipeline's trapezoid
    * bit-for-bit. Leaf impurity stats are private[ml]; instead each leaf
    * is reached through the PUBLIC `predictRaw` by synthesizing a feature
    * vector inside the leaf's path box (upper bounds come from left
    * branches, strict lower bounds from right ones — the box is non-empty
    * because every leaf held training rows). */
  def fromModelRawCount(
      model: org.apache.spark.ml.classification.DecisionTreeClassificationModel,
      features: Seq[String]): TreeSpec =
    fromModelVia(model, features, raw => raw(1))

  /** [[fromModelRawCount]]'s walk with leaf values = the class-1 POSTERIOR
    * `c1/(c0+c1)` — the tree's predicted probability (one division of the
    * leaf's training counts, exported as a literal), the score a
    * calibration table bins on. */
  def fromModelProb(
      model: org.apache.spark.ml.classification.DecisionTreeClassificationModel,
      features: Seq[String]): TreeSpec =
    fromModelVia(model, features, raw => raw(1) / (raw(0) + raw(1)))

  private def fromModelVia(
      model: org.apache.spark.ml.classification.DecisionTreeClassificationModel,
      features: Seq[String],
      leafValue: org.apache.spark.ml.linalg.Vector => Double): TreeSpec = {
    def walk(node: Node, lo: Map[Int, Double], hi: Map[Int, Double]): TreeSpec =
      node match {
        case _: LeafNode =>
          val v = org.apache.spark.ml.linalg.Vectors.dense(
            features.indices.map { i =>
              val l = lo.getOrElse(i, Double.NegativeInfinity)
              val h = hi.getOrElse(i, Double.PositiveInfinity)
              if (h != Double.PositiveInfinity) h // v <= every upper bound, > l
              else if (l != Double.NegativeInfinity) l + 1.0 // strictly right
              else 0.0
            }.toArray)
          Leaf(leafValue(model.predictRaw(v)))
        case in: InternalNode => in.split match {
          case cs: ContinuousSplit =>
            val i = cs.featureIndex
            SplitLE(features(i), cs.threshold,
              walk(in.leftChild, lo,
                hi.updated(i, math.min(hi.getOrElse(i, Double.PositiveInfinity), cs.threshold))),
              walk(in.rightChild,
                lo.updated(i, math.max(lo.getOrElse(i, Double.NegativeInfinity), cs.threshold)), hi))
          case other => throw new IllegalArgumentException(
            s"unsupported split type: ${other.getClass.getSimpleName}")
        }
        case other => throw new IllegalArgumentException(
          s"unsupported node type: ${other.getClass.getSimpleName}")
      }
    walk(model.rootNode, Map.empty, Map.empty)
  }

  /** Features appearing in the spec's splits (importance cross-check). */
  def splitFeatures(t: TreeSpec): Set[String] = t match {
    case Leaf(_) => Set.empty
    case SplitLE(f, _, l, r) => splitFeatures(l) ++ splitFeatures(r) + f
  }

  /** Extract a FITTED spark.ml tree into a [[TreeSpec]]; leaf value = the
    * model's class prediction. `features` maps featureIndex → source column
    * (the VectorAssembler input order — only valid when the tree was fit on
    * raw assembled columns, not re-scaled ones). Categorical splits are not
    * supported (the pipelines here assemble numeric + 0/1 columns only). */
  def fromModel(root: Node, features: Seq[String]): TreeSpec = root match {
    case leaf: LeafNode => Leaf(leaf.prediction)
    case in: InternalNode => in.split match {
      case cs: ContinuousSplit =>
        SplitLE(features(cs.featureIndex), cs.threshold,
          fromModel(in.leftChild, features), fromModel(in.rightChild, features))
      case other => throw new IllegalArgumentException(
        s"unsupported split type: ${other.getClass.getSimpleName}")
    }
    case other => throw new IllegalArgumentException(
      s"unsupported node type: ${other.getClass.getSimpleName}")
  }
}
