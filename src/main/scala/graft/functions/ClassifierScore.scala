package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.QualityClassifier

/** Trained-quality-classifier scoring as a native Catalyst expression —
  * the in-flight half of the "train batch, score in-flight" deployment
  * ([[graft.streaming.CorpusPipeline.scoreQuality]]).
  *
  * The first cut was a Scala UDF: correct, but every row paid the
  * encoder round-trip (UTF8String → String → boxed Long → catalyst)
  * and the UDF call sat OUTSIDE whole-stage codegen's null-tracking,
  * in the streaming curation hot path. Here the weight vector is a
  * codegen REFERENCE OBJECT (one pointer in the plan, same discipline
  * as [[BloomMightContain]]) and scoring is one static call per row
  * inside the generated code.
  *
  * The kernel is byte-identical to the batch scorer's —
  * [[QualityClassifier.featureIds]] → logit → Elliott probability in
  * micro-units — so batch and stream verdicts can never disagree
  * (asserted in CorpusPipelineSpec; the whole arithmetic is oracle-
  * gated by `text_classifier`). */
case class ClassifierScore(child: Expression, weights: Array[Long])
    extends UnaryExpression {
  require(weights.length == QualityClassifier.NumFeatures,
    s"weight vector must be ${QualityClassifier.NumFeatures} long")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    ClassifierScore.scoreMicro(input.asInstanceOf[UTF8String], weights)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("classifierWeights", weights, "long[]")
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.ClassifierScore.scoreMicro($in, $w)")
  }
  override protected def withNewChildInternal(c: Expression): ClassifierScore =
    copy(child = c)
  override def prettyName: String = "graft_classifier_score"
}

object ClassifierScore {
  /** Static forwarder for generated code: features → logit → Elliott
    * probability, all in micro-units. */
  def scoreMicro(text: UTF8String, w: Array[Long]): Long =
    QualityClassifier.probMicro(
      QualityClassifier.logitMicro(w,
        QualityClassifier.featureIds(text.toString)))
}
