package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.ml.fpm.FPGrowth

/** Association-rule mining (SURVEY §2.8 R5): the reference converts a
  * boolean frame to transactions and runs R's `apriori` with supp=0.3,
  * conf=0.8, minlen=3, maxlen=7, then keeps rules with lift>1.2 sorted by
  * confidence (`Hypothesis testing R.r:496-534`).
  *
  * FP-Growth produces the identical frequent-itemset/rule semantics with a
  * scalable distributed algorithm (`org.apache.spark.ml.fpm.FPGrowth`);
  * apriori's minlen/maxlen have no FPGrowth equivalent, so rule length
  * (|antecedent| + |consequent|) is filtered post-hoc, and lift comes from
  * the `associationRules` output directly.
  */
object AssociationRules {

  /** Boolean columns → transactions: item = column name where value is true. */
  def transactions(df: DataFrame, boolCols: Seq[String]): DataFrame =
    df.select(filter(
      array(boolCols.map(c => when(col(c) === true, lit(c))): _*),
      x => x.isNotNull).as("items"))

  /** Mine rules with the reference's post-filters. Output:
    * (antecedent, consequent, support, confidence, lift) sorted by
    * confidence desc. */
  def mine(df: DataFrame, boolCols: Seq[String],
      minSupport: Double = 0.3, minConfidence: Double = 0.8,
      minLen: Int = 3, maxLen: Int = 7, minLift: Double = 1.2): DataFrame = {
    val model = new FPGrowth()
      .setItemsCol("items")
      .setMinSupport(minSupport)
      .setMinConfidence(minConfidence)
      .fit(transactions(df, boolCols))
    // associationRules: antecedent, consequent, confidence, lift, support
    model.associationRules
      .withColumn("rule_len", size(col("antecedent")) + size(col("consequent")))
      .where(col("rule_len").between(minLen, maxLen) && col("lift") > minLift)
      .select(
        concat_ws(",", array_sort(col("antecedent"))).as("antecedent"),
        concat_ws(",", array_sort(col("consequent"))).as("consequent"),
        col("support"), col("confidence"), col("lift"))
      .orderBy(col("confidence").desc, col("antecedent"), col("consequent"))
  }

  /** Frequent itemsets with apriori-style min/max length (R :510-511). */
  def frequentItemsets(df: DataFrame, boolCols: Seq[String],
      minSupport: Double, minLen: Int, maxLen: Int): DataFrame = {
    val model = new FPGrowth().setItemsCol("items").setMinSupport(minSupport)
      .fit(transactions(df, boolCols))
    model.freqItemsets
      .where(size(col("items")).between(minLen, maxLen))
      .select(concat_ws(",", array_sort(col("items"))).as("itemset"), col("freq"))
      .orderBy(col("freq").desc, col("itemset"))
  }
}
