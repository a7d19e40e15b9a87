package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt's generic data tests re-expressed as DataFrame transforms
  * (the reference runs these via dbt-core:
  * tests/functional/basic/test_basic.py TestGenericTestsParquet).
  * Each returns a DataFrame of violations — empty means the test
  * passes, matching dbt semantics.
  */
object DataTests {

  /** `unique`: values of `column` appearing more than once. */
  def unique(df: DataFrame, column: String): DataFrame =
    df.groupBy(col(column))
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** `not_null`: rows where `column` is null. */
  def notNull(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNull)

  /** `accepted_values`: offending values with their counts. */
  def acceptedValues(df: DataFrame, column: String,
      accepted: Seq[String]): DataFrame =
    df.filter(!col(column).isInCollection(accepted))
      .groupBy(col(column)).agg(count(lit(1)).as("n_rows"))

  /** `relationships`: child keys with no matching parent (referential
    * integrity), as a broadcast-friendly left-anti join.
    */
  def relationships(child: DataFrame, childCol: String,
      parent: DataFrame, parentCol: String): DataFrame =
    child.select(col(childCol)).distinct()
      .join(parent.select(col(parentCol).as(childCol)).distinct(),
        Seq(childCol), "left_anti")
}
