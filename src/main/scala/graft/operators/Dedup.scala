package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic exact deduplication (the D1 shape, SURVEY §2.8, generalized
  * for any table): a row is dropped iff it is a non-first occurrence of
  * its key (in `orderCol` order) AND its key group spans more than one
  * distinct `sourceCol` value. With `crossSourceOnly=false` it degrades
  * to plain keep-first-per-key dedup (the classic exact-dedup of a
  * training-data pipeline).
  *
  * Scale: single hash-shuffle on the key; `collect_set` bounded by the
  * distinct-source count, not group size. For 100 TB corpora prefer
  * hashing wide keys first (`sha2(concat_ws(...))`) so the shuffle rows
  * stay narrow — see [[keyHash]].
  */
object Dedup {

  def keyHash(keyCols: Seq[Column]): Column =
    sha2(concat_ws("", keyCols.map(_.cast("string")): _*), 256)

  def exact(
      df: DataFrame,
      keyCols: Seq[Column],
      orderCol: Column,
      sourceCol: Option[Column] = None): DataFrame = {
    val w = Window.partitionBy(keyCols: _*)
    val rn = row_number().over(w.orderBy(orderCol))
    val keep = sourceCol match {
      case Some(src) => rn === 1 || size(collect_set(src).over(w)) <= 1
      case None => rn === 1
    }
    df.withColumn("_keep", keep).filter(col("_keep")).drop("_keep")
  }
}
