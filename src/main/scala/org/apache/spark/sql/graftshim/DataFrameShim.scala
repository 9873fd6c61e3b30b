package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Bridge to the sql-private internalCreateDataFrame: lets the decoder emit
  * InternalRow (UTF8String bytes straight from the codec, no UTF-16
  * round-trip) instead of external Rows through an Encoder.
  */
object DataFrameShim {
  def internalCreateDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[SparkSession].internalCreateDataFrame(rdd, schema)
}
