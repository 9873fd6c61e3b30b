package org.apache.spark.graftshim

import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration
import org.apache.hadoop.conf.Configuration

/** Bridge to the spark-private SerializableConfiguration (tasks need a
  * serializable Hadoop conf to open FileSystems with the session's
  * credentials/settings — e.g. s3a keys).
  */
object ConfShim {
  type SerConf = SerializableConfiguration
  def broadcast(sc: SparkContext): Broadcast[SerializableConfiguration] =
    SerializableConfiguration.broadcast(sc)
  def conf(b: Broadcast[SerializableConfiguration]): Configuration = b.value.value
}
