package graft

import org.apache.spark.sql.SparkSession

/** Session housekeeping between independent query runs: several
  * operators persist() intermediates they consume multiple times
  * (shingle sets, the TF table) and the streaming queries register
  * memory-sink tables — both are method-local, so the caller releases
  * them here once the query's result is materialized.
  */
object Housekeeping {
  def release(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.catalog.listTables().collect()
      .filter(t => t.isTemporary && (t.name.startsWith("graft_stream_") ||
        t.name.startsWith("graft_rollup_") || t.name.startsWith("graft_cube_")))
      .foreach(t => spark.catalog.dropTempView(t.name))
  }
}
