package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{IcebergPartitionFunctions, LakeTableFunctions, TextFunctions, VectorFunctions}

/** Session-extension entry point: `--conf spark.sql.extensions=graft.GraftExtensions`
  * makes every graft SQL function (cosine_sim, dot_f32, token_set,
  * shingle_set, simhash64, minhash_bands, …) AND the lake table-valued
  * functions (`SELECT * FROM graft_delta('/t')` / graft_iceberg /
  * graft_hudi) available in any session without programmatic
  * registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    VectorFunctions.registrations.foreach(ext.injectFunction)
    TextFunctions.registrations.foreach(ext.injectFunction)
    IcebergPartitionFunctions.registrations.foreach(ext.injectFunction)
    LakeTableFunctions.registrations.foreach(ext.injectTableFunction)
  }
}
