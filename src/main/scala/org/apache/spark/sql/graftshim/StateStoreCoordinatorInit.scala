package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession

/** Spark registers the `StateStoreCoordinator` RPC endpoint lazily, on
  * the first STREAMING query start (`classic.StreamingQueryManager`'s
  * lazy `stateStoreCoordinator`). A BATCH `transformWithState` still
  * loads per-task state stores whose executors look that endpoint up,
  * so a batch-only session fails with `RpcEndpointNotFoundException`.
  * This shim lives under `org.apache.spark.sql` purely to reach the
  * `private[sql]` lazy val and force endpoint creation up front.
  */
object StateStoreCoordinatorInit {
  def ensure(spark: SparkSession): Unit =
    spark.streams match {
      case m: org.apache.spark.sql.classic.StreamingQueryManager =>
        m.stateStoreCoordinator: Unit
      case _ => () // non-classic session (e.g. connect): nothing to init
    }
}
