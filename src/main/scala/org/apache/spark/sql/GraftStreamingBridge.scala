package org.apache.spark.sql

/** Bridge to the `private[sql]` streaming-update marker: a DSv2 sink that
  * mixes this in accepts `outputMode("update")` streams as appends (each
  * micro-batch delivers only changed rows, which a key-addressed upsert
  * sink applies in place). Same extension-library pattern as
  * [[GraftSqlBridge]].
  */
trait GraftStreamingUpdateAsAppend
    extends internal.connector.SupportsStreamingUpdateAsAppend
