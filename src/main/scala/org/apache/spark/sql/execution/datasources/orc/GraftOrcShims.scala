package org.apache.spark.sql.execution.datasources.orc

import org.apache.spark.sql.types.DataType

/** Same-package access to Spark's package-private ORC column-vector
  * wrappers. Graft's ORC reads that must intercept the orc-core batch (the
  * mixed-sign-zero scrub — see graft.format.OrcIO.ZeroSignScrubReader) wrap
  * the scrubbed hive vectors with the exact wrappers Spark's own vectorized
  * OrcColumnarBatchReader uses, so type semantics (decimals, timestamps,
  * nested structs/lists/maps, repeating vectors) are identical to a native
  * vectorized ORC scan. */
object GraftOrcShims {
  /** Zero-copy wrapper over an orc-core vector (recursive for nested
    * types) — OrcColumnVectorUtils.toOrcColumnVector is package-private. */
  def wrap(dt: DataType,
      vec: org.apache.hadoop.hive.ql.exec.vector.ColumnVector): OrcColumnVector =
    OrcColumnVectorUtils.toOrcColumnVector(dt, vec)
}
