package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Result-ordering helper for report-sized outputs.
  *
  * A terminal `orderBy` (no limit) plans a range-partitioned global sort;
  * RangePartitioner first runs a *sampling job* over the child, and when
  * the child pipeline has no exchange of its own (scan → broadcast join →
  * filter), that sampling job re-executes the entire pipeline — the most
  * expensive queries were paying for their plan twice. For outputs that
  * are report-sized (tens to thousands of rows), a single-partition
  * shuffle + local sort gives the same deterministic total order with one
  * execution and no sampling pass.
  *
  * Scale note: this is only for final, human/driver-sized result sets.
  * Large intermediate or output relations must keep the parallel sort
  * (or no sort at all).
  */
private[graft] object Out {
  def ordered(df: DataFrame)(cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)
}
