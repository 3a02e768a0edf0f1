package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed dense row numbering — `row_number()` over a TOTAL key
  * without the single-task global window Spark plans for
  * `Window.orderBy(...)` with no partition spec (at 100 TB that
  * operator funnels the whole dataset through one task).
  *
  * Shape: range-repartition on (group, key) so each task holds one
  * contiguous slice of the final order, pin the partitioning (ONE
  * narrow-projection materialization — the count pass and the
  * numbering pass must see identical partitions, and a re-sampled
  * range boundary between passes would mis-offset every rank), count
  * rows per (partition, group) — a ≤ partitions·|groups| row driver
  * fold, the bounded-collect shape of
  * [[graft.sync.InitialSync]]'s chunk boundaries — broadcast the
  * cumulative offsets back, and emit offset + partition-local
  * row_number. Every per-row step is scan-local; the only exchange is
  * the range sort the total order requires anyway.
  *
  * The rank is boundary-invariant: wherever the sampler happens to cut
  * ranges, offset + local rank reproduces exactly the row's rank in
  * the global (group, key) order, so the result is deterministic even
  * though range-boundary sampling is not.
  */
object DistributedRank {

  /** Append `posCol` = 1-based rank of each row within its `groupCols`
    * group under the total order `keyCols` (which must be unique per
    * group — ties would make the rank depend on partition internals).
    * Empty `groupCols` = one global numbering.
    */
  def withRank(df: DataFrame, groupCols: Seq[String], keyCols: Seq[Column],
      posCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val rangeCols = groupCols.map(col) ++ keyCols
    val sorted = df
      .repartitionByRange(parts, rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val groupExprs = groupCols.map(col)
    val counts = sorted.groupBy((col("_pid") +: groupExprs): _*)
      .agg(count(lit(1)).as("_n"))
      .collect()
    if (counts.isEmpty)
      return sorted.drop("_pid").withColumn(posCol, lit(0L).cast("long"))
    // per-(pid, group) starting offset: the group's row counts in all
    // lower partition ids (range partitioning keeps one group's rows
    // contiguous in ascending-pid order)
    val offs = startingOffsets(counts, groupCols)
    val offSchema = StructType(
      StructField("_pid", org.apache.spark.sql.types.IntegerType, nullable = false) +:
        counts.headOption.map(_.schema.fields.toSeq.filter(f =>
          groupCols.contains(f.name))).getOrElse(Seq.empty) :+
        StructField("_off", LongType, nullable = false))
    val offRows = counts.zip(offs).map { case (r, off) =>
      Row.fromSeq(r.getAs[Int]("_pid") +:
        groupCols.map(g => r.getAs[Any](g)) :+ off)
    }
    val offsetDf = spark.createDataFrame(
      java.util.Arrays.asList(offRows: _*), offSchema)
    val wLocal = Window.partitionBy((col("_pid") +: groupExprs): _*)
      .orderBy(keyCols: _*)
    sorted.join(broadcast(offsetDf), "_pid" +: groupCols)
      .withColumn(posCol, (col("_off") + row_number().over(wLocal)).cast("long"))
      .drop("_pid", "_off")
  }

  /** Starting offsets aligned index-for-index with `counts`. */
  private def startingOffsets(counts: Array[Row], groupCols: Seq[String]): Array[Long] = {
    val out = new Array[Long](counts.length)
    counts.zipWithIndex
      .map { case (r, i) =>
        (groupCols.map(g => Option(r.getAs[Any](g)).map(_.toString).orNull),
          r.getAs[Int]("_pid"), r.getAs[Long]("_n"), i)
      }
      .groupBy(_._1)
      .foreach { case (_, rows) =>
        var acc = 0L
        rows.sortBy(_._2).foreach { case (_, _, n, i) =>
          out(i) = acc; acc += n
        }
      }
    out
  }
}
