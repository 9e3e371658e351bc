package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Physical-layout utilities — the two table layouts that decide shuffle
  * cost at 100 TB, both absent from the reference (single-process pandas
  * has no layout: `clinical.py:572-578` re-filters the whole frame per
  * dataset).
  *
  *  - Hive-style partitioned directories: the per-`Dataset` fan-out
  *    becomes partition pruning — a query touching one dataset lists and
  *    reads ONLY that directory, instead of scanning the pan-study table
  *    per iteration (SURVEY §2.2 P3).
  *  - Bucketed tables: facts bucketed on the join key join WITHOUT any
  *    exchange — at 1000 executors the repeated clinical⋈mutation joins
  *    (SURVEY §2.3) pay the shuffle once at write time, then never again.
  */
object Layout {

  /** Write Hive-partitioned parquet; reads filtered on `partCols` prune
    * to matching directories (assert: `PartitionFilters` in the scan).
    */
  def writePartitioned(df: DataFrame, path: String, partCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Round-robin spread of a frame to the session's default parallelism
    * when its current plan would execute on fewer than half that many
    * tasks — the SINGLE-ROW-GROUP-INPUT guard (optimization r14).
    *
    * Why it exists: a parquet file is splittable only at row-group
    * boundaries, and a generator that writes one big row group per file
    * pins every scan of that file — and every operator whole-stage-
    * pipelined into the scan (seeding projections, tokenize+explode,
    * fused rule aggregates) — to ONE task regardless of cluster size
    * (measured: the v18 durable-MAF build, and the fused 37-rule pass
    * reading it back, ran 1 task on 32 cores at sf0.1). Durable-index
    * BUILDS route through this before writing, so (a) the expensive
    * derivation runs wide and (b) the index lands as ~parallelism files
    * whose readback splits properly.
    *
    * Scale behavior: the guard is the partition-count check, not a
    * constant — a production table with hundreds of splits passes
    * through untouched (no exchange in the plan); only a degenerate
    * under-split input pays one exchange, which is exactly the
    * "repartition immediately after the read" remedy the input-skew
    * playbook prescribes (guide §2.5). Round-robin keeps content
    * deterministic per input (sort-before-repartition is on by
    * default); downstream results are partitioning-independent.
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Gate on the ACTUAL splittable width, not the planned partition
    // count (r15, advisor note): parquet splits only at row-group
    // boundaries, so a large single-row-group file yields many planned
    // byte-splits (>= target/2 — the old gate then SKIPPED the spread)
    // while only one task ever reads data. Probing the footers also
    // avoids the old `.rdd` call, which under AQE materializes upstream
    // query stages (executing a build twice). Non-scan-rooted frames
    // pass through unchanged — spread() is an input-layout remedy and
    // must be fed scan-rooted plans (both call sites are).
    scanSplitWidth(df) match {
      case Some(width) if width * 2 <= target => df.repartition(target)
      case _ => df
    }
  }

  /** Effective splittable width of a frame rooted at ONE parquet
    * relation: the total row-group count across its files (each row
    * group is the smallest schedulable read unit). Footers are only
    * probed when the file count alone is below the caller's threshold
    * of interest; with > 64 files the scan is wide regardless of
    * row-group layout. None when the plan is not a single-parquet-scan
    * tree (no byte estimate exists without executing it).
    */
  private[graft] def scanSplitWidth(df: DataFrame): Option[Int] = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val rels = df.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation
    }
    rels match {
      case Seq(fs: HadoopFsRelation) =>
        val files = fs.location.inputFiles
        if (files.length > 64) Some(files.length)
        else {
          val conf = df.sparkSession.sessionState.newHadoopConf()
          val groups = files.map { f =>
            val in = org.apache.parquet.hadoop.util.HadoopInputFile
              .fromPath(new org.apache.hadoop.fs.Path(f), conf)
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try r.getRowGroups.size finally r.close()
          }.sum
          Some(math.max(1, groups))
        }
      case _ => None
    }
  }

  /** Save as a bucketed (and optionally sort-within-bucket) parquet table
    * in `db`. Both sides of a join bucketed on the join key with the same
    * bucket count plan a SortMergeJoin with NO ShuffleExchange.
    */
  def writeBucketed(df: DataFrame, db: String, table: String, buckets: Int,
                    keys: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    // Pre-shuffle rows into their bucket so each bucket is ONE file.
    // Without this every input task writes a file per bucket it touches —
    // tasks × buckets small files, the classic bucketed-write explosion.
    val bucketed = df.repartition(buckets, keys.map(df.col): _*)
    var w: DataFrameWriter[Row] = bucketed.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(s"$db.$table")
  }

  /** Create (once) a database rooted at an explicit location — keeps test
    * and bench warehouses out of the working directory.
    */
  def ensureDb(spark: SparkSession, db: String, location: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$location'")

  /** Small-file compaction: rewrite a parquet directory into
    * `ceil(totalBytes / targetBytes)` files. Long-running ingest (and
    * every streaming sink) accretes small files until listing and task
    * scheduling dominate query time — compaction is the standing
    * maintenance op of a 100 TB lake. Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles() = fs.listStatus(p).filter(s =>
      s.isFile && !s.getPath.getName.startsWith("_"))
    val before = dataFiles()
    val total = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(dir + "__compact_tmp")
    spark.read.parquet(dir).repartition(n)
      .write.mode("overwrite").parquet(tmp.toString)
    // Never a window where the only copy is gone: move the original aside,
    // promote the rewrite, and delete the old copy last — a crash between
    // steps leaves the data at either the target or `__compact_old`. Both
    // renames are within one parent dir, so no cross-filesystem surprises.
    val old = new org.apache.hadoop.fs.Path(dir + "__compact_old")
    fs.delete(old, true) // clear any leftover from a previous failed run
    require(fs.rename(p, old), s"compact: rename $p -> $old failed")
    require(fs.rename(tmp, p),
      s"compact: rename $tmp -> $p failed; original preserved at $old")
    fs.delete(old, true)
    (before.length, dataFiles().length)
  }

  /** Multi-dimensional clustering (Z-order style, the Delta/Iceberg
    * `OPTIMIZE ZORDER BY` layout): sort rows by the bit-interleaving of
    * two columns' grid cells so every file's min/max stats are tight on
    * BOTH dimensions — a linear sort can only serve one. Parquet readers
    * then skip files/row-groups from footer stats for filters on either
    * column; at 100 TB this is the difference between scanning a slice
    * and scanning the table for the second-most-common filter column.
    * Pure DataFrame ops: global min/max (one tiny agg) → fixed grid →
    * interleave via shift/mask → repartitionByRange + sort on the
    * z-value. Returns the number of files written.
    */
  def writeZOrdered(spark: SparkSession, df: DataFrame, path: String,
                    colA: String, colB: String, bits: Int = 8,
                    numFiles: Int = 8): Int = {
    import org.apache.spark.sql.functions._
    val Array(r) = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).collect()
    val (aMin, aMax, bMin, bMax) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val cells = (1L << bits) - 1
    def cell(c: String, lo: Double, hi: Double) = {
      val denom = if (hi > lo) hi - lo else 1.0
      least(lit(cells), greatest(lit(0L),
        ((col(c).cast("double") - lit(lo)) / lit(denom) * lit(cells.toDouble))
          .cast("long")))
    }
    val (za, zb) = (cell(colA, aMin, aMax), cell(colB, bMin, bMax))
    // interleave via the compiled kernel (cell indices < 2^bits ≤ 2^16,
    // so the 16-bit interleave is exact): one codegen'd call instead of
    // a 2·bits-term shift/mask expression tree
    require(bits <= 16, s"zorder grid is capped at 16 bits, got $bits")
    val z = graft.functions.ZInterleave16.zinterleave16(za, zb)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).count(s => s.isFile && !s.getPath.getName.startsWith("_"))
  }

  /** Compute table (and optionally column) statistics — what feeds the
    * cost-based optimizer's row-count/selectivity estimates
    * (`spark.sql.cbo.enabled`) for join reorder and broadcast decisions.
    * Without stats Spark falls back to file sizes, which under-informs
    * every post-filter cardinality estimate at scale.
    */
  def analyzeTable(spark: SparkSession, db: String, table: String,
                   cols: Seq[String] = Nil): Unit = {
    val forCols =
      if (cols.isEmpty) "" else cols.mkString(" FOR COLUMNS ", ", ", "")
    spark.sql(s"ANALYZE TABLE $db.$table COMPUTE STATISTICS$forCols")
  }
}
