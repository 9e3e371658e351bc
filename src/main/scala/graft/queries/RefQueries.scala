package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Schemas, Tables}
import graft.functions.Fns
import graft.functions.ReplaceFirst.replaceFirst
import graft.sources.{Layout, Tsv}

/** The reference's operator inventory (SURVEY.md §2) re-expressed as
  * Spark-first queries over the test corpus, one named query per operator,
  * each with a DuckDB oracle in [[oracle]]. Citations are to the reference
  * repo files the semantics derive from.
  */
object RefQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q1 flagship — pricing-summary style aggregation (scan S2 + agg A2/A3:
    * grouped sums/counts/count-distinct). Map-side partial aggregation +
    * one shuffle on the (tiny-cardinality) group key.
    */
  def q1Agg: Q = (s, dir) => {
    // Measured negative result (r14, sf10): rewriting the countDistinct
    // as a two-phase group-by-(keys, orderkey) — the Expand-avoiding
    // form that pays off in v18's rule engine — read 6.09 s vs 4.99 s
    // for this direct form. The 15M-orderkey first-phase hash aggregate
    // collapses almost nothing map-side (scaled lineitem is not
    // orderkey-clustered within partitions), so it shuffles MORE bytes
    // than Catalyst's Expand plan, whose distinct branch partial-
    // aggregates to the same distinct triples without the extra
    // measure columns. Keep the declarative form; Catalyst's choice is
    // the better plan here.
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"))
  }

  /** S2+K1 — TSV sink/scan round-trip: write `part` through the %.12g
    * single-file sink, re-read with the TSV scanner, aggregate. Oracle
    * aggregates the original parquet — proves serialization fidelity
    * (reference `clinical.py:353-358` write, `clinical.py:319` read).
    */
  def s2TsvRoundtrip: Q = (s, dir) => {
    val tmp = java.nio.file.Files.createTempDirectory("graft-s2").toString
    val f = s"$tmp/part.tsv"
    Tsv.writeTsvFile(Tables.part(s, dir), f)
    Tsv.read(s, f)
      .agg(
        count(lit(1)).as("n"),
        sum(col("p_size").cast(LongType)).as("sum_size"),
        sum(col("p_retailprice")).as("sum_price"))
      .select(col("n"), col("sum_size"), bround(col("sum_price"), 2).as("sum_price"))
  }

  /** S3/S4 — comment-skipping TSV scan: write `region` with a #-prefixed
    * header block (the cBioPortal 5-line header shape), re-read with
    * `comment='#'` (reference `maf.py:28`, `clinical.py:798-808`).
    */
  def s3CommentScan: Q = (s, dir) => {
    val tmp = java.nio.file.Files.createTempDirectory("graft-s3").toString
    val f = s"$tmp/region.tsv"
    Tsv.writeTsvFile(Tables.region(s, dir), f,
      headerBlock = Seq("#Display", "#Description", "#STRING", "#1"))
    Tsv.read(s, f, comment = Some('#'))
      .select(col("r_regionkey").cast(IntegerType), col("r_name"))
  }

  /** S5 — folder scan with extension filter (reference `maf.py:23-28`:
    * list folder children, keep `*.maf`): the glob is pushed into Spark's
    * file index, so non-matching files are never opened — the same shape
    * scales to a many-thousand-file MAF folder with a single distributed
    * listing.
    */
  def s5GlobScan: Q = (s, dir) => {
    // The fixture package is memoized per (session, sf): the operator
    // under test is the GLOB SCAN, and re-writing the fixtures per
    // invocation both leaked one temp dir per bench rep and billed the
    // driver-side writes to the scan's timing.
    val tmp = FrameCache.cachedStrings(s, s"s5pkg:$dir") {
      val t = java.nio.file.Files.createTempDirectory("graft-s5").toString
      val n = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
      Tsv.writeTsvFile(n.filter(col("n_nationkey") % 2 === 0), s"$t/even.maf")
      Tsv.writeTsvFile(n.filter(col("n_nationkey") % 2 === 1), s"$t/odd.maf")
      Tsv.writeTsvFile(n.limit(3), s"$t/ignore.txt") // must NOT be read
      Array(t)
    }.head
    Tsv.read(s, s"$tmp/*.maf")
      .select(col("n_nationkey").cast(IntegerType), col("n_name"))
  }

  /** S6 — dict-of-files study load (reference `validate.py:175-195`, via
    * [[graft.pipelines.StudyValidator.loadAllOutputs]]): materialize a
    * study package with three of the ten required outputs present, load
    * the full name→Option[DataFrame] map, and report per-file presence +
    * row count. Absent files surface as (present=false, -1), the
    * validator's contract, never an error. The per-file counts union into
    * ONE plan — each present file is its own TSV scan branch, so at real
    * scale every branch is an independent distributed count of just that
    * file, and absent branches are constant-folded single rows.
    */
  def s6LoadMap: Q = (s, dir) => {
    // Fixture package memoized per (session, sf) — same rationale as
    // [[s5GlobScan]]: the operator under test is the dict-of-files LOAD;
    // per-invocation fixture writes leaked temp dirs across bench reps
    // and polluted the load's timed region.
    val tmp = FrameCache.cachedStrings(s, s"s6pkg:$dir") {
      val t = java.nio.file.Files.createTempDirectory("graft-s6").toString
      Tsv.writeTsvFile(
        Tables.nation(s, dir).select(col("n_nationkey"), col("n_name")),
        s"$t/data_clinical_patient.txt")
      Tsv.writeTsvFile(
        Tables.region(s, dir).select(col("r_regionkey"), col("r_name")),
        s"$t/data_clinical_sample.txt")
      Tsv.writeTsvFile(
        Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name")),
        s"$t/data_mutations.txt")
      Array(t)
    }.head
    val loaded = graft.pipelines.StudyValidator.loadAllOutputs(s, tmp)
    Schemas.RequiredOutputFiles.map { f =>
      loaded(f) match {
        case Some(df) => df.agg(count(lit(1)).as("n_rows"))
          .select(lit(f).as("file"), lit(true).as("present"), col("n_rows"))
        case None => s.range(1).select(
          lit(f).as("file"), lit(false).as("present"), lit(-1L).as("n_rows"))
      }
    }.reduce(_.unionByName(_))
  }

  /** S7 — JSONL sink/scan round-trip (beyond the reference's TSV-only
    * surface; line-delimited JSON is the lingua franca of training-data
    * interchange). Write → re-read → aggregate; the oracle aggregates the
    * original parquet, proving type-faithful serialization.
    */
  def s7JsonlRoundtrip: Q = (s, dir) => {
    val tmp = java.nio.file.Files.createTempDirectory("graft-s7").toString
    Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("source"))
      .write.mode("overwrite").json(s"$tmp/docs")
    s.read.json(s"$tmp/docs")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_ids"),
        countDistinct(col("source")).as("n_sources"))
  }

  /** S10 — XML sink/scan round-trip (Spark 4 built-in XML source): the
    * interchange format for registry/clinical feeds. Schema inference
    * types the numeric fields back; the aggregate proves value fidelity
    * through the round-trip. Row-oriented text like JSONL: fine for
    * interchange, never the analytics layout — no column pruning or
    * predicate pushdown, which is exactly what the oracle-equal parquet
    * path provides.
    */
  def s10XmlRoundtrip: Q = (s, dir) => {
    val tmp = java.nio.file.Files.createTempDirectory("graft-s10").toString
    val out = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    out.write.mode("overwrite").format("xml").option("rowTag", "customer")
      .save(s"$tmp/cust")
    // read with the KNOWN write schema — XML schema inference is a
    // second full pass over the written files (r10: half the sf10 cost)
    s.read.format("xml").option("rowTag", "customer").schema(out.schema)
      .load(s"$tmp/cust")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("sum_keys"),
        bround(sum(col("c_acctbal")), 2).as("sum_bal"))
  }

  /** S8 — ORC sink/scan round-trip: the second columnar format, same
    * predicate/column pushdown surface as parquet.
    */
  def s8OrcRoundtrip: Q = (s, dir) => {
    val tmp = java.nio.file.Files.createTempDirectory("graft-s8").toString
    Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderstatus"))
      .write.mode("overwrite").orc(s"$tmp/orders")
    s.read.orc(s"$tmp/orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_keys"))
  }

  /** S9 — the `cbio` DataSource V2: write the cBioPortal headered TSV via
    * our sink, read it back through the custom source (typed NUMBER
    * columns, metadata from the header block, reader-side column
    * pruning), aggregate. The only full custom-source surface in the
    * engine — see `sources/CbioTsvSource`.
    */
  def s9CbioSource: Q = (s, dir) => {
    val tmp = java.nio.file.Files.createTempDirectory("graft-s9").toString
    val f = s"$tmp/region.txt"
    Tsv.writeTsvFile(Tables.region(s, dir), f, headerBlock = Seq(
      "#Region Key\tRegion Name",
      "#The region key\tThe region name",
      "#NUMBER\tSTRING",
      "#1\t1"))
    s.read.format("cbio").load(f)
      .agg(count(lit(1)).as("n"),
        sum(col("r_regionkey")).cast(LongType).as("sum_keys"),
        countDistinct(col("r_name")).as("n_names"))
  }

  /** S11/K6 — the `cbio` WRITE path (the reference's `save_to_synapse`,
    * `load.py:38-82`): store `customer` twice through the distributed
    * DSv2 sink (staged part files, rename-on-commit, `_version.json`
    * version-comment sidecar — the Synapse entity-versioning surface),
    * then read the committed dataset back through the cbio reader and
    * aggregate. Oracle aggregates the original parquet, so serialization,
    * commit visibility and overwrite semantics are all on the hash.
    */
  def s11CbioStoreRoundtrip: Q = (s, dir) => {
    val tmp = java.nio.file.Files.createTempDirectory("graft-s11").toString + "/customer"
    val df = Tables.customer(s, dir).select(
      col("c_name"), col("c_mktsegment"),
      col("c_acctbal").cast(DoubleType).as("c_acctbal"))
    df.write.format("cbio").option("versionComment", "initial export")
      .mode("overwrite").save(tmp)
    df.write.format("cbio").option("versionComment", "refresh")
      .mode("overwrite").save(tmp)
    require(graft.sources.CbioTsvSource.currentVersion(tmp).contains((2L, "refresh")),
      "cbio store must bump the version sidecar per commit")
    s.read.format("cbio").load(tmp)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("c_name")).as("n_names"),
        sum(col("c_acctbal")).as("sum_bal"))
      .select(col("c_mktsegment"), col("n"), col("n_names"),
        bround(col("sum_bal"), 2).as("sum_bal"))
  }

  /** S12/S1 — the Synapse ingest surface (`syn.get(synid).path` →
    * read, reference `clinical.py:319`, `utils.py:25-49`) over the mock
    * entity store: store `region` twice under one entity (v2 recases the
    * names), then read version 1 PINNED and the latest side by side
    * through `format("synapse")`. The oracle reconstructs both versions
    * from the original parquet — version resolution, the store round-trip
    * and the folder-children surface are all on the hash.
    */
  def s12SynapseFetch: Q = (s, dir) => {
    val root = java.nio.file.Files.createTempDirectory("graft-s12").toString
    val region = Tables.region(s, dir).select(col("r_regionkey"), col("r_name"))
    val id = graft.sources.SynapseStore.store(region, root, "region.txt", "synFolder", "initial")
    graft.sources.SynapseStore.store(
      region.withColumn("r_name", upper(col("r_name"))),
      root, "region.txt", "synFolder", "recased")
    require(graft.sources.SynapseStore.getChildren(root, "synFolder").map(_._2) == Seq("region.txt"),
      "folder listing must see exactly the stored entity")
    val v1 = s.read.format("synapse").option("store", root)
      .option("version", "1").load(id)
      .select(lit("v1").as("ver"), col("r_name"))
    val latest = s.read.format("synapse").option("store", root).load(id)
      .select(lit("v2").as("ver"), col("r_name"))
    v1.unionByName(latest)
  }

  /** P1 — regex filter with pandas `na=False` semantics (null text counts
    * as non-match → row kept) scoped to one partition value (reference
    * `clinical.py:74-95`).
    */
  def p1FilterNaFalse: Q = (s, dir) => {
    Tables.documents(s, dir)
      .filter(
        (!Fns.rlikeNaFalse(col("text"), "slow (?:join|scan)") && col("lang") === "en")
          || !(col("lang") <=> "en"))
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** P2 — not-equal filter that KEEPS nulls (pandas `!=` on NaN is True;
    * reference `maf.py:181-195`).
    */
  def p2NeqKeepNulls: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .filter(Fns.neqKeepNulls(col("l_returnflag"), lit("A")))
      .groupBy(col("l_linestatus")).agg(count(lit(1)).as("n"))
  }

  /** P3+P4 — partition filter + static projection (reference
    * `clinical.py:572-578`, `clinical.py:323-325`). At scale the filter is
    * a partition-pruned read of a `partitionBy("Dataset")` layout.
    */
  def p3PartitionFilter: Q = (s, dir) => {
    Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
  }

  /** P5 — dynamic projection dropping all-NA columns: one aggregate pass
    * counts non-nulls, then the projection excludes empty columns
    * (reference `clinical.py:538-547`). The all-null `junk` column must
    * vanish from the output schema.
    */
  def p5DropAllNaCols: Q = (s, dir) => {
    val df = Tables.orders(s, dir)
      .withColumn("junk", lit(null).cast(StringType))
      .select("o_orderkey", "o_orderstatus", "junk", "o_custkey")
    val counts = df.select(
      df.columns.map(c => count(Fns.qcol(c)).as(c)).toIndexedSeq: _*).head()
    val keep = df.columns.zipWithIndex.filter { case (_, i) => counts.getLong(i) > 0 }.map(_._1)
    df.select(keep.map(Fns.qcol).toIndexedSeq: _*)
  }

  /** P6+A6 — attribute-driven split projection + distinct (one row per
    * patient after projecting patient attributes; reference
    * `clinical.py:365-400`).
    */
  def p6SplitDistinct: Q = (s, dir) => {
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderstatus"))
      .distinct()
  }

  /** P7 — bulk dict-driven rename (reference `clinical.py:334-340`). */
  def p7RenameBulk: Q = (s, dir) => {
    Tables.customer(s, dir)
      .withColumnsRenamed(Map(
        "c_custkey" -> "PATIENT_ID",
        "c_name" -> "PATIENT_NAME",
        "c_mktsegment" -> "SEGMENT"))
      .select(col("PATIENT_ID"), col("PATIENT_NAME"), col("SEGMENT"))
  }

  /** J1 — left equi-join against a small curation mapping → broadcast hash
    * join, no shuffle of the big side (reference `clinical.py:320-327`).
    */
  def j1LeftBroadcast: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "left")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
  }

  /** J2 — join keys cast-normalized to string before the merge (pandas
    * `.astype(str)`; reference `clinical.py:231-262`, F7).
    */
  def j2CastKeyJoin: Q = (s, dir) => {
    // The astype(str)-normalized key join, cast written IN the join
    // condition: graft.plans.UnwrapCastKeyJoin proves the integral→
    // string cast injective for equality and hashes the raw longs —
    // 60M UTF8String renders never happen (the r13 classification had
    // this at ~19× the single-node oracle WITH the renders; the
    // semantics are bit-identical, locked by UnwrapCastKeyJoinSpec).
    val li = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))
    li.join(broadcast(sup),
        li("l_suppkey").cast(StringType) === sup("s_suppkey").cast(StringType),
        "left")
      .groupBy(col("s_name")).agg(count(lit(1)).as("n"))
  }

  /** J3 — FULL OUTER join with row-growth visibility (reference
    * `clinical.py:265-287`: outer merge, then neo-only keys are an error).
    */
  def j3FullOuter: Q = (s, dir) => {
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
    val o = Tables.orders(s, dir).select(col("o_custkey"), col("o_orderkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "outer")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("o_orderkey")).as("n_orders"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("n_orphan_orders"))
  }

  /** J4 — enrichment lookup join replacing the reference's
    * oncotree-converter subprocess (reference `clinical.py:477-496`):
    * code → (type, detailed) via a broadcast dim chain.
    */
  def j4LookupEnrich: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** J5 — annotation join with a failure channel: enrich against a partial
    * annotation table; unmatched rows are counted as the error report
    * (reference `maf.py:104-130`, Genome Nexus → annotated MAF + failure
    * report).
    */
  def j5AnnotationJoin: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val ann = Tables.part(s, dir)
      .filter(col("p_size") > 25)
      .select(col("p_partkey"), col("p_type").as("annotation"))
    li.join(broadcast(ann), li("l_partkey") === ann("p_partkey"), "left")
      .groupBy(col("l_returnflag"))
      .agg(
        count(col("annotation")).as("n_annotated"),
        sum(when(col("annotation").isNull, 1L).otherwise(0L)).as("n_failed"))
  }

  /** J5 live mode — the SAME enrichment as j5_annotation_join, but
    * through [[graft.pipelines.LiveAnnotator]]: a once-per-partition
    * client, fixed-size request batches, per-item FAILED rows (reference
    * `maf.py:95-130`'s pooled Genome Nexus calls). The in-process client
    * stands in for the HTTP service, and is shaped like one: the
    * SERVICE owns the lookup data — a [[graft.sources.KeyedStore]]
    * (sorted on-disk shards, built once as a distributed Spark job,
    * probed via mmap binary search). The task closure carries a PATH
    * string; driver and executor memory are O(1) in the scale factor.
    * Oracle: identical SQL to j5_annotation_join — live mode must be
    * indistinguishable from the join form.
    */
  def j5LiveAnnotate: Q = (s, dir) => {
    import graft.pipelines.LiveAnnotator
    import graft.sources.KeyedStore
    val li = Tables.lineitem(s, dir).select(col("l_partkey"), col("l_returnflag"))
    val storePath = annStoreRoot(s, dir).toString
    val annotated = LiveAnnotator.annotateLive(
      li, Seq("l_partkey"), Seq("annotation"),
      () => new LiveAnnotator.Client {
        private val store = KeyedStore.open(storePath) // per-JVM mmap cache
        def annotateBatch(keys: Seq[String]): Seq[Option[Seq[String]]] =
          keys.map(k => store.lookup(k).map(Seq(_)))
      }, batchSize = 256)
    annotated.groupBy(col("l_returnflag"))
      .agg(count(col("annotation")).as("n_annotated"),
        sum(when(col("annotation").isNull, 1L).otherwise(0L)).as("n_failed"))
  }

  /** Build-once location of the mock annotation service's keyed store
    * for `dir`'s part table (identity = source file size + mtime, the
    * [[graft.queries.TextQueries]] decont-index idiom): the service's
    * data outlives any one query session.
    */
  private def annStoreRoot(s: SparkSession, dir: String): java.nio.file.Path = {
    import java.nio.file.Paths
    val src = Paths.get(dir).resolve("part.parquet")
    // identity = hash of the contained part files' names+sizes+mtimes
    // (ContentIdent), not the directory's own metadata — an in-place
    // same-name rewrite must invalidate the store
    val ident = s"$src:${graft.sources.ContentIdent.of(src)}:annp25"
    val hash = java.security.MessageDigest.getInstance("MD5")
      .digest(ident.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val root = Paths.get(System.getProperty("java.io.tmpdir"), "graft-ann-store", hash)
    graft.sources.KeyedStore.build(
      Tables.part(s, dir).filter(col("p_size") > 25)
        .select(col("p_partkey"), col("p_type")),
      "p_partkey", "p_type", root)
    root
  }

  /** J6 — semi-join case list: entities retained iff present in the fact
    * table (reference `load.py:12-35` cases_sequenced).
    */
  def j6SemiJoin: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  /** J6b — anti-join complement (entities with no facts). */
  def j6AntiJoin: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** J7 — co-located join over bucketed tables (scale extension of the
    * reference's repeated clinical⋈mutation joins, SURVEY §2.3): both
    * facts bucketed on the join key at write time, so the join plans a
    * SortMergeJoin with NO exchange on either side — at 1000 executors
    * the shuffle is paid once at ingest, then every downstream join is
    * local. PlanChecksSpec asserts the no-exchange property.
    */
  def j7BucketedColocated: Q = (s, dir) => {
    // Bucketing is a LAYOUT decision amortized over every query that
    // joins on the key — so the tables are keyed by the input dir and
    // written once per session, and repeated runs (bench reps after the
    // warmup pass) measure the co-located JOIN, not the one-time layout
    // job. A fresh session re-creates them (in-memory catalog), so
    // correctness never depends on leftover state.
    val key = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(java.nio.file.Paths.get(dir)
        .toAbsolutePath.toString))
    val tmp = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft-bucket-$key").toString
    val db = s"graft_b$key"
    Layout.ensureDb(s, db, tmp)
    // Not in this session's catalog -> (re)create, clearing any leftover
    // location a previous JVM wrote (saveAsTable refuses to adopt it).
    def freshBucketed(table: String, df: => org.apache.spark.sql.DataFrame,
                      bucketKey: String): Unit =
      if (!s.catalog.tableExists(s"$db.$table")) {
        val p = new org.apache.hadoop.fs.Path(tmp, table)
        val fs = p.getFileSystem(s.sessionState.newHadoopConf())
        if (fs.exists(p)) fs.delete(p, true)
        Layout.writeBucketed(df, db, table, 8, Seq(bucketKey), Seq(bucketKey))
      }
    freshBucketed("customer_b",
      Tables.customer(s, dir).select("c_custkey", "c_mktsegment"), "c_custkey")
    freshBucketed("orders_b",
      Tables.orders(s, dir).select("o_custkey", "o_orderkey", "o_orderstatus"), "o_custkey")
    // merge hint: at test scale the dimension side fits the broadcast
    // threshold, which would hide the property under test — at 100 TB
    // neither side broadcasts and the bucketed SMJ is the real plan.
    val c = s.table(s"$db.customer_b").hint("merge")
    val o = s.table(s"$db.orders_b").hint("merge")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), countDistinct(col("o_orderkey")).as("n_orders"))
  }

  /** A1/K3 — case-list grouping: group → ordered id list (reference
    * `clinical.py:659-680`), rendered as a tab-joined string for exact
    * oracle comparison.
    */
  def a1GroupCollect: Q = (s, dir) => {
    Tables.customer(s, dir)
      .groupBy(col("c_mktsegment"))
      .agg(
        concat_ws("\t",
          transform(array_sort(collect_list(col("c_custkey"))), x => x.cast(StringType)))
          .as("case_ids"),
        count(lit(1)).as("n"))
  }

  /** A4/A5 — duplicate detection, full-row and keyed (reference
    * `maf.py:238-240`, `clinical.py:214-226`): keys with count > 1.
    */
  def a4DupDetect: Q = (s, dir) => {
    Tables.orders(s, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
  }

  /** A2/A3 — exact distinct counts + row counts, the before/after
    * preservation checks (reference `clinical.py:809-817`). Exact (not
    * approximate) because the validations require equality; one aggregate
    * pass over the fact table computes all four.
    */
  def a2CountDistinct: Q = (s, dir) => {
    Tables.orders(s, dir)
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"),
        count(col("o_orderpriority")).as("n_priority_nonnull"))
  }

  /** A2b — APPROXIMATE distinct count: the scale companion to A2. The
    * reference's validations need exact equality, so exact countDistinct
    * stays the parity operator — but at 100 TB the profiling/monitoring
    * side of a pipeline runs on sketches: fixed-size state, one pass,
    * mergeable across partitions. This face runs the engine-portable
    * explicit-register HLL ([[graft.functions.PortableHll]], p=8 ⇒
    * m=256 registers, rsd ≈ 6.5%): ONE fact scan fans each row into two
    * tagged hash streams (orderkey, partkey), registers fold by MAX
    * (map-side-combinable to ≤ 2·m rows per partition), and the
    * all-integer register algebra plus the IEEE-safe estimator make the
    * result bit-identical in any engine — this query hash-matches a
    * DuckDB oracle computing the same registers, where the previous
    * native-HLL++ face could only be rows-checked (engine-specific bias
    * tables). Raw estimator domain: cardinality ≥ 2.5·m = 640 — both
    * key columns clear it from sf0.01 up; the accuracy bound is
    * spec-locked at controlled cardinalities in RefQueriesSpec.
    */
  def a2ApproxDistinct: Q = (s, dir) => {
    import graft.functions.PortableHll
    val P = 8
    val tagged = Tables.lineitem(s, dir).select(explode(array(
        struct(lit("orders").as("k"), col("l_orderkey").cast("string").as("v")),
        struct(lit("parts").as("k"), col("l_partkey").cast("string").as("v")))).as("e"))
      .select(col("e.k").as("k"), graft.functions.Hashing.md5Long(col("e.v")).as("h"))
    tagged
      .select(col("k"), PortableHll.bucket(col("h"), P).as("b"),
        PortableHll.rho(col("h"), P).as("rho"))
      .groupBy(col("k"), col("b")).agg(max(col("rho")).as("reg"))
      .groupBy(col("k"))
      .agg(PortableHll.z48(col("reg"), P).as("z48"))
      .select(col("k"),
        PortableHll.estimate(col("z48"), P).as("approx_distinct"),
        col("z48"))
      .orderBy(col("k"))
  }

  /** A4b — full-row duplicate detection (reference `maf.py:238-240`:
    * `df.duplicated()` any → error), reported as the duplicated rows with
    * multiplicity. groupBy-all-columns form: one shuffle on the row hash,
    * no driver-side distinct-count comparison needed.
    */
  def a4FullRowDup: Q = (s, dir) => {
    val dup = Tables.region(s, dir) // small table unioned onto itself → known dups
    val df = dup.unionByName(dup.filter(col("r_regionkey") < 2))
    df.groupBy(df.columns.map(Fns.qcol).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(col("r_regionkey"), col("n"))
  }

  /** A7 — keep-last dedup by key: pandas `drop_duplicates(keep="last")`
    * made deterministic with an explicit priority ordering (reference
    * `clinical.py:440-474`).
    */
  def a7KeepLast: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"))
  }

  /** A8 — columnwise NA aggregates: per-column null counts + total
    * (reference `clinical.py:129-133`, `clinical.py:826-837`,
    * `maf.py:266-269`). Single aggregate pass, no per-column jobs.
    */
  def a8NaAggregates: Q = (s, dir) => {
    val df = Tables.orders(s, dir)
    val nullCount = (c: String) => sum(when(col(c).isNull, 1L).otherwise(0L))
    df.agg(
      nullCount("o_orderkey").as("na_orderkey"),
      nullCount("o_custkey").as("na_custkey"),
      nullCount("o_orderstatus").as("na_status"),
      nullCount("o_totalprice").as("na_totalprice"),
      count(lit(1)).as("n_rows"))
  }

  /** A9/U4 — distinct-set equality via symmetric anti-join counts
    * (reference `maf.py:241-247`, `validate.py:152-157`).
    */
  def a9SetEquality: Q = (s, dir) => {
    // Both directions in one shuffle: tag sides, group on the key, count
    // one-sided keys — equivalent to two distinct+except jobs at a quarter
    // of the passes over the fact table (the shape that matters at 100 TB).
    Tables.orders(s, dir).select(col("o_orderkey").as("k"), lit(1).as("side"))
      .unionByName(Tables.lineitem(s, dir).select(col("l_orderkey").as("k"), lit(2).as("side")))
      .groupBy(col("k"))
      .agg(max(when(col("side") === 1, 1).otherwise(0)).as("in_a"),
        max(when(col("side") === 2, 1).otherwise(0)).as("in_b"))
      .agg(sum(when(col("in_a") === 1 && col("in_b") === 0, 1L).otherwise(0L)).as("a_minus_b"),
        sum(when(col("in_b") === 1 && col("in_a") === 0, 1L).otherwise(0L)).as("b_minus_a"))
  }

  /** U1/U2 — union by name with missing-column NaN fill (pandas outer
    * `concat`; reference `maf.py:35`, `clinical.py:465`).
    */
  def u1UnionByName: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
      .select(col("c_name").as("name"), col("c_acctbal").as("acctbal"),
        col("c_mktsegment").as("segment"))
    val sup = Tables.supplier(s, dir)
      .select(col("s_name").as("name"), col("s_acctbal").as("acctbal"))
    c.unionByName(sup.withColumn("segment", lit(null).cast(StringType)),
        allowMissingColumns = true)
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"), bround(sum(col("acctbal")), 2).as("sum_bal"))
  }

  /** U4 — except / set difference (reference `validate.py:170-172`). */
  def u4Except: Q = (s, dir) => {
    val c = Tables.customer(s, dir).select(col("c_custkey").as("k"))
    val o = Tables.orders(s, dir).select(col("o_custkey").as("k"))
    c.except(o)
  }

  /** F1 — first-literal-occurrence replace via the custom ReplaceFirst
    * expression (reference `clinical.py:98-133`; Spark's regexp_replace
    * hits ALL occurrences, so this needs the custom expression).
    */
  def f1ReplaceFirst: Q = (s, dir) => {
    Tables.part(s, dir)
      .select(col("p_partkey"),
        replaceFirst(col("p_name"), lit(" "), lit("_")).as("name_first_us"))
  }

  /** F2/F3 — case normalization: CAPS and Title Case after `_`→space
    * (reference `clinical.py:136-167`). `type_title_exact` drives the
    * [[graft.functions.PyTitleCase]] expression through the inputs where
    * `initcap` diverges from Python `str.title()` — a cased letter after
    * a digit or apostrophe starts a word (`"42'kit"` → `"42'Kit"`).
    */
  def f2CapsTitle: Q = (s, dir) => {
    Tables.part(s, dir)
      .select(col("p_partkey"),
        Fns.capsCase(col("p_type")).as("type_caps"),
        Fns.titleCase(col("p_type")).as("type_title"),
        Fns.titleCase(concat(col("p_type"), lit(" "),
          col("p_partkey").cast("string"), lit("'kit"))).as("type_title_exact"))
  }

  /** F4 — conditional coalesce id remap (reference `clinical.py:170-196`). */
  def f4CoalesceRemap: Q = (s, dir) => {
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Fns.remapId(nullif(col("source"), lit("src0")), col("lang")).as("display_id"))
  }

  /** F5 — dict recode, unmapped values pass through as strings (reference
    * `clinical.py:403-422`).
    */
  def f5Recode: Q = (s, dir) => {
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        Fns.recode(col("o_orderstatus"), Map("O" -> "0:OPEN", "F" -> "1:FINISHED"))
          .as("status_recoded"))
  }

  /** F6 — days→months: `bround(col / 30.44, 2)` (reference
    * `clinical.py:515-535`; pandas HALF_EVEN → bround).
    */
  def f6DaysToMonths: Q = (s, dir) => {
    Tables.orders(s, dir)
      .select(col("o_orderkey"), Fns.daysToMonths(col("o_totalprice")).as("months"))
  }

  /** F9 — consecutive fixed-size chunk assignment over a defined global
    * order (reference `maf.py:39-72`). Rides
    * [[graft.pipelines.MafPipeline.assignChunks]], whose row numbering is
    * the distributed PrefixSum (range shuffle + broadcast offsets) — no
    * partitionless global window anywhere in this plan.
    */
  def f9Chunks: Q = (s, dir) => {
    graft.pipelines.MafPipeline
      .assignChunks(Tables.orders(s, dir).select(col("o_orderkey")), "o_orderkey", 400)
      .groupBy(col("chunk")).agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("first_key"), max(col("o_orderkey")).as("last_key"))
  }

  /** O1 — global ordered top-N (§2.5 extension; the reference never
    * sorts, but an engine needs the limit-pushdown shape): orderBy+limit
    * must plan TakeOrderedAndProject — each task keeps a bounded heap of
    * N rows and only those reach the driver, never a full global sort
    * (PlanChecksSpec asserts the physical operator).
    */
  def o1TopN: Q = (s, dir) => {
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** V* — the validation suite as one report frame (rule, value); every
    * rule is an aggregate query (reference §2.10; `utils.py:52-58`
    * error-accumulator replaced by a data result).
    */
  def vReport: Q = (s, dir) => {
    graft.validation.Rules.standardReport(s, dir)
  }

  /** V18 — the external cBioPortal validator's rule set
    * ([[graft.validation.PortalRules]]; reference `validate.py:198-226`
    * shells out to `validateData.py --no_portal_checks
    * --strict_maf_checks`) driven end-to-end: strict-MAF field checks +
    * id-containment as distributed aggregates/anti-joins over frames
    * derived deterministically from the corpus, plus the structural
    * package checks run against a real (small, deterministic) study
    * package written through the cbio sinks. Field checks are ONE
    * aggregate pass over the MAF-shaped fact frame; each containment is
    * one anti-join shuffle — the shapes that survive a 100 TB MAF.
    */
  def v18PortalRules: Q = (s, dir) => {
    // Measured negative result (r15): wrapping this construction in
    // Tuned.withWidth (the graph/ppjoin static width-matched recipe)
    // read 2.72/2.81 s vs 2.79 baseline at sf0.1/32c reps=1 — the
    // reps=1 cost is dominated by tiered-JIT warmup of the 37-rule
    // fused pass's generated code (V18Profile3: exec 5.95 → 1.45 →
    // 0.63 → 0.59 s across identical runs), not by task width; the
    // steady-state floor is ~1.8 s with or without the wrap.
    import s.implicits._
    import graft.validation.{PortalRules, Rules}
    val customer = Tables.customer(s, dir)
    val pk = pmod(col("c_custkey"), lit(1000L))
    def mkSamples(df: DataFrame): DataFrame = df.select(
      concat(lit("S"), col("c_custkey").cast(StringType)).as("SAMPLE_ID"),
      concat(lit("P"), pk.cast(StringType)).as("PATIENT_ID"),
      col("c_mktsegment").as("CANCER_TYPE"))
    val samples = mkSamples(customer)
    // patients table misses every patient id divisible by 97 — a seeded,
    // data-dependent violation rate for the containment rule
    val patients = customer.filter(pmod(pk, lit(97L)) =!= 0L)
      .select(concat(lit("P"), pk.cast(StringType)).as("PATIENT_ID")).distinct()

    val maf = v18Maf(s, dir)

    // Launch the fact-side distributed jobs FIRST — the driver-side
    // package build below (collects + TSV/meta/case-list writes) costs
    // 1-2 s that would otherwise serialize in front of them.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fieldF = Future(Rules.evaluate(s, maf, PortalRules.mafFieldRules(maf)))
    val v1F = Future(PortalRules.subsetViolations(samples, "PATIENT_ID", patients, "PATIENT_ID"))
    // row-level (maf_barcode_in_samples) and distinct (case-list) barcode
    // containment share ONE anti-join: count + count-distinct over the
    // same unmatched slice instead of two shuffles of the fact side
    val barcodesF = Future {
      // aggregate barcodes to (key, n) BEFORE the anti-join (the
      // subsetViolations shape): the map-side combine moves |barcodes|
      // rows instead of the 60M-row fact column
      val r = maf.groupBy(col("Tumor_Sample_Barcode").as("bk"))
        .agg(count(lit(1)).as("n"))
        .join(samples.select(col("SAMPLE_ID").as("bk")).distinct(), Seq("bk"), "left_anti")
        .agg(coalesce(sum(col("n")), lit(0L)), count(col("bk"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val dupF = Future(Rules.evaluate(s, samples, Seq(Rules.noKeyedDups("SAMPLE_ID")))
      .head().getLong(1))
    // tier 6: patient-key uniqueness + orphan patients (patients with no
    // sample), both over the same small frames
    val dupPatF = Future(Rules.evaluate(s, patients,
      Seq(Rules.noKeyedDups("PATIENT_ID"))).head().getLong(1))
    val orphanF = Future(PortalRules.subsetViolations(
      patients, "PATIENT_ID", samples, "PATIENT_ID", distinctChild = true))
    // tier 8: gene-identifier consistency
    val geneF = Future(PortalRules.hugoEntrezInconsistencies(maf))

    // a small deterministic study package through the real sinks; the
    // structural rules then audit actual on-disk meta/header/case-list
    // files, not an in-memory mock. The package is a pure function of
    // the customer table, so it is materialized ONCE per corpus version
    // as a DurableIndex artifact (optimization r14) — the same idiom as
    // the fixture MAF above: the validator's job is to VALIDATE a
    // written package, not to re-write the identical fixture on every
    // invocation (the driver-side TSV/meta/case-list writes + the id
    // collect cost ~1.5 s per run and serialized with the report's
    // critical path).
    val studyId = "graft_v18"
    val samplesSmall = mkSamples(customer.filter(col("c_custkey") <= 500L))
      // a NUMBER-typed attribute with a seeded parse violation every 89th
      // key — exercises clinical_number_attrs_numeric data-dependently
      .withColumn("AGE_MONTHS",
        when(pmod(expr("CAST(substring(SAMPLE_ID, 2) AS BIGINT)"), lit(89L)) === 0L,
          lit("ninety")).otherwise(
          pmod(expr("CAST(substring(SAMPLE_ID, 2) AS BIGINT)"), lit(120L))
            .cast(StringType)))
      // a BOOLEAN-typed attribute violated every 71st key — exercises
      // clinical_boolean_attrs_boolean data-dependently
      .withColumn("IS_PRIMARY",
        when(pmod(expr("CAST(substring(SAMPLE_ID, 2) AS BIGINT)"), lit(71L)) === 0L,
          lit("maybe"))
          .when(pmod(expr("CAST(substring(SAMPLE_ID, 2) AS BIGINT)"), lit(2L)) === 0L,
            lit("TRUE")).otherwise(lit("FALSE")))
    // tier-8 fixture: a cases_sequenced list that DISAGREES with the MAF
    // both ways — every 6th sample id is left off the list (mutated but
    // unlisted wherever the MAF carries its barcode), and three ghost
    // ids claim sequencing that produced no mutations. The id collect is
    // session-cached (control-table idiom): one ≤501-row collect per
    // (session, corpus), not one per invocation.
    val allSampleIds = FrameCache.cachedStrings(s, s"v18_sample_ids:$dir")(
      samplesSmall.select(col("SAMPLE_ID")).collect()
        .map(_.getString(0)).sorted).toSeq
    val sequencedIds = allSampleIds
      .filter(id => id.stripPrefix("S").toLong % 6L != 0L) ++
      Seq("SEQGHOST1", "SEQGHOST2", "SEQGHOST3")
    val pkgSrc = java.nio.file.Paths.get(dir).resolve("customer.parquet")
    val pkgIdent = s"$pkgSrc:${graft.sources.ContentIdent.of(pkgSrc)}:v18pkg1"
    val pkgRoot = graft.sources.DurableIndex.once("graft-v18-pkg", pkgIdent) { pkg =>
      val tmp = pkg.toString
      Tsv.writeTsvFile(samplesSmall, s"$tmp/data_clinical_sample.txt", Seq(
        "#Sample ID\tPatient ID\tCancer Type\tAge Months\tIs Primary",
        "#Sample identifier\tPatient identifier\tCancer type\tAge in months\tPrimary sample",
        "#STRING\tSTRING\tSTRING\tNUMBER\tBOOLEAN",
        "#1\t1\t1\t1\t1"))
      // OS_STATUS breaks the <0|1>:<LABEL> event coding every 83rd patient
      // key — exercises clinical_survival_status_format data-dependently.
      // OS_MONTHS (declared NUMBER) carries the tier-8 seeds, one per
      // rule, in priority order: an alternate NA spelling every 79th key
      // (clinical_na_spellings; also a NUMBER-parse violation), leading
      // whitespace every 73rd (clinical_value_whitespace; also a
      // NUMBER-parse violation), a negative survival time every 67th
      // (clinical_survival_months_nonneg — numerically valid, so ONLY the
      // months rule fires).
      val patientSmall = samplesSmall.select(col("PATIENT_ID")).distinct()
        .withColumn("OS_STATUS", {
          val pkP = expr("CAST(substring(PATIENT_ID, 2) AS BIGINT)")
          when(pmod(pkP, lit(83L)) === 0L, lit("LIVING"))
            .when(pmod(pkP, lit(2L)) === 0L, lit("0:LIVING"))
            .otherwise(lit("1:DECEASED"))
        })
        .withColumn("OS_MONTHS", {
          val pkP = expr("CAST(substring(PATIENT_ID, 2) AS BIGINT)")
          when(pmod(pkP, lit(79L)) === 0L, lit("N/A"))
            .when(pmod(pkP, lit(73L)) === 0L, lit(" 12.5"))
            .when(pmod(pkP, lit(67L)) === 0L, lit("-3"))
            .otherwise(concat(pmod(pkP, lit(240L)).cast(StringType), lit(".5")))
        })
      Tsv.writeTsvFile(patientSmall, s"$tmp/data_clinical_patient.txt",
        Seq("#Patient ID\tOs Status\tOs Months",
          "#Patient identifier\tSurvival status\tSurvival months",
          "#STRING\tSTRING\tNUMBER", "#1\t1\t1"))
      Tsv.writeMetaFile(s"$tmp/meta_clinical_sample.txt", Seq(
        "cancer_study_identifier" -> studyId,
        "genetic_alteration_type" -> "CLINICAL",
        "datatype" -> "SAMPLE_ATTRIBUTES",
        "data_filename" -> "data_clinical_sample.txt"))
      Tsv.writeMetaFile(s"$tmp/meta_clinical_patient.txt", Seq(
        "cancer_study_identifier" -> studyId,
        "genetic_alteration_type" -> "CLINICAL",
        "datatype" -> "PATIENT_ATTRIBUTES",
        "data_filename" -> "data_clinical_patient.txt"))
      Tsv.writeMetaFile(s"$tmp/meta_study.txt", Seq(
        "cancer_study_identifier" -> studyId,
        "type_of_cancer" -> "mixed",
        "name" -> s"$studyId fixture",
        "description" -> "portal-rules fixture study"))
      Tsv.writeCaseLists(samplesSmall, "CANCER_TYPE", "SAMPLE_ID", studyId,
        s"$tmp/case_lists")
      // tier 10: the global `_all` case list (the reference's V1
      // required-file set demands cases_all.txt) — a healthy package
      // carries it, so portal_cases_all_present stays a constant-0 row
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/case_lists/cases_all.txt"),
        (s"cancer_study_identifier: $studyId\n" +
          s"stable_id: ${studyId}_all\n" +
          "case_list_name: All samples\n" +
          "case_list_description: All samples in study\n" +
          "case_list_category: all_cases_in_study\n" +
          s"case_list_ids: ${allSampleIds.mkString("\t")}\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/case_lists/cases_sequenced.txt"),
        (s"cancer_study_identifier: $studyId\n" +
          s"stable_id: ${studyId}_sequenced\n" +
          "case_list_name: Sequenced samples\n" +
          "case_list_description: Samples with mutation data\n" +
          "case_list_category: all_cases_with_mutation_data\n" +
          s"case_list_ids: ${sequencedIds.mkString("\t")}\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val tmp = pkgRoot.toString
    val structural = PortalRules.structuralReport(tmp)

    // the remaining rule groups need the written package: value rules
    // read the clinical files, the sequenced contract reads the list
    val valF = Future(Seq("data_clinical_sample.txt",
      "data_clinical_patient.txt")
      .flatMap(n => PortalRules.clinicalValueViolations(s, tmp, n)))
    val seqF = Future(PortalRules.casesSequencedViolations(
      s, maf, sequencedIds, samplesSmall, "SAMPLE_ID"))
    val fieldReport = Await.result(fieldF, Duration.Inf)
    val (v1, (v2, v3), dup) = (Await.result(v1F, Duration.Inf),
      Await.result(barcodesF, Duration.Inf), Await.result(dupF, Duration.Inf))
    val (dupPat, orphans) =
      (Await.result(dupPatF, Duration.Inf), Await.result(orphanF, Duration.Inf))
    val valViol = Await.result(valF, Duration.Inf)
    val numViol = valViol.map(_("number")).sum
    val boolViol = valViol.map(_("boolean")).sum
    val survViol = valViol.map(_("survival")).sum
    val monthsViol = valViol.map(_("months")).sum
    val naViol = valViol.map(_("na_spelling")).sum
    val wsViol = valViol.map(_("whitespace")).sum
    val decViol = valViol.map(_("deceased_months")).sum
    val geneViol = Await.result(geneF, Duration.Inf)
    val (unsequenced, unlisted) = Await.result(seqF, Duration.Inf)
    (structural ++ Seq(
      ("sample_patient_in_patients", v1, v1 == 0L),
      ("maf_barcode_in_samples", v2, v2 == 0L),
      ("case_list_ids_in_samples", v3, v3 == 0L),
      ("no_dup_sample_id", dup, dup == 0L),
      ("clinical_no_dup_patient_id", dupPat, dupPat == 0L),
      ("clinical_orphan_patients", orphans, orphans == 0L),
      ("clinical_number_attrs_numeric", numViol, numViol == 0L),
      ("clinical_boolean_attrs_boolean", boolViol, boolViol == 0L),
      ("clinical_survival_status_format", survViol, survViol == 0L),
      ("clinical_survival_months_nonneg", monthsViol, monthsViol == 0L),
      ("clinical_na_spellings", naViol, naViol == 0L),
      ("clinical_value_whitespace", wsViol, wsViol == 0L),
      ("clinical_deceased_months_present", decViol, decViol == 0L),
      ("maf_hugo_entrez_consistent", geneViol, geneViol == 0L),
      ("cases_sequenced_ids_have_mutations", unsequenced, unsequenced == 0L),
      ("maf_barcodes_in_cases_sequenced", unlisted, unlisted == 0L)))
      .toDF("rule", "value", "passed")
      .unionByName(fieldReport)
  }

  /** The v18 fixture MAF (seeded strict-MAF violations over lineitem),
    * materialized ONCE per corpus version as an on-disk table
    * ([[graft.sources.DurableIndex]]) and read back columnar. Two
    * reasons, both the production shape: (a) the reference's validator
    * reads a WRITTEN data_mutations file, not an expression stack —
    * validating the materialized table is what `validateData` does;
    * (b) the seeded fixture's 20 derived columns (string concats +
    * CASE cascades over 60M rows) cost ~13 s per scan at sf10, and the
    * report's component jobs (field rules, dup-variant distinct,
    * barcode/gene aggregates) would each re-pay that — against the
    * stored table every component scans ONLY its pruned columns, which
    * is exactly how a 100 TB MAF behaves. Split out so the perf
    * scratch can drive component jobs against the exact production
    * frame.
    */
  private[graft] def v18Maf(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.Paths
    val src = Paths.get(dir).resolve("lineitem.parquet")
    // v18maf5: the build routes through Layout.spread — the driver's
    // single-row-group lineitem parquet otherwise pins the seeding
    // projection to ONE task AND lands the table as one file whose
    // readback pins every consumer (the fused 37-rule pass, the
    // dup-variant distinct, the gene/barcode aggregates) to one task
    // per ~128 MB row group: measured 6-way at sf10 and 1-way at sf0.1
    // on 32 cores. Spread, the table lands as ~parallelism files and
    // every component pass scans at full width.
    val ident = s"$src:${graft.sources.ContentIdent.of(src)}:v18maf5"
    val root = graft.sources.DurableIndex.once("graft-v18-maf", ident) { tmp =>
      graft.sources.Layout.spread(v18MafExprs(s, dir)).write.mode("overwrite")
        .parquet(tmp.resolve("maf").toString)
    }
    s.read.parquet(root.resolve("maf").toString)
  }

  /** The expression-stack form of [[v18Maf]] (the build side). */
  private def v18MafExprs(s: SparkSession, dir: String): DataFrame = {
    val chrm = pmod(col("l_partkey"), lit(27L)) // 0 and 26 are invalid names
    val a5 = pmod(col("l_suppkey"), lit(5L))    // 4 -> 'R', an invalid base
    val a4 = pmod(col("l_suppkey"), lit(4L))
    val a3 = pmod(col("l_suppkey"), lit(3L))
    val vt = pmod(col("l_suppkey"), lit(7L))    // 6 -> 'SNV', invalid type
    val tRef = pmod(col("l_partkey"), lit(1000L))
    val tAlt = when(pmod(col("l_suppkey"), lit(19L)) === 0L, lit(-1L))
      .otherwise(pmod(col("l_orderkey"), lit(500L)))
    Tables.lineitem(s, dir).select(
      concat(lit("S"), pmod(col("l_orderkey"), lit(2347L)).cast(StringType))
        .as("Tumor_Sample_Barcode"),
      // tier-9 seeding: every 59th partkey reports its (valid) name
      // `chr`-prefixed — normalizes clean for the validity rule, counts
      // under maf_chromosome_no_prefix
      concat(
        when(pmod(col("l_partkey"), lit(59L)) === 0L, lit("chr"))
          .otherwise(lit("")),
        when(chrm === 23L, "X").when(chrm === 24L, "Y").when(chrm === 25L, "MT")
          .otherwise(chrm.cast(StringType))).as("Chromosome"),
      col("l_orderkey").as("Start_Position"),
      (col("l_orderkey") + col("l_linenumber") - lit(3L)).as("End_Position"),
      // tier-7 presence seeding: a NULL reference allele every
      // suppkey≡5 (mod 23) row — exempt from the vocabulary rules (both
      // engine and oracle agree NULL is not a *format* violation) but
      // counted by maf_allele_present
      when(pmod(col("l_suppkey"), lit(23L)) === 5L, lit(null).cast(StringType))
        .when(a5 === 0L, "A").when(a5 === 1L, "C").when(a5 === 2L, "G")
        .when(a5 === 3L, "T").otherwise("R").as("Reference_Allele"),
      when(a4 === 0L, "A").when(a4 === 1L, "C").when(a4 === 2L, "G")
        .otherwise("T").as("Tumor_Seq_Allele2"),
      // tier-7: second tumor allele, invalid ('?') every 13th partkey
      when(pmod(col("l_partkey"), lit(13L)) === 0L, "?")
        .when(a3 === 0L, "A").when(a3 === 1L, "C").otherwise("G")
        .as("Tumor_Seq_Allele1"),
      when(col("l_returnflag") === "R", "Somatic")
        .when(col("l_returnflag") === "A", "Germline")
        .otherwise("Unknowable").as("Mutation_Status"),
      // tier-11 seeding: every 7919th partkey reports a build the
      // importer cannot map (fires maf_ncbi_build_known row-wise, and
      // makes maf_ncbi_build_consistent read 1 — two distinct builds)
      when(pmod(col("l_partkey"), lit(7919L)) === 0L, "hg17")
        .otherwise("GRCh38").as("NCBI_Build"),
      // tier-3 seeded columns: classification invalid on partkey%53==0,
      // type invalid on suppkey%7==6, extent-vs-type violated wherever
      // linenumber disagrees with the typed span, status invalid on 'A'
      // rows, entrez seeded below, hugo blank on %487==0
      when(pmod(col("l_partkey"), lit(53L)) === 0L, "Missense_Variant")
        // tier-9: Silent events every 41st partkey (valid vocabulary,
        // but counted by maf_not_loaded_classification and exempt from
        // the protein-change presence rule)
        .when(pmod(col("l_partkey"), lit(41L)) === 0L, "Silent")
        .otherwise("Missense_Mutation").as("Variant_Classification"),
      when(vt === 0L, "SNP").when(vt === 1L, "DNP").when(vt === 2L, "TNP")
        .when(vt === 3L, "ONP").when(vt === 4L, "INS").when(vt === 5L, "DEL")
        .otherwise("SNV").as("Variant_Type"),
      when(col("l_returnflag") === "N", "Untested")
        .when(col("l_returnflag") === "R", "Valid")
        .otherwise("Wrong_Status").as("Validation_Status"),
      // Entrez id is CONSISTENT with the Hugo symbol by construction
      // (gene g ⇒ id g+1) — as in a real MAF, where (symbol, id) pairs
      // are gene-scale; the tier-8 consistency rule's distinct-pair
      // projection must stay gene-scale, not fact-scale (the first
      // entrez formula, partkey%50021, made every gene map to thousands
      // of ids — a 25M-distinct-pair shuffle that cost more than the
      // rest of the report combined). Seeds: every 1999th partkey gets
      // id -7 (negative ⇒ maf_entrez_nonneg, and a CONFLICTING id for
      // its gene ⇒ maf_hugo_entrez_consistent fires data-dependently);
      // every 974th gets 0 — those rows are always blank-Hugo (974 =
      // 2·487), so they fire maf_gene_identifier_present instead and
      // stay out of the consistency rule.
      when(pmod(col("l_partkey"), lit(1999L)) === 0L, lit(-7L))
        .when(pmod(col("l_partkey"), lit(974L)) === 0L, lit(0L))
        .otherwise(pmod(col("l_partkey"), lit(500L)) + lit(1L))
        .as("Entrez_Gene_Id"),
      when(pmod(col("l_partkey"), lit(487L)) === 0L, "")
        .otherwise(concat(lit("G"),
          pmod(col("l_partkey"), lit(500L)).cast(StringType)))
        .as("Hugo_Symbol"),
      // tier-4 seeded columns: reverse strand on linenumber%7==0 rows,
      // verification status invalid on suppkey%11==0; the allele-length
      // and indel-shape rules fire data-dependently off the single-base
      // alleles wherever Variant_Type demands a wider or resized allele
      // reverse strand on linenumber%7==0, NULL (presence violation,
      // vocabulary-exempt) on %7==1
      when(pmod(col("l_linenumber"), lit(7L)) === 0L, "-")
        .when(pmod(col("l_linenumber"), lit(7L)) === 1L,
          lit(null).cast(StringType))
        .otherwise("+").as("Strand"),
      when(pmod(col("l_suppkey"), lit(11L)) === 0L, "Maybe")
        .when(pmod(col("l_suppkey"), lit(11L)) === 1L, "NA")
        .when(pmod(pmod(col("l_suppkey"), lit(11L)), lit(2L)) === 0L, "Verified")
        .otherwise("Unknown").as("Verification_Status"),
      tRef.as("t_ref_count"),
      tAlt.as("t_alt_count"),
      (tRef + tAlt - when(pmod(col("l_orderkey"), lit(29L)) === 0L, lit(5L))
        .otherwise(lit(0L))).as("t_depth"),
      // tier-9 seeded columns: dbSNP id malformed every suppkey≡0 (mod
      // 31), `novel`/blank branches legal; SWISSPROT lowercase (invalid)
      // every 17th; HGVSp blank every 5th linenumber (fires the
      // presence-for-nonsilent rule wherever the classification is
      // protein-affecting) and un-prefixed (format violation) every 29th
      // suppkey; matched-normal alt count negative every 37th suppkey
      when(pmod(col("l_suppkey"), lit(31L)) === 0L, "rsX13")
        .when(pmod(col("l_suppkey"), lit(31L)) === 1L, "novel")
        .when(pmod(col("l_suppkey"), lit(31L)) === 2L, "")
        .otherwise(concat(lit("rs"),
          pmod(col("l_orderkey"), lit(100000L)).cast(StringType)))
        .as("dbSNP_RS"),
      when(pmod(col("l_suppkey"), lit(17L)) === 0L, "p53_human")
        .when(pmod(col("l_suppkey"), lit(17L)) === 1L, "")
        .otherwise(concat(lit("G"),
          pmod(col("l_partkey"), lit(500L)).cast(StringType), lit("_HUMAN")))
        .as("SWISSPROT"),
      when(pmod(col("l_linenumber"), lit(5L)) === 0L, "")
        .when(pmod(col("l_suppkey"), lit(29L)) === 0L, "M1I")
        .otherwise(concat(lit("p.M"),
          (pmod(col("l_orderkey"), lit(1000L)) + lit(1L)).cast(StringType),
          lit("I")))
        .as("HGVSp_Short"),
      pmod(col("l_partkey"), lit(800L)).as("n_ref_count"),
      when(pmod(col("l_suppkey"), lit(37L)) === 0L, lit(-2L))
        .otherwise(pmod(col("l_orderkey"), lit(300L))).as("n_alt_count"))
  }

  val queries: Map[String, Q] = Map(
    "q1_agg" -> q1Agg,
    "s2_tsv_roundtrip" -> s2TsvRoundtrip,
    "s3_comment_scan" -> s3CommentScan,
    "s5_glob_scan" -> s5GlobScan,
    "s6_load_map" -> s6LoadMap,
    "s7_jsonl_roundtrip" -> s7JsonlRoundtrip,
    "s8_orc_roundtrip" -> s8OrcRoundtrip,
    "s10_xml_roundtrip" -> s10XmlRoundtrip,
    "s9_cbio_source" -> s9CbioSource,
    "s11_cbio_store_roundtrip" -> s11CbioStoreRoundtrip,
    "s12_synapse_fetch" -> s12SynapseFetch,
    "p1_filter_na_false" -> p1FilterNaFalse,
    "p2_neq_keep_nulls" -> p2NeqKeepNulls,
    "p3_partition_filter" -> p3PartitionFilter,
    "p5_drop_allna_cols" -> p5DropAllNaCols,
    "p6_split_distinct" -> p6SplitDistinct,
    "p7_rename_bulk" -> p7RenameBulk,
    "j1_left_broadcast" -> j1LeftBroadcast,
    "j2_cast_key_join" -> j2CastKeyJoin,
    "j3_full_outer" -> j3FullOuter,
    "j4_lookup_enrich" -> j4LookupEnrich,
    "j5_annotation_join" -> j5AnnotationJoin,
    "j5_live_annotate" -> j5LiveAnnotate,
    "j6_semi_join" -> j6SemiJoin,
    "j6_anti_join" -> j6AntiJoin,
    "j7_bucketed_colocated" -> j7BucketedColocated,
    "a1_group_collect" -> a1GroupCollect,
    "a2_count_distinct" -> a2CountDistinct,
    "a2_approx_distinct" -> a2ApproxDistinct,
    "a4_dup_detect" -> a4DupDetect,
    "a4_full_row_dup" -> a4FullRowDup,
    "a7_keep_last" -> a7KeepLast,
    "a8_na_aggregates" -> a8NaAggregates,
    "a9_set_equality" -> a9SetEquality,
    "u1_union_by_name" -> u1UnionByName,
    "u4_except" -> u4Except,
    "f1_replace_first" -> f1ReplaceFirst,
    "f2_caps_title" -> f2CapsTitle,
    "f4_coalesce_remap" -> f4CoalesceRemap,
    "f5_recode" -> f5Recode,
    "f6_days_to_months" -> f6DaysToMonths,
    "f9_chunks" -> f9Chunks,
    "o1_top_n" -> o1TopN,
    "v_report" -> vReport,
    "v18_portal_rules" -> v18PortalRules)

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | count(*) AS n_rows, count(DISTINCT l_orderkey) AS n_orders
        | FROM lineitem GROUP BY 1, 2""".stripMargin,
    // NB: integer sums are CAST to BIGINT everywhere in these oracles —
    // DuckDB's sum(INTEGER/BIGINT) returns HUGEINT, which the driver's
    // pandas fetch renders as float64 ("42.0") while Spark's LongType
    // renders "42": a value-hash mismatch on identical results.
    "s2_tsv_roundtrip" ->
      """SELECT count(*) AS n, CAST(sum(p_size) AS BIGINT) AS sum_size,
        | round(sum(p_retailprice), 2) AS sum_price FROM part""".stripMargin,
    "s3_comment_scan" ->
      "SELECT r_regionkey, r_name FROM region",
    "s5_glob_scan" ->
      "SELECT n_nationkey, n_name FROM nation",
    "s6_load_map" ->
      """SELECT 'data_clinical_patient.txt' AS file, TRUE AS present,
        |  count(*)::BIGINT AS n_rows FROM nation
        |UNION ALL SELECT 'data_clinical_sample.txt', TRUE, count(*)::BIGINT FROM region
        |UNION ALL SELECT 'data_mutations.txt', TRUE, count(*)::BIGINT FROM supplier
        |UNION ALL SELECT f, FALSE, -1::BIGINT FROM (VALUES
        |  ('meta_clinical_patient.txt'), ('meta_clinical_sample.txt'),
        |  ('meta_mutations.txt'), ('data_gene_signatures.txt'),
        |  ('meta_gene_signatures.txt'), ('data_rna_seq_mrna.txt'),
        |  ('meta_rna_seq_mrna.txt')) t(f)""".stripMargin,
    "s7_jsonl_roundtrip" ->
      """SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        | count(DISTINCT source) AS n_sources FROM documents GROUP BY 1""".stripMargin,
    "s8_orc_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_keys
        | FROM orders GROUP BY 1""".stripMargin,
    "s10_xml_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n, CAST(sum(c_custkey) AS BIGINT) AS sum_keys,
        | round(sum(c_acctbal), 2) AS sum_bal FROM customer GROUP BY 1""".stripMargin,
    "s9_cbio_source" ->
      """SELECT count(*) AS n, CAST(sum(r_regionkey) AS BIGINT) AS sum_keys,
        | count(DISTINCT r_name) AS n_names FROM region""".stripMargin,
    "s11_cbio_store_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n, count(DISTINCT c_name) AS n_names,
        | round(sum(c_acctbal), 2) AS sum_bal FROM customer GROUP BY 1""".stripMargin,
    "s12_synapse_fetch" ->
      """SELECT 'v1' AS ver, r_name FROM region
        |UNION ALL
        |SELECT 'v2' AS ver, upper(r_name) AS r_name FROM region""".stripMargin,
    "p1_filter_na_false" ->
      """SELECT doc_id, lang, source FROM documents
        | WHERE (NOT coalesce(regexp_matches(text, 'slow (?:join|scan)'), false)
        |        AND lang = 'en')
        |    OR lang IS DISTINCT FROM 'en'""".stripMargin,
    "p2_neq_keep_nulls" ->
      """SELECT l_linestatus, count(*) AS n FROM lineitem
        | WHERE l_returnflag IS DISTINCT FROM 'A' GROUP BY 1""".stripMargin,
    "p3_partition_filter" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        | WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "p5_drop_allna_cols" ->
      "SELECT o_orderkey, o_orderstatus, o_custkey FROM orders",
    "p6_split_distinct" ->
      "SELECT DISTINCT o_custkey, o_orderstatus FROM orders",
    "p7_rename_bulk" ->
      """SELECT c_custkey AS PATIENT_ID, c_name AS PATIENT_NAME,
        | c_mktsegment AS SEGMENT FROM customer""".stripMargin,
    "j1_left_broadcast" ->
      """SELECT p.p_brand, count(*) AS n, sum(l.l_quantity) AS sum_qty
        | FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        | GROUP BY 1""".stripMargin,
    "j2_cast_key_join" ->
      """SELECT s.s_name, count(*) AS n
        | FROM lineitem l LEFT JOIN supplier s
        |   ON CAST(l.l_suppkey AS VARCHAR) = CAST(s.s_suppkey AS VARCHAR)
        | GROUP BY 1""".stripMargin,
    "j3_full_outer" ->
      """SELECT c.c_mktsegment, count(*) AS n_rows, count(o.o_orderkey) AS n_orders,
        | CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_orders
        | FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
        | GROUP BY 1""".stripMargin,
    "j4_lookup_enrich" ->
      """SELECT r.r_name, n.n_name, count(*) AS n_customers
        | FROM customer c
        | LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        | LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        | GROUP BY 1, 2""".stripMargin,
    "j5_annotation_join" ->
      """SELECT l.l_returnflag, count(a.annotation) AS n_annotated,
        | CAST(sum(CASE WHEN a.annotation IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
        | FROM lineitem l LEFT JOIN
        |  (SELECT p_partkey, p_type AS annotation FROM part WHERE p_size > 25) a
        |  ON l.l_partkey = a.p_partkey
        | GROUP BY 1""".stripMargin,
    "j5_live_annotate" ->
      """SELECT l.l_returnflag, count(a.annotation) AS n_annotated,
        | CAST(sum(CASE WHEN a.annotation IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
        | FROM lineitem l LEFT JOIN
        |  (SELECT p_partkey, p_type AS annotation FROM part WHERE p_size > 25) a
        |  ON l.l_partkey = a.p_partkey
        | GROUP BY 1""".stripMargin,
    "j6_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        | WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "j6_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        | WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "j7_bucketed_colocated" ->
      """SELECT c.c_mktsegment, o.o_orderstatus, count(*) AS n,
        | count(DISTINCT o.o_orderkey) AS n_orders
        | FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        | GROUP BY 1, 2""".stripMargin,
    "a1_group_collect" ->
      """SELECT c_mktsegment,
        | string_agg(CAST(c_custkey AS VARCHAR), chr(9) ORDER BY c_custkey) AS case_ids,
        | count(*) AS n
        | FROM customer GROUP BY 1""".stripMargin,
    "a2_count_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS n_customers,
        | count(DISTINCT o_orderkey) AS n_orders,
        | count(*) AS n_rows, count(o_orderpriority) AS n_priority_nonnull
        | FROM orders""".stripMargin,
    "a2_approx_distinct" -> {
      import graft.functions.PortableHll._
      val p = 8
      s"""WITH tagged AS (
        |  SELECT 'orders' AS k, ${duckH("CAST(l_orderkey AS VARCHAR)")} AS h FROM lineitem
        |  UNION ALL
        |  SELECT 'parts' AS k, ${duckH("CAST(l_partkey AS VARCHAR)")} AS h FROM lineitem),
        |w AS (SELECT k, h >> ${60 - p} AS b, ${duckWindow("h", p)} AS w FROM tagged),
        |r AS (SELECT k, b, ${duckRho("w", p)} AS rho FROM w),
        |regs AS (SELECT k, b, max(rho) AS reg FROM r GROUP BY 1, 2),
        |z AS (SELECT k, ${duckZ48(p)} AS z48 FROM regs GROUP BY 1)
        |SELECT k, ${duckEstimate("z48", p)} AS approx_distinct, z48
        |FROM z ORDER BY k""".stripMargin
    },
    "a4_dup_detect" ->
      """SELECT o_custkey, count(*) AS n FROM orders
        | GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    "a4_full_row_dup" ->
      """SELECT r_regionkey, count(*) AS n FROM (
        |  SELECT * FROM region
        |  UNION ALL SELECT * FROM region WHERE r_regionkey < 2)
        | GROUP BY r_regionkey, r_name HAVING count(*) > 1""".stripMargin,
    "a7_keep_last" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus FROM (
        |  SELECT o_custkey, o_orderkey, o_orderstatus,
        |   row_number() OVER (PARTITION BY o_custkey
        |     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,
    "a8_na_aggregates" ->
      """SELECT
        | CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS na_orderkey,
        | CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS na_custkey,
        | CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS na_status,
        | CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS na_totalprice,
        | count(*) AS n_rows
        | FROM orders""".stripMargin,
    "a9_set_equality" ->
      """SELECT
        | (SELECT count(*) FROM
        |   (SELECT DISTINCT o_orderkey FROM orders
        |    EXCEPT SELECT DISTINCT l_orderkey FROM lineitem)) AS a_minus_b,
        | (SELECT count(*) FROM
        |   (SELECT DISTINCT l_orderkey FROM lineitem
        |    EXCEPT SELECT DISTINCT o_orderkey FROM orders)) AS b_minus_a""".stripMargin,
    "u1_union_by_name" ->
      """SELECT segment, count(*) AS n, round(sum(acctbal), 2) AS sum_bal FROM (
        |  SELECT c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment
        |   FROM customer
        |  UNION ALL BY NAME
        |  SELECT s_name AS name, s_acctbal AS acctbal, NULL AS segment
        |   FROM supplier)
        | GROUP BY 1""".stripMargin,
    "u4_except" ->
      """SELECT c_custkey AS k FROM customer
        | EXCEPT SELECT o_custkey AS k FROM orders""".stripMargin,
    "f1_replace_first" ->
      """SELECT p_partkey, regexp_replace(p_name, ' ', '_') AS name_first_us
        | FROM part""".stripMargin,
    "f2_caps_title" ->
      """SELECT p_partkey, upper(replace(p_type, '_', ' ')) AS type_caps,
        | array_to_string(list_transform(string_split(replace(p_type, '_', ' '), ' '),
        |   x -> upper(x[1]) || lower(x[2:])), ' ') AS type_title,
        | array_to_string(list_transform(string_split(replace(p_type, '_', ' '), ' '),
        |   x -> upper(x[1]) || lower(x[2:])), ' ')
        |  || ' ' || CAST(p_partkey AS VARCHAR) || '''Kit' AS type_title_exact
        | FROM part""".stripMargin,
    "f4_coalesce_remap" ->
      """SELECT doc_id, coalesce(nullif(source, 'src0'), lang) AS display_id
        | FROM documents""".stripMargin,
    "f5_recode" ->
      """SELECT o_orderkey,
        | CASE o_orderstatus WHEN 'O' THEN '0:OPEN' WHEN 'F' THEN '1:FINISHED'
        |  ELSE CAST(o_orderstatus AS VARCHAR) END AS status_recoded
        | FROM orders""".stripMargin,
    "f6_days_to_months" ->
      """SELECT o_orderkey, round(o_totalprice / 30.44, 2) AS months
        | FROM orders""".stripMargin,
    "f9_chunks" ->
      """SELECT chunk, count(*) AS n, min(o_orderkey) AS first_key,
        | max(o_orderkey) AS last_key FROM (
        |  SELECT o_orderkey,
        |   CAST(floor((row_number() OVER (ORDER BY o_orderkey) - 1) / 400) AS BIGINT) AS chunk
        |  FROM orders)
        | GROUP BY 1""".stripMargin,
    "o1_top_n" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        | ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "v_report" -> graft.validation.Rules.standardReportOracle,
    "v18_portal_rules" -> graft.validation.PortalRules.fixtureOracle)
}
