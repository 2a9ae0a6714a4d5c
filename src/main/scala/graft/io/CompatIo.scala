package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-compatible output formats.
  *
  * The reference writes `", "`-delimited (comma+space) CSV rows, ordered
  * count-descending, one file per document (reference Code/DocInfo.java:62,
  * Code/TF_IDFWorker.java:42). Spark's csv `sep` is single-char, so the
  * row is pre-joined with concat_ws and written through the text sink.
  *
  * Per-doc file fan-out explodes into millions of tiny files at 100 TB —
  * the default layout is a single columnar/text table with doc_id as a
  * column; `perDoc = true` opts into the compatibility layout
  * (one directory per doc_id via partitionBy).
  */
object CompatIo {

  val RefDelimiter = ", "

  /** Write `cols` of `df` as reference-style `", "`-joined text rows.
    * Ordering: count-desc, word-asc within each doc (T4 order
    * preservation, tie pinned). Under `perDoc`, doc_id becomes the
    * partition directory and is dropped from the row body. */
  def writeRefCsv(df: DataFrame, cols: Seq[String], outDir: String,
                  perDoc: Boolean = false): Unit = {
    val hasDoc = df.columns.contains("doc_id")
    val hasCnt = df.columns.contains("cnt")
    def body(cs: Seq[String]) =
      concat_ws(RefDelimiter, cs.map(c => col(c).cast("string")): _*)
    if (perDoc && hasDoc) {
      val sorted =
        if (hasCnt)
          df.repartition(col("doc_id"))
            .sortWithinPartitions(col("doc_id"), col("cnt").desc,
              col("word").asc)
        else df.repartition(col("doc_id"))
      sorted
        .select(col("doc_id"), body(cols.filterNot(_ == "doc_id")).as("value"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("doc_id").text(outDir)
    } else {
      // co-locate + order each doc's rows even in the single-table layout
      val sorted =
        if (hasDoc && hasCnt)
          df.repartition(col("doc_id"))
            .sortWithinPartitions(col("doc_id"), col("cnt").desc,
              col("word").asc)
        else if (hasCnt) df.orderBy(col("cnt").desc, col("word").asc)
        else df
      sorted.select(body(cols).as("value"))
        .write.mode(SaveMode.Overwrite).text(outDir)
    }
  }

  /** Read-side of the reference's staged-CSV surface (SURVEY §2.1 S6):
    * positional parse of `", "`-delimited rows back into a typed frame,
    * the way the reference re-reads its own staging files
    * (reference Code/TF_IDFWorker.java:22-39 — `line.split(", ")` with
    * fixed field positions; Code/DocInfo.java:62 writes them).
    *
    * `cols` maps each positional field to (name, castType) in file
    * order. Rows with fewer fields yield NULLs (the reference would
    * throw; a declarative source must stay total). Works on any text
    * layout Spark can list — a single file (idf.csv), a directory of
    * part files, or [[writeRefCsv]]'s perDoc `doc_id=<id>/` layout
    * (where doc_id arrives as an auto-discovered partition column).
    */
  def readRefCsv(spark: SparkSession, path: String,
                 cols: Seq[(String, String)]): DataFrame = {
    val raw = spark.read.text(path)
    val parts = split(col("value"), java.util.regex.Pattern.quote(RefDelimiter))
    val keep = raw.columns.filter(_ != "value").map(col).toSeq // partition cols
    raw.select(keep ++ cols.zipWithIndex.map { case ((name, tpe), i) =>
      get(parts, lit(i)).cast(tpe).as(name)
    }: _*)
  }

  /** JSONL (one JSON object per line) — the LLM-training-data
    * interchange format. Write: `to_json` over all columns in schema
    * order through the text sink (Jackson's shortest-round-trip double
    * repr makes the numeric round-trip exact); read: the schema'd json
    * source, so malformed lines surface as NULLs, not task failures.
    * One file per partition — at 100 TB the layout shards exactly like
    * any text table (no per-doc fan-out).
    */
  def writeJsonl(df: DataFrame, outDir: String): Unit =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.mode(SaveMode.Overwrite).text(outDir)

  /** RFC-4180-style quoted CSV round-trip — the real-world CSV dialect
    * next to the reference's positional `", "` one: every field
    * quoted, embedded quotes doubled (escape = quote char), embedded
    * newlines legal inside quotes. The read side sets `multiLine` (a
    * quoted newline spans physical lines — without it the parser
    * splits records mid-field) and the same escape, plus an explicit
    * schema (never inference). Lossless for arbitrary NON-EMPTY text —
    * the gate is an identity twin against the source table, and the
    * spec injects quotes/commas/newlines directly. Known lossy corner
    * (spec-pinned): an empty string writes as `""` but reads back as
    * NULL (the reader's nullValue default) — CSV cannot distinguish
    * the two; JSONL can, use it when empties are semantic.
    */
  def writeQuotedCsv(df: DataFrame, outDir: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("quoteAll", "true")
      .option("escape", "\"")
      .csv(outDir)

  def readQuotedCsv(spark: SparkSession, path: String,
                    schema: org.apache.spark.sql.types.StructType)
  : DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)

  /** Read-side of [[writeJsonl]]: explicit schema (never inference —
    * an inference pass both scans twice and can widen types). */
  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Hive-partitioned parquet layout + partition-pruned read-back —
    * the lake layout a 100 TB corpus actually uses: write once
    * partitioned by a low-cardinality column (lang, source, date);
    * consumers touching one partition read ONLY its files. The read
    * path must show the predicate under `PartitionFilters` (directory
    * pruning — zero I/O on other partitions), not `PushedFilters`
    * (row-group pruning after the file is opened); Round6Spec pins
    * exactly that on the physical scan node.
    */
  def writePartitioned(df: DataFrame, outDir: String,
                       partCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(outDir)

  /** Partition-pruned read of one `partCol=value` slice. */
  def readPartition(spark: SparkSession, dir: String, partCol: String,
                    value: String): DataFrame =
    spark.read.parquet(dir).filter(col(partCol) === value)

  /** Dynamic partition overwrite — the nightly-restatement write of a
    * partitioned lake: an Overwrite-mode insert that replaces ONLY the
    * partitions present in the incoming frame and leaves every other
    * partition's files untouched (static overwrite, the default, would
    * truncate the whole table first — the classic lost-history
    * footgun). This is how a backfill/restatement job lands: recompute
    * the dirty days, write them, touch nothing else. The mode is a
    * PER-WRITE option, not a session-conf toggle: mutating the shared
    * session conf around the write would race a concurrent plain
    * Overwrite on the same session into dynamic semantics (or clobber
    * a concurrent setter on restore) — ADVICE r9.
    */
  def overwritePartitionsDynamic(df: DataFrame, outDir: String,
                                 partCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(outDir)

  /** Retention PLAN — the TTL half of lake maintenance (next to the
    * [[compactLake]] small-file half): over a `partCol=<date>`
    * partitioned lake, label every partition keep/drop under a
    * keep-last-`keepDays` policy, with the cutoff anchored on the
    * lake's own newest partition (a wall-clock cutoff would make the
    * plan non-reproducible and would empty a stale lake on a delayed
    * run). Pure partition-directory METADATA — one FS listing of the
    * root's immediate children, |partitions| rows, no data file is
    * opened; at lake scale this listing is the catalog's job, same as
    * the [[compactLake]] argument. Unparseable partition values fail
    * loudly (ANSI to_date) rather than silently aging into 'drop'.
    * Output: (partCol DATE, action 'keep'|'drop'), one row per
    * physical partition. */
  def retentionPlan(spark: SparkSession, lakeDir: String,
                    keepDays: Int, partCol: String = "day"): DataFrame = {
    require(keepDays >= 1, s"keepDays must be >= 1: $keepDays")
    import org.apache.hadoop.fs.Path
    val p = new Path(lakeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(partCol + "="))
      .map(_.getPath.getName.drop(partCol.length + 1))
    require(parts.nonEmpty,
      s"retentionPlan: no $partCol= partitions under $lakeDir")
    import spark.implicits._
    val days = parts.toDF("pv").select(to_date(col("pv")).as(partCol))
    val mx = days.agg(max(col(partCol)).as("mx"))
    days.crossJoin(broadcast(mx))
      .select(col(partCol),
        when(datediff(col("mx"), col(partCol)) < keepDays, lit("keep"))
          .otherwise(lit("drop")).as("action"))
  }

  /** Retention EXEC — physically delete the partitions
    * [[retentionPlan]] marked 'drop' and return the surviving lake.
    * The dropped-partition collect is |partitions|-bounded metadata
    * (the plan's own row count); deletes are per-directory FS calls —
    * a partition is removed whole or not at all, and a re-run after a
    * partial failure re-plans against the surviving directories and
    * deletes only what is still due (idempotent, the
    * dynamic-overwrite restatement story). */
  def retentionExec(spark: SparkSession, lakeDir: String,
                    keepDays: Int, partCol: String = "day"): DataFrame = {
    val dropped = retentionPlan(spark, lakeDir, keepDays, partCol)
      .filter(col("action") === "drop")
      .select(col(partCol).cast("string"))
      .collect().map(_.getString(0)) // |partitions|-bounded metadata
    import org.apache.hadoop.fs.Path
    val root = new Path(lakeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    dropped.foreach { d =>
      fs.delete(new Path(root, s"$partCol=$d"), true)
    }
    spark.read.parquet(lakeDir)
  }

  /** ORC interchange — the second first-class columnar lake format
    * next to parquet (Hive-ecosystem consumers): plain columnar write,
    * one file per partition, identical sharding story. Numeric
    * round-trip is exact by construction (typed columnar encoding, no
    * text serialization to pin).
    */
  def writeOrc(df: DataFrame, outDir: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(outDir)

  /** Read-side of [[writeOrc]]: schema comes from the ORC footer
    * (typed, no inference pass). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Schema-evolution read over a parquet lake directory whose batches
    * were written with DIFFERENT (compatible) schemas: `mergeSchema`
    * unions the per-file footer schemas and older batches surface the
    * added columns as NULL — the additive-evolution contract every
    * long-lived lake table ends up needing. Scale note: mergeSchema
    * reads EVERY file footer to build the union (a driver-side
    * O(#files) metadata pass) — at 100 TB the schema belongs in a
    * catalog/metastore and this option stays off; this is the
    * catalog-less surface. `recursiveFileLookup` because evolution
    * batches land as plain subdirectories, not hive partitions. */
  def readMergedParquet(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("mergeSchema", "true")
      .option("recursiveFileLookup", "true")
      .parquet(path)

  /** Bucketed external table write — the shuffle-elimination layout: a
    * fact table hash-bucketed (and sorted) on its join key joins any
    * same-bucketed table with NO Exchange in the plan, because the
    * on-disk layout IS the join distribution. At 100 TB this converts
    * the nightly fact⋈fact shuffle (the single largest exchange in a
    * star-schema pipeline) into a zero-movement zip of co-located
    * buckets; the write itself shuffles once, amortized over every
    * later join. Registered in the session catalog (bucket metadata
    * lives there) with an explicit external `path`; any previous
    * registration is dropped first so gate re-runs are idempotent.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Globally-sorted lake layout: `repartitionByRange` assigns each
    * output file a disjoint, increasing key range (one range-exchange,
    * sampled bounds) and `sortWithinPartitions` orders rows inside it —
    * so the file set as a whole is globally ordered by `sortCols`
    * without a single-partition global sort. At 100 TB this is the
    * layout that makes downstream merge joins and key-range reads
    * cheap: parquet min/max footer stats per file are tight and
    * non-overlapping, so a key-range predicate prunes to the one file
    * holding it (the poor man's clustered index; ScaleLayoutSpec pins
    * both the RangePartitioning exchange and the non-overlapping
    * per-file ranges). `files` sizes the layout — at scale pick
    * bytes/file, not a constant.
    */
  def writeSortedRange(df: DataFrame, outDir: String, files: Int,
                       sortCols: Seq[String]): Unit =
    df.repartitionByRange(files, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(outDir)

  /** Even-bit spread: the low 32 bits of `c` interleaved with zero
    * bits (bit i lands at bit 2i) — the classic mask-and-shift Morton
    * dilation, five codegen'd bitwise ops, no loop, no UDF. */
  private def spreadBits(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val m = Seq(0x0000FFFF0000FFFFL, 0x00FF00FF00FF00FFL,
      0x0F0F0F0F0F0F0F0FL, 0x3333333333333333L, 0x5555555555555555L)
    val x0 = c.bitwiseAND(lit(0xFFFFFFFFL))
    Seq(16, 8, 4, 2, 1).zip(m).foldLeft(x0) { case (x, (s, mask)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(mask))
    }
  }

  /** Z-order (Morton) clustered lake layout — the multi-dimensional
    * generalization of [[writeSortedRange]] (Delta/Hudi `OPTIMIZE
    * ZORDER BY` shape): the two cluster keys' bits interleave into one
    * 64-bit z-value, and a single range-exchange on it gives every
    * output file a compact axis-aligned bounding BOX in (x, y) space
    * instead of a tight range on one key and no locality on the other.
    * Parquet min/max footer stats on BOTH columns stay tight, so a
    * predicate on either key (or a box on both) prunes most files —
    * 1-D sort gives this for its leading key only. ZOrderLayoutSpec
    * pins the claim with measured bounding-box areas vs the 1-D
    * layout; the gate pins row-identity.
    *
    * Keys must be non-negative and < 2^31 after casting to long —
    * enforced IN-PLAN (`raise_error` branch, no extra scan): a
    * violating or NULL key fails the write loudly instead of landing
    * in an arbitrary file. `files` sizes the layout — at scale pick
    * bytes/file, not a constant.
    */
  def writeZOrder(df: DataFrame, outDir: String, files: Int,
                  colX: String, colY: String): Unit =
    df.withColumn("_z", mortonZ(col(colX), col(colY)))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(outDir)

  /** The 64-bit Morton z-value of two non-negative 31-bit keys (x at
    * even bits, y at odd) — pure codegen'd bitwise ops; a NULL or
    * out-of-range key fails loudly in-plan via `raise_error`. Public:
    * the same value serves clustering, bucketing, and range-bounding
    * uses beyond [[writeZOrder]]. */
  def mortonZ(x0: org.apache.spark.sql.Column,
              y0: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val x = x0.cast("long")
    val y = y0.cast("long")
    val inRange = (c: org.apache.spark.sql.Column) =>
      c.isNotNull && c >= 0 && c < 2147483648L
    when(inRange(x) && inRange(y),
        spreadBits(x).bitwiseOR(shiftleft(spreadBits(y), 1)))
      .otherwise(raise_error(
        lit("z-order keys must be non-negative ints")))
  }

  /** Reference-native per-doc layout reader: a directory of
    * `<docID>.csv` files (the reference's staging bucket / TF-IDF-Docs
    * layout), doc_id recovered from the file name. One Spark task per
    * file split — at 100 TB this layout is exactly the small-files
    * problem the engine's columnar default avoids, but reading it back
    * is part of the compatibility surface.
    */
  def readRefDocsDir(spark: SparkSession, dir: String,
                     cols: Seq[(String, String)]): DataFrame =
    readRefCsv(spark, dir, cols)
      .withColumn("doc_id",
        regexp_extract(input_file_name(), "([^/]+)\\.csv$", 1))
      .select((col("doc_id") +: cols.map { case (name, _) => col(name) }): _*)

  /** Small-file compaction planner — the lake-maintenance step that
    * groups a sea of small files into ~`targetBytes` rewrite tasks.
    * Quota-binning: files in id order, exclusive running byte total,
    * bin = excl_total div target (exact integer division, both
    * engines) — so file f lands in the bin whose byte quota its start
    * offset falls into. With every file ≤ target this pins each
    * non-final bin's total inside (target − maxfile, target +
    * maxfile); the greedy close-on-overflow alternative is the
    * sequential fold [[graft.operators.Packing]] already demonstrates
    * (per-shard state, recursive-CTE oracle) — quota-binning is its
    * one-window declarative twin, and bin boundaries are a pure
    * function of the prefix-sum, so adding files only re-bins the
    * suffix. Scale shape: this is FILE METADATA, not data — 100 TB at
    * 128 MB files is ~800k rows, so the single-partition ordering
    * window is bounded by the catalog size, never by data volume
    * (same argument as the daily-revenue spine). Output: (file_id,
    * bytes, bin, bin_files, bin_bytes).
    */
  def compactionPlan(files: DataFrame, targetBytes: Long,
                     idCol: String = "file_id",
                     bytesCol: String = "bytes"): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1: $targetBytes")
    val w = org.apache.spark.sql.expressions.Window
    val ordered = w.orderBy(col("file_id").asc)
      .rowsBetween(w.unboundedPreceding, -1)
    val byBin = w.partitionBy("bin")
    files
      .select(col(idCol).as("file_id"),
        col(bytesCol).cast("long").as("bytes"))
      .withColumn("excl",
        coalesce(sum(col("bytes")).over(ordered), lit(0L)))
      .withColumn("bin", expr(s"excl div ${targetBytes}L"))
      .drop("excl")
      .withColumn("bin_files", count(lit(1)).over(byBin))
      .withColumn("bin_bytes", sum(col("bytes")).over(byBin))
  }

  /** Execute a [[compactionPlan]]: rewrite a directory of small parquet
    * files into one output file per plan bin. The listing is a
    * driver-side metadata pass (O(#files), the [[readMergedParquet]]
    * argument — at lake scale this is the catalog's job); the plan's
    * (file → bin) map is metadata-sized and broadcast; the rewrite
    * itself is ONE shuffle of the data keyed by bin. Rows are routed to
    * bins by their source FILE (matched on file name via
    * `input_file_name`), so the rewrite is a pure physical re-layout —
    * row identity is the gate. `repartitionByRange` on the bin id puts
    * each bin wholly in one task (range partitioning never splits equal
    * keys), and `partitionBy("bin")` then writes exactly one file per
    * bin directory — so output file count == |distinct plan bins|,
    * which the spec pins. A file larger than `targetBytes` makes the
    * quota binning SKIP bin indexes (the prefix sum jumps), so bins are
    * counted distinct, not max+1. Parallelism scales as data/target —
    * each output file is written by one task, the small-file problem in
    * reverse, which is exactly the point.
    * Returns the compacted data read back (bin column dropped).
    */
  def compactLake(spark: SparkSession, inDir: String, outDir: String,
                  targetBytes: Long): DataFrame = {
    import org.apache.hadoop.fs.Path
    val inPath = new Path(inDir)
    val fs = inPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val listing = fs.listStatus(inPath)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath.getName, st.getLen))
      .sortBy(_._1)
    require(listing.nonEmpty, s"no parquet files under $inDir")
    import spark.implicits._
    val plan = compactionPlan(listing.toSeq.toDF("fname", "bytes"),
      targetBytes, idCol = "fname")
    val binOf = plan.select(col("file_id").as("__fname"), col("bin"))
    // |distinct bins| is a metadata-bounded driver scalar (≤ #files)
    val nBins = binOf.select("bin").distinct().count().toInt
    spark.read.parquet(inDir)
      .withColumn("__fname",
        regexp_extract(input_file_name(), "[^/]+$", 0))
      .join(broadcast(binOf), "__fname")
      .drop("__fname")
      .repartitionByRange(nBins, col("bin"))
      .write.mode("overwrite").partitionBy("bin").parquet(outDir)
    spark.read.parquet(outDir).drop("bin")
  }

  /** Build the data-skipping stats index over a parquet lake dir: one
    * (file, min_key, max_key, n_rows) row per data file — the
    * manifest-stats half of a Delta/Iceberg table format, as an
    * explicit parquet artifact. One scan builds it (keyed agg on
    * `input_file_name`); after that, range-predicate planning is a
    * metadata-only read of the |files|-sized index — no data-file
    * footer is ever opened to decide what to skip, which at a million
    * files is the difference between a catalog lookup and a listing
    * storm. Pair with [[writeSortedRange]]: a clustered layout makes
    * the per-file ranges non-overlapping, so skipping is near-perfect.
    * Works on flat AND Hive-partitioned layouts — the manifest keys on
    * the lake-root-relative path, so partition dirs cannot collide and
    * stats skipping on a NON-partition key composes with partition
    * pruning (prune dirs by partition value, then files by key range).
    */
  def statsIndexWrite(spark: SparkSession, dataDir: String,
                      idxDir: String, keyCol: String): Unit =
    spark.read.parquet(dataDir)
      .groupBy(relFileKey(spark, dataDir).as("file"))
      .agg(min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"),
        count(lit(1)).as("n_rows"))
      .write.mode(SaveMode.Overwrite).parquet(idxDir)

  /** Plan a key-range read against the stored stats index: the files
    * whose [min_key, max_key] interval intersects [lo, hi]. Pure
    * metadata — |files| rows in, matching files out. */
  def skippingPlan(spark: SparkSession, idxDir: String,
                   lo: Long, hi: Long): DataFrame =
    spark.read.parquet(idxDir)
      .filter(col("max_key") >= lo && col("min_key") <= hi)
      .select("file", "min_key", "max_key", "n_rows")

  /** The parquet file keys under `dir` — a driver-side metadata pass
    * (O(#files), the [[compactLake]] listing argument: at lake scale
    * this is the catalog's job).
    *
    * The stats-index/cursor family keys its manifest on the path
    * RELATIVE to the lake root (ADVICE r9: basename keys against a
    * non-recursive listing silently corrupt on nested layouts — two
    * partition dirs can hold the same basename). The listing walks
    * recursively, skipping internal `_`/`.` entries, so a flat layout
    * keys exactly as before (relative path of a root-level file IS its
    * basename — stored indices stay valid) and a Hive-partitioned
    * layout (`day=3/part-x.parquet`) keys collision-free. */
  private def listParquet(spark: SparkSession,
                          dir: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootUri = fs.makeQualified(p).toUri
    val it = fs.listFiles(p, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val st = it.next()
      val rel = rootUri.relativize(st.getPath.toUri).getPath
      // rel carries every path component under the root — skip files
      // inside internal dirs (`_spark_metadata/…`) and internal files
      if (st.getPath.getName.endsWith(".parquet") &&
          !rel.split("/").exists(c => c.startsWith("_") ||
            c.startsWith(".")))
        out += rel
    }
    out.sorted.toSeq
  }

  /** The manifest key for a scanned row's source file: its path
    * relative to the lake root (matches [[listParquet]] keys on flat
    * AND partitioned layouts). The anchor is the QUALIFIED root's URI
    * path (ADVICE r10: `java.io.File(...).getAbsolutePath` is a
    * local-filesystem assumption — on hdfs://, s3a://, or any root
    * whose qualified URI path differs from the local absolute path it
    * never matches and every row would key to ''), so the same code
    * keys correctly on any Hadoop scheme: `input_file_name()` returns
    * the file's URI, whose path component always contains the
    * qualified root path as a prefix. A non-matching row
    * `raise_error`s instead of silently collapsing the manifest into
    * one bogus '' key (which would degrade skipping plans and make
    * [[readIncrement]] re-deliver consumed files forever). */
  private def relFileKey(spark: SparkSession,
                         dataDir: String): org.apache.spark.sql.Column = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dataDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootPath = fs.makeQualified(p).toUri.getPath
    val rel = regexp_extract(input_file_name(),
      java.util.regex.Pattern.quote(rootPath) + "/(.+)$", 1)
    when(rel === lit(""),
      raise_error(concat(lit(s"relFileKey: scanned file outside lake root '$rootPath': "),
        input_file_name()))).otherwise(rel)
  }

  /** Data files present in the lake but NOT in the stored stats index
    * — the manifest diff that drives incremental ingestion (the Auto
    * Loader / Iceberg-incremental-scan shape): the index doubles as
    * the consumption CURSOR, so "what landed since last night" is a
    * metadata diff, never a data scan or a modification-time guess. */
  def incrementNewFiles(spark: SparkSession, dataDir: String,
                        idxDir: String): Seq[String] = {
    val known = spark.read.parquet(idxDir)
      .select("file").collect().map(_.getString(0)).toSet
    listParquet(spark, dataDir).filterNot(known)
  }

  /** Read ONLY the files that landed since the stats index was last
    * advanced — the nightly-delta consumption read. Old files are
    * never opened; an empty diff short-circuits to an empty frame. */
  def readIncrement(spark: SparkSession, dataDir: String,
                    idxDir: String): DataFrame = {
    val nf = incrementNewFiles(spark, dataDir, idxDir)
    val full = spark.read.parquet(dataDir)
    if (nf.isEmpty) full.filter(lit(false))
    else spark.read.schema(full.schema)
      // basePath recovers partition-dir columns when the keys are
      // nested (day=3/part-x.parquet); a no-op on flat layouts
      .option("basePath", dataDir)
      .parquet(nf.map(f => s"$dataDir/$f"): _*)
  }

  /** Advance the cursor: append the NEW files' (min, max, rows) stats
    * to the stored index — computed by scanning only those files —
    * after which [[readIncrement]] returns nothing until more data
    * lands. Consume-then-append is the idempotent nightly loop. */
  def statsIndexAppend(spark: SparkSession, dataDir: String,
                       idxDir: String, keyCol: String): Unit = {
    val nf = incrementNewFiles(spark, dataDir, idxDir)
    if (nf.nonEmpty) {
      val full = spark.read.parquet(dataDir)
      spark.read.schema(full.schema)
        .option("basePath", dataDir)
        .parquet(nf.map(f => s"$dataDir/$f"): _*)
        .groupBy(relFileKey(spark, dataDir).as("file"))
        .agg(min(col(keyCol)).as("min_key"),
          max(col(keyCol)).as("max_key"),
          count(lit(1)).as("n_rows"))
        .write.mode(SaveMode.Append).parquet(idxDir)
    }
  }

  /** Bloom-skipping geometry: bits per file / hash count. 2^16 bits
    * and k=4 put the per-file false-positive rate under ~1% up to
    * ~5k distinct keys per file; a production lake stores the bitmap
    * packed (8 KiB/file) in the catalog — the sparse (file, bitpos)
    * rows here keep every membership decision oracle-replayable. */
  val BloomBits = 65536
  val BloomK = 4

  /** The Bloom bit position of `key` under hash row `d` — a 60-bit md5
    * slice of the salted rendering mod [[BloomBits]] (the
    * [[graft.operators.Relational.cmsBucket]] device: md5 is the one
    * cross-engine-stable hash, so skip decisions replay exactly).
    * Null-strict `concat` (not concat_ws) so a NULL key yields a NULL
    * position — dropped by the writers' isNotNull and inert under the
    * probe's `isin` — matching the repo-wide NULL-hash contract
    * (Sampling.hashValue) instead of aliasing every NULL onto the
    * salt-only bits (ADVICE r11). */
  private def bloomPos(key: Column, d: Int): Column =
    conv(substring(md5(concat(key.cast("string"), lit("#"), lit(d))),
      1, 15), 16, 10).cast("long") % BloomBits

  /** Build the per-file BLOOM skipping index — the POINT-LOOKUP
    * sibling of [[statsIndexWrite]] (min/max stats prune range scans;
    * a high-cardinality equality probe like "this one doc_id /
    * order id" needs membership, not ranges — the Delta/Iceberg
    * bloom-filter-index story): for every file, the distinct Bloom
    * bit positions its keys set, as sparse (file, bitpos) rows. One
    * scan, one map-side-combined distinct; ≤ [[BloomBits]] rows per
    * file regardless of row count. */
  def bloomIndexWrite(spark: SparkSession, dataDir: String,
                      idxDir: String, keyCol: String): Unit =
    bloomBitRows(spark, dataDir,
        spark.read.parquet(dataDir), listParquet(spark, dataDir),
        keyCol)
      .write.mode(SaveMode.Overwrite).parquet(idxDir)

  /** The index rows for a scanned file set: the distinct (file,
    * bitpos) membership rows PLUS one `bitpos = -1` SENTINEL row per
    * scanned file. The sentinel marks "this file is indexed" even
    * when the file contributes zero real bit rows (an all-NULL key
    * column — ADVICE r12: inferring `known` from non-empty output
    * made such files re-scan on every append). Probe positions are
    * always ≥ 0, so sentinels can never qualify a lookup. The
    * sentinel derives from the FILE LIST, not the data rows. */
  private def bloomBitRows(spark: SparkSession, dataDir: String,
                           data: DataFrame, files: Seq[String],
                           keyCol: String): DataFrame = {
    import spark.implicits._
    // project (file, key) FIRST — input_file_name() must bind to the
    // scan — then re-spread: a one-file delta arrives as ONE partition
    // and the K-fold md5 hashing below would serialize onto one task
    // (r13; no-op on multi-split inputs — Tables.spread)
    graft.Tables.spread(
        data.select(relFileKey(spark, dataDir).as("file"), col(keyCol)))
      .select(col("file"),
        explode(array((1 to BloomK).map(d =>
          bloomPos(col(keyCol), d)): _*)).as("bitpos"))
      .filter(col("bitpos").isNotNull)
      .distinct()
      .unionByName(files.toDF("file")
        .select(col("file"), lit(-1L).as("bitpos")))
  }

  /** Incremental Bloom-index maintenance — the [[statsIndexAppend]]
    * pattern for membership: compute bit rows for files NOT yet in
    * the index (scanning only those files) and append them. Because a
    * file's bit set is a pure function of its own rows and the index
    * is a union of per-file sets, append-then-serve is BIT-IDENTICAL
    * to rebuild-then-serve (the gate pins it) — the nightly delta
    * never rescans the lake. */
  def bloomIndexAppend(spark: SparkSession, dataDir: String,
                       idxDir: String, keyCol: String): Unit = {
    // self-initializing: the first delta of a maintained lake finds no
    // index yet — a full build over the current files IS the correct
    // append from the empty index (lets a streaming foreachBatch
    // maintainer call append unconditionally)
    val idxFile = new java.io.File(idxDir)
    if (!idxFile.isDirectory || Option(idxFile.listFiles()).toSeq
        .flatten.forall(!_.getName.endsWith(".parquet"))) {
      bloomIndexWrite(spark, dataDir, idxDir, keyCol)
      return
    }
    // the sentinel rows make `known` the EXPLICIT indexed-file set —
    // a file whose key column is entirely NULL still counts as
    // indexed and is never re-scanned (ADVICE r12)
    val known = spark.read.parquet(idxDir)
      .select("file").distinct().collect().map(_.getString(0)).toSet
    val nf = listParquet(spark, dataDir).filterNot(known)
    if (nf.nonEmpty) {
      val full = spark.read.parquet(dataDir)
      bloomBitRows(spark, dataDir,
          spark.read.schema(full.schema)
            .option("basePath", dataDir)
            .parquet(nf.map(f => s"$dataDir/$f"): _*),
          nf, keyCol)
        .write.mode(SaveMode.Append).parquet(idxDir)
    }
  }

  /** Execute a point lookup through the Bloom index: a file MAY
    * contain the key iff all [[BloomK]] of the key's bit positions are
    * set in its filter — only those files are opened, then the exact
    * equality filter trims false positives' rows, so the result is
    * bit-identical to the full-scan filter by construction (the gate).
    * The probe's positions and the qualifying file list are
    * metadata-bounded driver work (k values; ≤ #files rows — the
    * [[readWithSkipping]] argument). An empty plan short-circuits
    * without touching the data dir. */
  def readWithBloomSkipping(spark: SparkSession, dataDir: String,
                            idxDir: String, keyCol: String,
                            value: Long): DataFrame = {
    val planned = bloomPlannedFiles(spark, idxDir, value)
    val full = spark.read.parquet(dataDir)
    if (planned.isEmpty) full.filter(lit(false))
    else spark.read.schema(full.schema)
      .option("basePath", dataDir)
      .parquet(planned.map(f => s"$dataDir/$f").toIndexedSeq: _*)
      .filter(col(keyCol) === value)
  }

  /** The files the Bloom index qualifies for `value` — the plan under
    * [[readWithBloomSkipping]], exposed for the skip-effectiveness
    * spec. Probe positions and the file list are metadata-bounded
    * driver work (k values; ≤ #files rows). */
  private[graft] def bloomPlannedFiles(spark: SparkSession,
                                       idxDir: String,
                                       value: Long): Seq[String] = {
    import spark.implicits._
    val pos = Seq(value).toDF("v")
      .select(array((1 to BloomK).map(d => bloomPos(col("v"), d)): _*))
      .collect().head.getSeq[Long](0).distinct
    spark.read.parquet(idxDir)
      .filter(col("bitpos").isin(pos: _*))
      .groupBy("file").agg(countDistinct(col("bitpos")).as("nb"))
      .filter(col("nb") === pos.size)
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Pin a SNAPSHOT of the lake: record the current file list as a
    * manifest table — the poor-man's table-format transaction log. A
    * reader holding the manifest sees the lake AS OF the pin no matter
    * how many appends land after it ([[readSnapshot]]); this is the
    * isolation primitive under every reproducible-training story
    * ("the run trained on manifest M", not "on whatever the directory
    * held that night"). Metadata-only: one recursive listing,
    * |files| rows. */
  def manifestWrite(spark: SparkSession, dataDir: String,
                    manifestDir: String): Unit = {
    import spark.implicits._
    val files = listParquet(spark, dataDir)
    // pin the SCHEMA alongside the file list (ADVICE r12: the empty-
    // manifest read used to derive its schema from the LIVE dir, so a
    // pre-evolution empty pin leaked the evolved schema): the pinned
    // schema is the mergeSchema union of the LISTED files at pin time;
    // an empty lake has nothing to derive — schema NULL, and the
    // reader's live-dir fallback is the documented exception
    val schemaJson =
      if (files.isEmpty) null
      else spark.read.option("mergeSchema", "true")
        .option("basePath", dataDir)
        .parquet(files.map(f => s"$dataDir/$f"): _*).schema.json
    files.toDF("file")
      .select(col("file"), lit(schemaJson).as("schema"))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(manifestDir)
  }

  /** Read the lake AS OF a stored manifest: only the listed files are
    * opened — rows appended since the pin are invisible, bit-for-bit.
    * A listed file that has been DELETED since the pin fails the read
    * loudly (the snapshot contract is broken by a premature vacuum;
    * serving partial history silently would be worse). An empty
    * manifest short-circuits to an empty frame.
    *
    * The snapshot pins its SCHEMA too: the read schema is the
    * mergeSchema union of the LISTED files' footers, never the live
    * directory's — so a later additive schema evolution (v2 files with
    * an added column) cannot leak a null-filled column into an old
    * snapshot, and an old-schema footer racing into the dir cannot
    * drop one from a new snapshot (the [[readMergedParquet]] additive
    * contract composed with the pin — io_snapshot_evolve). */
  def readSnapshot(spark: SparkSession, dataDir: String,
                   manifestDir: String): DataFrame = {
    val mf = spark.read.parquet(manifestDir)
    val rows =
      (if (mf.columns.contains("schema")) mf.select("file", "schema")
       else mf.select(col("file"), lit(null).cast("string").as("schema")))
        .collect() // |files| metadata
    val files = rows.map(_.getString(0)).filter(_ != null).toIndexedSeq
    val pinnedSchema = rows.iterator.map(_.getString(1))
      .find(_ != null)
      .map(org.apache.spark.sql.types.DataType.fromJson(_)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    (files.isEmpty, pinnedSchema) match {
      // a 0-file pin recorded no schema (an empty lake HAS none) —
      // the live-dir fallback is the documented exception to the
      // schema pin (ADVICE r12); pre-r13 manifests without the schema
      // column land here too
      case (true, None) =>
        spark.read.parquet(dataDir).filter(lit(false))
      case (true, Some(s)) =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      // listed files read under the PINNED schema — identical to the
      // mergeSchema union of exactly these footers (what manifestWrite
      // recorded), without re-merging footers at read time
      case (false, Some(s)) =>
        spark.read.schema(s).option("basePath", dataDir)
          .parquet(files.map(f => s"$dataDir/$f"): _*)
      case (false, None) =>
        spark.read.option("mergeSchema", "true")
          .option("basePath", dataDir)
          .parquet(files.map(f => s"$dataDir/$f"): _*)
    }
  }

  /** VACUUM to a manifest — the complement of [[readSnapshot]] and
    * the other half of the table-format transaction story: delete
    * every data file NOT listed in the manifest (orphans from failed
    * or superseded writes — the debris a real lake accumulates), so
    * the directory again equals the pinned table state. The orphan
    * list is the [[listParquet]] diff (metadata-bounded); deletes are
    * per-file and idempotent — a re-run finds no orphans and touches
    * nothing. The inverse hazard of [[readSnapshot]]'s loud-vacuum
    * contract holds by construction: vacuuming to manifest M can
    * never delete a file M pins. Returns the surviving lake. */
  def vacuumToManifest(spark: SparkSession, dataDir: String,
                       manifestDir: String): DataFrame = {
    val pinned = spark.read.parquet(manifestDir)
      .select("file").collect().map(_.getString(0)).toSet // |files|
    import org.apache.hadoop.fs.Path
    val root = new Path(dataDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    listParquet(spark, dataDir).filterNot(pinned)
      .foreach(f => fs.delete(new Path(root, f), false))
    spark.read.parquet(dataDir)
  }

  /** Execute a key-range read through the stats index: read ONLY the
    * planned files, then apply the exact range filter (stats prune
    * whole files; the residual predicate trims the survivors' rows) —
    * bit-identical to the full-scan filter by construction, which is
    * the gate. The planned file list is a metadata-bounded driver
    * artifact (≤ #files, same argument as [[compactLake]]'s bin map).
    * An empty plan short-circuits to an empty frame without listing
    * the data dir at all. */
  def readWithSkipping(spark: SparkSession, dataDir: String,
                       idxDir: String, keyCol: String,
                       lo: Long, hi: Long): DataFrame = {
    val planned = skippingPlan(spark, idxDir, lo, hi)
      .select("file").collect().map(_.getString(0))
    val full = spark.read.parquet(dataDir)
    if (planned.isEmpty) full.filter(lit(false))
    else
      spark.read.schema(full.schema)
        .option("basePath", dataDir)
        .parquet(planned.map(f => s"$dataDir/$f"): _*)
        .filter(col(keyCol).between(lo, hi))
  }
}
