package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import java.nio.charset.StandardCharsets.UTF_8

/** The 100 TB-scale apply path: maintain a replica table as hash-bucketed
  * parquet via MERGE semantics with partition pruning (the A2/A3
  * "VALUES-JOIN UPDATE" becomes a real join, SURVEY §4; MERGE intent of
  * the reference's coalescing.rs:644-871).
  *
  * Layout: `path/bucket=N/…` where `bucket = pmod(hash(key…), numBuckets)`,
  * plus a `_graft_table.json` sidecar holding the table's unified payload
  * schema and its bucket count. Each micro-batch:
  *   1. squash the batch to one winner per key (latest lsn wins);
  *   2. compute the batch's TOUCHED buckets (≤ numBuckets driver-side ints);
  *   3. read ONLY those partition dirs with the sidecar schema — planning
  *      cost (file listing + footer I/O) is O(touched), never O(all files):
  *      no full-table `mergeSchema` scan happens on any batch;
  *   4. anti-join + union the winners, dynamic-partition-overwrite: only
  *      touched partitions are rewritten, untouched buckets' files stay
  *      byte-identical on disk.
  *
  * Per-batch cost is therefore O(touched-bucket data + batch), NOT
  * O(snapshot): at 100 TB with numBuckets sized so a bucket is a few GB,
  * a small batch rewrites a few partitions instead of the whole table.
  * The `localCheckpoint` materializes only the touched buckets' next
  * state (it must, since their input files are about to be overwritten).
  * A bucket whose rows are all deleted is overwritten with an explicit
  * empty-but-schema'd file so reads of a drained table keep the schema.
  *
  * Schema evolution: a batch carrying a column the sidecar lacks widens
  * the sidecar FIRST (atomic tmp+rename), then applies — so a crash
  * between the two leaves a schema that is wider than any file (reads
  * null-fill), never a file wider than the schema (which would silently
  * drop the column on the next rewrite).
  *
  * The sidecar also records numBuckets: an applier constructed with a
  * different count fails fast instead of scattering keys across two
  * incompatible hash layouts (see [[rebucket]] for changing it).
  *
  * With Delta/Iceberg this maps 1:1 onto MERGE INTO with file-level
  * pruning; plain parquet + explicit buckets reproduces the same pruning
  * with no table-format dependency.
  */
class ParquetReplicaSink(path: String, keyCols: Seq[String],
                         numBuckets: Int = 64,
                         declaredBlooms: Seq[String] = Nil)
    extends Serializable {

  /** Test/ops instrumentation: data files planned for read by the last
    * applyBatch — the O(touched) contract made observable. */
  @transient @volatile var lastPlannedFiles: Seq[String] = Nil

  private def root = new Path(path)
  private def fsOf(spark: SparkSession): FileSystem =
    root.getFileSystem(spark.sessionState.newHadoopConf())

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bucket", pmod(hash(keyCols.map(col): _*), lit(numBuckets)))

  /** Key-sorted within each write partition: parquet row-group min/max
    * stats then prune key lookups inside a bucket (the [[lookup]] serving
    * path), and sorted runs compress better. Partition-local sort — no
    * extra shuffle. No-op for a keyless (truncate-only) handle. */
  private def sortedByKey(df: DataFrame): DataFrame =
    if (keyCols.isEmpty) df
    else df.sortWithinPartitions(keyCols.map(col): _*)

  // ---------------------------------------------------------------- sidecar

  private def sidecarPath = new Path(path, "_graft_table.json")

  /** (numBuckets, payload schema) recorded for the table; None before the
    * first batch (or for a pre-sidecar legacy table — see the fallback in
    * [[unifiedSchema]]). */
  private[graft] def readSidecar(spark: SparkSession): Option[(Int, StructType)] = {
    val fs = fsOf(spark)
    if (!fs.exists(sidecarPath)) None
    else {
      val in = fs.open(sidecarPath)
      val txt = try new String(in.readAllBytes(), UTF_8) finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      Some((node.get("numBuckets").asInt(),
        org.apache.spark.sql.types.DataType.fromJson(node.get("schema").toString)
          .asInstanceOf[StructType]))
    }
  }

  private def writeSidecar(spark: SparkSession, schema: StructType): Unit = {
    val fs = fsOf(spark)
    fs.mkdirs(root)
    val tmp = new Path(path, "_graft_table.json.tmp")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("numBuckets", numBuckets)
    node.set[com.fasterxml.jackson.databind.JsonNode](
      "schema", mapper.readTree(schema.json))
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(sidecarPath.toUri, spark.sessionState.newHadoopConf())
      .rename(tmp, sidecarPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Sidecar schema unified with this batch's columns. Returns
    * (schema, evolved?, added column names) — evolved means the sidecar
    * must be rewritten (a superset of added.nonEmpty: the one-time
    * legacy/fresh migrations rewrite without necessarily adding).
    * A legacy table without a sidecar pays ONE mergeSchema inference and
    * is migrated on its next batch. */
  private def unifiedSchema(spark: SparkSession, batchPayload: StructType)
      : (StructType, Boolean, Seq[String]) =
    readSidecar(spark) match {
      case Some((n, s)) =>
        require(n == numBuckets,
          s"replica at $path was written with numBuckets=$n, applier configured " +
            s"with $numBuckets — run rebucket() instead of mixing hash layouts")
        val known = s.fieldNames.toSet
        val added = batchPayload.fields.filterNot(f => known.contains(f.name))
        (StructType(s.fields ++ added), added.nonEmpty,
          added.map(_.name).toSeq)
      case None if bucketDirs(spark).nonEmpty =>
        // pre-sidecar table: one-time full inference, then self-migrate
        val inferred = StructType(spark.read.option("mergeSchema", "true")
          .parquet(path).drop("bucket").schema)
        val known = inferred.fieldNames.toSet
        val added = batchPayload.fields.filterNot(f => known.contains(f.name))
        (StructType(inferred.fields ++ added), true, added.map(_.name).toSeq)
      case None =>
        // a FRESH table's first batch: every column is new
        (batchPayload, true, batchPayload.fieldNames.toSeq)
    }

  // ----------------------------------------------------------- schema log

  /** Append-only audit of sidecar widenings: one entry per batch that
    * ADDED columns — (batchId, the batch's max LSN, added names, the
    * full column list after). "When did column X appear" without
    * replaying the stream. Idempotent under replay: an entry keyed by
    * the same batchId is replaced, and the log is written tmp+rename
    * like its sidecar siblings. Bounded by the number of schema
    * CHANGES, not batches — schema drift is rare by nature. */
  private def schemaLogPath = new Path(path, "_graft_schema_log.json")

  /** (batchId, maxLsn, addedCols, columnsAfter) entries, batch order. */
  def schemaLog(spark: SparkSession): Seq[(Long, Long, Seq[String], Seq[String])] = {
    val fs = fsOf(spark)
    if (!fs.exists(schemaLogPath)) Seq.empty
    else {
      val in = fs.open(schemaLogPath)
      val txt = try new String(in.readAllBytes(), UTF_8) finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      import scala.jdk.CollectionConverters._
      node.get("entries").elements().asScala.map { e =>
        (e.get("batchId").asLong(), e.get("lsn").asLong(),
          e.get("added").elements().asScala.map(_.asText()).toSeq,
          e.get("columns").elements().asScala.map(_.asText()).toSeq)
      }.toSeq.sortBy(_._1)
    }
  }

  private def appendSchemaLog(spark: SparkSession, batchId: Long, lsn: Long,
                              added: Seq[String], schema: StructType): Unit = {
    val entries = schemaLog(spark).filterNot(_._1 == batchId) :+
      ((batchId, lsn, added, schema.fieldNames.toSeq))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rootNode = mapper.createObjectNode()
    val arr = rootNode.putArray("entries")
    entries.sortBy(_._1).foreach { case (b, l, a, cs) =>
      val e = arr.addObject()
      e.put("batchId", b); e.put("lsn", l)
      val aa = e.putArray("added"); a.foreach(aa.add)
      val ca = e.putArray("columns"); cs.foreach(ca.add)
    }
    val fs = fsOf(spark)
    fs.mkdirs(root)
    val tmp = new Path(path, "_graft_schema_log.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(rootNode)) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(schemaLogPath.toUri, spark.sessionState.newHadoopConf())
      .rename(tmp, schemaLogPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  // -------------------------------------------------------------- zone maps

  /** Per-bucket min/max column statistics — the warehouse's zone map.
    * One JSON sidecar `_graft_zones.json`: bucket → column → [min, max]
    * (values as strings; the table schema decides compare semantics).
    * Consulted by [[scan]] and [[retain]] to skip whole bucket dirs with
    * O(1) metadata — BEFORE any file listing or footer I/O — which
    * complements the z-order layout (zones skip buckets, parquet
    * row-group stats then skip pages inside surviving buckets).
    *
    * Crash soundness: the STREAMING path ([[applyBatch]]) writes zones
    * before the data as the WIDENED union old ∪ new — a crash between
    * the two leaves ranges wider than the contents, which can only
    * suppress a skip, never cause a wrong one. The offline verbs
    * (retain/rebucket/truncate) recompute exact ranges AFTER their
    * rewrite — same one-sided-error argument in the other order. A
    * column absent from a bucket's entry means it held only NULLs there
    * (comparisons never match → skippable); a bucket with no entry at
    * all is always read (legacy/unknown). */
  private def zonesPath = new Path(path, "_graft_zones.json")

  private[graft] def readZones(spark: SparkSession)
      : Option[Map[Int, Map[String, (String, String)]]] = {
    val fs = fsOf(spark)
    if (!fs.exists(zonesPath)) None
    else {
      val in = fs.open(zonesPath)
      val txt = try new String(in.readAllBytes(), UTF_8) finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      import scala.jdk.CollectionConverters._
      Some(node.properties().asScala.map { e =>
        e.getKey.toInt -> e.getValue.properties().asScala.map { c =>
          c.getKey -> (c.getValue.get(0).asText(), c.getValue.get(1).asText())
        }.toMap
      }.toMap)
    }
  }

  private def writeZones(spark: SparkSession,
                         zones: Map[Int, Map[String, (String, String)]]): Unit = {
    val fs = fsOf(spark)
    fs.mkdirs(root)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rootNode = mapper.createObjectNode()
    zones.toSeq.sortBy(_._1).foreach { case (b, cols) =>
      val bn = rootNode.putObject(b.toString)
      cols.toSeq.sortBy(_._1).foreach { case (c, (mn, mx)) =>
        val arr = bn.putArray(c); arr.add(mn); arr.add(mx)
      }
    }
    val tmp = new Path(path, "_graft_zones.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(rootNode)) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(zonesPath.toUri, spark.sessionState.newHadoopConf())
      .rename(tmp, zonesPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Columns zone stats make sense for: atomic, orderable, compare
    * semantics reproducible from the string form. */
  private def zoneCols(schema: StructType): Seq[StructField] =
    schema.fields.toSeq.filter(f => f.dataType match {
      case org.apache.spark.sql.types.StringType => true
      case _: org.apache.spark.sql.types.NumericType => true
      case _ => false
    })

  /** Per-bucket min/max of every zone-eligible column — one partial
    * aggregation over the (bucket-carrying) frame. */
  private def statsOf(withBuckets: DataFrame, schema: StructType)
      : Map[Int, Map[String, (String, String)]] = {
    val cols = zoneCols(schema).filter(f => withBuckets.columns.contains(f.name))
    if (cols.isEmpty) return Map.empty
    val aggs = cols.flatMap(f => Seq(
      min(col(f.name)).cast("string").as(s"mn_${f.name}"),
      max(col(f.name)).cast("string").as(s"mx_${f.name}")))
    withBuckets.groupBy("bucket").agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        val b = r.getInt(0)
        b -> cols.flatMap { f =>
          val mn = r.getAs[String](s"mn_${f.name}")
          val mx = r.getAs[String](s"mx_${f.name}")
          if (mn == null || mx == null) None // all-NULL column → no entry
          else Some(f.name -> (mn, mx))
        }.toMap
      }.toMap
  }

  /** Widened union (per bucket, per column): min of mins, max of maxes
    * under the column's compare semantics — the only zone update that is
    * sound to write BEFORE the data. A column present on only ONE side
    * keeps that side's range: absence asserts all-NULL there, and NULL
    * rows cannot extend a min/max range (dropping the entry instead
    * would flip the bucket to "skippable", an UNSOUND narrowing). */
  private def widen(schema: StructType,
                    old: Map[Int, Map[String, (String, String)]],
                    add: Map[Int, Map[String, (String, String)]])
      : Map[Int, Map[String, (String, String)]] = {
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    (old.keySet ++ add.keySet).map { b =>
      (old.get(b), add.get(b)) match {
        case (Some(o), None) => b -> o
        case (None, Some(a)) => b -> a
        case (Some(o), Some(a)) =>
          b -> (o.keySet | a.keySet).flatMap { c =>
            (o.get(c), a.get(c)) match {
              case (Some(r), None) => Some(c -> r)
              case (None, Some(r)) => Some(c -> r)
              case (Some((omn, omx)), Some((amn, amx))) =>
                types.get(c).map { t =>
                  c -> (if (zoneLt(t, omn, amn)) omn else amn,
                    if (zoneLt(t, omx, amx)) amx else omx)
                }
              case _ => None
            }
          }.toMap
        case _ => b -> Map.empty[String, (String, String)]
      }
    }.toMap
  }

  private def zoneLt(t: org.apache.spark.sql.types.DataType,
                     a: String, b: String): Boolean = t match {
    case org.apache.spark.sql.types.FloatType |
         org.apache.spark.sql.types.DoubleType =>
      // NaN / ±Infinity round-trip through Spark's string cast as
      // "NaN"/"Infinity"/"-Infinity" — BigDecimal would throw on them.
      // Double.compare orders NaN greatest, matching Spark's ordering.
      java.lang.Double.compare(
        java.lang.Double.parseDouble(a), java.lang.Double.parseDouble(b)) < 0
    case _: org.apache.spark.sql.types.NumericType =>
      new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)) < 0
    case _ => utf8Lt(a, b)
  }

  /** Unsigned UTF-8 byte-order comparison — Spark's UTF8String orders
    * strings by UTF-8 bytes (= code-point order), while JVM String '<'
    * compares UTF-16 code units; the two disagree on supplementary-plane
    * characters, which would make zone skips unsound. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(UTF_8); val y = b.getBytes(UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  private def zoneLe(t: org.apache.spark.sql.types.DataType,
                     a: String, b: String): Boolean =
    !zoneLt(t, b, a)

  /** Candidate buckets for `pred` per the zone stats: the buckets whose
    * ranges MAY satisfy it (sound — a skipped bucket provably holds no
    * matching row). The candidate universe is the PHYSICAL bucket dirs:
    * a bucket with no zone entry (legacy data predating the sidecar, or
    * an incomplete migration) is always a candidate — only a recorded
    * entry can prove a skip. The predicate is first RESOLVED by running
    * Spark's analyzer over an empty frame with the table schema (on
    * Spark 4, `col(x) === v` builds an `UnresolvedFunction("=")`, never
    * a `BinaryComparison` — only the analyzed tree carries the real
    * `EqualTo`/`And`/`In` nodes over `AttributeReference` leaves). Then
    * conjunctions intersect, disjunctions union, supported leaves are
    * =, <, <=, >, >=, IN between a stat column and foldable literals of
    * a matching string/numeric type; anything else is conservatively
    * "every bucket". Equality/IN leaves on a bloom-declared column
    * additionally test the per-bucket bloom ([[bloomMay]]) — the range
    * and membership prunes intersect. None = neither sidecar yet (no
    * pruning possible). */
  private[graft] def zoneCandidates(spark: SparkSession,
                                    pred: org.apache.spark.sql.Column)
      : Option[Seq[Int]] = {
    val zonesOpt0 = readZones(spark)
    val bloomsOpt = readBlooms(spark)
    // blooms alone still prune equalities: an absent zone sidecar
    // degrades to the empty map (every bucket range-unknown)
    val zonesOpt =
      if (zonesOpt0.isEmpty && bloomsOpt.isDefined)
        Some(Map.empty[Int, Map[String, (String, String)]])
      else zonesOpt0
    val schemaOpt = readSidecar(spark).map(_._2)
    (zonesOpt, schemaOpt) match {
      case (Some(zones), Some(schema)) =>
        import org.apache.spark.sql.catalyst.expressions._
        val types = zoneCols(schema).map(f => f.name -> f.dataType).toMap
        val all: Set[Int] = bucketDirs(spark)
          .map(_.getName.stripPrefix("bucket=").toInt).toSet
        object AttrName {
          def unapply(e: Expression): Option[String] = e match {
            case a: AttributeReference => Some(a.name)
            case _ => None
          }
        }
        // post-analysis literal side: a plain Literal, or any foldable
        // expression (e.g. a cast the analyzer wrapped around a literal)
        object FoldedLit {
          def unapply(e: Expression): Option[Literal] = e match {
            case l: Literal => Some(l)
            case _ if e.foldable =>
              scala.util.Try(Literal.create(e.eval(null), e.dataType)).toOption
            case _ => None
          }
        }
        def litStr(l: Literal, t: org.apache.spark.sql.types.DataType): Option[String] =
          if (l.value == null) None
          else l.dataType match {
            // only same-family literals: comparing across families would
            // need Spark's implicit-cast semantics re-implemented
            case _: org.apache.spark.sql.types.NumericType
                if t.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
              Some(l.value.toString)
            case org.apache.spark.sql.types.StringType
                if t == org.apache.spark.sql.types.StringType =>
              Some(l.value.toString)
            case _ => None
          }
        // may bucket b match `col op v`? no entry for the BUCKET means
        // unknown (always read); an entry missing the COLUMN means the
        // column is all-NULL there → comparisons never match
        def mayMatch(b: Int, c: String, test: ((String, String)) => Boolean): Boolean =
          zones.get(b) match {
            case None => true
            case Some(cols) => cols.get(c) match {
              case Some(range) => test(range)
              case None => false
            }
          }
        def candsCmp(name: String, v: String, op: String): Set[Int] = {
          val t = types(name)
          val ranged = all.filter(b => mayMatch(b, name, { case (mn, mx) => op match {
            case "="  => zoneLe(t, mn, v) && zoneLe(t, v, mx)
            case "<"  => zoneLt(t, mn, v)
            case "<=" => zoneLe(t, mn, v)
            case ">"  => zoneLt(t, v, mx)
            case ">=" => zoneLe(t, v, mx)
          }}))
          // equality also consults the bloom index (range ∩ membership)
          if (op == "=") ranged.filter(bloomMay(bloomsOpt, _, name, v))
          else ranged
        }
        def walk(e: Expression): Set[Int] = e match {
          case And(l, r) => walk(l) & walk(r)
          case Or(l, r) => walk(l) | walk(r)
          case cmp: BinaryComparison => (cmp.left, cmp.right) match {
            case (AttrName(an), FoldedLit(l)) if types.contains(an) =>
              litStr(l, types(an)).map { v =>
                cmp match {
                  case _: EqualTo => candsCmp(an, v, "=")
                  case _: LessThan => candsCmp(an, v, "<")
                  case _: LessThanOrEqual => candsCmp(an, v, "<=")
                  case _: GreaterThan => candsCmp(an, v, ">")
                  case _: GreaterThanOrEqual => candsCmp(an, v, ">=")
                  case _ => all
                }
              }.getOrElse(all)
            case (FoldedLit(l), AttrName(an)) if types.contains(an) =>
              litStr(l, types(an)).map { v =>
                cmp match { // flipped operand order
                  case _: EqualTo => candsCmp(an, v, "=")
                  case _: LessThan => candsCmp(an, v, ">")
                  case _: LessThanOrEqual => candsCmp(an, v, ">=")
                  case _: GreaterThan => candsCmp(an, v, "<")
                  case _: GreaterThanOrEqual => candsCmp(an, v, "<=")
                  case _ => all
                }
              }.getOrElse(all)
            case _ => all
          }
          case In(AttrName(an), vs) if types.contains(an) =>
            val lits = vs.map { case FoldedLit(l) => Some(l); case _ => None }
            if (lits.exists(_.isEmpty)) all
            else lits.flatten.flatMap(litStr(_, types(an)))
              .map(candsCmp(an, _, "=")).foldLeft(Set.empty[Int])(_ | _)
          case _ => all
        }
        // resolve through the analyzer: filter an empty frame carrying
        // the sidecar schema, take the analyzed Filter's condition —
        // unresolvable predicates (unknown columns…) degrade to "all"
        val resolved: Option[Expression] = scala.util.Try {
          emptyWith(spark, schema).filter(pred).queryExecution.analyzed
            .collectFirst {
              case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
                f.condition
            }
        }.toOption.flatten
        Some(resolved.fold(all)(walk).toSeq.sorted)
      case _ => None
    }
  }

  /** Zone-pruned filtered read — the non-key serving companion of
    * [[lookup]]: consult the zone sidecar (O(1) metadata), plan ONLY the
    * candidate bucket dirs, push `pred` into that scan. Falls back to a
    * full filtered snapshot when no zones exist. */
  def scan(spark: SparkSession, pred: org.apache.spark.sql.Column): DataFrame =
    (zoneCandidates(spark, pred), readSidecar(spark)) match {
      case (Some(cands), Some((_, s))) =>
        val fs = fsOf(spark)
        val dirs = cands.map(b => new Path(path, s"bucket=$b"))
          .filter(fs.exists).map(_.toString)
        lastScanPlannedBuckets = dirs.size
        if (dirs.isEmpty) emptyWith(spark, s).filter(pred)
        else spark.read
          .schema(StructType(s.fields :+ StructField("bucket", IntegerType)))
          .option("basePath", path).parquet(dirs: _*)
          .filter(pred).drop("bucket")
      case _ =>
        lastScanPlannedBuckets = bucketDirs(spark).size
        snapshot(spark).filter(pred)
    }

  /** Planned bucket-dir count of the last [[scan]] — the zone-skip
    * contract made observable (the [[lastProbePlannedBuckets]] idiom
    * for the serving read). */
  @transient @volatile var lastScanPlannedBuckets: Int = -1

  private def bucketDirs(spark: SparkSession): Seq[Path] = {
    val fs = fsOf(spark)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .map(_.getPath)
  }

  private def emptyWith(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Current replica content without the bucket bookkeeping column. With
    * a sidecar the read needs no schema inference at all; a legacy table
    * falls back to mergeSchema (schema evolution left files of several
    * eras — the union must win, or columns only present in newer files
    * would be silently dropped). */
  def snapshot(spark: SparkSession): DataFrame = readSidecar(spark) match {
    case Some((_, s)) =>
      if (bucketDirs(spark).isEmpty) emptyWith(spark, s)
      else spark.read
        .schema(StructType(s.fields :+ StructField("bucket", IntegerType)))
        .option("basePath", path).parquet(path).drop("bucket")
    case None => spark.read.option("mergeSchema", "true").parquet(path).drop("bucket")
  }

  // ------------------------------------------------------------------ apply

  /** batch: envelope rows flattened to (key..., payload columns, op, lsn). */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long): Unit = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(desc("lsn"))
    val winners = withBucket(batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn"))

    val batchPayload = StructType(winners.drop("op", "lsn", "bucket").schema)
    val (schema, evolved, added) = unifiedSchema(spark, batchPayload)
    // widen the sidecar BEFORE touching data (see class doc)
    if (evolved) writeSidecar(spark, schema)
    if (added.nonEmpty) {
      // audit the widening; max(lsn) is one tiny job on the batch and
      // only ever runs on a schema-change batch
      val maxLsn = Option(batch.agg(max("lsn")).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(-1L)
      appendSchemaLog(spark, batchId, maxLsn, added, schema)
    }

    // ≤ numBuckets ints — bounded driver collect, not data-sized
    val touched = winners.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return
    val fs = fsOf(spark)
    val touchedDirs = touched.map(b => new Path(path, s"bucket=$b"))
      .filter(fs.exists).map(_.toString)

    if (touchedDirs.isEmpty) {
      // nothing to merge with: plain insert of the batch winners
      lastPlannedFiles = Nil
      val inserts = winners.filter(col("op") =!= "d").drop("op", "lsn")
      // zones + blooms BEFORE data, widened/OR'd (soundness notes above)
      writeZones(spark, widen(schema,
        readZones(spark).getOrElse(Map.empty), statsOf(inserts, schema)))
      maintainBlooms(spark, inserts)
      inserts.write.mode(SaveMode.Append).partitionBy("bucket").parquet(path)
    } else {
      // partition pruning: ONLY touched bucket dirs are listed/opened,
      // and the explicit schema means no footer is read for inference
      val cur = spark.read
        .schema(StructType(schema.fields :+ StructField("bucket", IntegerType)))
        .option("basePath", path)
        .parquet(touchedDirs: _*)
      lastPlannedFiles = cur.inputFiles.toSeq
      val survivors = cur.join(
        winners.select(keyCols.map(col): _*), keyCols, "left_anti")
      // allowMissingColumns: schema evolution — a column added (or no
      // longer emitted) mid-stream fills null on the side lacking it
      // instead of failing the whole apply
      val next = survivors.unionByName(
        winners.filter(col("op") =!= "d").drop("op", "lsn"),
        allowMissingColumns = true)
      // repartition by bucket BEFORE materializing: without it each
      // shuffle partition writes a sliver into every touched bucket
      // dir (touched × partitions files per batch) and the replica
      // degenerates into a small-files swamp; with it a rewrite
      // leaves ~one well-sized file per bucket. Buckets are sized a
      // few GB (numBuckets chosen per table volume), so one task per
      // bucket is the right write granularity.
      // materialize the touched buckets' next state before overwriting
      // their input files — O(touched), not O(snapshot)
      val materialized = sortedByKey(
        next.repartition(math.max(touched.length, 1), col("bucket")))
        .localCheckpoint(eager = true)
      // zones + blooms BEFORE the rewrite, widened/OR'd old ∪ next-state:
      // a crash between the two leaves stats that are only ever too wide
      writeZones(spark, widen(schema,
        readZones(spark).getOrElse(Map.empty), statsOf(materialized, schema)))
      maintainBlooms(spark, materialized)
      materialized.write
        .mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(path)
      // dynamic overwrite writes nothing for a bucket that drained to
      // zero rows — overwrite those partition dirs with an explicit
      // empty (schema-carrying) file so stale rows don't survive
      val remaining = materialized.select("bucket").distinct()
        .collect().map(_.getInt(0)).toSet
      val payload = materialized.drop("bucket")
      touched.filterNot(remaining).foreach { b =>
        payload.limit(0).repartition(1)
          .write.mode(SaveMode.Overwrite).parquet(s"$path/bucket=$b")
      }
    }
    // declarative bloom auto-init (streaming chains declare columns up
    // front — GRAFT_WAREHOUSE_BLOOMS — instead of running the offline
    // verb once): the first batch after which EVERY declared column
    // exists in the schema builds the index exactly over the table;
    // maintainBlooms keeps it fresh from then on. Built AFTER the data
    // so the initial build covers this batch too. An undeclared column
    // waits (schema evolution may add it later); an ineligible type
    // fails fast — that is a configuration error, not drift.
    if (declaredBlooms.nonEmpty && readBlooms(spark).isEmpty)
      readSidecar(spark).map(_._2).foreach { sc =>
        if (declaredBlooms.forall(sc.fieldNames.contains))
          buildBlooms(spark, declaredBlooms)
      }
  }

  // --------------------------------------------------------------- truncate

  /** P6 on the warehouse chain: drop EVERY row of the replica while
    * keeping its schema readable (the reference truncates every
    * destination, sql_renderer.rs:300-320; SQLite's DELETE-all analog,
    * dialects/sqlite.rs:26-33). All bucket dirs are removed and one
    * empty schema-carrying marker is left so plain `spark.read.parquet`
    * of the table keeps working. Idempotent — a batch replay truncates
    * an already-empty table. */
  def truncate(spark: SparkSession): Unit = {
    val fs = fsOf(spark)
    if (!fs.exists(root)) return
    val schema = readSidecar(spark).map(_._2).getOrElse {
      if (bucketDirs(spark).isEmpty) return
      StructType(spark.read.option("mergeSchema", "true")
        .parquet(path).drop("bucket").schema)
    }
    bucketDirs(spark).foreach(d => fs.delete(d, true))
    writeSidecar(spark, schema)
    emptyWith(spark, schema).repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/bucket=0")
    // exact-after-rewrite (offline order): the schema-marker bucket gets
    // a KNOWN-EMPTY entry (no columns = every column all-NULL there) so
    // scans keep skipping it — a bucket with no entry at all would be
    // "unknown", which is always read
    writeZones(spark, Map(0 -> Map.empty))
    // same for a declared bloom index: one recorded-but-empty bucket
    readBlooms(spark).foreach(bi =>
      writeBlooms(spark, bi.copy(buckets = Map(0 -> Map.empty))))
  }

  // ---------------------------------------------------------------- compact

  /** Maintenance compaction: rewrite buckets whose file count exceeds
    * `maxFilesPerBucket` into one file each. Normal MERGE rewrites
    * already leave ~one file per touched bucket; fragmentation
    * accumulates from drained-bucket markers and schema-evolution eras.
    * Run OFFLINE (no concurrent applyBatch on the same table).
    *
    * `zorderBy`: when set (2+ columns), rewritten files are laid out
    * along the rank-bucketed Morton curve over those columns
    * ([[graft.operators.ZOrder.layout]]) instead of key order — parquet
    * row-group min/max stats then prune selective predicates on ANY of
    * the listed columns (multi-dimensional data skipping), at the cost
    * of the key-sorted layout [[lookup]] prefers. Pick per table by its
    * read pattern.
    *
    * Crash-safe by construction: the compacted copy is fully written to
    * a sibling `_compact_bucket=N` dir (underscore-hidden from parquet
    * discovery, `_SUCCESS`-committed) BEFORE the original dir is
    * replaced, and [[recover]] rolls any interrupted swap forward (tmp
    * committed → finish the rename) or back (tmp partial → delete it) on
    * the next run. At no point is the only copy of a bucket in memory —
    * unlike a localCheckpoint, which dies with an executor.
    * Returns the compacted bucket ids. */
  def compact(spark: SparkSession, maxFilesPerBucket: Int = 4,
              zorderBy: Seq[String] = Nil): Seq[Int] = {
    val fs = fsOf(spark)
    if (!fs.exists(root)) return Seq.empty
    recover(spark)
    val schemaOpt = readSidecar(spark).map(_._2)
    val fragmented = bucketDirs(spark)
      .map { d =>
        val b = d.getName.stripPrefix("bucket=").toInt
        val nFiles = fs.listStatus(d).count(_.getPath.getName.endsWith(".parquet"))
        (b, nFiles)
      }
      .filter(_._2 > maxFilesPerBucket)
      .map(_._1).sorted
    fragmented.foreach { b =>
      val dir = new Path(path, s"bucket=$b")
      val tmp = new Path(path, s"_compact_bucket=$b")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      val reader = schemaOpt match {
        case Some(s) => spark.read.schema(s)
        case None => spark.read.option("mergeSchema", "true")
      }
      val in = reader.parquet(dir.toString).repartition(1)
      val laidOut =
        if (zorderBy.nonEmpty) graft.operators.ZOrder.layout(in, zorderBy)
        else sortedByKey(in)
      laidOut.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      fs.delete(dir, true)
      fs.rename(tmp, dir)
    }
    fragmented
  }

  /** Retention / TTL maintenance: delete every row matching `pred`
    * (e.g. `col("ts") < cutoff` or a GDPR key list), rewriting ONLY the
    * buckets that actually contain matches — a probe aggregation finds
    * them first, so a retention pass over a mostly-compliant table
    * touches almost nothing. Each rewrite reuses [[compact]]'s
    * committed-staging swap ([[recover]] heals interruptions), and a
    * bucket drained to zero keeps a schema-carrying marker, same as the
    * MERGE path. Run OFFLINE (no concurrent applyBatch). Returns the
    * rewritten bucket ids. */
  def retain(spark: SparkSession, pred: org.apache.spark.sql.Column): Seq[Int] = {
    val fs = fsOf(spark)
    if (!fs.exists(root)) return Seq.empty
    recover(spark)
    val schemaOpt = readSidecar(spark).map(_._2)
    def reader = schemaOpt match {
      case Some(s) =>
        spark.read.schema(StructType(s.fields :+ StructField("bucket", IntegerType)))
      case None => spark.read.option("mergeSchema", "true")
    }
    if (bucketDirs(spark).isEmpty) return Seq.empty
    // probe: which buckets hold matching rows (≤ numBuckets ints —
    // predicate + bucket column both prune/push into the scan)
    // zone consult FIRST: buckets whose ranges exclude the predicate
    // never reach the probe scan (O(1) metadata vs O(all footers))
    val probeDirs = zoneCandidates(spark, pred) match {
      case Some(cands) =>
        val ds = cands.map(b => new Path(path, s"bucket=$b"))
          .filter(fs.exists).map(_.toString)
        lastProbePlannedBuckets = ds.size
        ds
      case None =>
        lastProbePlannedBuckets = bucketDirs(spark).size
        Seq(path)
    }
    if (probeDirs.isEmpty) return Seq.empty
    val touched = reader.option("basePath", path).parquet(probeDirs: _*)
      .filter(pred)
      .select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    val keptStats = touched.map { b =>
      val dir = new Path(path, s"bucket=$b")
      val tmp = new Path(path, s"_compact_bucket=$b")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      // null-safe complement: a row where pred is NULL is KEPT (it does
      // not match the deletion predicate) — bare !pred would drop it
      val kept = sortedByKey(
        reader.option("basePath", path).parquet(dir.toString)
          .filter(!coalesce(pred, lit(false))).repartition(1))
        .localCheckpoint(eager = true)
      kept.drop("bucket").write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      fs.delete(dir, true)
      fs.rename(tmp, dir)
      b -> schemaOpt.map(s => statsOf(kept, s).getOrElse(b, Map.empty))
    }
    // exact-after-rewrite zone refresh (offline order): shrunk ranges
    // land only once the kept rows are the bucket's contents
    schemaOpt.foreach { _ =>
      readZones(spark).foreach { zones =>
        writeZones(spark, zones ++ keptStats.collect {
          case (b, Some(st)) => b -> st
        })
      }
    }
    touched.toSeq
  }

  /** Probe-scan bucket-dir count of the last [[retain]] — the zone-skip
    * contract made observable for tests/ops. */
  @transient @volatile var lastProbePlannedBuckets: Int = -1

  /** Finish (or undo) any compaction swap a crash interrupted. Safe to
    * call any time the table is offline; compact() calls it first. */
  def recover(spark: SparkSession): Unit = {
    val fs = fsOf(spark)
    if (!fs.exists(root)) return
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_compact_bucket="))
      .foreach { t =>
        val dst = new Path(path, t.getPath.getName.stripPrefix("_compact_"))
        if (fs.exists(new Path(t.getPath, "_SUCCESS"))) {
          // tmp fully committed: the swap rolls FORWARD
          if (fs.exists(dst)) fs.delete(dst, true)
          fs.rename(t.getPath, dst)
        } else fs.delete(t.getPath, true) // partial write: roll back
      }
  }

  // ----------------------------------------------------------------- lookup

  /** Point-lookup serving path. The key's bucket is an expression over
    * LITERALS — `pmod(hash(k…), numBuckets)` — so Catalyst constant-folds
    * it and partition pruning reads exactly ONE bucket dir out of
    * `numBuckets`; inside it, the key-equality predicates prune row
    * groups via the sorted-by-key file layout. O(one bucket's matching
    * row groups) per lookup, never a table scan.
    *
    * Key values must match the stored column types (the same values the
    * batch hashed on the way in). */
  def lookup(spark: SparkSession, key: Seq[Any]): DataFrame = {
    require(key.length == keyCols.length,
      s"lookup key arity ${key.length} != key columns ${keyCols.length}")
    val preds = keyCols.zip(key)
      .map { case (c, v) => col(c) === lit(v) }
      .reduce(_ && _)
    readSidecar(spark) match {
      case Some((_, s)) if bucketDirs(spark).nonEmpty =>
        spark.read
          .schema(StructType(s.fields :+ StructField("bucket", IntegerType)))
          .option("basePath", path).parquet(path)
          .filter(col("bucket") === pmod(hash(key.map(lit): _*), lit(numBuckets)))
          .filter(preds)
          .drop("bucket")
      case _ => snapshot(spark).filter(preds) // legacy/empty: no pruning
    }
  }

  // --------------------------------------------------------------- rebucket

  /** Offline bucket-count evolution: a table that grew 100× since its
    * numBuckets was chosen ends with multi-TB buckets, and the
    * per-touched-bucket rewrite degrades toward full-table cost. This
    * re-hashes every row into `newNumBuckets` partitions in a sibling
    * staging dir, then swaps it in (same committed-before-replace
    * discipline as [[compact]]; an interrupted swap rolls forward on
    * re-run). The sidecar records the new count, so any applier still
    * configured with the old one fails fast instead of corrupting the
    * layout. Returns a sink bound to the new count. */
  def rebucket(spark: SparkSession, newNumBuckets: Int): ParquetReplicaSink = {
    require(newNumBuckets > 0, "newNumBuckets must be positive")
    val fs = fsOf(spark)
    val staging = new Path(root.getParent, root.getName + "._rebucket")
    val next = new ParquetReplicaSink(path, keyCols, newNumBuckets)
    if (fs.exists(staging) &&
        fs.exists(new Path(staging, "_graft_rebucket_done"))) {
      // a previous run crashed mid-swap: roll forward. The bloom
      // declaration rides INSIDE the committed staging dir (copied
      // before the done marker), so it survives even the window where
      // the old root is already deleted — read it after the rename and
      // rebuild against the new layout.
      if (fs.exists(root)) fs.delete(root, true)
      fs.rename(staging, root)
      next.recomputeZones(spark)
      next.readBlooms(spark)
        .foreach(bi => next.buildBlooms(spark, bi.cols, bi.m, bi.k))
      return next
    }
    if (fs.exists(staging)) fs.delete(staging, true)
    val snap = snapshot(spark)
    val schema = StructType(snap.schema)
    sortedByKey(
      snap.withColumn("bucket", pmod(hash(keyCols.map(col): _*), lit(newNumBuckets)))
        .repartition(newNumBuckets, col("bucket")))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(staging.toString)
    // staging sidecar + done-marker make the staging dir self-contained
    new ParquetReplicaSink(staging.toString, keyCols, newNumBuckets)
      .writeSidecar(spark, schema)
    // carry the bloom DECLARATION into staging BEFORE the done marker:
    // the roll-forward's crash window sits between delete(root) and
    // rename, where the old root's _graft_blooms.json is already gone —
    // without this the declared skip index would silently vanish on
    // recovery (pruning degrades until someone re-runs bloom-build).
    // Declaration ONLY (empty buckets map): the old payloads address
    // the OLD bucket layout, and an empty map means "every bucket is
    // read" — sound at worst-slow until the rebuild below (or the
    // roll-forward's) restores exact bits for the new layout.
    readBlooms(spark).foreach { bi =>
      val st = new ParquetReplicaSink(staging.toString, keyCols, newNumBuckets)
      st.writeBlooms(spark, st.BloomIndex(bi.m, bi.k, bi.cols, Map.empty))
    }
    fs.create(new Path(staging, "_graft_rebucket_done"), true).close()
    // capture the declaration for the rebuild after the swap
    val bloomDecl = readBlooms(spark)
    fs.delete(root, true)
    fs.rename(staging, root)
    next.recomputeZones(spark)
    bloomDecl.foreach(bi => next.buildBlooms(spark, bi.cols, bi.m, bi.k))
    next
  }

  /** Recompute exact zone stats from the current layout — offline, the
    * rebucket epilogue and the migration entry for a pre-zones table. */
  def recomputeZones(spark: SparkSession): Unit =
    readSidecar(spark).foreach { case (_, s) =>
      if (bucketDirs(spark).isEmpty) writeZones(spark, Map.empty)
      else writeZones(spark, statsOf(
        spark.read
          .schema(StructType(s.fields :+ StructField("bucket", IntegerType)))
          .option("basePath", path).parquet(path), s))
    }

  // ------------------------------------------------------ bloom skip index

  /** Per-bucket Bloom filters over DECLARED columns — the EQUALITY
    * companion of the zone maps. Zones prune ranges, but only when the
    * column's values correlate with the bucket layout; a point predicate
    * on a layout-UNcorrelated high-cardinality column (an order number,
    * a request id, an email hash) spans every bucket's min/max and zones
    * prune nothing. A per-bucket bloom answers "does bucket b possibly
    * contain value v" from O(1) sidecar metadata: `col = v` / `IN (…)`
    * predicates on a declared column skip every bucket whose filter
    * provably excludes the value — at 100 TB, a point lookup on a
    * non-key column plans a handful of bucket dirs instead of the table.
    *
    * One JSON sidecar `_graft_blooms.json`: `{m, k, cols, buckets:
    * {bucket → {col → hex bitset}}}`. m bits (multiple of 64) per
    * (bucket, column), k deterministic salted-md5 positions per value —
    * the same hash family on the distributed write side (Spark md5 over
    * the value's string cast) and the driver consult side
    * (MessageDigest over the literal's rendering), so membership tests
    * are exact re-computations, never approximations of each other.
    * Eligible column types are strings and integral numerics only:
    * their Spark `CAST(… AS STRING)` and the literal's `toString` agree
    * byte-for-byte, which float/decimal renderings do not guarantee
    * (floats stay zone-served).
    *
    * Soundness discipline (the zone-map argument, specialized to sets):
    * the streaming path ([[applyBatch]]) ORs the batch's bits in BEFORE
    * writing data — a crash between the two leaves bits that are only
    * ever EXTRA, which can suppress a skip, never cause a wrong one.
    * Updates/deletes leave stale bits (same one-sided error);
    * [[recomputeBlooms]] / the `bloom-build` verb restore exactness
    * offline. A column absent from a bucket's entry means no non-NULL
    * value of it was ever recorded there → equality cannot match →
    * skippable; a bucket with no entry at all is always read. */
  private def bloomsPath = new Path(path, "_graft_blooms.json")

  private[graft] case class BloomIndex(m: Int, k: Int, cols: Seq[String],
      buckets: Map[Int, Map[String, Array[Long]]])

  private def bloomEligible(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case org.apache.spark.sql.types.StringType => true
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }

  /** Distributed k salted positions of a column value — md5 of
    * "salt:value", first 60 bits, mod m. */
  private def bloomPosExpr(salt: Int, c: org.apache.spark.sql.Column, m: Int)
      : org.apache.spark.sql.Column =
    pmod(conv(substring(md5(concat(lit(s"$salt:"), c.cast("string"))), 1, 15),
      16, 10).cast("long"), lit(m.toLong))

  /** Driver-side replay of [[bloomPosExpr]] for a rendered literal. */
  private def bloomPositions(v: String, m: Int, k: Int): Seq[Int] =
    (0 until k).map { salt =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt:$v".getBytes(UTF_8))
      val hex = md.take(8).map(b => f"$b%02x").mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % m).toInt
    }

  private[graft] def readBlooms(spark: SparkSession): Option[BloomIndex] = {
    val fs = fsOf(spark)
    if (!fs.exists(bloomsPath)) None
    else {
      val in = fs.open(bloomsPath)
      val txt = try new String(in.readAllBytes(), UTF_8) finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      import scala.jdk.CollectionConverters._
      val m = node.get("m").asInt(); val k = node.get("k").asInt()
      val cols = node.get("cols").elements().asScala.map(_.asText()).toSeq
      val buckets = node.get("buckets").properties().asScala.map { e =>
        e.getKey.toInt -> e.getValue.properties().asScala.map { c =>
          c.getKey -> c.getValue.asText().grouped(16)
            .map(java.lang.Long.parseUnsignedLong(_, 16)).toArray
        }.toMap
      }.toMap
      Some(BloomIndex(m, k, cols, buckets))
    }
  }

  private def writeBlooms(spark: SparkSession, bi: BloomIndex): Unit = {
    val fs = fsOf(spark)
    fs.mkdirs(root)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rootNode = mapper.createObjectNode()
    rootNode.put("m", bi.m); rootNode.put("k", bi.k)
    val ca = rootNode.putArray("cols")
    bi.cols.foreach(ca.add)
    val bn = rootNode.putObject("buckets")
    bi.buckets.toSeq.sortBy(_._1).foreach { case (b, cols) =>
      val cn = bn.putObject(b.toString)
      cols.toSeq.sortBy(_._1).foreach { case (c, words) =>
        cn.put(c, words.map(w => f"$w%016x").mkString)
      }
    }
    val tmp = new Path(path, "_graft_blooms.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(rootNode)) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(bloomsPath.toUri, spark.sessionState.newHadoopConf())
      .rename(tmp, bloomsPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Per-(bucket, column) bloom words of `withBuckets` — one partial
    * aggregation (explode factor k per declared column), collected as
    * ≤ buckets × cols × m/64 longs: bounded metadata, never data-sized. */
  private def bloomWordsOf(withBuckets: DataFrame, cols: Seq[String],
      m: Int, k: Int): Map[Int, Map[String, Array[Long]]] = {
    val present = cols.filter(withBuckets.columns.contains)
    if (present.isEmpty) return Map.empty
    val exploded = present.map { c =>
      withBuckets.filter(col(c).isNotNull)
        .select(col("bucket"), lit(c).as("__c"),
          explode(array((0 until k).map(bloomPosExpr(_, col(c), m)): _*))
            .as("__p"))
    }.reduce(_ unionByName _)
    exploded
      .select(col("bucket"), col("__c"), expr("__p div 64").as("__w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))").as("__b"))
      .groupBy("bucket", "__c", "__w")
      .agg(expr("bit_or(__b)").as("__bits"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (b, rows) =>
        b -> rows.toSeq.groupBy(_.getString(1)).map { case (c, rs) =>
          val words = new Array[Long](m / 64)
          rs.foreach(r => words(r.getLong(2).toInt) |= r.getLong(3))
          c -> words
        }
      }
  }

  /** Declare + exactly build the bloom index over `cols` — offline, the
    * entry point (and the staleness reset, see class doc). Rejects
    * non-existent or non-eligible columns loudly rather than recording
    * an index that could never prune soundly. */
  def buildBlooms(spark: SparkSession, cols: Seq[String],
                  m: Int = 4096, k: Int = 3): Unit = {
    require(cols.nonEmpty, "buildBlooms: at least one column")
    require(m > 0 && m % 64 == 0, s"buildBlooms: m=$m must be a multiple of 64")
    require(k >= 1, s"buildBlooms: k=$k")
    val schema = readSidecar(spark).map(_._2).getOrElse(
      throw new IllegalArgumentException(
        s"buildBlooms: $path has no schema sidecar"))
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach { c =>
      val t = types.getOrElse(c, throw new IllegalArgumentException(
        s"buildBlooms: unknown column $c"))
      require(bloomEligible(t),
        s"buildBlooms: $c is $t — only string/integral columns have a " +
          "reproducible string rendering (floats stay zone-served)")
    }
    val buckets =
      if (bucketDirs(spark).isEmpty) Map.empty[Int, Map[String, Array[Long]]]
      else bloomWordsOf(
        spark.read
          .schema(StructType(schema.fields :+ StructField("bucket", IntegerType)))
          .option("basePath", path).parquet(path), cols, m, k)
    writeBlooms(spark, BloomIndex(m, k, cols, buckets))
  }

  /** OR the batch's values into the index BEFORE the caller writes data
    * (the widen-before-write soundness order). No-op without a declared
    * index. `withBuckets` must carry the bucket column. */
  private def maintainBlooms(spark: SparkSession, withBuckets: DataFrame): Unit =
    readBlooms(spark).foreach { bi =>
      val add = bloomWordsOf(withBuckets, bi.cols, bi.m, bi.k)
      if (add.nonEmpty) {
        val merged = (bi.buckets.keySet ++ add.keySet).map { b =>
          val o = bi.buckets.getOrElse(b, Map.empty[String, Array[Long]])
          val a = add.getOrElse(b, Map.empty[String, Array[Long]])
          b -> (o.keySet ++ a.keySet).map { c =>
            c -> ((o.get(c), a.get(c)) match {
              case (Some(x), Some(y)) => x.zip(y).map(t => t._1 | t._2)
              case (Some(x), None) => x
              case (None, y) => y.get
            })
          }.toMap
        }.toMap
        writeBlooms(spark, bi.copy(buckets = merged))
      }
    }

  /** Exact rebuild from the current layout with the declared cols/m/k —
    * offline; drops the stale bits updates/deletes/retain left behind. */
  def recomputeBlooms(spark: SparkSession): Unit =
    readBlooms(spark).foreach(bi => buildBlooms(spark, bi.cols, bi.m, bi.k))

  // ------------------------------------------------------------ ANALYZE

  /** ANALYZE-style table statistics: row count plus per-column distinct
    * and null counts, persisted as `_graft_stats.json` — the planner
    * food a warehouse grows around (is this dim broadcastable? is that
    * column worth a bloom index? how selective is a point predicate?).
    * ONE scan: every column's NDV rides Spark's HLL++ partial aggregate
    * (order-insensitive register maxes — deterministic for a given
    * table), nulls are a count-when. Run offline (the `stats` verb);
    * numbers describe the scan-time snapshot. */
  def tableStats(spark: SparkSession)
      : (Long, Seq[(String, Long, Long)]) = {
    val schema = readSidecar(spark).map(_._2)
      .getOrElse(StructType(snapshot(spark).schema))
    val snap = snapshot(spark)
    val aggs = schema.fields.toSeq.flatMap(f => Seq(
      approx_count_distinct(col(f.name)).as(s"ndv_${f.name}"),
      sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"nul_${f.name}")))
    val r = snap.agg(count(lit(1)).as("rows"), aggs: _*).first()
    val rows = r.getAs[Long]("rows")
    val cols = schema.fields.toSeq.map(f =>
      (f.name, r.getAs[Long](s"ndv_${f.name}"),
        Option(r.getAs[Any](s"nul_${f.name}")).map(_.asInstanceOf[Long])
          .getOrElse(0L)))
    // persist for planners/operators (atomic rename, the sidecar idiom)
    val fs = fsOf(spark)
    fs.mkdirs(root)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rootNode = mapper.createObjectNode()
    rootNode.put("rows", rows)
    val cn = rootNode.putObject("columns")
    cols.foreach { case (c, ndv, nulls) =>
      val o = cn.putObject(c); o.put("ndv", ndv); o.put("nulls", nulls)
    }
    val statsPath = new Path(path, "_graft_stats.json")
    val tmp = new Path(path, "_graft_stats.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(rootNode)) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(statsPath.toUri, spark.sessionState.newHadoopConf())
      .rename(tmp, statsPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    (rows, cols)
  }

  /** May bucket `b` contain `v` in column `c`? Sidecar absent / column
    * undeclared / bucket unrecorded → unknown (true). */
  private def bloomMay(bloomsOpt: Option[BloomIndex], b: Int, c: String,
                       v: String): Boolean = bloomsOpt match {
    case None => true
    case Some(bi) =>
      if (!bi.cols.contains(c)) true
      else bi.buckets.get(b) match {
        case None => true
        case Some(cm) => cm.get(c) match {
          case None => false // no non-NULL value of c ever landed in b
          case Some(words) => bloomPositions(v, bi.m, bi.k)
            .forall(p => ((words(p / 64) >>> (p % 64)) & 1L) == 1L)
        }
      }
  }
}
