package graft.streaming

import graft.dialect.Dialect
import graft.render.RenderContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{broadcast, col, concat, concat_ws, count, countDistinct, desc, explode, expr, hash, lit, max, pmod, size, slice, sum, when}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** E1/E2 app runner — the `run_cdc_app` analog (reference app.rs:51-234,
  * client.rs:54-160): env config → validation → cdcwal source → event
  * filter (F1/F4) → exactly-once JDBC apply, with the metrics scrape
  * server up and a JVM shutdown hook draining the in-flight epoch
  * (`query.stop()` ≙ the reference's SIGTERM → CancellationToken → drain
  * path, O4).
  *
  * All wiring lives in [[build]] so tests can drive the full composition
  * without a process; `main` adds only the process-lifecycle shell.
  *
  * Env surface (beyond GraftConfig's CDC_* set):
  *   GRAFT_WAL_DIR      — cdcwal segment directory (required)
  *   GRAFT_DEST_URL     — destination JDBC url (required unless
  *     GRAFT_WAREHOUSE_DIR selects the warehouse mode)
  *   GRAFT_WAREHOUSE_DIR — parquet-replica root: replicate into
  *     per-table hash-bucketed parquet (the 100 TB path) instead of a
  *     JDBC destination; GRAFT_WAREHOUSE_BUCKETS (default 64) sizes the
  *     layout, GRAFT_WAREHOUSE_SPILL=true routes through the disk-spill
  *     sealer for arbitrarily large streamed transactions;
  *     GRAFT_STAR_VIEWS declares N-dim star join views (see
  *     parseStarViews), GRAFT_WAREHOUSE_BLOOMS declares per-table
  *     bloom skip indexes the chain auto-builds + maintains
  *   GRAFT_CURATE_DIR   — training-data intake mode: stream document
  *     parquet (doc_id, source, text) from this directory through the
  *     curation pipeline (quality/language gates, exact + LSH near
  *     dedup) into GRAFT_CURATE_STORE (required with it); replaces the
  *     CDC chain, so GRAFT_WAL_DIR/GRAFT_DEST_URL are not required;
  *     GRAFT_CURATE_BLOCKS=true adds the block-granular (paragraph)
  *     dedup rewrite stage backed by a BlockDedupStore at
  *     <store>/blocks; GRAFT_CURATE_DECONTAM=<dir> adds the Bloom
  *     benchmark-decontamination stage served from a bloom-bits
  *     artifact; GRAFT_CURATE_MODEL=<dir> adds the trained-
  *     classifier gate (a classifier-train weight artifact; docs with
  *     margin z < 0 are dropped); GRAFT_CURATE_SKETCH=<dir> folds each trigger's
  *     ADMITTED docs into a durable SketchStore (per-source length
  *     histogram + distinct-shingle HLL) — running corpus telemetry
  *     without a corpus scan
  *   GRAFT_KAFKA_BROKERS — kafka mode: publish Debezium envelopes via
  *     the built-in kafka sink instead of applying SQL;
  *     GRAFT_KAFKA_TOPIC_PREFIX (default "cdc") routes
  *     {prefix}.{schema}.{table}; GRAFT_KAFKA_FORMAT/GRAFT_KAFKA_PATH
  *     are the sandbox test seam (no broker here)
  *   GRAFT_CHECKPOINT   — checkpoint location (required)
  *   GRAFT_DIALECT      — ansi|mysql|sqlserver|sqlite (default ansi)
  *   GRAFT_METRICS_PORT — scrape port (default 8080; -1 disables)
  *   CDC_MAX_EVENTS_PER_TRIGGER — admission cap (optional)
  *   GRAFT_PG_HOST/PORT/USER/PASSWORD/DATABASE — live capture upstream
  *     (optional; database defaults to "postgres", as libpq does)
  *
  * MAINTENANCE mode (offline — replaces streaming entirely; [[build]]
  * refuses the combination, which is how the library's run-offline
  * discipline for these verbs is enforced at the process level):
  *   GRAFT_MAINTENANCE  — comma-separated verbs:
  *     compact       every warehouse table (and each declared projection
  *                   under `_proj/`) folds buckets fragmented past
  *                   GRAFT_COMPACT_MAX_FILES (default 4); per-table
  *                   z-order via GRAFT_ZORDER="tbl=c1,c2;..."
  *     retain        delete rows matching GRAFT_RETAIN_PREDICATE (SQL
  *                   boolean expr) from GRAFT_RETAIN_TABLE
  *     rebucket      re-hash GRAFT_REBUCKET_TABLE to GRAFT_REBUCKET_TO
  *                   buckets (keys via GRAFT_TABLE_KEYS)
  *     spill         fold long-lived txid dirs of the warehouse spill
  *                   (GRAFT_SPILL_MAX_FILES, default 16) and reap
  *                   abandoned txids below GRAFT_SPILL_WATERMARK (if set)
  *     curate-store  fold the curation store's per-batch dirs
  *                   (GRAFT_CURATE_STORE); on a `release` verb's store
  *                   this also folds the processed/retracted delta id
  *                   ledgers (per-row batch id keeps liveness ordering
  *                   exact across the merge)
  *     doc-fate      "why is doc X (not) in the corpus": per-id fate
  *                   report over a curation store / release root
  *                   (GRAFT_DOC_IDS=1,2,...; GRAFT_CURATE_STORE or
  *                   GRAFT_RELEASE_OUT; optional GRAFT_FATE_DOCS raw
  *                   corpus names the dropping stage + displacing doc,
  *                   honoring GRAFT_RELEASE_BLOOM/_MODEL/_JACCARD;
  *                   when the release root carries synced serving
  *                   indexes, the line also answers "is it SEARCHABLE"
  *                   — text_index/ann_index membership at their synced
  *                   versions, part-pruned probes)
  *     lsh-index     compact the durable dedup index (GRAFT_INDEX_DIR;
  *                   GRAFT_INDEX_PARTS if the store was built with a
  *                   non-default part count — the folded layout must
  *                   use the SAME modulus or intake planning misses it)
  *     block-store   compact the durable block-dedup ownership store
  *                   (GRAFT_BLOCK_DIR; GRAFT_BLOCK_PARTS likewise)
  *     sketch-store  fold the durable KMV/CMS sketch store's per-batch
  *                   dirs (GRAFT_SKETCH_STORE)
  *     ann-sweep     distributed batch retrieval against a persisted
  *                   ANN index (GRAFT_ANN_DIR): top-GRAFT_ANN_K (def
  *                   10) per probe written to GRAFT_ANN_SWEEP_OUT;
  *                   probes = GRAFT_ANN_PROBES parquet of vec_id, or
  *                   "self"/unset = every live id (full-corpus sweep);
  *                   GRAFT_ANN_RADIUS / GRAFT_ANN_NPROBE tune the
  *                   LSH / IVF candidate widths; GRAFT_ANN_SHORTLIST
  *                   (def 50) sizes the per-probe ADC shortlist of an
  *                   ivfpq store's rerank; GRAFT_ANN_WHERE adds
  *                   a metadata predicate over the store's metaCols
  *                   (filter-then-score); GRAFT_ANN_PAIR_WHERE adds a
  *                   per-probe PAIR predicate (candidate metaCols vs
  *                   the probe's as p_<name> — "label <> p_label" =
  *                   distributed hard-negative mining) — no driver
  *                   candidate materialization at any probe-set size
  *     sketch-serve  read the durable sketch store without Scala: one
  *                   line per stored kind (KMV/HLL estimates, histogram
  *                   quantiles); GRAFT_SKETCH_GROUPS=g1,g2 prunes the
  *                   read to the probed groups' hash parts,
  *                   GRAFT_SKETCH_QUANTILES=500,990 picks the permille
  *                   read-outs
  *     bloom-bits    build/refresh the Bloom decontamination artifact
  *                   from a benchmark corpus (GRAFT_BLOOM_BENCH parquet
  *                   of doc_id,text → GRAFT_BLOOM_OUT; GRAFT_BLOOM_M /
  *                   GRAFT_BLOOM_K / GRAFT_BLOOM_SHINGLE tune the
  *                   filter, defaults 65536/4/3); the curate intake
  *                   serves it via GRAFT_CURATE_DECONTAM=<dir>
  *     bloom-build   declare + exactly (re)build per-bucket bloom SKIP
  *                   indexes on warehouse tables (GRAFT_BLOOM_TABLES=
  *                   "table:col1+col2,..."; GRAFT_BLOOM_BITS/
  *                   GRAFT_BLOOM_HASHES, def 4096/3) — point
  *                   predicates on the declared columns then plan ~1
  *                   bucket dir; also the staleness reset after
  *                   update/delete churn (streaming chains can declare
  *                   via GRAFT_WAREHOUSE_BLOOMS instead)
  *     stats         ANALYZE wave: per-table row counts + per-column
  *                   NDV/null stats (persisted _graft_stats.json) and
  *                   the skip-index inventory
  *     text-index    build/append a durable BM25 inverted index
  *                   (GRAFT_TEXT_DOCS → GRAFT_TEXT_OUT;
  *                   GRAFT_TEXT_PARTS def 64, GRAFT_TEXT_BATCH def 0,
  *                   GRAFT_TEXT_COMPACT=1 folds batch dirs,
  *                   GRAFT_TEXT_QUERY serves a probe from the
  *                   part-pruned postings;
  *                   GRAFT_TEXT_DFCAP_PERMILLE def 600 skips
  *                   stopword terms before any posting read)
  *     text-index-sync  bring a release root's BM25 index
  *                   (`<GRAFT_RELEASE_OUT>/_text_index`) up to the
  *                   corpus' CURRENT version: manifest-diff
  *                   incremental (untouched segments never read),
  *                   rebuild fallback once the synced version left
  *                   retention; GRAFT_TEXT_COMPACT=1 purges tombstones;
  *                   batch dirs AUTO-fold past GRAFT_TEXT_FOLD_AUTO_MAX
  *                   (32; GRAFT_TEXT_FOLD_BATCHES=N forces, =0 opts
  *                   out) — the standalone form of
  *                   GRAFT_RELEASE_TEXT_INDEX=1
  *     ann-index-sync  bring a release root's vector index
  *                   (`<GRAFT_RELEASE_OUT>/_ann_index`) up to the
  *                   corpus' CURRENT version: same manifest diff over
  *                   the embedding column the funnel carries
  *                   (GRAFT_ANN_EMBED_COL def `embedding`); cold builds
  *                   pick GRAFT_ANN_SYNC_KIND (lsh def | ivf | ivfpq);
  *                   GRAFT_ANN_COMPACT=1 purges tombstones — the
  *                   standalone form of GRAFT_RELEASE_ANN_INDEX=1
  *     hybrid-search reciprocal-rank fusion of the text index
  *                   (GRAFT_TEXT_OUT) and a persisted ANN index
  *                   (GRAFT_ANN_DIR) for one probe doc
  *                   (GRAFT_HYBRID_PROBE, text from GRAFT_HYBRID_DOCS;
  *                   GRAFT_HYBRID_K def 5). With GRAFT_RELEASE_OUT set
  *                   instead, all three default to the release root's
  *                   synced `_text_index`/`_ann_index`/current docs —
  *                   version-consistent hybrid serving over the frozen
  *                   corpus (the synced versions are reported)
  *     hybrid-sweep  the CORPUS-SIZED form: every probe id
  *                   (GRAFT_HYBRID_PROBES parquet, or "self" = every
  *                   live vector) queries both tiers in one
  *                   distributed plan each (searchDistributed +
  *                   sweepDistributed), RRF-fused per probe →
  *                   GRAFT_HYBRID_OUT parquet; same root defaults as
  *                   hybrid-search
  *     bpe-train     train a BPE tokenizer on GRAFT_BPE_DOCS parquet
  *                   (GRAFT_BPE_MERGES, def 200; GRAFT_BPE_VOCAB_CAP,
  *                   def 65536; GRAFT_BPE_TEXT_COL, def text) and
  *                   persist the complete artifact (merges + vocab)
  *                   to GRAFT_BPE_OUT for Bpe.loadTokenizer
  *     ann-index     fold append-accumulated files of a persisted ANN
  *                   serving index (GRAFT_ANN_DIR); GRAFT_ANN_DELETE=
  *                   id,id,… retracts vectors (tombstone + physical
  *                   fold); reports IVF centroid-drift telemetry;
  *                   GRAFT_ANN_REBUILD_IF_DRIFT=<ratio> re-clusters the
  *                   whole store (fresh centroids — ivfpq stores also
  *                   retrain their codebooks and re-code; baseline
  *                   reset) when the last append drifted past
  *                   baseline×ratio
  *     agg-view      heal + fold every GRAFT_AGG_VIEWS-declared
  *                   incremental aggregate view's, every
  *                   GRAFT_JOIN_VIEWS-declared join view's AND every
  *                   GRAFT_STAR_VIEWS-declared star view's delta dirs
  *                   under GRAFT_WAREHOUSE_DIR and report live group
  *                   counts; GRAFT_AGG_PROBE="v1,v2;..." also serves a
  *                   partition-pruned probed read per matching-arity
  *                   view (tuples in group-column order)
  *     agg-view-bootstrap  declare agg/join/star views over
  *                   ALREADY-replicated tables: seed from the replica
  *                   snapshots (join/star seed through the sink's
  *                   broadcast-join rebuild), then the streaming chain
  *                   maintains them incrementally
  *     history       heal + fold every GRAFT_HISTORY_TABLES-declared
  *                   SCD2 history store under GRAFT_WAREHOUSE_DIR and
  *                   report version/current counts; GRAFT_HISTORY_ASOF=
  *                   <lsn> adds the time-travel row count at that LSN,
  *                   GRAFT_HISTORY_PROBE="k1,k2" prints one key's
  *                   partition-pruned version chain,
  *                   GRAFT_HISTORY_RETAIN_BELOW=<lsn> ages out versions
  *                   whose validity ended at/before the horizon (asOf
  *                   at/after it is untouched)
  *     schema-log    print every replica's schema-drift audit (one
  *                   entry per sidecar widening: batch, max LSN, added
  *                   columns, resulting schema)
  *     history-bootstrap declare SCD2 history over an ALREADY-replicated
  *                   table: seed one open version per replica row at
  *                   GRAFT_HISTORY_BOOTSTRAP_LSN (the snapshot's
  *                   replication position); the streaming chain appends
  *                   from there
  *     classifier-train train the logistic-regression quality gate on
  *                   GRAFT_CLF_DOCS parquet (GRAFT_CLF_STEPS, def 3;
  *                   GRAFT_CLF_LR milli, def 100;
  *                   GRAFT_CLF_TARGET_LANG, def en) and persist the
  *                   weight artifact to GRAFT_CLF_OUT — served by the
  *                   curate intake via GRAFT_CURATE_MODEL
  *     unigram-train train a unigram (SentencePiece-style) segmenter
  *                   vocab on GRAFT_UNIGRAM_DOCS parquet
  *                   (GRAFT_UNIGRAM_VOCAB, def 512;
  *                   GRAFT_UNIGRAM_VOCAB_CAP, def 65536;
  *                   GRAFT_UNIGRAM_TEXT_COL, def text) and persist the
  *                   piece table to GRAFT_UNIGRAM_OUT for
  *                   Unigram.loadVocab
  *     emit-shards   the last mile: GRAFT_EMIT_DOCS parquet
  *                   (doc_id, text[, ...]) encoded with the
  *                   GRAFT_EMIT_TOKENIZER artifact into packed
  *                   GRAFT_EMIT_BUDGET-token id sequences (def 2048),
  *                   md5-shuffle-assigned to GRAFT_EMIT_SHARDS shards
  *                   (def 64), written shard-partitioned to
  *                   GRAFT_EMIT_OUT — the layout a trainer's loader
  *                   mounts; GRAFT_EMIT_TOKENIZER_KIND=bpe (default)
  *                   or unigram selects the tokenizer family the
  *                   artifact belongs to
  *     release       one-command INCREMENTAL training-data release
  *                   over GRAFT_RELEASE_DOCS: never-processed docs run
  *                   the streaming-intake funnel (quality/lang gate +
  *                   optional GRAFT_RELEASE_MODEL classifier gate +
  *                   optional GRAFT_RELEASE_BLOOM decontamination
  *                   (GRAFT_RELEASE_MINSHARED def 3), exact dedup,
  *                   near-dedup at GRAFT_RELEASE_JACCARD def 0.8,
  *                   optional GRAFT_RELEASE_BLOCKS=1 paragraph-dedup
  *                   rewrite, optional GRAFT_RELEASE_SKETCH=<dir>
  *                   corpus-telemetry sketch store; deltas above
  *                   GRAFT_RELEASE_BATCH_DOCS run as bounded
  *                   sequential id-ordered intake chunks — identical
  *                   end state, bounded working set)
  *                   against the persisted dedup stores — O(delta),
  *                   part-pruned; removed doc_ids retract; non-core
  *                   columns (multimodal payloads/metadata) ride
  *                   through. The curated corpus freezes crash-safely
  *                   at GRAFT_RELEASE_OUT/docs/v<N>/MANIFEST (CURRENT
  *                   pointer; untouched segments are REFERENCED from
  *                   the docs/_segs pool — zero bytes copied — with
  *                   the previous version retained; zero-delta
  *                   releases publish no new version; resolve via
  *                   VersionedDir.currentPath + SegPool.readDocs) and
  *                   emit-shards
  *                   runs against it (manifest + changed-shards-only
  *                   re-tokenization; pass the
  *                   GRAFT_EMIT_TOKENIZER[_KIND]/BUDGET/SHARDS knobs
  *                   through); per-release funnel report under
  *                   GRAFT_RELEASE_OUT/_report;
  *                   GRAFT_RELEASE_TEXT_INDEX=1 keeps the BM25 index
  *                   at GRAFT_RELEASE_OUT/_text_index in exact sync
  *                   with the frozen corpus (manifest-diff
  *                   incremental);
  *                   GRAFT_RELEASE_ANN_INDEX=1 does the same for the
  *                   vector index at _ann_index over the carried
  *                   embedding column (GRAFT_ANN_EMBED_COL;
  *                   GRAFT_ANN_SYNC_KIND lsh|ivf|ivfpq,
  *                   GRAFT_ANN_REBUILD_IF_DRIFT=<r>).
  *                   Retraction tombstones are purged physically by a
  *                   SIZE-TRIGGERED auto-trigger (pending >
  *                   GRAFT_INDEX_AUTOCOMPACT_REMOVED, default 100000,
  *                   or > GRAFT_INDEX_AUTOCOMPACT_PCT percent of
  *                   stored docs, default 10 — the df-cap's slack must
  *                   not degrade to no-term-over-cap). The auto path
  *                   runs the SELECTIVE purge (only batches/dirs
  *                   holding dead rows rewrite — store.purge);
  *                   GRAFT_RELEASE_{TEXT,ANN}_COMPACT=1 forces the
  *                   full fold-compact, =0 disables both; pending
  *                   counts exported as graft_index_tombstones_{text,ann}
  *                   — LIVE callback gauges read at scrape time, so a
  *                   delete between releases moves the value with no
  *                   verb running; text batch dirs auto-fold past
  *                   GRAFT_TEXT_FOLD_AUTO_MAX (32) as in text-index-sync
  *     project-bootstrap  (re)build every GRAFT_PROJECTIONS-declared
  *                   projection from its base replica's snapshot — how
  *                   a projection is added to an existing warehouse
  *     project-check  row-count parity between each declared projection
  *                   and its base replica — the cheap divergence
  *                   tripwire for a violated insert contract (repair =
  *                   project-bootstrap)
  *   GRAFT_TABLE_KEYS — "c1,c2" for all tables, or per-table
  *     "tbl=c1,c2;tbl2=c3" (keeps rewrites key-sorted; rebucket requires
  *     the target table's keys)
  *
  * Declared projections (warehouse mode + maintenance):
  *   GRAFT_PROJECTIONS — "schema.table:indexKey;..." declares secondary
  *     layouts the warehouse chain maintains from each batch's
  *     before/after images (primary keys via GRAFT_TABLE_KEYS) and the
  *     op="t" wave truncates with their base table
  *   GRAFT_AGG_VIEWS — "schema.table:g1,g2>s1,s2;..." declares
  *     incrementally-maintained aggregate views (per-group COUNT(*) +
  *     SUM of the listed columns) folded from each batch's
  *     before/after images as signed deltas; truncate zeroes them via
  *     an epoch bump; offline upkeep via the agg-view verb
  *   GRAFT_HISTORY_TABLES — "schema.table[:k1,k2];..." declares SCD2
  *     version histories ([[graft.sinks.HistorySink]]) the warehouse
  *     chain appends under <root>/_history/ (audit trail + as-of-LSN
  *     time travel; truncate caps intervals via a marker, never a
  *     rewrite); offline upkeep/serving via the history verb (keys
  *     resolve from the store meta)
  */
object GraftApp {

  /** Per-stage wall times of the last `release` run (delta_detect /
    * apply_delta / freeze / emit_shards) — the verb's end-to-end cost
    * made observable for ScaleProbe and round-over-round comparison. */
  @volatile var lastReleaseStageSecs: Seq[(String, Double)] = Nil

  /** The last freeze's plan: (segments rebuilt — their pool dirs were
    * read and rewritten, O(changed)) vs (segments referenced — their
    * pool dirs were neither read nor written). The spec-pinned
    * O(changed segments) publish contract. */
  @volatile var lastFreezePlan: (Seq[String], Seq[String]) = (Nil, Nil)

  /** Whether the last release's per-source report had to SCAN the
    * assembled corpus (true only for versions predating the SOURCES
    * sidecar) instead of folding the sidecar's per-seg counts on the
    * driver. Spec-pinned false on the sidecar path: the report stage
    * must launch no job over the corpus. */
  @volatile var lastReportScan: Boolean = false

  /** How many store dirs the last release's up-front RANGE RECLAIM
    * removed — leftovers of a crashed/displaced attempt of the same
    * release (batch ids in [relBatch*65536, +65536) with no committed
    * ledger). Spec-pinned: a leftover seen row must never anti-join a
    * resubmitted doc out of every future frozen version. */
  @volatile var lastRangeSwept: Int = 0

  /** The last release's text-index sync report (None when
    * GRAFT_RELEASE_TEXT_INDEX is off). Spec-pinned: untouched segments
    * are SKIPPED (never read) and a synced index ranks identically to
    * a fresh build over the current corpus. */
  @volatile var lastIndexSync:
      Option[graft.llmops.CorpusIndexSync.SyncReport] = None

  /** The last release's ANN-index sync report (None when
    * GRAFT_RELEASE_ANN_INDEX is off). Same pins as [[lastIndexSync]],
    * for the vector side. */
  @volatile var lastAnnSync:
      Option[graft.llmops.CorpusIndexSync.SyncReport] = None

  /** GRAFT_TABLE_KEYS: "c1,c2" for every table, or "tbl=c1,c2;tbl2=c3". */
  private def tableKeys(env: Map[String, String], table: String): Seq[String] =
    env.get("GRAFT_TABLE_KEYS").map { s =>
      if (!s.contains("=")) s.split(",").map(_.trim).toSeq
      else s.split(";").map(_.split("=", 2)).collectFirst {
        case Array(t, ks) if t.trim == table => ks.split(",").map(_.trim).toSeq
      }.getOrElse(Seq.empty)
    }.getOrElse(Seq.empty)

  /** GRAFT_AGG_VIEWS: "schema.table:g1,g2>s1,s2;..." → declared
    * incremental aggregate views (group cols > summed cols). */
  private[graft] def parseAggViews(
      env: Map[String, String]): Seq[graft.sinks.AggViewDef] =
    env.get("GRAFT_AGG_VIEWS").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { spec =>
        spec.split(":", 2) match {
          case Array(table, rest) if rest.contains(">") =>
            // groups>sums[>minmax] — the third section is optional
            val sections = rest.split(">", 3)
            def cols(s: String) =
              s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            val groups = cols(sections(0))
            val sums = cols(sections(1))
            val minMax = if (sections.length > 2) cols(sections(2)) else Nil
            require(groups.nonEmpty,
              s"agg view '$spec' needs at least one group column")
            graft.sinks.AggViewDef(table.trim, groups, sums,
              minMaxCols = minMax)
          case _ => throw new IllegalArgumentException(
            s"GRAFT_AGG_VIEWS entry '$spec' is not schema.table:g1,g2>s1,s2[>m1,m2]")
        }
      }

  /** GRAFT_JOIN_VIEWS: "fact~dim:fk=pk:g1,g2>s1,s2[>m1,m2];..." →
    * declared incrementally-maintained join views (the optional third
    * section lists fact columns tracked as per-group MIN/MAX through
    * the value multiset). */
  private[graft] def parseJoinViews(
      env: Map[String, String]): Seq[graft.sinks.JoinViewDef] =
    env.get("GRAFT_JOIN_VIEWS").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { spec =>
        spec.split(":", 3) match {
          case Array(tbls, keys, gss)
              if tbls.contains("~") && keys.contains("=") && gss.contains(">") =>
            val Array(fact, dim) = tbls.split("~", 2).map(_.trim)
            val Array(fk, pk) = keys.split("=", 2).map(_.trim)
            // groups>sums[>minmax] — third section optional, as in
            // GRAFT_AGG_VIEWS
            val sections = gss.split(">", 3)
            def cols(s: String) =
              s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            val groups = cols(sections(0))
            require(groups.nonEmpty,
              s"join view '$spec' needs at least one dim group column")
            graft.sinks.JoinViewDef(fact, dim, fk, pk, groups, cols(sections(1)),
              minMaxCols = if (sections.length > 2) cols(sections(2)) else Nil)
          case _ => throw new IllegalArgumentException(
            s"GRAFT_JOIN_VIEWS entry '$spec' is not " +
              "fact~dim:fk=pk:g1,g2>s1,s2[>m1,m2]")
        }
      }

  /** GRAFT_STAR_VIEWS: "fact~dim1:fk1=pk1:g1,g2~dim2:fk2=pk2:g3>s1[>m1];
    * ..." → declared star-schema join views: the fact and one or more
    * `dim:fk=pk:groupCols` spokes, then the sum columns, then the
    * optional MIN/MAX columns (the GRAFT_JOIN_VIEWS sections,
    * generalized to N dims). */
  private[graft] def parseStarViews(
      env: Map[String, String]): Seq[graft.sinks.StarViewDef] =
    env.get("GRAFT_STAR_VIEWS").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { spec =>
        def cols(s: String) =
          s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val sections = spec.split(">", 3)
        require(sections.length >= 2 && sections(0).contains("~"),
          s"GRAFT_STAR_VIEWS entry '$spec' is not " +
            "fact~dim:fk=pk:g1,g2[~dim2:fk2=pk2:g3]>s1,s2[>m1,m2]")
        val tbls = sections(0).split("~").map(_.trim)
        val fact = tbls.head
        val dims = tbls.tail.toSeq.map { ds =>
          ds.split(":", 3) match {
            case Array(dim, keys, gs) if keys.contains("=") =>
              val Array(fk, pk) = keys.split("=", 2).map(_.trim)
              val groups = cols(gs)
              require(groups.nonEmpty,
                s"star view dim '$ds' needs at least one group column")
              graft.sinks.StarDim(dim.trim, fk, pk, groups)
            case _ => throw new IllegalArgumentException(
              s"GRAFT_STAR_VIEWS dim '$ds' is not dim:fk=pk:g1,g2")
          }
        }
        graft.sinks.StarViewDef(fact, dims, cols(sections(1)),
          minMaxCols = if (sections.length > 2) cols(sections(2)) else Nil)
      }

  /** GRAFT_WAREHOUSE_BLOOMS: "table:col1+col2,..." → per-table bloom
    * skip-index declarations for the STREAMING warehouse chain (the
    * `bloom-build` verb's syntax): the chain auto-builds each index on
    * the first batch that covers the declared columns and maintains it
    * online from then on. */
  private[graft] def parseWarehouseBlooms(
      env: Map[String, String]): Map[String, Seq[String]] =
    env.get("GRAFT_WAREHOUSE_BLOOMS").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      .map { sp =>
        sp.split(":", 2) match {
          case Array(t, cs) =>
            t.trim -> cs.split("\\+").map(_.trim).filter(_.nonEmpty).toSeq
          case _ => throw new IllegalArgumentException(
            s"GRAFT_WAREHOUSE_BLOOMS entry '$sp' is not table:col1+col2")
        }
      }.toMap

  /** GRAFT_HISTORY_TABLES: "schema.table[:k1,k2];..." → tables whose
    * SCD2 version history ([[graft.sinks.HistorySink]]) the warehouse
    * chain maintains under `<root>/_history/`. Key columns are OPTIONAL
    * everywhere once the store exists (its meta records them; a
    * declaration is cross-checked against it) — the streaming side
    * learns them from each batch's keyColumns. */
  private[graft] def parseHistoryTables(
      env: Map[String, String]): Seq[(String, Seq[String])] =
    env.get("GRAFT_HISTORY_TABLES").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { spec =>
        spec.split(":", 2) match {
          case Array(table, ks) =>
            (table.trim, ks.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          case Array(table) => (table.trim, Seq.empty[String])
        }
      }

  /** GRAFT_PROJECTIONS: "schema.table:indexKey;..." → declared defs. */
  private def parseProjections(env: Map[String, String],
                               numBuckets: Int): Seq[graft.sinks.ProjectionDef] =
    env.get("GRAFT_PROJECTIONS").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { spec =>
        spec.split(":", 2) match {
          case Array(table, idx) if idx.nonEmpty =>
            val keys = tableKeys(env, table.trim)
            require(keys.nonEmpty,
              s"projection ${table.trim}:$idx needs the table's primary " +
                "key via GRAFT_TABLE_KEYS")
            graft.sinks.ProjectionDef(table.trim, keys, idx.trim, numBuckets)
          case _ => throw new IllegalArgumentException(
            s"GRAFT_PROJECTIONS entry '$spec' is not schema.table:indexKey")
        }
      }

  final case class Wiring(query: StreamingQuery,
                          metrics: Option[MetricsServer],
                          listener: CdcMetricsListener,
                          capture: Option[graft.sources.pgwire.ReplicationClient] = None,
                          captureThread: Option[Thread] = None)

  /** Validate config, wire source→filter→sink, start metrics.
    *
    * When GRAFT_PG_HOST is set (or `captureTransport` is injected for
    * tests), a live-capture thread runs the replication client against
    * the upstream walsender, writing `.pgo` segments into GRAFT_WAL_DIR
    * while the Spark pipeline consumes them — the full socket→segment→
    * source→destination chain in one process. Without it, segments are
    * produced externally (the reference's own capture split). */
  def build(spark: SparkSession, cfg: GraftConfig, env: Map[String, String],
            trigger: Trigger = Trigger.ProcessingTime(0),
            captureTransport: Option[() => graft.sources.pgwire.PgWire.WireTransport] = None): Wiring = {
    cfg.validate() match {
      case Left(err) => throw new IllegalArgumentException(s"invalid config: $err")
      case Right(_) => ()
    }
    // the maintenance verbs rewrite the same dirs the streaming sinks
    // write — one process must never do both
    require(!env.contains("GRAFT_MAINTENANCE"),
      "GRAFT_MAINTENANCE is offline-only: run it in its own process, " +
        "with no streaming pipeline (use GraftApp.maintenance)")
    val ckpt = env.getOrElse("GRAFT_CHECKPOINT",
      throw new IllegalArgumentException("GRAFT_CHECKPOINT is required"))

    // curation-intake mode: a training-data pipeline instead of the CDC
    // chain — document parquet in, curated store out (StreamingCurate)
    env.get("GRAFT_CURATE_DIR") match {
      case Some(docsDir) =>
        val store = env.getOrElse("GRAFT_CURATE_STORE",
          throw new IllegalArgumentException(
            "GRAFT_CURATE_STORE is required with GRAFT_CURATE_DIR"))
        val listener = new CdcMetricsListener
        spark.streams.addListener(listener)
        val metricsPort =
          env.get("GRAFT_METRICS_PORT").map(_.toInt).getOrElse(8080)
        val metrics =
          if (metricsPort < 0) None
          // curate mode also exposes the per-trigger funnel counters
          // and the publish-lease protocol counters (leases acquired/
          // contended/broken, heartbeat displacements, fence aborts) —
          // the signal an operator running nightly releases watches to
          // notice publisher contention
          else Some(new MetricsServer(listener, metricsPort,
            () => graft.llmops.StreamingCurate.metricsSnapshot() ++
              graft.llmops.VersionedDir.metricsSnapshot() ++
              graft.llmops.IndexMetrics.metricsSnapshot()).start())
        listener.setDestinationConnected("curate-store", connected = true)
        val docs = spark.readStream
          .schema("doc_id LONG, source STRING, text STRING")
          .parquet(docsDir)
        Wiring(
          graft.llmops.StreamingCurate.start(docs, store, ckpt, trigger,
            blockRewrite = env.get("GRAFT_CURATE_BLOCKS").exists(_.toBoolean),
            decontamDir = env.get("GRAFT_CURATE_DECONTAM"),
            sketchDir = env.get("GRAFT_CURATE_SKETCH"),
            modelDir = env.get("GRAFT_CURATE_MODEL")),
          metrics, listener)
      case None => buildCdc(spark, cfg, env, trigger, captureTransport, ckpt)
    }
  }

  /** The CDC chains (JDBC / warehouse), factored from [[build]]. */
  private def buildCdc(spark: SparkSession, cfg: GraftConfig,
                       env: Map[String, String], trigger: Trigger,
                       captureTransport: Option[() => graft.sources.pgwire.PgWire.WireTransport],
                       ckpt: String): Wiring = {
    val walDir = env.getOrElse("GRAFT_WAL_DIR",
      throw new IllegalArgumentException("GRAFT_WAL_DIR is required"))
    val warehouseDir = env.get("GRAFT_WAREHOUSE_DIR")
    val destUrl = env.get("GRAFT_DEST_URL")
    val kafkaBrokers = env.get("GRAFT_KAFKA_BROKERS")
    if (warehouseDir.isEmpty && destUrl.isEmpty && kafkaBrokers.isEmpty)
      throw new IllegalArgumentException(
        "GRAFT_DEST_URL is required (or GRAFT_WAREHOUSE_DIR for warehouse " +
          "mode, or GRAFT_KAFKA_BROKERS for kafka mode)")
    val dialect = Dialect.forName(env.getOrElse("GRAFT_DIALECT", "ansi"))

    // live capture (optional): replication client → .pgo segments.
    // Started BEFORE the query so the first trigger can already see WAL.
    val transportFactory: Option[() => graft.sources.pgwire.PgWire.WireTransport] =
      captureTransport.orElse(env.get("GRAFT_PG_HOST").map { host => () =>
        val t = graft.sources.pgwire.PgWire.socketTransport(
          host, env.get("GRAFT_PG_PORT").map(_.toInt).getOrElse(5432))
        connectTransport(t, env)
      })
    val capture = transportFactory.map { mk =>
      val startLsn = graft.model.Lsn(
        graft.sources.cdcwal.WalSegmentIO.readFeedback(walDir).getOrElse(0L))
      (new graft.sources.pgwire.ReplicationClient(mk(), cfg, walDir), startLsn)
    }
    val captureThread = capture.map { case (client, startLsn) =>
      val th = new Thread(() => client.run(startLsn), "graft-capture")
      th.setDaemon(true)
      th.start()
      th
    }

    val listener = new CdcMetricsListener
    spark.streams.addListener(listener)
    val metricsPort = env.get("GRAFT_METRICS_PORT").map(_.toInt).getOrElse(8080)
    val metrics =
      if (metricsPort < 0) None
      else Some(new MetricsServer(listener, metricsPort).start())

    val reader = spark.readStream
      .format("graft.sources.cdcwal.CdcWalSource")
      .option("path", walDir)
    env.get("CDC_MAX_EVENTS_PER_TRIGGER")
      .foreach(n => reader.option("maxEventsPerTrigger", n))
    val envelope = reader.load()

    val query = warehouseDir match {
      case Some(root) =>
        // warehouse mode: per-table hash-bucketed parquet replicas (the
        // 100 TB path); spill form bounds executor memory for huge txs
        listener.setDestinationConnected("warehouse", connected = true)
        val buckets = env.get("GRAFT_WAREHOUSE_BUCKETS").map(_.toInt).getOrElse(64)
        val projections = parseProjections(env, buckets)
        val aggViews = parseAggViews(env)
        if (env.get("GRAFT_WAREHOUSE_SPILL").exists(_.toBoolean))
          TxnSpill.startWarehouseSpill(envelope, root, ckpt, buckets,
            trigger, cfg.originFilter, projections)
        else CdcPipeline.startWarehouse(envelope, root, ckpt, buckets,
          trigger, cfg.originFilter, projections, aggViews,
          parseJoinViews(env), parseHistoryTables(env).map(_._1),
          parseStarViews(env), parseWarehouseBlooms(env))
      case None if kafkaBrokers.isDefined =>
        // kafka mode: assembled transactions → Debezium envelope rows →
        // the built-in kafka sink (at-least-once, the reference's own
        // model — the delivery barrier/retry contract the transport must
        // honor is documented+tested in sinks/KafkaDelivery). Assembly
        // before publish for the same reason as JDBC: StreamAborted v2
        // transactions must never reach a topic.
        listener.setDestinationConnected("kafka", connected = true)
        val prefix = env.getOrElse("GRAFT_KAFKA_TOPIC_PREFIX", "cdc")
        val format = env.getOrElse("GRAFT_KAFKA_FORMAT", "kafka")
        CdcPipeline.startAssembled(envelope, cfg.originFilter,
          s"graft-kafka-${cfg.slotName}", ckpt, trigger) { (batch, _) =>
          val rows = CdcPipeline.debeziumRows(batch.toDF(), prefix)
          val writer = rows.write.format(format)
            .option("kafka.bootstrap.servers", kafkaBrokers.get)
          // GRAFT_KAFKA_FORMAT is a test seam (no broker/connector in the
          // sandbox): parquet+GRAFT_KAFKA_PATH captures the exact rows the
          // kafka sink would publish
          env.get("GRAFT_KAFKA_PATH") match {
            case Some(p) => writer.mode("append").save(p)
            case None => writer.save()
          }
        }
      case None =>
        val ctx = RenderContext(dialect, cfg.schemaMappings)
        val applier = new graft.sinks.JdbcApplier(destUrl.get, ctx, cfg.slotName,
          graft.coalesce.CoalesceConfig(
            maxRowsPerInsert = cfg.maxRowsPerInsert,
            bulkInsertThreshold = cfg.bulkInsertThreshold),
          cfg.batchSize)
        applier.init() // throws on unreachable destination → gauge stays absent
        listener.setDestinationConnected(dialect.name, connected = true)
        // Transaction assembly before apply (same scaffold as startJdbc /
        // startWarehouse): protocol-v2 streamed DML whose transaction later
        // StreamAborts must never reach the destination.
        CdcPipeline.startAssembled(envelope, cfg.originFilter,
          s"graft-app-${cfg.slotName}", ckpt, trigger) { (batch, batchId) =>
          applier.applyBatch(batch, batchId)
        }
    }
    Wiring(query, metrics, listener, capture.map(_._1), captureThread)
  }

  /** Open the wire session on a fresh transport: StartupMessage FIRST
    * (the server waits for it before saying anything — handshaking
    * without it deadlocks both sides), then the authentication
    * conversation. Factored so tests can drive the exact production
    * byte order through a scripted transport. */
  def connectTransport(t: graft.sources.pgwire.PgWire.WireTransport,
                       env: Map[String, String]): graft.sources.pgwire.PgWire.WireTransport = {
    val user = env.getOrElse("GRAFT_PG_USER", "postgres")
    t.send(graft.sources.pgwire.PgWire.startup(
      user, env.getOrElse("GRAFT_PG_DATABASE", "postgres")))
    graft.sources.pgwire.PgWire.handshake(t, user, env.get("GRAFT_PG_PASSWORD"))
    t
  }

  /** Serving-side BM25 stopword df-cap (permille of corpus docs) —
    * default 600: a query term in >60% of documents contributes ~zero
    * idf but a corpus-sized posting read, so the text-index/
    * hybrid-search verbs skip it unless GRAFT_TEXT_DFCAP_PERMILLE
    * overrides (1000 = off, the raw-library default). */
  private def dfCapPermille(env: Map[String, String]): Long =
    env.get("GRAFT_TEXT_DFCAP_PERMILLE").map(_.toLong).getOrElse(600L)

  /** The tiered-fold bound for a synced text index — the shared knob
    * pattern of the release verb and the standalone sync verb:
    * GRAFT_TEXT_FOLD_BATCHES=N forces the bound, =0 opts out, UNSET
    * auto-folds once the serve plan's batch-dir count exceeds
    * GRAFT_TEXT_FOLD_AUTO_MAX (default
    * [[graft.llmops.TextIndexStore.DefaultFoldBatches]]) — default-on
    * with opt-out, like the tombstone auto-purge. `batchCount` is only
    * evaluated on the auto path (one directory listing). */
  private def textFoldBound(env: Map[String, String],
                            batchCount: => Int): Option[Int] =
    env.get("GRAFT_TEXT_FOLD_BATCHES").map(_.toInt) match {
      case Some(0) => None // explicit opt-out
      case Some(n) => Some(n)
      case None =>
        val cap = env.get("GRAFT_TEXT_FOLD_AUTO_MAX").map(_.toInt)
          .getOrElse(graft.llmops.TextIndexStore.DefaultFoldBatches)
        if (batchCount > cap) Some(cap) else None
    }

  /** OFFLINE maintenance: run the env-selected verbs (class doc lists
    * them) and return one human-readable summary line per action taken.
    * Every verb already carries its own crash-safety (committed-staging
    * swaps, roll-forward heals), so an interrupted maintenance run is
    * re-runnable as-is. */
  def maintenance(spark: SparkSession, env: Map[String, String]): Seq[String] = {
    import org.apache.hadoop.fs.Path
    val verbs = env.getOrElse("GRAFT_MAINTENANCE", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(verbs.nonEmpty, "GRAFT_MAINTENANCE must list at least one verb")
    def whRoot = env.getOrElse("GRAFT_WAREHOUSE_DIR",
      throw new IllegalArgumentException(
        "GRAFT_WAREHOUSE_DIR is required for warehouse maintenance"))
    val buckets = env.get("GRAFT_WAREHOUSE_BUCKETS").map(_.toInt).getOrElse(64)
    def keysFor(table: String): Seq[String] = tableKeys(env, table)
    def zorderFor(table: String): Seq[String] =
      env.get("GRAFT_ZORDER").toSeq
        .flatMap(_.split(";")).map(_.split("=", 2)).collectFirst {
          case Array(t, cs) if t.trim == table => cs.split(",").map(_.trim).toSeq
        }.getOrElse(Seq.empty)
    def fsOf(p: Path) = p.getFileSystem(spark.sessionState.newHadoopConf())
    def tableDirs(root: String): Seq[String] = {
      val r = new Path(root); val fs = fsOf(r)
      if (!fs.exists(r)) Seq.empty
      else fs.listStatus(r).toSeq
        .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
        .map(_.getPath.getName).sorted
    }

    verbs.toSeq.flatMap {
      case "compact" =>
        val maxFiles = env.get("GRAFT_COMPACT_MAX_FILES").map(_.toInt).getOrElse(4)
        val tables = tableDirs(whRoot).map { t =>
          val done = new graft.sinks.ParquetReplicaSink(
            s"$whRoot/$t", keysFor(t), buckets)
            .compact(spark, maxFiles, zorderFor(t))
          s"compact $t: ${done.size} buckets"
        }
        // declared projections live under _proj/<table>/<indexKey>; the
        // path encodes everything their compaction needs
        val projRoot = new Path(whRoot, "_proj")
        val projections = for {
          t <- { val fs = fsOf(projRoot)
            if (!fs.exists(projRoot)) Seq.empty
            else fs.listStatus(projRoot).toSeq.filter(_.isDirectory) }
          idx <- fsOf(projRoot).listStatus(t.getPath).toSeq.filter(_.isDirectory)
        } yield {
          val done = new graft.sinks.ProjectionSink(
            idx.getPath.toString, Nil, idx.getPath.getName)
            .compact(spark, maxFiles)
          s"compact projection ${t.getPath.getName}/${idx.getPath.getName}: " +
            s"${done.size} buckets"
        }
        tables ++ projections
      case "schema-log" =>
        // schema-drift audit: every sidecar widening each replica ever
        // recorded — batch, max LSN, added columns, resulting schema
        tableDirs(whRoot).flatMap { t =>
          val log = new graft.sinks.ParquetReplicaSink(
            s"$whRoot/$t", keysFor(t), buckets).schemaLog(spark)
          if (log.isEmpty) Seq(s"schema-log $t: no recorded changes")
          else log.map { case (b, l, a, cs) =>
            s"schema-log $t: batch $b lsn $l added ${a.mkString(",")} " +
              s"-> ${cs.mkString(",")}"
          }
        }
      case "retain" =>
        val table = env.getOrElse("GRAFT_RETAIN_TABLE",
          throw new IllegalArgumentException("GRAFT_RETAIN_TABLE is required"))
        val pred = env.getOrElse("GRAFT_RETAIN_PREDICATE",
          throw new IllegalArgumentException("GRAFT_RETAIN_PREDICATE is required"))
        val done = new graft.sinks.ParquetReplicaSink(
          s"$whRoot/$table", keysFor(table), buckets)
          .retain(spark, org.apache.spark.sql.functions.expr(pred))
        Seq(s"retain $table [$pred]: ${done.size} buckets rewritten")
      case "rebucket" =>
        val table = env.getOrElse("GRAFT_REBUCKET_TABLE",
          throw new IllegalArgumentException("GRAFT_REBUCKET_TABLE is required"))
        val to = env.getOrElse("GRAFT_REBUCKET_TO",
          throw new IllegalArgumentException("GRAFT_REBUCKET_TO is required")).toInt
        val keys = keysFor(table)
        require(keys.nonEmpty,
          s"rebucket needs $table's key columns via GRAFT_TABLE_KEYS")
        new graft.sinks.ParquetReplicaSink(s"$whRoot/$table", keys, buckets)
          .rebucket(spark, to)
        Seq(s"rebucket $table: -> $to buckets")
      case "stats" =>
        // ANALYZE wave: per-table row counts + per-column NDV/null
        // stats (one scan each, persisted as _graft_stats.json), plus
        // the skip-index inventory (buckets, zone/bloom sidecars) —
        // the numbers broadcast and bloom-declaration decisions read
        tableDirs(whRoot).map { t =>
          val sink = new graft.sinks.ParquetReplicaSink(
            s"$whRoot/$t", keysFor(t), buckets)
          val (rows, cols) = sink.tableStats(spark)
          val fs = fsOf(new Path(s"$whRoot/$t"))
          val nBuckets = fs.listStatus(new Path(s"$whRoot/$t")).count(s =>
            s.isDirectory && s.getPath.getName.startsWith("bucket="))
          val zones = fs.exists(new Path(s"$whRoot/$t/_graft_zones.json"))
          val blooms = fs.exists(new Path(s"$whRoot/$t/_graft_blooms.json"))
          val colStr = cols.map { case (c, ndv, nulls) =>
            s"$c=$ndv" + (if (nulls > 0) s"/${nulls}null" else "")
          }.mkString(", ")
          s"stats $t: $rows rows, $nBuckets buckets, " +
            s"zones=$zones blooms=$blooms; ndv $colStr"
        }
      case "text-index" =>
        // durable BM25 inverted index: build/append a batch of docs,
        // optionally fold batch dirs, optionally serve a probe query —
        // the lexical sibling of the ann-index/ann-sweep verbs
        val docsDir = env.getOrElse("GRAFT_TEXT_DOCS",
          throw new IllegalArgumentException("GRAFT_TEXT_DOCS is required"))
        val outDir = env.getOrElse("GRAFT_TEXT_OUT",
          throw new IllegalArgumentException("GRAFT_TEXT_OUT is required"))
        val tParts = env.get("GRAFT_TEXT_PARTS").map(_.toInt).getOrElse(64)
        val tBatch = env.get("GRAFT_TEXT_BATCH").map(_.toLong).getOrElse(0L)
        // GRAFT_TEXT_POSITIONS=0: position-free postings (BM25-only
        // serving at roughly half the index bytes; phrase search off)
        val tStore = new graft.llmops.TextIndexStore(outDir, tParts,
          storePositions = !env.get("GRAFT_TEXT_POSITIONS").contains("0"))
        tStore.addBatch(spark, graft.llmops.SegPool.readDocs(spark, docsDir),
          tBatch)
        if (env.get("GRAFT_TEXT_COMPACT").exists(_ == "1")) tStore.compact(spark)
        val (tn, tt) = tStore.stats(spark)
        val qLine = env.get("GRAFT_TEXT_QUERY").map { words =>
          import spark.implicits._
          val q = words.split("\\s+").toSeq.map(("q", _)).toDF("qid", "term")
          val hits = tStore.search(spark, q, k = 5,
              maxDfPermille = dfCapPermille(env)).collect()
            .map(r => s"${r.getLong(2)}:${r.getLong(3)}")
          s"text-index query [$words]: ${hits.mkString(" ")} " +
            s"(${tStore.lastPlannedDirs.size} part dirs planned)"
        }
        Seq(s"text-index: batch $tBatch -> $outDir " +
          s"($tn docs, $tt tokens, $tParts parts)") ++ qLine.toSeq
      case "text-index-sync" =>
        // bring a release root's BM25 index up to the corpus' CURRENT
        // version (manifest-diff incremental; rebuild fallback) — the
        // standalone form of GRAFT_RELEASE_TEXT_INDEX=1, for ops that
        // run search maintenance on its own schedule
        val sOut = env.getOrElse("GRAFT_RELEASE_OUT",
          throw new IllegalArgumentException("GRAFT_RELEASE_OUT is required"))
        val sParts = env.get("GRAFT_TEXT_PARTS").map(_.toInt).getOrElse(64)
        // under the root's publish lease: a release's own in-lease sync
        // (or another standalone sync) must never interleave appends
        // into the same index — the loser fails fast and retryable
        // (LeaseHeldException), exactly like a concurrent release
        val r = graft.llmops.VersionedDir.withLeaseFenced(spark,
          s"$sOut/docs", env.get("GRAFT_RELEASE_LEASE_MS").map(_.toLong)
            .getOrElse(graft.llmops.VersionedDir.DefaultLeaseTtlMs)) { _ =>
          val rep = graft.llmops.CorpusIndexSync.sync(
            spark, s"$sOut/docs", s"$sOut/_text_index", sParts,
            storePositions = !env.get("GRAFT_TEXT_POSITIONS").contains("0"))
          if (env.get("GRAFT_TEXT_COMPACT").contains("1"))
            new graft.llmops.TextIndexStore(s"$sOut/_text_index", sParts)
              .compact(spark)
          else if (env.get("GRAFT_TEXT_PURGE").contains("1"))
            // selective: only the batches holding dead docs rewrite
            new graft.llmops.TextIndexStore(s"$sOut/_text_index", sParts)
              .purge(spark)
          val foldStore =
            new graft.llmops.TextIndexStore(s"$sOut/_text_index", sParts)
          textFoldBound(env, foldStore.batchCount(spark))
            .foreach(n => foldStore.fold(spark, n))
          rep
        }
        // the standalone ops path points the live pressure gauge at
        // this index too (the release verb does the same)
        graft.llmops.IndexMetrics.gauge("graft_index_tombstones_text") {
          new graft.llmops.TextIndexStore(s"$sOut/_text_index", sParts)
            .tombstoneCount(spark).toDouble
        }
        Seq(s"text-index sync: ${r.mode} v${r.from.getOrElse(-1L)}->" +
          s"v${r.to} +${r.added} -${r.removed} " +
          s"(${r.segsSkipped} segs untouched)")
      case "ann-index-sync" =>
        // bring a release root's vector index up to the corpus' CURRENT
        // version (manifest-diff incremental over the carried embedding
        // column; staged-rebuild fallback) — the standalone form of
        // GRAFT_RELEASE_ANN_INDEX=1
        val aOut = env.getOrElse("GRAFT_RELEASE_OUT",
          throw new IllegalArgumentException("GRAFT_RELEASE_OUT is required"))
        // under the root's publish lease, as text-index-sync: concurrent
        // appenders into one vector index must serialize
        val (r, annDriftLine) = graft.llmops.VersionedDir.withLeaseFenced(
          spark, s"$aOut/docs",
          env.get("GRAFT_RELEASE_LEASE_MS").map(_.toLong)
            .getOrElse(graft.llmops.VersionedDir.DefaultLeaseTtlMs)) { _ =>
          val rep = graft.llmops.CorpusIndexSync.syncAnn(
            spark, s"$aOut/docs", s"$aOut/_ann_index",
            embedCol = env.getOrElse("GRAFT_ANN_EMBED_COL", "embedding"),
            kind = env.getOrElse("GRAFT_ANN_SYNC_KIND", "lsh"),
            nClusters = env.get("GRAFT_ANN_SYNC_CLUSTERS").map(_.toInt)
              .getOrElse(graft.llmops.Similarity.DefaultIvfClusters))
          if (env.get("GRAFT_ANN_COMPACT").contains("1"))
            new graft.llmops.AnnIndexStore(s"$aOut/_ann_index").compact(spark)
          else if (env.get("GRAFT_ANN_PURGE").contains("1"))
            // selective: only the dirs holding dead rows rewrite
            new graft.llmops.AnnIndexStore(s"$aOut/_ann_index").purge(spark)
          // drift-gated IVF rebuild, same knob as the ann-index verb: an
          // lsh-kind store never records drift, so the check is a no-op
          val drift = env.get("GRAFT_ANN_REBUILD_IF_DRIFT")
            .map(_.toDouble).map { ratio =>
              val st = new graft.llmops.AnnIndexStore(s"$aOut/_ann_index")
              if (st.driftExceeds(spark, ratio)) {
                st.rebuildIvf(spark)
                s"ann-index sync: rebuilt ivf (drift exceeded x$ratio)"
              } else s"ann-index sync: drift within x$ratio - no rebuild"
            }
          (rep, drift)
        }
        // live pressure gauge for the standalone ops path, as on the
        // text side
        graft.llmops.IndexMetrics.gauge("graft_index_tombstones_ann") {
          new graft.llmops.AnnIndexStore(s"$aOut/_ann_index")
            .tombstoneCount(spark).toDouble
        }
        Seq(s"ann-index sync: ${r.mode} v${r.from.getOrElse(-1L)}->" +
          s"v${r.to} +${r.added} -${r.removed} " +
          s"(${r.segsSkipped} segs untouched)") ++ annDriftLine.toSeq
      case "hybrid-search" =>
        // persisted hybrid retrieval: the durable BM25 text index and
        // the persisted ANN vector index serve the SAME probe doc
        // (lexical query = its first 6 tokens, semantic query = its
        // stored embedding), fused by reciprocal rank Σ 1/(60+rank)
        // in integer micro units — the llm_hybrid_rrf chain over the
        // part-pruned/cluster-pruned serving tiers
        // release-rooted mode: with GRAFT_RELEASE_OUT set, serve from
        // the root's SYNCED indexes over its CURRENT frozen version —
        // version-consistent hybrid retrieval (explicit env still wins)
        val hRel = env.get("GRAFT_RELEASE_OUT")
        def hOr(key: String, rel: String => String): String =
          env.get(key).orElse(hRel.map(rel)).getOrElse(
            throw new IllegalArgumentException(
              s"$key (or GRAFT_RELEASE_OUT) is required"))
        val hText = hOr("GRAFT_TEXT_OUT", o => s"$o/_text_index")
        val hAnn = hOr("GRAFT_ANN_DIR", o => s"$o/_ann_index")
        val hDocs = hOr("GRAFT_HYBRID_DOCS", o =>
          graft.llmops.VersionedDir.currentPath(spark, s"$o/docs")
            .getOrElse(throw new IllegalArgumentException(
              s"no published docs version under $o/docs")))
        val hProbe = env.getOrElse("GRAFT_HYBRID_PROBE",
          throw new IllegalArgumentException(
            "GRAFT_HYBRID_PROBE (a doc id present in both indexes) " +
              "is required")).toLong
        val hK = env.get("GRAFT_HYBRID_K").map(_.toInt).getOrElse(5)
        val hParts = env.get("GRAFT_TEXT_PARTS").map(_.toInt).getOrElse(64)
        val hStore = new graft.llmops.TextIndexStore(hText, hParts)
        val hIdx = new graft.llmops.AnnIndexStore(hAnn)
        import spark.implicits._
        // query terms via TextOps.tokens — the SAME tokenization the
        // index and hybrid-sweep use (a \s+ split would derive a
        // different term set on irregularly-spaced text, silently
        // breaking the sweep≡single-probe parity and missing index
        // tokens entirely)
        val hQ = graft.llmops.SegPool.readDocs(spark, hDocs)
          .filter(col("doc_id") === hProbe)
          .select(lit(hProbe).as("qid"),
            explode(slice(graft.llmops.TextOps.tokens(col("text")), 1, 6))
              .as("term"))
        val hLex = hStore.search(spark, hQ, k = 20,
            maxDfPermille = dfCapPermille(env))
          .select(col("doc_id"), col("rank").as("lex_rank"))
        val hSem = hIdx.sweepDistributed(Seq(hProbe).toDF("vec_id"), k = 20)
          .select(col("vec_id").as("doc_id"), col("rank").as("sem_rank"))
        val hTop = hLex.join(hSem, Seq("doc_id"), "full_outer")
          .withColumn("rrf_micro",
            expr("CAST(coalesce(1000000 div (60 + lex_rank), 0) " +
              "+ coalesce(1000000 div (60 + sem_rank), 0) AS BIGINT)"))
          .orderBy(desc("rrf_micro"), col("doc_id")).limit(hK)
          .collect()
          .map(r => s"${r.getAs[Long]("doc_id")}:${r.getAs[Long]("rrf_micro")}")
        Seq(s"hybrid-search probe $hProbe: top-$hK ${hTop.mkString(" ")} " +
          s"(text index planned ${hStore.lastPlannedDirs.size} part dirs)") ++
          hRel.toSeq.map { _ =>
            val tv = graft.llmops.CorpusIndexSync.syncedVersion(spark, hText)
            val av = graft.llmops.CorpusIndexSync.syncedVersion(spark, hAnn)
            s"hybrid-search synced versions: text=" +
              s"${tv.map(v => s"v$v").getOrElse("unsynced")} ann=" +
              s"${av.map(v => s"v$v").getOrElse("unsynced")}"
          }
      case "hybrid-sweep" =>
        // CORPUS-SIZED hybrid retrieval: every probe doc queries BOTH
        // persisted serving tiers in one distributed plan each —
        // TextIndexStore.searchDistributed (lexical: the doc's first 6
        // tokens, derived on the cluster) + AnnIndexStore
        // .sweepDistributed (semantic: its stored vector) — fused by
        // the same RRF arithmetic as hybrid-search, per-probe window
        // top-k, written to parquet. No probe, term or candidate data
        // touches the driver: the RAG-eval / contamination-audit shape
        // at corpus scale (probes = a parquet of ids, or "self" =
        // every live vector).
        val wRel = env.get("GRAFT_RELEASE_OUT")
        def wOr(key: String, rel: String => String): String =
          env.get(key).orElse(wRel.map(rel)).getOrElse(
            throw new IllegalArgumentException(
              s"$key (or GRAFT_RELEASE_OUT) is required"))
        val wText = wOr("GRAFT_TEXT_OUT", o => s"$o/_text_index")
        val wAnn = wOr("GRAFT_ANN_DIR", o => s"$o/_ann_index")
        val wDocs = wOr("GRAFT_HYBRID_DOCS", o =>
          graft.llmops.VersionedDir.currentPath(spark, s"$o/docs")
            .getOrElse(throw new IllegalArgumentException(
              s"no published docs version under $o/docs")))
        val wOut = env.getOrElse("GRAFT_HYBRID_OUT",
          throw new IllegalArgumentException("GRAFT_HYBRID_OUT is required"))
        val wK = env.get("GRAFT_HYBRID_K").map(_.toInt).getOrElse(5)
        val wStore = new graft.llmops.TextIndexStore(wText,
          env.get("GRAFT_TEXT_PARTS").map(_.toInt).getOrElse(64))
        val wIdx = new graft.llmops.AnnIndexStore(wAnn)
        val wProbes = env.get("GRAFT_HYBRID_PROBES") match {
          case None | Some("self") => wIdx.liveIds(spark)
          case Some(p) =>
            val df = spark.read.parquet(p)
            df.select(col(df.columns.head).cast("long").as("vec_id"))
        }
        val wQueries = graft.llmops.SegPool.readDocs(spark, wDocs)
          .select(col("doc_id").cast("long").as("vec_id"), col("text"))
          .join(wProbes, "vec_id")
          .select(col("vec_id").as("qid"),
            explode(slice(graft.llmops.TextOps.tokens(col("text")), 1, 6))
              .as("term"))
        val wLex = wStore.searchDistributed(wQueries, k = 20,
            maxDfPermille = dfCapPermille(env))
          .select(col("qid"), col("doc_id"),
            col("rank").cast("long").as("lex_rank"))
        val wSem = wIdx.sweepDistributed(wProbes, k = 20)
          .select(col("pid").as("qid"), col("vec_id").as("doc_id"),
            col("rank").as("sem_rank"))
        val wWin = org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(desc("rrf_micro"), col("doc_id"))
        wLex.join(wSem, Seq("qid", "doc_id"), "full_outer")
          .withColumn("rrf_micro",
            expr("CAST(coalesce(1000000 div (60 + lex_rank), 0) " +
              "+ coalesce(1000000 div (60 + sem_rank), 0) AS BIGINT)"))
          .withColumn("rank",
            org.apache.spark.sql.functions.row_number().over(wWin))
          .filter(col("rank") <= wK)
          .select("qid", "rank", "doc_id", "rrf_micro", "lex_rank", "sem_rank")
          .write.mode("overwrite").parquet(wOut)
        val wN = spark.read.parquet(wOut)
          .select(countDistinct(col("qid"))).first().getLong(0)
        Seq(s"hybrid-sweep: $wN probes fused top-$wK -> $wOut")
      case "bloom-build" =>
        // declare + exactly (re)build per-bucket bloom skip indexes:
        // the equality companion of the zone maps for point predicates
        // on layout-uncorrelated columns. Re-running the verb is also
        // the staleness reset after heavy update/delete churn.
        val specs = env.getOrElse("GRAFT_BLOOM_TABLES",
          throw new IllegalArgumentException(
            "GRAFT_BLOOM_TABLES is required (table:col1+col2,...)"))
        val m = env.get("GRAFT_BLOOM_BITS").map(_.toInt).getOrElse(4096)
        val k = env.get("GRAFT_BLOOM_HASHES").map(_.toInt).getOrElse(3)
        specs.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { sp =>
          val Array(t, cs) = sp.split(":", 2)
          val cols = cs.split("\\+").map(_.trim).filter(_.nonEmpty).toSeq
          new graft.sinks.ParquetReplicaSink(
            s"$whRoot/$t", keysFor(t), buckets)
            .buildBlooms(spark, cols, m, k)
          s"bloom-build $t: ${cols.mkString("+")} m=$m k=$k"
        }
      case "spill" =>
        val spillDir = s"$whRoot/_txspill"
        val maxFiles = env.get("GRAFT_SPILL_MAX_FILES").map(_.toInt).getOrElse(16)
        val folded = TxnSpill.compactPending(spark, spillDir, maxFiles)
        val reaped = env.get("GRAFT_SPILL_WATERMARK").map(_.toLong)
          .map(TxnSpill.reapAbandoned(spark, spillDir, _)).getOrElse(Seq.empty)
        Seq(s"spill: folded ${folded.size} txids, reaped ${reaped.size}")
      case "curate-store" =>
        val store = env.getOrElse("GRAFT_CURATE_STORE",
          throw new IllegalArgumentException("GRAFT_CURATE_STORE is required"))
        // a release root's store (`<out>/_curate` beside `<out>/docs`):
        // batch ids at or above currentVersion*65536 belong to the
        // NEXT release — possibly a crashed attempt's replayable
        // leftovers that its retry will reclaim. The fold must not
        // merge them under a committed-looking name (the retry's range
        // sweep would then delete committed history with the orphan).
        val docsRoot = s"${new Path(store).getParent}/docs"
        val excludeFrom = graft.llmops.VersionedDir
          .current(spark, docsRoot)
          .map(_ * 65536L).getOrElse(Long.MaxValue)
        val folded = graft.llmops.StreamingCurate
          .compactStore(spark, store, excludeFrom)
        Seq(s"curate-store: folded " +
          folded.toSeq.sortBy(_._1).map { case (k, n) => s"$k=$n" }.mkString(","))
      case "doc-fate" =>
        // "why is doc X (not) in the corpus" — a diagnostic probe over
        // a curation store, plus the release ledgers / frozen-corpus
        // membership when the store belongs to a `release` root.
        // Store probes use the intake's own part-pruned planning
        // (O(probe)); the membership checks are ids-only column scans.
        // With GRAFT_FATE_DOCS (the raw corpus) the report names the
        // dropping stage and the displacing doc exactly.
        val ids = env.getOrElse("GRAFT_DOC_IDS",
          throw new IllegalArgumentException("GRAFT_DOC_IDS is required"))
          .split(",").map(_.trim.toLong).toSeq
        val relOut = env.get("GRAFT_RELEASE_OUT")
        val store = env.get("GRAFT_CURATE_STORE")
          .orElse(relOut.map(o => s"$o/_curate"))
          .getOrElse(throw new IllegalArgumentException(
            "GRAFT_CURATE_STORE or GRAFT_RELEASE_OUT is required"))
        val raw = env.get("GRAFT_FATE_DOCS")
          .map(d => graft.llmops.SegPool.readDocs(spark, d))
        val fate = graft.llmops.StreamingCurate.explainDocs(spark, store,
            ids, raw,
            jaccard = env.get("GRAFT_RELEASE_JACCARD").map(_.toDouble)
              .getOrElse(0.8),
            decontamDir = env.get("GRAFT_RELEASE_BLOOM"),
            decontamMinShared = env.get("GRAFT_RELEASE_MINSHARED")
              .map(_.toInt).getOrElse(3),
            modelDir = env.get("GRAFT_RELEASE_MODEL"))
          .collect().map(r => r.getLong(0) -> r).toMap
        val fateFs = new Path(store)
          .getFileSystem(spark.sessionState.newHadoopConf())
        def ledgerSide(kind: String): Map[Long, Long] = {
          val dir = new Path(store, kind)
          graft.llmops.BatchDirFold.heal(spark, dir)
          if (!fateFs.exists(dir)) Map.empty
          else {
            val dirs = fateFs.listStatus(dir).toSeq
              .filter(s => s.isDirectory && s.getPath.getName.startsWith("b"))
              .map(s => (s.getPath.getName.stripPrefix("b").toLong,
                s.getPath.toString))
            if (dirs.isEmpty) Map.empty
            else dirs.map { case (b, d) =>
              spark.read.schema("doc_id LONG, b LONG").parquet(d)
                .select(col("doc_id"),
                  org.apache.spark.sql.functions.coalesce(col("b"), lit(b))
                    .as("b"))
            }.reduce(_ unionByName _)
              .filter(col("doc_id").isin(ids: _*))
              .groupBy("doc_id").agg(max("b").as("b"))
              .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          }
        }
        val pLed = ledgerSide("processed")
        val rLed = ledgerSide("retracted")
        val segOf: Map[Long, String] = relOut.flatMap { o =>
          graft.llmops.VersionedDir.currentPath(spark, s"$o/docs").map { vd =>
            graft.llmops.SegPool.readDocs(spark, vd)
              // cast: a legacy (pre-manifest) root's seg partition
              // column type-infers as INT
              .select(col("doc_id"), col("seg").cast("string").as("seg"))
              .filter(col("doc_id").isin(ids: _*))
              .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
          }
        }.getOrElse(Map.empty)
        // per-version membership across the RETAINED history — "doc X
        // was in v5-v7, retracted in release 8". Versions mostly SHARE
        // pool dirs (manifest indirection), so each distinct pool dir
        // is probed ONCE (ids-filtered, doc_id-only, tagged with its
        // dir as a literal and unioned into ONE Spark job — hundreds of
        // sub-seg dirs over several retained versions must not become
        // hundreds of sequential jobs) and membership is a driver-side
        // fold of manifest lines over the probe hits: O(distinct pool
        // dirs) bytes ≈ O(current + rebuilt deltas), never
        // #versions × corpus. A legacy (pre-manifest) version probes
        // its own dir as one unit. The probe takes no lease, so a
        // CONCURRENT release's retention pruning/GC can delete a listed
        // dir mid-probe — one re-list-and-retry absorbs that; the
        // diagnostic must not block (or be blocked by) the nightly
        // publish.
        val versionsOf: Map[Long, Seq[Long]] = relOut.map { o =>
          val docsRoot = s"$o/docs"
          val docsFs = new Path(docsRoot)
            .getFileSystem(spark.sessionState.newHadoopConf())
          def probe(): Map[Long, Seq[Long]] = {
            val vs = graft.llmops.VersionedDir.versions(spark, docsRoot)
            val relToVs: Map[String, Seq[Long]] = vs.flatMap { v =>
              val vd = graft.llmops.VersionedDir.versionPath(docsRoot, v)
              if (docsFs.exists(
                  new Path(vd, graft.llmops.SegPool.ManifestName)))
                graft.llmops.SegPool.readManifest(docsFs, vd)
                  .map { case (_, rel) => s"$docsRoot/$rel" -> v }
              else Seq(vd -> v) // legacy layout: the version dir itself
            }.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sorted }
            val hitRows = relToVs.keys.toSeq.sorted
              .filter(d => docsFs.exists(new Path(d)))
              .map { dir =>
                spark.read.parquet(dir)
                  .select(col("doc_id").cast("long").as("doc_id"))
                  .filter(col("doc_id").isin(ids: _*))
                  .withColumn("__dir", lit(dir))
              }
              .reduceOption(_ unionByName _)
              .map(_.collect()).getOrElse(Array.empty)
            val hits = hitRows.groupBy(_.getString(1))
              .map { case (d, rs) => d -> rs.map(_.getLong(0)).toSet }
            ids.map { id =>
              id -> relToVs.toSeq.collect {
                case (dir, vers) if hits.getOrElse(dir, Set.empty)(id) => vers
              }.flatten.distinct.sorted
            }.toMap
          }
          // retry ONLY the GC-race signatures (a listed dir pruned
          // under the probe); deterministic failures — e.g. a corrupt
          // committed manifest — must surface on first throw
          try probe()
          catch {
            case _: java.io.FileNotFoundException => probe()
            case _: org.apache.spark.sql.AnalysisException => probe()
          }
        }.getOrElse(Map.empty)
        // synced-index membership (when the release root carries synced
        // serving indexes): is the doc actually SEARCHABLE right now —
        // text probe = one ids-filtered scan of the index's doc-length
        // table, ann probe = part-pruned vector reads; both minus
        // tombstones, each tagged with its synced corpus version
        def idxMembership(sub: String, probe: String => Set[Long])
            : Option[(Long, Set[Long])] =
          relOut.map(o => s"$o/$sub").flatMap { d =>
            graft.llmops.CorpusIndexSync.syncedVersion(spark, d)
              .map(v => v -> probe(d))
          }
        val textIdxM = idxMembership("_text_index", d =>
          new graft.llmops.TextIndexStore(d,
            env.get("GRAFT_TEXT_PARTS").map(_.toInt).getOrElse(64))
            .hasDocs(spark, ids))
        val annIdxM = idxMembership("_ann_index", d =>
          new graft.llmops.AnnIndexStore(d).hasDocs(spark, ids))
        def idxStr(m: Option[(Long, Set[Long])], id: Long): String =
          m.map { case (v, s) => s"v$v:${if (s(id)) "in" else "out"}" }
            .getOrElse("-")
        ids.map { id =>
          val pb = pLed.get(id); val rb = rLed.get(id)
          val f = fate(id)
          def opt(i: Int): String = Option(f.get(i)).map(_.toString)
            .getOrElse("-")
          val vstr = versionsOf.get(id).filter(_.nonEmpty)
            .map(_.mkString(",")).getOrElse("-")
          s"doc-fate $id: " +
            s"processed_b=${pb.map(_.toString).getOrElse("-")} " +
            s"retracted_b=${rb.map(_.toString).getOrElse("-")} " +
            s"live=${pb.exists(p => rb.forall(p > _))} " +
            s"curated=${f.getBoolean(1)} exact_kept=${f.getBoolean(2)} " +
            s"content_hash=${opt(3)} gate_pass=${opt(4)} " +
            s"bloom_flagged=${opt(5)} exact_dup_of=${opt(6)} " +
            s"near_dup_of=${opt(7)} seg=${segOf.getOrElse(id, "-")} " +
            s"versions=$vstr " +
            s"text_index=${idxStr(textIdxM, id)} " +
            s"ann_index=${idxStr(annIdxM, id)}"
        }
      case "lsh-index" =>
        val dir = env.getOrElse("GRAFT_INDEX_DIR",
          throw new IllegalArgumentException("GRAFT_INDEX_DIR is required"))
        val parts = env.get("GRAFT_INDEX_PARTS").map(_.toInt).getOrElse(64)
        new graft.llmops.LshIndexStore(dir, numParts = parts).compact(spark)
        Seq(s"lsh-index: compacted $dir")
      case "block-store" =>
        val dir = env.getOrElse("GRAFT_BLOCK_DIR",
          throw new IllegalArgumentException("GRAFT_BLOCK_DIR is required"))
        val parts = env.get("GRAFT_BLOCK_PARTS").map(_.toInt).getOrElse(64)
        new graft.llmops.BlockDedupStore(dir, numParts = parts).compact(spark)
        Seq(s"block-store: compacted $dir")
      case "sketch-store" =>
        val dir = env.getOrElse("GRAFT_SKETCH_STORE",
          throw new IllegalArgumentException("GRAFT_SKETCH_STORE is required"))
        val folded = new graft.llmops.SketchStore(dir).compact(spark)
        Seq(s"sketch-store: folded " +
          folded.toSeq.sortBy(_._1).map { case (k, n) => s"$k=$n" }.mkString(","))
      case "sketch-serve" =>
        // read side of the sketch store without Scala: per-group
        // distinct estimates (KMV and/or HLL) and histogram quantiles,
        // pruned to GRAFT_SKETCH_GROUPS when given (literal part list),
        // full-store otherwise. One status line per sketch kind.
        val dir = env.getOrElse("GRAFT_SKETCH_STORE",
          throw new IllegalArgumentException("GRAFT_SKETCH_STORE is required"))
        val sk = new graft.llmops.SketchStore(dir)
        val groups = env.get("GRAFT_SKETCH_GROUPS").toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        val qs = env.get("GRAFT_SKETCH_QUANTILES").toSeq
          .flatMap(_.split(",")).map(_.trim.toLong)
        def fmt(df: org.apache.spark.sql.DataFrame): String =
          df.orderBy(df.columns.map(col): _*).collect()
            .map(r => r.toSeq.mkString(":")).mkString(" ")
        // Hadoop FS existence, not java.io.File — the store may live on
        // hdfs:// or s3a://, where a local-path check is silently false
        val skRoot = new org.apache.hadoop.fs.Path(dir)
        val skFs = skRoot.getFileSystem(spark.sessionState.newHadoopConf())
        def kindLine(kind: String, body: => String): Option[String] =
          if (skFs.exists(new org.apache.hadoop.fs.Path(skRoot, kind)))
            Some(s"sketch-serve $kind: " + body)
          else None
        kindLine("kmv", fmt(
          if (groups.nonEmpty) sk.kmvEstimateFor(spark, groups)
          else sk.kmvEstimates(spark))).toSeq ++
        kindLine("hll", fmt(
          if (groups.nonEmpty) sk.hllEstimateFor(spark, groups)
          else sk.hllEstimates(spark))).toSeq ++
        kindLine("hist", fmt(
          if (groups.nonEmpty)
            sk.histQuantilesFor(spark, groups,
              if (qs.nonEmpty) qs else Seq(500L, 900L, 990L))
          else sk.histQuantiles(spark,
            if (qs.nonEmpty) qs else Seq(500L, 900L, 990L)))).toSeq
      case "ann-index" =>
        val dir = env.getOrElse("GRAFT_ANN_DIR",
          throw new IllegalArgumentException("GRAFT_ANN_DIR is required"))
        val store = new graft.llmops.AnnIndexStore(dir)
        // optional retraction first: GRAFT_ANN_DELETE=id,id,… tombstones
        // the ids, and the compact below folds them out physically
        val deleted = env.get("GRAFT_ANN_DELETE").toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).map(_.toLong)
        if (deleted.nonEmpty) store.delete(spark, deleted)
        store.compact(spark)
        // optional drift-gated rebuild: GRAFT_ANN_REBUILD_IF_DRIFT=<r>
        // re-clusters when the last append's distance-to-centroid
        // exceeded the build baseline by ×r (mean or p95)
        val rebuildLine = env.get("GRAFT_ANN_REBUILD_IF_DRIFT")
          .map(_.toDouble).map { r =>
            if (store.driftExceeds(spark, r)) {
              store.rebuildIvf(spark)
              s"ann-index: rebuilt ivf (drift exceeded x$r)"
            } else s"ann-index: drift within x$r - no rebuild"
          }
        (if (deleted.nonEmpty)
           Seq(s"ann-index: retracted ${deleted.size} ids") else Seq.empty) ++
          Seq(s"ann-index: compacted $dir") ++
          store.driftReport(spark).map(d => s"ann-index: $d") ++
          rebuildLine.toSeq
      case "ann-sweep" =>
        val dir = env.getOrElse("GRAFT_ANN_DIR",
          throw new IllegalArgumentException("GRAFT_ANN_DIR is required"))
        val out = env.getOrElse("GRAFT_ANN_SWEEP_OUT",
          throw new IllegalArgumentException("GRAFT_ANN_SWEEP_OUT is required"))
        val k = env.get("GRAFT_ANN_K").map(_.toInt).getOrElse(10)
        val store = new graft.llmops.AnnIndexStore(dir)
        // probe set: a parquet of vec_id (eval-set contamination sweep)
        // or "self" = every live id (full-corpus near-dup / RAG audit)
        val probes = env.get("GRAFT_ANN_PROBES") match {
          case None | Some("self") => store.liveIds(spark)
          case Some(p) => spark.read.parquet(p)
        }
        store.sweepDistributed(probes, k,
            radius = env.get("GRAFT_ANN_RADIUS").map(_.toInt).getOrElse(1),
            nprobe = env.get("GRAFT_ANN_NPROBE").map(_.toInt)
              .getOrElse(graft.llmops.Similarity.DefaultIvfProbes),
            // ivfpq stores: ADC shortlist width before the full-width
            // rerank (per probe)
            shortlist = env.get("GRAFT_ANN_SHORTLIST").map(_.toInt)
              .getOrElse(50),
            // metadata-filtered sweep: a SQL predicate over the store's
            // declared metaCols (e.g. "label = 3"), applied inside the
            // pruned candidate read — same contract as filtered serving
            where = env.get("GRAFT_ANN_WHERE")
              .map(org.apache.spark.sql.functions.expr),
            // per-probe PAIR predicate (candidate metaCols vs the
            // probe's as p_<name>, e.g. "label <> p_label" = hard-
            // negative mining), applied before scoring
            pairWhere = env.get("GRAFT_ANN_PAIR_WHERE")
              .map(org.apache.spark.sql.functions.expr))
          .write.mode("overwrite").parquet(out)
        val n = spark.read.parquet(out).select("pid").distinct().count()
        Seq(s"ann-sweep: top-$k for $n probes -> $out")
      case "bloom-bits" =>
        // build/refresh the decontamination artifact from a benchmark
        // corpus (doc_id, text); GRAFT_CURATE_DECONTAM then serves it
        val bench = env.getOrElse("GRAFT_BLOOM_BENCH",
          throw new IllegalArgumentException("GRAFT_BLOOM_BENCH is required"))
        val out = env.getOrElse("GRAFT_BLOOM_OUT",
          throw new IllegalArgumentException("GRAFT_BLOOM_OUT is required"))
        val m = env.get("GRAFT_BLOOM_M").map(_.toInt).getOrElse(1 << 16)
        val kh = env.get("GRAFT_BLOOM_K").map(_.toInt).getOrElse(4)
        val sn = env.get("GRAFT_BLOOM_SHINGLE").map(_.toInt).getOrElse(3)
        val nBits = graft.llmops.Dedup.writeBloom(spark, out,
          spark.read.parquet(bench), m, kh, sn)
        Seq(s"bloom-bits: $nBits of $m positions set (k=$kh, n=$sn) -> $out")
      case "bpe-train" =>
        val docsDir = env.getOrElse("GRAFT_BPE_DOCS",
          throw new IllegalArgumentException("GRAFT_BPE_DOCS is required"))
        val out = env.getOrElse("GRAFT_BPE_OUT",
          throw new IllegalArgumentException("GRAFT_BPE_OUT is required"))
        val nMerges = env.get("GRAFT_BPE_MERGES").map(_.toInt).getOrElse(200)
        val cap = env.get("GRAFT_BPE_VOCAB_CAP").map(_.toInt).getOrElse(1 << 16)
        val textCol = env.getOrElse("GRAFT_BPE_TEXT_COL", "text")
        val docs = graft.llmops.SegPool.readDocs(spark, docsDir)
        val dict = graft.llmops.Bpe.wordCounts(docs, cap, textCol).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq
        val merges = graft.llmops.Bpe.train(dict, nMerges)
        val vocab = graft.llmops.Bpe.vocabOf(docs, merges, textCol)
        graft.llmops.Bpe.writeTokenizer(spark, out, merges, vocab)
        Seq(s"bpe-train: ${merges.length} merges, " +
          s"|vocab|=${vocab.count()} -> $out")
      case "agg-view" =>
        // heal + fold every declared incremental aggregate AND join
        // view's delta dirs, and report the live group counts (the
        // offline maintenance companion of the warehouse-chain upkeep);
        // GRAFT_AGG_PROBE="v1,v2;..." additionally serves a probed
        // (partition-pruned) read of each aggregate view — tuples in
        // groupCols order, ';' between probes
        val whRoot = env.getOrElse("GRAFT_WAREHOUSE_DIR",
          throw new IllegalArgumentException(
            "GRAFT_WAREHOUSE_DIR is required for agg-view"))
        val views = parseAggViews(env)
        val jviews = parseJoinViews(env)
        val sviews = parseStarViews(env)
        require(views.nonEmpty || jviews.nonEmpty || sviews.nonEmpty,
          "GRAFT_AGG_VIEWS, GRAFT_JOIN_VIEWS or GRAFT_STAR_VIEWS is " +
            "required for agg-view")
        val probeTuples = env.get("GRAFT_AGG_PROBE").toSeq
          .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
          .map(_.split(",").map(_.trim).toSeq)
        def probeLines(name: String,
                       read: Seq[Seq[String]] => org.apache.spark.sql.DataFrame,
                       arity: Int): Seq[String] =
          if (probeTuples.isEmpty || probeTuples.exists(_.size != arity)) Nil
          else read(probeTuples).collect().toSeq.map(r =>
            s"agg-view probe $name: " +
              r.toSeq.map(v => Option(v).map(_.toString).getOrElse("null"))
                .mkString(", "))
        views.flatMap { v =>
          val sink = v.sink(whRoot)
          sink.recover(spark)
          val folded = sink.compact(spark)
          val groups = sink.read(spark).count()
          (s"agg-view ${v.table}/${v.name}: folded $folded dirs, " +
            s"$groups live groups") +:
            probeLines(s"${v.table}/${v.name}",
              sink.readGroupTuples(spark, _), v.groupCols.size)
        } ++ jviews.flatMap { jv =>
          val sink = jv.sink(whRoot)
          sink.recover(spark)
          val folded = sink.compact(spark)
          val groups = sink.read(spark).count()
          (s"join-view ${jv.factTable}~${jv.dimTable}/${jv.name}: " +
            s"folded $folded dirs, $groups live groups") +:
            probeLines(s"${jv.factTable}~${jv.dimTable}",
              sink.readGroupTuples(spark, _), jv.dimGroupCols.size)
        } ++ sviews.flatMap { sv =>
          val sink = sv.sink(whRoot)
          sink.recover(spark)
          val folded = sink.compact(spark)
          val groups = sink.read(spark).count()
          (s"star-view ${sv.factTable}/${sv.name}: " +
            s"folded $folded dirs, $groups live groups") +:
            probeLines(s"${sv.factTable}/star",
              sink.readGroupTuples(spark, _), sink.groupCols.size)
        }
      case "history" =>
        // heal + fold every GRAFT_HISTORY_TABLES-declared SCD2 history
        // store (keys required here — see parseHistoryTables) and
        // report version/current counts; GRAFT_HISTORY_ASOF=<lsn> adds
        // the time-travel row count at that LSN,
        // GRAFT_HISTORY_PROBE="k1,k2" prints one key's version chain
        val whRoot = env.getOrElse("GRAFT_WAREHOUSE_DIR",
          throw new IllegalArgumentException(
            "GRAFT_WAREHOUSE_DIR is required for history"))
        val declared = parseHistoryTables(env)
        require(declared.nonEmpty, "GRAFT_HISTORY_TABLES is required for history")
        declared.flatMap { case (table, hkeys) =>
          // keys usually come from the store's _graft_history.json meta;
          // a :k1,k2 declaration is only needed (and then cross-checked)
          // for stores predating the meta
          val hist = new graft.sinks.HistorySink(
            s"$whRoot/_history/$table", hkeys)
          hist.heal(spark)
          val folded = hist.compact(spark,
            env.get("GRAFT_HISTORY_RETAIN_BELOW").map(_.toLong))
          val h = hist.history(spark).cache()
          val (versions, current) =
            try (h.count(),
              h.filter(org.apache.spark.sql.functions.col("is_current")).count())
            finally h.unpersist()
          val asOfLine = env.get("GRAFT_HISTORY_ASOF").map(_.toLong).map(l =>
            s"history $table asof $l: ${hist.asOf(spark, l).count()} rows")
          val probeLine = env.get("GRAFT_HISTORY_PROBE").map { p =>
            val key = p.split(",").map(_.trim).toSeq
            val chain = hist.probe(spark, key).collect().toSeq.map(r =>
              r.toSeq.map(v => Option(v).map(_.toString).getOrElse("null"))
                .mkString(","))
            s"history $table probe ${key.mkString(",")}: " +
              chain.mkString(" | ")
          }
          (s"history $table: folded $folded dirs, $versions versions, " +
            s"$current current") +: (asOfLine.toSeq ++ probeLine.toSeq)
        }
      case "classifier-train" =>
        // train + persist the logistic-regression quality-gate weights
        // (Classifier.writeWeights artifact; served by the curate
        // intake via GRAFT_CURATE_MODEL and by Classifier.gateDocs)
        val docsDir = env.getOrElse("GRAFT_CLF_DOCS",
          throw new IllegalArgumentException("GRAFT_CLF_DOCS is required"))
        val out = env.getOrElse("GRAFT_CLF_OUT",
          throw new IllegalArgumentException("GRAFT_CLF_OUT is required"))
        val clfSteps = env.get("GRAFT_CLF_STEPS").map(_.toInt).getOrElse(3)
        val clfLr = env.get("GRAFT_CLF_LR").map(_.toLong).getOrElse(100L)
        val clfLang = env.getOrElse("GRAFT_CLF_TARGET_LANG", "en")
        val clfDocs = graft.llmops.SegPool.readDocs(spark, docsDir)
        val wts = graft.llmops.Classifier.trainWeights(
          clfDocs, clfSteps, clfLr, clfLang)
        graft.llmops.Classifier.writeWeights(spark, out, wts)
        val kept = graft.llmops.Classifier.gateDocs(clfDocs, wts).count()
        Seq(s"classifier-train: $clfSteps steps, weights " +
          s"(${wts.b},${wts.w1},${wts.w2},${wts.w3}), " +
          s"gate keeps $kept/${clfDocs.count()} -> $out")
      case "unigram-train" =>
        // the unigram sibling of bpe-train: substring-frequency vocab
        // over the capped word dict, persisted for Unigram.loadVocab
        val docsDir = env.getOrElse("GRAFT_UNIGRAM_DOCS",
          throw new IllegalArgumentException("GRAFT_UNIGRAM_DOCS is required"))
        val out = env.getOrElse("GRAFT_UNIGRAM_OUT",
          throw new IllegalArgumentException("GRAFT_UNIGRAM_OUT is required"))
        val vSize = env.get("GRAFT_UNIGRAM_VOCAB").map(_.toInt)
          .getOrElse(graft.llmops.Unigram.DefaultVocabSize)
        val uCap = env.get("GRAFT_UNIGRAM_VOCAB_CAP").map(_.toInt)
          .getOrElse(1 << 16)
        val uText = env.getOrElse("GRAFT_UNIGRAM_TEXT_COL", "text")
        val uVocab = graft.llmops.Unigram.trainVocab(
          graft.llmops.SegPool.readDocs(spark, docsDir), vSize, uCap, uText)
        graft.llmops.Unigram.writeVocab(spark, out, uVocab)
        Seq(s"unigram-train: |pieces|=${uVocab.pieces.length}, " +
          s"total=${uVocab.total} -> $out")
      case "emit-shards" =>
        // the last mile of the training-data pipeline: curated docs +
        // a frozen tokenizer artifact -> packed fixed-budget token-id
        // shards on disk, the layout a trainer's data loader mounts.
        // Deterministic md5 shard assignment decorrelates doc order
        // from source order (the shuffle-shard discipline); packing is
        // per-shard windows only, so shards scale independently.
        // Every emission writes a release manifest (ShardManifest) and
        // re-tokenizes ONLY the shards whose content hash moved since
        // the previous release — a corpus delta touches a few shards,
        // not the world.
        val docsDir = env.getOrElse("GRAFT_EMIT_DOCS",
          throw new IllegalArgumentException("GRAFT_EMIT_DOCS is required"))
        val tok = env.getOrElse("GRAFT_EMIT_TOKENIZER",
          throw new IllegalArgumentException("GRAFT_EMIT_TOKENIZER is required"))
        val out = env.getOrElse("GRAFT_EMIT_OUT",
          throw new IllegalArgumentException("GRAFT_EMIT_OUT is required"))
        val budget = env.get("GRAFT_EMIT_BUDGET").map(_.toInt).getOrElse(2048)
        val nShards = env.get("GRAFT_EMIT_SHARDS").map(_.toInt).getOrElse(64)
        // MANIFEST-aware: a frozen release version resolves through its
        // segment manifest; a plain parquet dir reads directly
        val docs = graft.llmops.SegPool.readDocs(spark, docsDir)
        import graft.llmops.ShardManifest
        // tokenizer family: bpe (default; a bpe-train artifact) or
        // unigram (a unigram-train vocab artifact) — both id streams
        // feed the identical packing/sharding path. The artifact is
        // loaded ONCE; its content fingerprint stamps the manifest.
        val (encode, tokFp) =
          env.getOrElse("GRAFT_EMIT_TOKENIZER_KIND", "bpe") match {
            case "bpe" =>
              val (merges, vocab) = graft.llmops.Bpe.loadTokenizer(spark, tok)
              val vrows = vocab.collect()
                .map(r => s"${r.getString(0)}\u0000${r.getLong(1)}").sorted
              val fp = ShardManifest.fpOf(Iterator("bpe") ++
                merges.iterator.map(m => s"${m.a}\u0000${m.b}\u0000${m.rank}") ++
                vrows.iterator)
              ((d: org.apache.spark.sql.DataFrame) =>
                graft.llmops.Bpe.encodeCorpusIds(d, merges, vocab), fp)
            case "unigram" =>
              val v = graft.llmops.Unigram.loadVocab(spark, tok)
              val fp = ShardManifest.fpOf(Iterator("unigram") ++
                v.pieces.iterator.map(p => s"${p.piece}\u0000${p.freq}"))
              ((d: org.apache.spark.sql.DataFrame) =>
                graft.llmops.Unigram.encodeCorpusIds(d, v), fp)
            case k => throw new IllegalArgumentException(
              s"unknown GRAFT_EMIT_TOKENIZER_KIND $k (bpe|unigram)")
          }
        // shard → (n_docs, content_hash) of the CURRENT corpus: one
        // hash scan, ≤ nShards driver rows — no tokenizer in the loop
        val curState: Map[Long, (Long, Long)] =
          ShardManifest.contentState(docs, nShards).collect()
            .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        // the previous release is comparable only if the tokenizer,
        // budget and shard count all match — any of those moving
        // changes membership or packing geometry everywhere
        val prevRel = ShardManifest.latestRelease(spark, out)
        val prevRows: Map[Long, (Long, Long, Long, Long)] = prevRel match {
          case Some((_, m)) =>
            val rows = m.collect()
            val comparable = rows.headOption.forall(r =>
              r.getAs[Long]("tokenizer_fp") == tokFp &&
                r.getAs[Long]("budget") == budget.toLong &&
                r.getAs[Long]("n_shards") == nShards.toLong)
            if (comparable) rows.map(r => r.getAs[Long]("shard") ->
              ((r.getAs[Long]("content_hash"), r.getAs[Long]("n_tokens"),
                r.getAs[Long]("n_seqs"), r.getAs[Long]("n_full")))).toMap
            else Map.empty
          case None => Map.empty
        }
        val incremental = prevRows.nonEmpty
        val changed = curState.keys.filter(sh =>
          prevRows.get(sh).forall(_._1 != curState(sh)._2)).toSeq.sorted
        val removed =
          if (incremental) prevRows.keys.filterNot(curState.contains).toSeq.sorted
          else Nil
        val fs = new org.apache.hadoop.fs.Path(out)
          .getFileSystem(spark.sessionState.newHadoopConf())
        if (changed.nonEmpty) {
          // re-tokenize + re-pack ONLY the changed shards' docs (a
          // shard re-packs whole — docs straddle sequence boundaries)
          val subset =
            if (incremental)
              docs.filter(ShardManifest.shardOf(col("doc_id"), nShards)
                .isin(changed: _*))
            else docs
          val ids = encode(subset)
            .withColumn("shard", ShardManifest.shardOf(col("doc_id"), nShards))
          val packed = graft.llmops.Bpe.packSequences(ids, budget,
            srcCol = "shard")
          if (incremental) {
            // delete the changed shards' dirs FIRST, then append: the
            // write recreates exactly the shards with encodable content,
            // so a shard the delta drained (or a crash mid-write) can
            // never leave stale rows — re-running the verb self-heals
            // because the manifest only advances at the very end
            changed.map(sh => new org.apache.hadoop.fs.Path(out, s"shard=$sh"))
              .filter(fs.exists).foreach(p => fs.delete(p, true))
            packed.write.mode("append").partitionBy("shard").parquet(out)
          } else
            packed.write.mode("overwrite").partitionBy("shard").parquet(out)
        } else if (!incremental) {
          // first emission of a NEW CHAIN over an empty/uncovered
          // corpus: leftovers of a previous (non-comparable) chain —
          // stale shard dirs and the _manifest release history — must
          // not survive into release 0, or latestRelease would resolve
          // to the old chain's max release on the next run (the
          // changed-shards path is safe because its static overwrite
          // replaces the whole out dir)
          val outPath = new org.apache.hadoop.fs.Path(out)
          if (fs.exists(outPath))
            fs.listStatus(outPath).toSeq
              .filter(st => st.getPath.getName.startsWith("shard=") ||
                st.getPath.getName == "_manifest")
              .foreach(st => fs.delete(st.getPath, true))
          fs.mkdirs(outPath)
        }
        // every removed shard (no docs left): drop the stale dir
        removed.map(sh => new org.apache.hadoop.fs.Path(out, s"shard=$sh"))
          .filter(fs.exists).foreach(p => fs.delete(p, true))
        // fresh per-shard stats: only dirs the write just produced
        // remain for changed shards, so a drained shard reads as absent
        val changedDirs = changed.map(sh =>
            new org.apache.hadoop.fs.Path(out, s"shard=$sh"))
          .filter(fs.exists).map(_.toString)
        val shardStats: Map[Long, (Long, Long, Long)] =
          if (changedDirs.isEmpty) Map.empty
          else spark.read
            .schema("seq_id BIGINT, ids ARRAY<BIGINT>, shard BIGINT")
            .option("basePath", out).parquet(changedDirs: _*)
            .groupBy("shard")
            .agg(sum(size(col("ids"))).as("t"), count(lit(1)).as("s"),
              sum(when(size(col("ids")) === budget, 1L).otherwise(0L)).as("f"))
            .collect()
            .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
            .toMap
        // release manifest: changed shards from the fresh stats,
        // unchanged shards carried forward from the previous release
        val changedSet = changed.toSet
        val manifestRows = curState.toSeq.sortBy(_._1).map {
          case (sh, (nDocs, cHash)) =>
            val (nToks, nSeqs, nFull) =
              if (changedSet(sh))
                shardStats.get(sh).map(t => (t._1, t._2, t._3))
                  .getOrElse((0L, 0L, 0L))
              else {
                val p = prevRows(sh); (p._2, p._3, p._4)
              }
            (sh, cHash, nDocs, nToks, nSeqs, nFull,
              tokFp, budget.toLong, nShards.toLong)
        }
        val release = if (incremental) prevRel.get._1 + 1 else 0
        locally {
          import spark.implicits._
          ShardManifest.writeRelease(spark, out, release,
            manifestRows.toDF("shard", "content_hash", "n_docs", "n_tokens",
              "n_seqs", "n_full", "tokenizer_fp", "budget", "n_shards"))
        }
        val totSeqs = manifestRows.map(_._5).sum
        val totFull = manifestRows.map(_._6).sum
        val totToks = manifestRows.map(_._4).sum
        Seq(s"emit-shards: $totSeqs sequences " +
          s"($totFull full at $budget), " +
          s"$totToks tokens across $nShards shards -> $out; " +
          s"release $release: rewrote ${changed.size}/${curState.size} " +
          s"shards, removed ${removed.size}")
      case "manifest-diff" =>
        // release diffing over emit-shards manifests: which shards a
        // trainer must re-fetch between two releases
        val out = env.getOrElse("GRAFT_EMIT_OUT",
          throw new IllegalArgumentException("GRAFT_EMIT_OUT is required"))
        import graft.llmops.ShardManifest
        val (latest, latestDf) = ShardManifest.latestRelease(spark, out)
          .getOrElse(throw new IllegalArgumentException(
            s"no emit-shards manifest under $out"))
        val to = env.get("GRAFT_MANIFEST_TO").map(_.toInt).getOrElse(latest)
        val from = env.get("GRAFT_MANIFEST_FROM").map(_.toInt)
          .getOrElse(math.max(to - 1, 0))
        val toDf = if (to == latest) latestDf
          else ShardManifest.readRelease(spark, out, to)
        val d = ShardManifest.diff(
          ShardManifest.readRelease(spark, out, from), toDf)
        val counts = d.groupBy("status").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val shards = d.filter(col("status").isin("added", "removed", "changed"))
          .orderBy("shard").collect()
          .map(r => s"${r.getLong(0)}:${r.getString(1)}")
        Seq(s"manifest-diff $from -> $to: " +
          Seq("added", "removed", "changed", "unchanged")
            .map(s => s"$s=${counts.getOrElse(s, 0L)}").mkString(", "),
          s"manifest-diff shards: ${shards.mkString(" ")}")
      case "release" =>
        // ONE-COMMAND INCREMENTAL training-data release — the curated-
        // release funnel as a single crash-safe, delta-paying verb. The
        // funnel IS the streaming-intake operator
        // (StreamingCurate.applyBatch: quality/lang gate -> optional
        // trained-model gate -> optional Bloom decontamination -> exact
        // dedup -> LSH near-dedup, Jaccard-verified against the
        // persisted seen/bucket/text stores), so a re-release over an
        // updated corpus pays O(delta): only never-processed docs are
        // gated/deduped (store reads part-pruned to the delta's keys),
        // removed docs retract from the frozen corpus, and only changed
        // shards re-tokenize. Non-core input columns (image/audio
        // payloads, metadata structs — the multimodal carry) ride the
        // whole funnel untouched and land in the frozen corpus.
        // Identity contract: doc_ids are stable and immutable (an
        // edited doc is a new id — the shard manifest's content-hash
        // convention); dedup memory is append-biased (a doc dropped as
        // a near-dup of a later-removed doc stays dropped until
        // re-submitted with a new id); a RETRACTED id that reappears is
        // re-classified as new exactly once (its later processed-ledger
        // entry outranks the retraction).
        // Layout under GRAFT_RELEASE_OUT:
        //   docs/v<N>/MANIFEST+SOURCES  crash-safe frozen corpus
        //     (VersionedDir + SegPool manifest indirection): a version
        //     LISTS its segments; unchanged segments are REFERENCED
        //     from the shared docs/_segs pool (zero bytes moved),
        //     segments holding removed docs rebuild filtered, one fresh
        //     pool seg holds this release's curated additions; SOURCES
        //     carries per-seg (source, n) rows so the funnel report is
        //     metadata-only; refcount GC reclaims pool dirs no retained
        //     version references. A zero-delta re-release publishes NO
        //     new version.
        //   _curate/         StreamingCurate dedup stores + the
        //     processed/retracted id ledgers (delta detection);
        //     _curate/_delta stages a chunked release's delta payload
        //     (one raw-corpus read total, reclaimed after intake)
        //   shards/ _report/ as before (emit-shards delegation; the
        //     funnel report derives from applyBatch's own stage
        //     counters + the SOURCES sidecar — no corpus-sized
        //     driver count() actions remain)
        val docsDir = env.getOrElse("GRAFT_RELEASE_DOCS",
          throw new IllegalArgumentException("GRAFT_RELEASE_DOCS is required"))
        val relOut = env.getOrElse("GRAFT_RELEASE_OUT",
          throw new IllegalArgumentException("GRAFT_RELEASE_OUT is required"))
        val thr = env.get("GRAFT_RELEASE_JACCARD").map(_.toDouble)
          .getOrElse(0.8)
        val relMinShared = env.get("GRAFT_RELEASE_MINSHARED")
          .map(_.toInt).getOrElse(3)
        val curStore = s"$relOut/_curate"
        val docsRoot = s"$relOut/docs"
        import graft.llmops.{SegPool, VersionedDir}
        val relFs = new Path(relOut)
          .getFileSystem(spark.sessionState.newHadoopConf())
        // one ttl for EVERY lease touch of this root — every actor on
        // the root must judge staleness by the same clock, or a gc/
        // publisher would break a live long-freeze holder's lease
        val relLeaseMs = env.get("GRAFT_RELEASE_LEASE_MS").map(_.toLong)
          .getOrElse(graft.llmops.VersionedDir.DefaultLeaseTtlMs)
        // ONE publish lease spans the whole verb — previous-version
        // snapshot, delta detection, chunked intake, freeze, ledgers:
        // the snapshot (and the batch/ledger ids derived from it) can
        // never go stale against a concurrent publisher, because two
        // releases on one root serialize UP FRONT — the loser fails
        // cleanly (LeaseHeldException, retryable) before touching any
        // store, instead of publishing a manifest derived from a stale
        // lineage or overwriting the winner's ledger dirs. The lease
        // heartbeat keeps a multi-hour run fresh; long stages re-check
        // the fence so a displaced-but-alive holder stops writing at
        // the next stage boundary instead of racing its breaker.
        def relFence(relHeld: () => Boolean, at: String): Unit =
          if (!relHeld()) throw new IllegalStateException(
            s"release lease for $docsRoot was broken ($at); aborting")
        VersionedDir.withLeaseFenced(spark, docsRoot, relLeaseMs) { relHeld =>
          val prevV = VersionedDir.current(spark, docsRoot)
          val relBatch = prevV.getOrElse(0L)
          val raw = graft.llmops.SegPool.readDocs(spark, docsDir)
          val stageSecs = scala.collection.mutable.LinkedHashMap[String, Double]()
          def staged[T](name: String)(f: => T): T = {
            val t0 = System.nanoTime()
            val r = f
            stageSecs(name) = (System.nanoTime() - t0) / 1e9
            r
          }
          // delta detection: ids-only and column-pruned — the only
          // full-corpus touch is ONE doc_id scan (checkpointed; nRaw
          // rides it), never a payload read. Ledgers carry their batch
          // id so a retracted-then-resubmitted doc is live again the
          // moment a LATER release re-processes it — classified as new
          // exactly once, no perpetual reprocessing, no ledger rewrite.
          // Ledger dirs carry the release batch id BOTH as the dir name
          // and as a per-row `b` column: `curate-store` compaction folds
          // old dirs together (BatchDirFold), and only the per-row id
          // keeps processed-vs-retracted ORDERING exact across the merge
          // (a doc processed at b0 and retracted at b5 must not read as
          // processed-at-the-fold-dir's-name > 5 and resurrect). The
          // coalesce covers pre-column legacy dirs.
          def idLedger(kind: String): org.apache.spark.sql.DataFrame = {
            val dir = new Path(curStore, kind)
            // an interrupted ledger fold may hold the only copy in _fold
            graft.llmops.BatchDirFold.heal(spark, dir)
            val dirs =
              if (!relFs.exists(dir)) Seq.empty
              else relFs.listStatus(dir).toSeq
                .filter(s => s.isDirectory && s.getPath.getName.startsWith("b"))
                .map(s => (s.getPath.getName.stripPrefix("b").toLong,
                  s.getPath.toString))
            if (dirs.isEmpty)
              spark.range(0).select(col("id").as("doc_id"), lit(0L).as("b"))
            else dirs.map { case (b, d) =>
              spark.read.schema("doc_id LONG, b LONG").parquet(d)
                .select(col("doc_id"),
                  org.apache.spark.sql.functions.coalesce(col("b"), lit(b))
                    .as("b"))
            }.reduce(_ unionByName _)
          }
          val (rawIds, nRaw, liveLedger, newIds, removedIds, nNew, nRemoved) =
            staged("delta_detect") {
              val rawIds = raw.select(col("doc_id").cast("long").as("doc_id"))
                .localCheckpoint(false)
              val nRaw = rawIds.count()
              val liveLedger = idLedger("processed")
                .groupBy("doc_id").agg(max("b").as("pb"))
                .join(idLedger("retracted")
                  .groupBy("doc_id").agg(max("b").as("rb")),
                  Seq("doc_id"), "left")
                .filter(col("rb").isNull || col("pb") > col("rb"))
                .select("doc_id").localCheckpoint(false)
              val newIds = rawIds.join(liveLedger, Seq("doc_id"), "left_anti")
                .localCheckpoint(true)
              val removedIds = liveLedger.join(rawIds, Seq("doc_id"), "left_anti")
                .localCheckpoint(true)
              (rawIds, nRaw, liveLedger, newIds, removedIds,
                newIds.count(), removedIds.count())
            }
          // the delta runs through applyBatch — the same operator the
          // oracle-pinned llm_curate queries and the streaming intake
          // run; its per-stage counters ARE the funnel report (snapshot
          // diff). Deltas above GRAFT_RELEASE_BATCH_DOCS (def 5M docs —
          // a COLD release's delta is the whole corpus) split into
          // bounded sequential intake chunks in ascending doc_id order:
          // the streaming-parity contract makes the end state IDENTICAL
          // to the one-shot batch (earlier chunks become store-side for
          // later ones), while the within-chunk LSH self-join, the
          // Jaccard-verify working set and executor memory are bounded
          // by the chunk size at ANY corpus size. Store batch ids are
          // relBatch*65536 + chunk — monotonic across releases, so
          // prior-release reads and the current-batch-exclusion rule
          // are untouched.
          //
          // The chunked path reads the raw corpus exactly ONCE: the
          // delta's payload is materialized one time under
          // _curate/_delta, chunk-partitioned by ascending doc_id rank
          // (deterministic sort + zipWithIndex, so a crash-retry
          // rewrites the same chunks and replays the same b-dirs), and
          // every chunk then opens only its own __chunk=i files — the
          // per-chunk cost is O(chunk) on ANY raw layout, id-clustered
          // or not. A cold release over a non-clustered 100 TB corpus
          // therefore pays one corpus read + one delta write, never
          // nChunks corpus scans; the single-chunk common case skips
          // the staging write entirely and joins the raw scan directly.
          val relBatchDocs = env.get("GRAFT_RELEASE_BATCH_DOCS")
            .map(_.toLong).getOrElse(5000000L)
          val nChunks = math.min(65536L,
            math.max(1L, (nNew + relBatchDocs - 1) / relBatchDocs)).toInt
          val chunkBase = relBatch * 65536L
          // the delta staging is ATTEMPT-UNIQUE like the pool parents:
          // a displaced-but-alive holder's staging writes and its
          // end-of-intake delete must never touch the breaker's
          // in-flight staging (same zombie model as the freeze). Any
          // `_delta-*` leftover belongs to a dead or displaced attempt
          // — we hold the verb lease — so sweep them up front (a
          // zombie mid-write into its own leftover just fails sooner).
          val deltaDir =
            s"$curStore/_delta-${java.util.UUID.randomUUID().toString.take(8)}"
          locally {
            val cs = new Path(curStore)
            if (relFs.exists(cs))
              relFs.listStatus(cs).toSeq
                .filter(_.getPath.getName.startsWith("_delta"))
                .foreach(s => relFs.delete(s.getPath, true))
          }
          // RANGE RECLAIM: store b-dirs inside this release's batch-id
          // range [chunkBase, chunkBase+65536) can only be a crashed or
          // displaced attempt of THIS release — relBatch advances with
          // every committed publish and the id ledger (the delta's
          // commit point) lands after it, so nothing in an uncommitted
          // range is durable state. Leftovers must not survive into
          // this attempt: a retry that chunks DIFFERENTLY (the raw
          // corpus moved under the crash, or GRAFT_RELEASE_BATCH_DOCS
          // changed) never Overwrites the orphan ids, future releases
          // would read them as committed prior state, and — worst case
          // — a doc that left raw under the crash and is later
          // resubmitted anti-joins against a leftover seen row and
          // silently never reaches any frozen version. We hold the verb
          // lease; the offline curate-store fold excludes this range
          // for the same reason.
          val rangeHi = chunkBase + 65536L
          lastRangeSwept = graft.llmops.StreamingCurate.reclaimBatchRange(
            spark, curStore, chunkBase, rangeHi,
            sketchDir = env.get("GRAFT_RELEASE_SKETCH"))
          val chunkDocs: Int => org.apache.spark.sql.DataFrame =
            if (nChunks == 1) {
              // broadcast the id set while driver-safe so the raw scan
              // stays shuffle-free; id-hash join beyond that
              val newDocs =
                if (nNew <= 4000000L) raw.join(broadcast(newIds), "doc_id")
                else raw.join(newIds, "doc_id")
              _ => newDocs
            } else {
              staged("delta_stage") {
                import spark.implicits._
                val idChunks = newIds.orderBy("doc_id").select("doc_id")
                  .as[Long].rdd.zipWithIndex()
                  .map { case (id, i) =>
                    (id, math.min(i / relBatchDocs, nChunks - 1L).toInt) }
                  .toDF("doc_id", "__chunk")
                // repartition by (chunk, id-salt): one shuffle pass (a
                // range partitioner would sample-scan the join twice),
                // each chunk spread over `slots` tasks so a 5M-doc
                // chunk never funnels through one writer, and each
                // task writes into exactly one __chunk dir
                val shuf = spark.conf
                  .get("spark.sql.shuffle.partitions").toInt
                val nParts = math.max(shuf, nChunks)
                val slots = math.max(1, nParts / nChunks)
                raw.join(idChunks, "doc_id")
                  .repartition(nParts, col("__chunk"),
                    pmod(hash(col("doc_id")), lit(slots)))
                  .write.mode("overwrite").partitionBy("__chunk")
                  .parquet(deltaDir)
              }
              i => spark.read.option("mergeSchema", "true")
                .parquet(s"$deltaDir/__chunk=$i")
            }
          val mBefore = graft.llmops.StreamingCurate.metricsSnapshot()
          staged("apply_delta") {
            if (nNew > 0) (0 until nChunks).foreach { i =>
              // a displaced holder stops at the next chunk boundary —
              // its breaker is replaying the same chunks into the same
              // b-dirs, and two writers must not race one dir longer
              // than a chunk
              relFence(relHeld, s"before intake chunk $i")
              graft.llmops.StreamingCurate.applyBatch(chunkDocs(i), curStore,
                chunkBase + i,
                blockRewrite = env.get("GRAFT_RELEASE_BLOCKS").contains("1"),
                decontamDir = env.get("GRAFT_RELEASE_BLOOM"),
                sketchDir = env.get("GRAFT_RELEASE_SKETCH"),
                modelDir = env.get("GRAFT_RELEASE_MODEL"),
                jaccard = thr, decontamMinShared = relMinShared,
                maxPerBucket = env.get("GRAFT_RELEASE_MAXBUCKET").map(_.toInt))
            }
          }
          // reclaim this attempt's staging now (fenced — a displaced
          // holder must delete nothing); a crashed attempt's leftover
          // — even one retried onto the single-chunk arm with a raised
          // batch cap — is swept by the next run's up-front `_delta-*`
          // sweep above
          if (relHeld() && relFs.exists(new Path(deltaDir)))
            relFs.delete(new Path(deltaDir), true)
          // residue sweep: a displaced zombie stops at its next chunk
          // boundary, so it may land ONE more chunk's store dirs after
          // the up-front sweep; reclaim everything in the range that is
          // not this attempt's own chunk set (fenced — a displaced run
          // must delete nothing)
          if (relHeld())
            graft.llmops.StreamingCurate.reclaimBatchRange(
              spark, curStore, chunkBase, rangeHi,
              keep = (0 until nChunks).map(chunkBase + _.toLong).toSet,
              sketchDir = env.get("GRAFT_RELEASE_SKETCH"))
          val mAfter = graft.llmops.StreamingCurate.metricsSnapshot()
          def stageN(st: String): Long = {
            val k = "graft_curate_stage_docs_total{stage=\"" + st + "\"}"
            (mAfter.getOrElse(k, 0.0) - mBefore.getOrElse(k, 0.0)).toLong
          }
          // assemble + publish docs v<next> as a MANIFEST version
          // (SegPool): the PREVIOUS version is the canonical corpus (all
          // prior retractions already applied, and independent of any
          // curate-store fold). Untouched segments are REFERENCED from
          // the shared pool — zero bytes move for them, on any
          // filesystem; only segments holding removed docs rebuild
          // (filtered, distributed) and one fresh pool seg lands the
          // delta's curated additions. A zero-delta re-release publishes
          // nothing at all.
          // which segments hold removed docs — skipped for a legacy
          // (pre-manifest) previous version, whose migration rebuilds
          // every segment unconditionally anyway
          val affectedSegs: Set[String] =
            if (nRemoved == 0 || prevV.isEmpty ||
                !relFs.exists(new Path(
                  VersionedDir.versionPath(docsRoot, prevV.get),
                  SegPool.ManifestName))) Set.empty
            else SegPool
              .readDocs(spark, VersionedDir.versionPath(docsRoot, prevV.get))
              .select("seg", "doc_id")
              .join(removedIds, Seq("doc_id"))
              .select("seg").distinct().collect()
              .map(_.get(0).toString).toSet
          val skipPublish = nNew == 0 && nRemoved == 0 && prevV.nonEmpty
          val newV = staged("freeze") {
            if (skipPublish) {
              // still reclaim orphans a crashed earlier publish may have
              // left in the pool — already under the verb's lease (gc
              // must never race a publisher's not-yet-manifested pool
              // writes); re-check the fence right before destructive
              // work, a displaced run's skipped sweep is redone later
              if (relHeld()) SegPool.gc(spark, docsRoot)
              prevV.get
            } else {
              // GRAFT_RELEASE_RETAIN (def 2): how many doc versions stay
              // servable — consumers pinned N releases back trade
              // storage (shared pool segs refcount, so the cost is only
              // the rebuilt/fresh deltas between retained versions)
              val relRetain = env.get("GRAFT_RELEASE_RETAIN")
                .map(_.toInt).getOrElse(2)
              val published = VersionedDir.publishHeld(spark, docsRoot, dir => {
                // `dir` is the ATTEMPT-UNIQUE staging path (_v<N>-<nonce>);
                // the nonce rides every pool parent this attempt writes,
                // so a displaced-but-alive publisher can never overwrite
                // a committed attempt's segment dirs — its orphans are
                // unreferenced by any manifest and reclaimed by gc
                val v = VersionedDir.stagedVersion(dir)
                val nonce = VersionedDir.stagedNonce(dir)
                val entries =
                  scala.collection.mutable.LinkedHashMap[String, String]()
                val rebuilt = Seq.newBuilder[String]
                val referenced = Seq.newBuilder[String]
                // per-seg (source, n) rows for the SOURCES sidecar: the
                // segments being WRITTEN are scanned right here (they
                // are O(changed) and freshly hot), untouched segments
                // carry their rows forward from the previous sidecar —
                // the release report then never scans the corpus
                val srcRows = Seq.newBuilder[(String, String, Long)]
                def srcCounts(in: Seq[String]): Seq[(String, String, Long)] = {
                  // a fully-retracted rebuild leaves a dataless parent
                  // (just _SUCCESS) — nothing to count, nothing to read
                  val dirs = in.filter(SegPool.hasParquet(relFs, _))
                  if (dirs.isEmpty) Seq.empty
                  else spark.read.option("mergeSchema", "true")
                    .parquet(dirs: _*)
                    .select(col("seg").cast("string").as("seg"), col("source"))
                    .groupBy("seg", "source")
                    .agg(count(lit(1)).as("n"))
                    .collect()
                    .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
                    .toSeq
                }
                prevV.foreach { pv =>
                  val pvDir = VersionedDir.versionPath(docsRoot, pv)
                  if (!relFs.exists(new Path(pvDir, SegPool.ManifestName))) {
                    // pre-manifest root (legacy v<N>/seg=K layout, the
                    // byte-copy era): ONE-TIME migration — the whole
                    // legacy version rewrites into the shared pool as
                    // one partitioned job (removed ids filtered on the
                    // way), and this version onward is pure manifest
                    // indirection. O(corpus) once, never again. Legacy
                    // seg names are user-chosen strings, so they move
                    // into an `m`-prefixed namespace: a legacy segment
                    // literally named "1" must not collide with (and be
                    // silently overwritten by) this release's fresh seg
                    // key relBatch="1" in the entries map — fresh keys
                    // are always numeric/dotted, never m-prefixed.
                    val parent = s"_segs/m$relBatch-v$v-$nonce"
                    spark.read.option("mergeSchema", "true").parquet(pvDir)
                      .withColumn("seg",
                        concat(lit("m"), col("seg").cast("string")))
                      .join(removedIds, Seq("doc_id"), "left_anti")
                      .withColumn("segp", col("seg"))
                      .repartition(col("segp"))
                      .write.mode("overwrite").partitionBy("segp")
                      .parquet(s"$docsRoot/$parent")
                    relFs.listStatus(new Path(pvDir)).toSeq
                      .map(_.getPath.getName).filter(_.startsWith("seg="))
                      .map(_.stripPrefix("seg=")).sorted.foreach { k =>
                        val rel = s"$parent/segp=m$k"
                        if (relFs.exists(new Path(s"$docsRoot/$rel")))
                          entries += s"m$k" -> rel
                        rebuilt += s"m$k"
                      }
                    srcRows ++= srcCounts(Seq(s"$docsRoot/$parent"))
                  } else {
                    val manifest = SegPool.readManifest(relFs, pvDir)
                    val (affected, untouched) =
                      manifest.partition { case (seg, _) =>
                        affectedSegs.contains(seg) }
                    if (affected.nonEmpty) {
                      // ONE distributed job rebuilds every affected
                      // segment: rows carry their `seg` column, so a
                      // single anti-join + one partitioned write lands all
                      // rebuilt segs in parallel — a wide retraction (a
                      // whole source GDPR-deleted out of thousands of
                      // segments) costs one shuffle, not one sequential
                      // Spark job per segment. Per-task volume stays
                      // bounded: segments are capped at
                      // GRAFT_RELEASE_SEG_ROWS by fresh-batch
                      // sub-segmentation.
                      val parent = s"_segs/r$relBatch-v$v-$nonce"
                      spark.read.option("mergeSchema", "true")
                        .parquet(affected.map {
                          case (_, rel) => s"$docsRoot/$rel" }: _*)
                        .join(removedIds, Seq("doc_id"), "left_anti")
                        .withColumn("segp", col("seg"))
                        .repartition(col("segp"))
                        .write.mode("overwrite").partitionBy("segp")
                        .parquet(s"$docsRoot/$parent")
                      affected.foreach { case (seg, _) =>
                        val rel = s"$parent/segp=$seg"
                        // a fully-retracted segment writes no partition
                        // dir — it simply leaves the manifest
                        if (relFs.exists(new Path(s"$docsRoot/$rel")))
                          entries += seg -> rel
                        rebuilt += seg
                      }
                      srcRows ++= srcCounts(Seq(s"$docsRoot/$parent"))
                    }
                    untouched.foreach { case (seg, rel) =>
                      entries += seg -> rel // referenced, never read
                      referenced += seg
                    }
                    // carried-forward source counts for the untouched
                    // segs; a previous version that predates the
                    // sidecar pays ONE (seg, source)-pruned scan of its
                    // untouched dirs — the legacy bridge, once
                    val untouchedSet = untouched.map(_._1).toSet
                    SegPool.readSources(relFs, pvDir) match {
                      case Some(rows) =>
                        srcRows ++= rows.filter(r => untouchedSet(r._1))
                      case None =>
                        srcRows ++= srcCounts(untouched.map {
                          case (_, rel) => s"$docsRoot/$rel" })
                    }
                  }
                }
                lastFreezePlan = (rebuilt.result(), referenced.result())
                val freshDirs = (0 until nChunks)
                  .map(i => new Path(s"$curStore/curated/b${chunkBase + i}"))
                  .filter(relFs.exists(_)).map(_.toString)
                if (nNew > 0 && freshDirs.nonEmpty) {
                  // bounded SUB-SEGMENTS: a cold release's fresh seg is
                  // the whole corpus, and segment granularity is the
                  // rebuild granularity — one removed doc must not
                  // rebuild a corpus-sized segment later. Batches above
                  // GRAFT_RELEASE_SEG_ROWS (def 4M rows) split by
                  // doc_id hash into S dirs of one partitioned write;
                  // each sub-seg is its own manifest entry, so a
                  // retraction rebuilds O(removed × seg_rows) bytes.
                  val segRows = env.get("GRAFT_RELEASE_SEG_ROWS")
                    .map(_.toLong).getOrElse(4000000L)
                  val nFresh = // the batch's emitted-docs counter
                    if (env.get("GRAFT_RELEASE_BLOCKS").contains("1"))
                      stageN("4_blocks")
                    else stageN("3_near")
                  val nSub = math.min(512L,
                    math.max(1L, (nFresh + segRows - 1) / segRows)).toInt
                  // no pinned schema: the multimodal extras ride along
                  // (merged across chunk dirs)
                  val freshDocs = spark.read.option("mergeSchema", "true")
                    .parquet(freshDirs: _*)
                  if (nSub == 1) {
                    val dstRel = SegPool.poolRel(relBatch.toString, v, nonce)
                    freshDocs.withColumn("seg", lit(relBatch.toString))
                      .write.mode("overwrite").parquet(s"$docsRoot/$dstRel")
                    // a delta whose every doc the funnel dropped leaves
                    // a dataless dir (just _SUCCESS): register no entry
                    // — a manifest must never reference nothing (the
                    // orphan dir is GC'd) — mirroring the sub-seg and
                    // rebuild arms' existence checks
                    if (SegPool.hasParquet(relFs, s"$docsRoot/$dstRel")) {
                      entries += relBatch.toString -> dstRel
                      srcRows ++= srcCounts(Seq(s"$docsRoot/$dstRel"))
                    }
                  } else {
                    val parent = s"_segs/f$relBatch-v$v-$nonce"
                    freshDocs
                      .withColumn("segp", pmod(hash(col("doc_id")), lit(nSub)))
                      .withColumn("seg",
                        concat_ws(".", lit(relBatch.toString), col("segp")))
                      .repartition(col("segp"))
                      .write.mode("overwrite").partitionBy("segp")
                      .parquet(s"$docsRoot/$parent")
                    (0 until nSub).foreach { p =>
                      val rel = s"$parent/segp=$p"
                      if (relFs.exists(new Path(s"$docsRoot/$rel")))
                        entries += s"$relBatch.$p" -> rel
                    }
                    srcRows ++= srcCounts(Seq(s"$docsRoot/$parent"))
                  }
                }
                if (entries.isEmpty) {
                  // an empty/fully-gated first release, or a release
                  // that retracted every remaining doc: a
                  // schema-carrying empty segment keeps the version
                  // readable
                  val dstRel = SegPool.poolRel("0", v, nonce)
                  spark.range(0).select(col("id").as("doc_id"),
                      lit("").as("source"), lit("").as("text"),
                      lit("0").as("seg"))
                    .write.mode("overwrite").parquet(s"$docsRoot/$dstRel")
                  entries += "0" -> dstRel
                }
                SegPool.writeManifest(relFs, dir, entries.toSeq)
                SegPool.writeSources(relFs, dir, srcRows.result())
                relFs.create(new Path(s"$dir/_SUCCESS"), true).close()
              }, retain = relRetain, stillHeld = relHeld,
                leaseTtlMs = relLeaseMs)
              // gc still INSIDE the verb's lease (and fenced): pool dirs
              // no retained version references — including a displaced
              // attempt's orphaned nonce dirs — must not be reclaimed
              // while racing another publisher's in-flight writes
              if (relHeld()) SegPool.gc(spark, docsRoot)
              published
            }
          }
          val curDocsDir = VersionedDir.versionPath(docsRoot, newV)
          // durable delta ledgers AFTER the publish: a crash in between
          // re-derives the same end state (the seen store suppresses a
          // re-curated delta; its ledger rows land with the retry's
          // batch id). Fenced: ledger dirs are deterministic
          // (processed/b<relBatch>), so a displaced holder must not
          // overwrite the breaker's
          relFence(relHeld, "before the ledger writes")
          if (nNew > 0)
            newIds.withColumn("b", lit(relBatch)).write.mode("overwrite")
              .parquet(s"$curStore/processed/b$relBatch")
          if (nRemoved > 0)
            removedIds.withColumn("b", lit(relBatch)).write.mode("overwrite")
              .parquet(s"$curStore/retracted/b$relBatch")
          // Tombstone-pressure discipline for BOTH synced indexes:
          // pending (uncompacted) retractions widen the BM25 df-cap's
          // slack (stored df − |dead| lower-bounds live df) — past a
          // point NO term prices over the cap and every stopword's
          // corpus-sized posting read is silently re-admitted. So the
          // release verb compacts BY DEFAULT when pending tombstones
          // exceed GRAFT_INDEX_AUTOCOMPACT_REMOVED (default 100000)
          // or GRAFT_INDEX_AUTOCOMPACT_PCT percent of stored docs
          // (default 10); GRAFT_RELEASE_{TEXT,ANN}_COMPACT=1 still
          // forces, =0 disables even the auto trigger. The pending
          // count is exported as graft_index_tombstones_{text,ann}
          // next to the lease counters.
          val acRemoved = env.get("GRAFT_INDEX_AUTOCOMPACT_REMOVED")
            .map(_.toLong).getOrElse(100000L)
          val acPct = env.get("GRAFT_INDEX_AUTOCOMPACT_PCT")
            .map(_.toLong).getOrElse(10L)
          def compactDue(flag: Option[String], pending: Long,
                         stored: Long): Boolean =
            flag.contains("1") || (!flag.contains("0") && pending > 0 &&
              (pending > acRemoved || pending * 100L > acPct * stored))
          // GRAFT_RELEASE_TEXT_INDEX=1: keep the serving-side BM25
          // index (`_text_index` beside `docs/`) in exact sync with
          // CURRENT at O(changed segments) — manifest diff, additions
          // as one addBatch(batchId = version), retractions as
          // tombstones with exact stat adjustment. Runs on the
          // zero-delta path too: that is the CATCH-UP (a release that
          // ran without the flag, or a sync that crashed after the
          // ledgers, is brought current by one diff spanning the gap).
          if (env.get("GRAFT_RELEASE_TEXT_INDEX").contains("1")) {
            relFence(relHeld, "before the text-index sync")
            val tiParts = env.get("GRAFT_TEXT_PARTS").map(_.toInt)
              .getOrElse(64)
            lastIndexSync = Some(staged("text_index") {
              graft.llmops.CorpusIndexSync.sync(
                spark, docsRoot, s"$relOut/_text_index", tiParts,
                // GRAFT_TEXT_POSITIONS=0 seeds a position-free index
                // (the store's _posmode marker rules once built)
                storePositions = !env.get("GRAFT_TEXT_POSITIONS")
                  .contains("0"))
            })
            val tStore =
              new graft.llmops.TextIndexStore(s"$relOut/_text_index", tiParts)
            val tPending = tStore.tombstoneCount(spark)
            // LIVE gauge: evaluated at scrape time over a fresh handle,
            // so the exported pressure tracks deletes landing BETWEEN
            // releases instead of freezing at this verb's reading (the
            // read is the store's memoized metadata-sized count)
            val tiPath = s"$relOut/_text_index"
            graft.llmops.IndexMetrics.gauge("graft_index_tombstones_text") {
              new graft.llmops.TextIndexStore(tiPath, tiParts)
                .tombstoneCount(spark).toDouble
            }
            // explicit =1 forces the full fold-compact; the AUTO
            // pressure trigger runs the SELECTIVE purge instead —
            // only the batches holding dead docs rewrite, the rest of
            // the index stays byte-untouched (TextIndexStore.purge)
            val tFlag = env.get("GRAFT_RELEASE_TEXT_COMPACT")
            if (compactDue(tFlag, tPending, tStore.stats(spark)._1)) {
              if (tFlag.contains("1")) staged("text_compact")(tStore.compact(spark))
              else staged("text_purge")(tStore.purge(spark))
            }
            // Tiered batch fold — when the per-release sync batches
            // exceed the bound, merge the SMALLEST down to it (large
            // batches stay byte-untouched), so serve planning stays
            // bounded across years of nightly releases without
            // compact's full rewrite. DEFAULT-ON with opt-out, like the
            // auto-purge: GRAFT_TEXT_FOLD_BATCHES=N forces the bound,
            // =0 opts out, UNSET folds once the dir count exceeds
            // GRAFT_TEXT_FOLD_AUTO_MAX (default 32) — a year of nightly
            // releases on default config must not leave ~365 batch dirs
            // in every serve plan
            textFoldBound(env, tStore.batchCount(spark))
              .foreach(n => staged("text_fold")(tStore.fold(spark, n)))
          }
          // GRAFT_RELEASE_ANN_INDEX=1: the vector-side sibling — keep
          // the ANN serving index (`_ann_index` beside `docs/`) in sync
          // with CURRENT at O(changed segments) over the embedding
          // column the funnel carries (GRAFT_ANN_EMBED_COL def
          // `embedding`, an array<float> riding the multimodal carry).
          // Same catch-up semantics on the zero-delta path; compaction
          // follows the shared auto-trigger above (explicit
          // GRAFT_RELEASE_ANN_COMPACT=1 forces, =0 disables).
          if (env.get("GRAFT_RELEASE_ANN_INDEX").contains("1")) {
            relFence(relHeld, "before the ann-index sync")
            lastAnnSync = Some(staged("ann_index") {
              graft.llmops.CorpusIndexSync.syncAnn(
                spark, docsRoot, s"$relOut/_ann_index",
                embedCol = env.getOrElse("GRAFT_ANN_EMBED_COL", "embedding"),
                kind = env.getOrElse("GRAFT_ANN_SYNC_KIND", "lsh"),
                nClusters = env.get("GRAFT_ANN_SYNC_CLUSTERS").map(_.toInt)
                  .getOrElse(graft.llmops.Similarity.DefaultIvfClusters))
            })
            val aStore = new graft.llmops.AnnIndexStore(s"$relOut/_ann_index")
            val aPending = aStore.tombstoneCount(spark)
            // LIVE gauge, as on the text side
            val annPath = s"$relOut/_ann_index"
            graft.llmops.IndexMetrics.gauge("graft_index_tombstones_ann") {
              new graft.llmops.AnnIndexStore(annPath)
                .tombstoneCount(spark).toDouble
            }
            // same split as the text side: explicit =1 → full
            // fold-compact, auto pressure trigger → selective purge
            // (only the dirs holding dead rows rewrite)
            val aFlag = env.get("GRAFT_RELEASE_ANN_COMPACT")
            if (compactDue(aFlag, aPending, aStore.vectorCount(spark))) {
              if (aFlag.contains("1")) staged("ann_compact")(aStore.compact(spark))
              else staged("ann_purge")(aStore.purge(spark))
            }
            // drift-gated IVF rebuild inside the nightly release (same
            // knob as the ann-index verb; no-op for lsh-kind stores)
            env.get("GRAFT_ANN_REBUILD_IF_DRIFT").map(_.toDouble)
              .foreach { ratio =>
                val st = new graft.llmops.AnnIndexStore(s"$relOut/_ann_index")
                if (st.driftExceeds(spark, ratio)) st.rebuildIvf(spark)
              }
          }
          // final corpus size + per-source rows from the SOURCES
          // sidecar the freeze wrote next to the manifest — one driver
          // metadata read, zero jobs, zero corpus bytes. A version that
          // predates the sidecar (legacy root, or a zero-delta release
          // resolving an old version) falls back to parquet footers +
          // one pruned column scan.
          val srcSidecar = SegPool.readSources(relFs, curDocsDir)
          val nFinal = srcSidecar.map(_.map(_._3).sum)
            .getOrElse(SegPool.rowCount(spark, curDocsDir))
          // token side: delegate to emit-shards (incremental manifest,
          // changed-shards-only re-tokenization — reuse, not re-impl).
          // Fenced first: shards/ and _report/ paths are deterministic,
          // and re-tokenization is the verb's longest stage — a
          // displaced holder must not race its breaker there
          relFence(relHeld, "before emit-shards")
          val emitLines = staged("emit_shards") {
            maintenance(spark, env ++ Map(
              "GRAFT_MAINTENANCE" -> "emit-shards",
              "GRAFT_EMIT_DOCS" -> curDocsDir,
              "GRAFT_EMIT_OUT" -> s"$relOut/shards"))
          }
          lastReleaseStageSecs = stageSecs.toSeq
          val relId = graft.llmops.ShardManifest
            .latestRelease(spark, s"$relOut/shards").map(_._1).getOrElse(0)
          // per-release funnel report: raw/new/removed from the ids pass,
          // stage survivors from applyBatch's counters, final +
          // per-source folded down from the SOURCES sidecar — the report
          // stage launches NO job over the assembled corpus (legacy
          // pre-sidecar versions keep the one pruned column scan).
          // Fenced like every deterministic-path write stage.
          relFence(relHeld, "before the report write")
          locally {
            import spark.implicits._
            val perSource = srcSidecar match {
              case Some(rows) =>
                lastReportScan = false
                rows.groupBy(_._2).toSeq.map { case (src, rs) =>
                  ("final", src, rs.map(_._3).sum) }.sortBy(_._2)
              case None =>
                lastReportScan = true
                SegPool.readDocs(spark, curDocsDir).groupBy("source")
                  .agg(count(lit(1)).as("n")).collect()
                  .map(r => ("final", r.getString(0), r.getLong(1))).toSeq
            }
            val modelStage =
              if (env.contains("GRAFT_RELEASE_MODEL"))
                Seq(("model", "*", stageN("1a_model"))) else Seq.empty
            val bloomStage =
              if (env.contains("GRAFT_RELEASE_BLOOM"))
                Seq(("bloom", "*", stageN("1b_bloom"))) else Seq.empty
            val blocksStage =
              if (env.get("GRAFT_RELEASE_BLOCKS").contains("1"))
                Seq(("blocks", "*", stageN("4_blocks"))) else Seq.empty
            val stages = Seq(
              ("raw", "*", nRaw), ("new", "*", nNew),
              ("removed", "*", nRemoved),
              ("gated", "*", stageN("1_gate"))) ++ modelStage ++ bloomStage ++
              Seq(("exact_dedup", "*", stageN("2_exact")),
                ("near_dedup", "*", stageN("3_near"))) ++ blocksStage ++
              Seq(("final", "*", nFinal)) ++ perSource
            // release id rides the partition dir (release=N), not a data
            // column — a parent-dir read recovers it as the partition col
            val repDir = s"$relOut/_report/release=$relId"
            if (relFs.exists(new Path(repDir)))
              relFs.delete(new Path(repDir), true)
            stages.toDF("stage", "source", "n_docs")
              .coalesce(1).write.parquet(repDir)
          }
          Seq(s"release $relId: raw=$nRaw new=$nNew removed=$nRemoved " +
            s"gated=${stageN("1_gate")}" +
            (if (env.contains("GRAFT_RELEASE_MODEL"))
              s" model=${stageN("1a_model")}" else "") +
            (if (env.contains("GRAFT_RELEASE_BLOOM"))
              s" bloom=${stageN("1b_bloom")}" else "") +
            s" exact=${stageN("2_exact")} near=${stageN("3_near")}" +
            (if (env.get("GRAFT_RELEASE_BLOCKS").contains("1"))
              s" blocks=${stageN("4_blocks")}" else "") +
            s" final=$nFinal -> $curDocsDir",
            "release stages: " + stageSecs.map { case (s, t) =>
              f"$s=$t%.1fs" }.mkString(" ") +
              (if (skipPublish) " (zero delta: no new docs version)" else "")
          ) ++ lastIndexSync.filter(_ =>
            env.get("GRAFT_RELEASE_TEXT_INDEX").contains("1")).map(r =>
            s"text-index sync: ${r.mode} v${r.from.getOrElse(-1L)}->" +
              s"v${r.to} +${r.added} -${r.removed} " +
              s"(${r.segsSkipped} segs untouched)").toSeq ++
          lastAnnSync.filter(_ =>
            env.get("GRAFT_RELEASE_ANN_INDEX").contains("1")).map(r =>
            s"ann-index sync: ${r.mode} v${r.from.getOrElse(-1L)}->" +
              s"v${r.to} +${r.added} -${r.removed} " +
              s"(${r.segsSkipped} segs untouched)").toSeq ++ emitLines
        }
      case "agg-view-bootstrap" =>
        // declare a view over ALREADY-replicated tables: initial state
        // from the replica snapshots, then the streaming chain
        // maintains it incrementally (run offline, like
        // project-bootstrap). Aggregate views seed from one snapshot;
        // join/star views seed through their sink's rebuild — the same
        // broadcast-join chain the any-dim-change recovery runs.
        val views = parseAggViews(env)
        val jviews = parseJoinViews(env)
        val sviews = parseStarViews(env)
        require(views.nonEmpty || jviews.nonEmpty || sviews.nonEmpty,
          "GRAFT_AGG_VIEWS, GRAFT_JOIN_VIEWS or GRAFT_STAR_VIEWS is " +
            "required for agg-view-bootstrap")
        def snapOf(table: String) =
          new graft.sinks.ParquetReplicaSink(
            s"$whRoot/$table", keysFor(table), buckets).snapshot(spark)
        views.map { v =>
          v.sink(whRoot).bootstrap(spark, snapOf(v.table))
          val groups = v.sink(whRoot).read(spark).count()
          s"agg-view-bootstrap ${v.table}/${v.name}: $groups live groups"
        } ++ jviews.map { jv =>
          jv.sink(whRoot).rebuild(spark, snapOf(jv.factTable),
            snapOf(jv.dimTable))
          val groups = jv.sink(whRoot).read(spark).count()
          s"join-view-bootstrap ${jv.factTable}~${jv.dimTable}/${jv.name}: " +
            s"$groups live groups"
        } ++ sviews.map { sv =>
          sv.sink(whRoot).rebuild(spark, snapOf(sv.factTable),
            sv.dims.map(d => d.dimTable -> snapOf(d.dimTable)).toMap)
          val groups = sv.sink(whRoot).read(spark).count()
          s"star-view-bootstrap ${sv.factTable}/${sv.name}: " +
            s"$groups live groups"
        }
      case "history-bootstrap" =>
        // declare SCD2 history over an ALREADY-replicated table: seed
        // one open version per replica row at the snapshot's
        // replication position (GRAFT_HISTORY_BOOTSTRAP_LSN), then the
        // streaming chain appends (run offline, like project-bootstrap)
        val declared = parseHistoryTables(env)
        require(declared.nonEmpty,
          "GRAFT_HISTORY_TABLES is required for history-bootstrap")
        val bootLsn = env.getOrElse("GRAFT_HISTORY_BOOTSTRAP_LSN",
          throw new IllegalArgumentException(
            "GRAFT_HISTORY_BOOTSTRAP_LSN (the snapshot's replication " +
              "position) is required for history-bootstrap")).toLong
        declared.map { case (table, hkeys) =>
          val keys = if (hkeys.nonEmpty) hkeys else keysFor(table)
          val base = new graft.sinks.ParquetReplicaSink(
            s"$whRoot/$table", keys, buckets)
          val hist = new graft.sinks.HistorySink(
            s"$whRoot/_history/$table", keys, buckets)
          hist.bootstrap(spark, base.snapshot(spark), bootLsn)
          val seeded = hist.history(spark).count()
          s"history-bootstrap $table: $seeded versions seeded at lsn $bootLsn"
        }
      case "project-bootstrap" =>
        val defs = parseProjections(env, buckets)
        require(defs.nonEmpty,
          "GRAFT_PROJECTIONS is required for project-bootstrap")
        defs.map { pd =>
          val base = new graft.sinks.ParquetReplicaSink(
            s"$whRoot/${pd.table}", pd.primaryKey, buckets)
          pd.sink(whRoot).bootstrap(spark, base.snapshot(spark))
          s"project-bootstrap ${pd.table}:${pd.indexKey}"
        }
      case "project-check" =>
        // divergence detector: a projection must hold exactly the base
        // replica's rows (one per key). The insert contract (a 'c' for a
        // live key strands the old projected row while the base MERGE
        // self-heals) is the one way they can silently drift apart —
        // row-count parity is the cheap tripwire that notices it, and
        // project-bootstrap is the documented repair
        val defs = parseProjections(env, buckets)
        require(defs.nonEmpty, "GRAFT_PROJECTIONS is required for project-check")
        defs.map { pd =>
          val base = new graft.sinks.ParquetReplicaSink(
            s"$whRoot/${pd.table}", pd.primaryKey, buckets)
            .snapshot(spark).count()
          val proj = spark.read.parquet(pd.path(whRoot)).count()
          val verdict =
            if (base == proj) "OK" else "DIVERGED (run project-bootstrap)"
          s"project-check ${pd.table}:${pd.indexKey}: base=$base proj=$proj $verdict"
        }
      case v =>
        throw new IllegalArgumentException(s"unknown maintenance verb: $v")
    }
  }

  /** Drain and release everything (idempotent): capture first (final
    * standby status + CopyDone), then the query's in-flight epoch, then
    * the metrics server. */
  def shutdown(w: Wiring): Unit = {
    try {
      w.capture.foreach(_.stop())
      w.captureThread.foreach(_.join(30000))
    } finally {
      try w.query.stop() finally {
        w.listener.markDestinationsDisconnected()
        w.metrics.foreach(_.stop())
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-cdc")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    if (sys.env.contains("GRAFT_MAINTENANCE")) {
      // offline maintenance run: verbs, summary, exit — never a query
      maintenance(spark, sys.env).foreach(println)
      spark.stop()
      return
    }
    val w = build(spark, GraftConfig.fromEnv(sys.env), sys.env)
    // SIGTERM/SIGINT → drain in-flight epoch, final flush, clean exit
    Runtime.getRuntime.addShutdownHook(new Thread(() => shutdown(w)))
    w.query.awaitTermination()
  }
}
