/*
 * Native SQL UPDATE / MERGE INTO through the JVM catalog
 * (SupportsRowLevelOperations, group-based COPY-ON-WRITE).
 *
 * Reference surface: LanceMetadata.java:1116-1271 (beginMerge/finishMerge,
 * row-level change SQL) and docs/src/operations/dml/merge.md.  Spark's
 * RewriteUpdateTable / RewriteMergeIntoTable rewrite the statement into a
 * ReplaceData plan over this operation: the SCAN is the table's normal
 * DV-aware vectorized scan (LanceJvmTable.newScanBuilder), Spark computes
 * the post-image rows, and the WRITE stages parquet fragments executor-side
 * (Spark's own ParquetWriteSupport — the same row->parquet encoder the
 * built-in writer uses) and commits ONE manifest that replaces the table
 * content, through the shared hard-link protocol.
 *
 * Scale/semantics notes:
 *   - COPY-ON-WRITE: an UPDATE/MERGE rewrites the table (no runtime group
 *     filtering is implemented, so every fragment is a candidate group).
 *     Correct first; selective MoR updates remain the Python committer's
 *     capability (operators/dml.py), exactly like the reference keeps both
 *     paths.  DELETE never lands here — SupportsDeleteV2 handles it with
 *     MoR deletion vectors (LanceJvmDelete).
 *   - Conflicts: the commit refuses when the table moved past the snapshot
 *     the statement planned against (same stance as INSERT OVERWRITE — a
 *     replace cannot retry through a lost snapshot).
 */
package io.lancespark;

import java.io.IOException;
import java.nio.file.Files;
import java.nio.file.Path;
import java.nio.file.Paths;
import java.util.ArrayList;
import java.util.List;
import java.util.UUID;

import com.fasterxml.jackson.databind.JsonNode;
import com.fasterxml.jackson.databind.ObjectMapper;
import com.fasterxml.jackson.databind.node.ArrayNode;
import com.fasterxml.jackson.databind.node.ObjectNode;

import org.apache.hadoop.conf.Configuration;
import org.apache.parquet.hadoop.ParquetWriter;
import org.apache.parquet.hadoop.api.WriteSupport;
import org.apache.parquet.hadoop.metadata.CompressionCodecName;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.BatchWrite;
import org.apache.spark.sql.connector.write.DataWriter;
import org.apache.spark.sql.connector.write.DataWriterFactory;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.PhysicalWriteInfo;
import org.apache.spark.sql.connector.write.RowLevelOperation;
import org.apache.spark.sql.connector.write.RowLevelOperationInfo;
import org.apache.spark.sql.connector.write.Write;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

final class LanceJvmRowLevel implements RowLevelOperation {

  private static final ObjectMapper MAPPER = new ObjectMapper();

  private final LanceJvmTable table;
  private final Command command;

  LanceJvmRowLevel(LanceJvmTable table, RowLevelOperationInfo info) {
    this.table = table;
    this.command = info.command();
  }

  @Override
  public Command command() {
    return command;
  }

  /** Rewrite-candidate fragment ids after zone-map pruning; null = every
   *  fragment is a candidate (no usable filters were offered). */
  private java.util.LinkedHashSet<Long> candidateIds;

  java.util.Set<Long> candidateIds() {
    return candidateIds;
  }

  @Override
  public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
    // Spark offers the statement's condition to this builder purely as a
    // GROUP-granularity hint (the ReplaceData plan has no Filter above the
    // scan — it CASE-WHENs every scanned row), so filters here may prune
    // whole fragments via manifest zone-map stats but must NEVER reach the
    // parquet delegate: row-group skipping inside a kept fragment would
    // silently drop its non-matching rows from the replacement. The commit
    // then replaces exactly the scanned fragments and carries the pruned
    // ones over untouched — the Iceberg copy-on-write file contract.
    return new CowScanBuilder(options);
  }

  final class CowScanBuilder
      implements org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns,
      org.apache.spark.sql.connector.read.SupportsPushDownFilters {
    private final CaseInsensitiveStringMap options;
    private StructType required;

    CowScanBuilder(CaseInsensitiveStringMap options) {
      this.options = options;
    }

    @Override
    public org.apache.spark.sql.sources.Filter[] pushFilters(
        org.apache.spark.sql.sources.Filter[] filters) {
      java.util.LinkedHashSet<Long> ids = new java.util.LinkedHashSet<>();
      for (JsonNode frag : table.manifestJson().get("fragments")) {
        boolean admit = true;
        for (org.apache.spark.sql.sources.Filter f : filters) {
          if (!fragmentAdmits(frag, f)) {
            admit = false;
            break;
          }
        }
        if (admit) {
          ids.add(frag.get("id").asLong());
        }
      }
      candidateIds = ids;
      return filters; // ALL residual — nothing is applied at row level
    }

    @Override
    public org.apache.spark.sql.sources.Filter[] pushedFilters() {
      return new org.apache.spark.sql.sources.Filter[0];
    }

    @Override
    public void pruneColumns(StructType requiredSchema) {
      required = requiredSchema;
    }

    @Override
    public org.apache.spark.sql.connector.read.Scan build() {
      ScanBuilder inner = table.newScanBuilderFor(options, candidateIds);
      if (required != null
          && inner instanceof org.apache.spark.sql.connector.read
              .SupportsPushDownRequiredColumns cols) {
        cols.pruneColumns(required);
      }
      return inner.build();
    }
  }

  /** Zone-map admission: can any row of the fragment satisfy the filter?
   *  Conservative — admit on any uncertainty (no stats, unknown filter
   *  shape, incomparable types). Mirrors the Python reader's _stats_admit
   *  (sources/lance_datasource.py). */
  static boolean fragmentAdmits(JsonNode frag, Object filter) {
    JsonNode stats = frag.get("stats");
    long physicalRows = frag.path("physical_rows").asLong(Long.MAX_VALUE);
    if (filter instanceof org.apache.spark.sql.sources.And a) {
      return fragmentAdmits(frag, a.left()) && fragmentAdmits(frag, a.right());
    }
    if (filter instanceof org.apache.spark.sql.sources.Or o) {
      return fragmentAdmits(frag, o.left()) || fragmentAdmits(frag, o.right());
    }
    if (stats == null || stats.isNull()) {
      return true;
    }
    if (filter instanceof org.apache.spark.sql.sources.IsNull n) {
      JsonNode s = stats.get(n.attribute());
      return s == null || s.path("nulls").asLong(1) > 0;
    }
    if (filter instanceof org.apache.spark.sql.sources.IsNotNull n) {
      JsonNode s = stats.get(n.attribute());
      return s == null || s.path("nulls").asLong(0) < physicalRows;
    }
    if (filter instanceof org.apache.spark.sql.sources.Not not) {
      if (not.child() instanceof org.apache.spark.sql.sources.EqualTo eq) {
        JsonNode s = stats.get(eq.attribute());
        if (s == null) {
          return true;
        }
        Integer mnv = cmp(s.get("min"), eq.value());
        Integer mxv = cmp(s.get("max"), eq.value());
        if (mnv == null || mxv == null) {
          return true;
        }
        // every row equals v and none are null -> nothing satisfies <>
        return !(mnv == 0 && mxv == 0 && s.path("nulls").asLong(1) == 0);
      }
      return true;
    }
    String attr;
    Object value;
    int kind; // 0 '=', 1 '>', 2 '>=', 3 '<', 4 '<='
    if (filter instanceof org.apache.spark.sql.sources.EqualTo f) {
      attr = f.attribute(); value = f.value(); kind = 0;
    } else if (filter instanceof org.apache.spark.sql.sources.GreaterThan f) {
      attr = f.attribute(); value = f.value(); kind = 1;
    } else if (filter instanceof org.apache.spark.sql.sources.GreaterThanOrEqual f) {
      attr = f.attribute(); value = f.value(); kind = 2;
    } else if (filter instanceof org.apache.spark.sql.sources.LessThan f) {
      attr = f.attribute(); value = f.value(); kind = 3;
    } else if (filter instanceof org.apache.spark.sql.sources.LessThanOrEqual f) {
      attr = f.attribute(); value = f.value(); kind = 4;
    } else if (filter instanceof org.apache.spark.sql.sources.In f) {
      JsonNode s = stats.get(f.attribute());
      if (s == null) {
        return true;
      }
      for (Object v : f.values()) {
        Integer lo = cmp(s.get("min"), v);
        Integer hi = cmp(s.get("max"), v);
        if (lo == null || hi == null) {
          return true; // incomparable value -> admit
        }
        if (lo <= 0 && hi >= 0) {
          return true; // min <= v <= max
        }
      }
      return false;
    } else {
      return true; // unknown shape -> conservative admit
    }
    JsonNode s = stats.get(attr);
    if (s == null) {
      return true;
    }
    Integer lo = cmp(s.get("min"), value); // sign of (min - v)
    Integer hi = cmp(s.get("max"), value); // sign of (max - v)
    if (lo == null || hi == null) {
      return true;
    }
    switch (kind) {
      case 0: return lo <= 0 && hi >= 0; // min <= v <= max
      case 1: return hi > 0;             // max > v
      case 2: return hi >= 0;            // max >= v
      case 3: return lo < 0;             // min < v
      default: return lo <= 0;           // min <= v
    }
  }

  /** signum(statValue - filterValue), or null when incomparable. Only
   *  number-vs-number (boolean excluded) and string-vs-string order is
   *  trusted — everything else admits. */
  private static Integer cmp(JsonNode stat, Object value) {
    if (stat == null || stat.isNull() || value == null) {
      return null;
    }
    if (stat.isNumber() && value instanceof Number
        && !(value instanceof Boolean)) {
      return Integer.valueOf(new java.math.BigDecimal(stat.asText())
          .compareTo(new java.math.BigDecimal(value.toString())));
    }
    if (stat.isTextual() && value instanceof String str) {
      return Integer.valueOf(Integer.signum(stat.asText().compareTo(str)));
    }
    return null;
  }

  @Override
  public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
    return new WriteBuilder() {
      @Override
      public Write build() {
        return new CowWrite(table, info.schema(), LanceJvmRowLevel.this);
      }
    };
  }

  @Override
  public String description() {
    return "lance-cow-" + command + "(" + table.name() + ")";
  }

  /** Whole-table copy-on-write replace: executors stage parquet fragments,
   *  the driver commits one replacing manifest. */
  static final class CowWrite implements Write, BatchWrite {
    private final Path tableDir;
    private final long snapshotVersion;
    private final StructType schema;
    private final Path stagingDir;
    private final LanceJvmRowLevel operation;

    CowWrite(LanceJvmTable table, StructType schema, LanceJvmRowLevel operation) {
      this.tableDir = table.dir();
      this.snapshotVersion = table.snapshotVersion();
      this.schema = schema;
      this.operation = operation;
      this.stagingDir =
          tableDir.resolve("data").resolve(".stage-" + UUID.randomUUID());
    }

    @Override
    public BatchWrite toBatch() {
      return this;
    }

    @Override
    public DataWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
      try {
        Files.createDirectories(stagingDir);
      } catch (IOException e) {
        throw new RuntimeException("creating staging dir failed", e);
      }
      // driver-side: capture the session hadoop conf (it carries every
      // spark.sql.* key the parquet schema converter reads) and ship it
      // to executors the same way Spark's own FileWriterFactory does
      org.apache.spark.sql.classic.SparkSession session =
          org.apache.spark.sql.classic.SparkSession.active();
      Configuration conf = session.sessionState().newHadoopConf();
      ParquetWriteSupport.setSchema(schema, conf);
      // the keys ParquetFileFormat.prepareWrite sets explicitly (they
      // are not guaranteed present in newHadoopConf at default values);
      // resolved generically through the SQLConf entries the schema
      // converter reads, so this stays in sync with the session
      org.apache.spark.sql.internal.SQLConf sql = session.sessionState().conf();
      org.apache.spark.internal.config.ConfigEntry<?>[] entries = {
          org.apache.spark.sql.internal.SQLConf.PARQUET_WRITE_LEGACY_FORMAT(),
          org.apache.spark.sql.internal.SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE(),
          org.apache.spark.sql.internal.SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED(),
          org.apache.spark.sql.internal.SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE(),
          org.apache.spark.sql.internal.SQLConf.PARQUET_REBASE_MODE_IN_WRITE(),
          org.apache.spark.sql.internal.SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE(),
      };
      for (org.apache.spark.internal.config.ConfigEntry<?> e : entries) {
        Object v = sql.getConf(e);
        if (v != null) {
          conf.set(e.key(), v.toString());
        }
      }
      return new CowWriterFactory(
          stagingDir.toString(), schema.json(),
          new org.apache.spark.util.SerializableConfiguration(conf));
    }

    @Override
    public void commit(WriterCommitMessage[] messages) {
      long latest = LanceJvmDelete.latestVersion(tableDir);
      if (latest != snapshotVersion) {
        throw new IllegalStateException(
            "copy-on-write conflict: table moved from v" + snapshotVersion
            + " to v" + latest + " during the rewrite; rerun the statement");
      }
      // messages are deliberately NOT inspected: a jar loaded via ADD JAR
      // lives in different classloaders on the write path and the commit
      // path, so casting a custom message class across them fails. The
      // staging dir is this write's private namespace — list it and read
      // authoritative row counts (and sound zone-map stats) from the
      // parquet footers, exactly like the INSERT commit.
      List<String> rels = new ArrayList<>();
      List<Long> rowCounts = new ArrayList<>();
      List<ObjectNode> fragStats = new ArrayList<>();
      Configuration conf = new Configuration();
      try {
        Files.createDirectories(tableDir.resolve("data"));
        List<Path> parts = new ArrayList<>();
        try (var s = Files.newDirectoryStream(stagingDir)) {
          for (Path p : s) {
            if (p.getFileName().toString().endsWith(".parquet")) {
              parts.add(p);
            }
          }
        }
        parts.sort(java.util.Comparator.comparing(Path::toString));
        for (Path p : parts) {
          long rows;
          ObjectNode stats;
          try (org.apache.parquet.hadoop.ParquetFileReader r =
              org.apache.parquet.hadoop.ParquetFileReader.open(
                  org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                      new org.apache.hadoop.fs.Path(p.toString()), conf))) {
            rows = r.getRecordCount();
            stats = LanceJvmWrite.footerStats(r);
          }
          if (rows == 0) {
            continue;
          }
          String rel = "data/" + UUID.randomUUID() + ".parquet";
          Files.move(p, tableDir.resolve(rel));
          rels.add(rel);
          rowCounts.add(rows);
          fragStats.add(stats);
        }
      } catch (IOException e) {
        throw new RuntimeException("staging copy-on-write fragments failed", e);
      }
      java.util.Set<Long> candidatesEarly = operation.candidateIds();
      if (rels.isEmpty() && candidatesEarly != null && candidatesEarly.isEmpty()) {
        // zone maps excluded every fragment and nothing was written: the
        // statement provably changed no rows — skip the no-op version
        cleanup();
        return;
      }
      JsonNode base = readManifest(tableDir, latest);
      ObjectNode next = ((ObjectNode) base).deepCopy();
      next.put("version", latest + 1);
      next.put("operation", "overwrite"); // COW replace == overwrite commit
      next.put("read_version", latest);
      next.put("timestamp_ms", System.currentTimeMillis());
      next.remove("commit_metadata");
      // fragments the zone-map pruning excluded from the rewrite scan were
      // never read — carry them over UNCHANGED (ids, DVs, stats intact);
      // candidates == null means no usable filters: full replace
      java.util.Set<Long> candidates = operation.candidateIds();
      ArrayNode frags = MAPPER.createArrayNode();
      long id = -1;
      for (JsonNode frag : base.get("fragments")) {
        long fid = frag.get("id").asLong();
        id = Math.max(id, fid);
        if (candidates != null && !candidates.contains(fid)) {
          frags.add(frag.deepCopy());
        }
      }
      for (int i = 0; i < rels.size(); i++) {
        id++;
        ObjectNode f = MAPPER.createObjectNode();
        f.put("id", id);
        f.put("path", rels.get(i));
        f.put("physical_rows", rowCounts.get(i));
        f.set("deletion", MAPPER.nullNode());
        if (fragStats.get(i) != null && fragStats.get(i).size() > 0) {
          f.set("stats", fragStats.get(i));
        }
        frags.add(f);
      }
      next.set("fragments", frags);
      next.put("max_fragment_id", id);
      LanceJvmDelete.commitManifest(tableDir, latest + 1, next);
      cleanup();
    }

    @Override
    public void abort(WriterCommitMessage[] messages) {
      cleanup();
    }

    private void cleanup() {
      try {
        if (Files.isDirectory(stagingDir)) {
          try (var s = Files.newDirectoryStream(stagingDir)) {
            for (Path p : s) {
              Files.deleteIfExists(p);
            }
          }
          Files.deleteIfExists(stagingDir);
        }
      } catch (IOException ignored) {
        // best-effort staging cleanup; vacuum reaps aged .stage-* dirs
      }
    }

    private static JsonNode readManifest(Path tableDir, long version) {
      try {
        return MAPPER.readTree(Files.readAllBytes(
            tableDir.resolve("_versions").resolve(version + ".manifest.json")));
      } catch (IOException e) {
        throw new RuntimeException("reading manifest v" + version + " failed", e);
      }
    }
  }

  static final class CowCommitMessage implements WriterCommitMessage {
    final String stagedFile;
    final long rows;

    CowCommitMessage(String stagedFile, long rows) {
      this.stagedFile = stagedFile;
      this.rows = rows;
    }
  }

  /** Executor side: each task writes one staged parquet file through
   *  Spark's own ParquetWriteSupport (full type coverage, same encoding
   *  as the built-in vectorized writer's output). */
  static final class CowWriterFactory implements DataWriterFactory {
    private final String stagingDir;
    private final String schemaJson;
    private final org.apache.spark.util.SerializableConfiguration conf;

    CowWriterFactory(String stagingDir, String schemaJson,
        org.apache.spark.util.SerializableConfiguration conf) {
      this.stagingDir = stagingDir;
      this.schemaJson = schemaJson;
      this.conf = conf;
    }

    @Override
    public DataWriter<InternalRow> createWriter(int partitionId, long taskId) {
      StructType schema = (StructType) DataType.fromJson(schemaJson);
      String file = stagingDir + "/part-" + partitionId + "-" + taskId + ".parquet";
      return new DataWriter<>() {
        private ParquetWriter<InternalRow> writer;
        private long rows;

        private void open() throws IOException {
          Configuration c = conf.value();
          writer = new SupportBuilder(
              new org.apache.hadoop.fs.Path(file), new ParquetWriteSupport())
              .withConf(c)
              .withCompressionCodec(CompressionCodecName.SNAPPY)
              .build();
        }

        @Override
        public void write(InternalRow row) throws IOException {
          if (writer == null) {
            open();
          }
          if (row.numFields() == schema.length() + 1) {
            // group-based ReplaceData with no metadata projection hands
            // the writer raw rows led by the __row_operation marker
            // (RowDeltaUtils.OPERATION_COLUMN; ReplaceDataExec falls back
            // to the plain writing task when metadataProjection is None)
            // — every row is a keep/write, so drop the marker ordinal
            row = new LanceDvScan.OrdinalSkipRow(row, 0);
          }
          writer.write(row);
          rows++;
        }

        @Override
        public WriterCommitMessage commit() throws IOException {
          if (writer != null) {
            writer.close();
          }
          return new CowCommitMessage(file, rows);
        }

        @Override
        public void abort() throws IOException {
          if (writer != null) {
            writer.close();
          }
          Files.deleteIfExists(Paths.get(file));
        }

        @Override
        public void close() {}
      };
    }
  }

  static final class SupportBuilder
      extends ParquetWriter.Builder<InternalRow, SupportBuilder> {
    private final WriteSupport<InternalRow> support;

    SupportBuilder(org.apache.hadoop.fs.Path path, WriteSupport<InternalRow> support) {
      super(path);
      this.support = support;
    }

    @Override
    protected SupportBuilder self() {
      return this;
    }

    @Override
    protected WriteSupport<InternalRow> getWriteSupport(Configuration conf) {
      return support;
    }
  }
}
