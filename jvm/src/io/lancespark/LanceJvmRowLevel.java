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

  @Override
  public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
    // the table's normal scan (vectorized, DV-aware) wrapped so that NO
    // data filters reach the parquet delegate: the rewrite must see EVERY
    // row of the table — a pushed condition plus row-group skipping would
    // silently drop the non-matching rows from the replacement (Spark
    // keeps the condition above the scan and CASE-WHENs per row instead).
    // Column pruning is forwarded (it never drops rows).
    ScanBuilder inner = table.newScanBuilder(options);
    return new UnfilteredScanBuilder(inner);
  }

  static final class UnfilteredScanBuilder
      implements org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
    private final ScanBuilder inner;

    UnfilteredScanBuilder(ScanBuilder inner) {
      this.inner = inner;
    }

    @Override
    public void pruneColumns(StructType requiredSchema) {
      if (inner instanceof org.apache.spark.sql.connector.read
          .SupportsPushDownRequiredColumns cols) {
        cols.pruneColumns(requiredSchema);
      }
    }

    @Override
    public org.apache.spark.sql.connector.read.Scan build() {
      return inner.build();
    }
  }

  @Override
  public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
    return new WriteBuilder() {
      @Override
      public Write build() {
        return new CowWrite(table, info.schema());
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

    CowWrite(LanceJvmTable table, StructType schema) {
      this.tableDir = table.dir();
      this.snapshotVersion = table.snapshotVersion();
      this.schema = schema;
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
      JsonNode base = readManifest(tableDir, latest);
      ObjectNode next = ((ObjectNode) base).deepCopy();
      next.put("version", latest + 1);
      next.put("operation", "overwrite"); // COW replace == overwrite commit
      next.put("read_version", latest);
      next.put("timestamp_ms", System.currentTimeMillis());
      next.remove("commit_metadata");
      ArrayNode frags = MAPPER.createArrayNode();
      long id = 0;
      for (int i = 0; i < rels.size(); i++) {
        ObjectNode f = MAPPER.createObjectNode();
        f.put("id", id);
        f.put("path", rels.get(i));
        f.put("physical_rows", rowCounts.get(i));
        f.set("deletion", MAPPER.nullNode());
        if (fragStats.get(i) != null && fragStats.get(i).size() > 0) {
          f.set("stats", fragStats.get(i));
        }
        frags.add(f);
        id++;
      }
      next.set("fragments", frags);
      next.put("max_fragment_id", id - 1);
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
