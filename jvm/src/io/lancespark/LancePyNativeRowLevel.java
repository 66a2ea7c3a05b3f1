/*
 * Catalyst-planned UPDATE / MERGE INTO / complex-predicate DELETE on
 * NATIVE (binary-manifest) `.lance` tables through the JVM catalog —
 * MERGE-ON-READ deltas via SupportsDelta, bridged to the Python
 * committer.
 *
 * Reference parity: the reference plans every row-level statement
 * in-engine as DELETE_ROW_AND_INSERT_ROW (LanceMetadata.java:1116-1271;
 * LanceMergeSink.java:49-204). Spark's native shape for that paradigm is
 * SupportsDelta with representUpdateAsDeleteAndInsert():
 * RewriteUpdateTable / RewriteMergeIntoTable / RewriteDeleteFromTable
 * produce a WriteDelta plan whose scan is the PYTHON source's native
 * page reader (filter pushdown + zone-map fragment pruning apply; the
 * `row_address` option serves the 64-bit row identity,
 * fragment_id << 32 | row_index, RowAddress.java:22-43), and each
 * touched row reaches a DeltaWriter as delete($addr) / insert(row).
 *
 * Division of labor (the JVM cannot encode native v1/v2 pages):
 *   - Executors stage the delta with the SAME machinery as the
 *     own-format row-level write (LanceJvmRowLevel.MorDeltaWriterFactory):
 *     deletes to per-task address files (8 B/row), inserts to per-task
 *     parquet — O(changed rows), untouched rows never flow.
 *   - The driver concatenates the committed address files, then runs ONE
 *     Python-source write (`commit_mode=delta`): insert rows re-encode as
 *     native fragments EXECUTOR-side (spark.read.parquet over the staged
 *     files is distributed) and LanceNativeDeltaWriter commits deletes +
 *     inserts as ONE MoR manifest version — DV union-before-apply,
 *     fully-deleted-fragment drop, max_fragment_id watermark, and
 *     conflict rebase all live in the one Python committer.
 *
 * Simple-predicate DELETE still optimizes down to SupportsDeleteV2's
 * metadata path (LancePyNativeTable.deleteWhere) — this class only
 * carries the statements that genuinely need row-level rewrites.
 */
package io.lancespark;

import java.io.BufferedInputStream;
import java.io.BufferedOutputStream;
import java.io.FileInputStream;
import java.io.FileOutputStream;
import java.io.IOException;
import java.nio.file.Files;
import java.nio.file.Path;
import java.nio.file.Paths;
import java.util.ArrayList;
import java.util.HashSet;
import java.util.TreeSet;
import java.util.UUID;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.classic.SparkSession;
import org.apache.spark.sql.connector.expressions.NamedReference;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.DeltaBatchWrite;
import org.apache.spark.sql.connector.write.DeltaWrite;
import org.apache.spark.sql.connector.write.DeltaWriteBuilder;
import org.apache.spark.sql.connector.write.DeltaWriterFactory;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.PhysicalWriteInfo;
import org.apache.spark.sql.connector.write.RowLevelOperationInfo;
import org.apache.spark.sql.connector.write.SupportsDelta;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

final class LancePyNativeRowLevel implements SupportsDelta {

  static final String ROW_ADDRESS_COL = "_row_address";

  private final LancePyNativeTable table;
  private final Command command;

  LancePyNativeRowLevel(LancePyNativeTable table, RowLevelOperationInfo info) {
    this.table = table;
    this.command = info.command();
  }

  @Override
  public Command command() {
    return command;
  }

  @Override
  public NamedReference[] rowId() {
    // FieldReference.apply(Seq) — NOT Expressions.column/FieldReference
    // .apply(String), which PARSE the name (LanceJvmRowLevel precedent)
    return new NamedReference[] {
        org.apache.spark.sql.connector.expressions.FieldReference.apply(
            scala.jdk.javaapi.CollectionConverters.asScala(
                java.util.List.of(ROW_ADDRESS_COL)).toSeq())};
  }

  @Override
  public boolean representUpdateAsDeleteAndInsert() {
    // the reference's DELETE_ROW_AND_INSERT_ROW paradigm
    return true;
  }

  @Override
  public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
    // a FRESH Python table loaded with row_address=true: its scan schema
    // carries the rowId column; pushed filters reach the native reader
    return table.rowLevelScanBuilder(options);
  }

  @Override
  public DeltaWriteBuilder newWriteBuilder(LogicalWriteInfo info) {
    return new DeltaWriteBuilder() {
      @Override
      public DeltaWrite build() {
        // delete-only statements (DELETE, delete-only MERGE) arrive with
        // an EMPTY write schema — the Python committer still validates
        // against the table's columns, so carry both
        return new NativeDeltaWrite(table.path(), info.schema(), table.schema());
      }
    };
  }

  @Override
  public String description() {
    return "lance-native-mor-" + command + "(" + table.name() + ")";
  }

  /** Executors stage per-task delete-address files and insert parquet;
   *  the driver bridges both into ONE Python-committed native version. */
  static final class NativeDeltaWrite implements DeltaWrite, DeltaBatchWrite {
    private final String datasetPath;
    private final StructType schema;
    private final StructType tableSchema;
    private final Path stagingDir;

    NativeDeltaWrite(String datasetPath, StructType schema, StructType tableSchema) {
      this.datasetPath = datasetPath;
      this.schema = schema;
      this.tableSchema = tableSchema;
      // dot-prefixed root-level dir: invisible to scans and native vacuum
      this.stagingDir =
          Paths.get(datasetPath).resolve(".stage-delta-" + UUID.randomUUID());
    }

    @Override
    public DeltaBatchWrite toBatch() {
      return this;
    }

    @Override
    public DeltaWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
      return LanceJvmRowLevel.newWriterFactory(stagingDir, schema);
    }

    @Override
    public void commit(WriterCommitMessage[] messages) {
      // ONLY files named by successful task commits are eligible;
      // orphans from failed/speculative attempts are purged, never read
      HashSet<String> insertFiles = new HashSet<>();
      HashSet<String> deleteFiles = new HashSet<>();
      for (WriterCommitMessage m : messages) {
        if (m == null) {
          continue;
        }
        for (String f : LanceJvmRowLevel.messageFiles(m, "insertFiles")) {
          insertFiles.add(f);
        }
        for (String f : LanceJvmRowLevel.messageFiles(m, "deleteFiles")) {
          deleteFiles.add(f);
        }
      }
      try {
        purgeOrphans(insertFiles, deleteFiles);
      } catch (IOException e) {
        throw new RuntimeException("purging staging orphans failed", e);
      }
      if (insertFiles.isEmpty() && deleteFiles.isEmpty()) {
        cleanup(); // statement touched no rows: no Python job, no version
        return;
      }

      // concatenate the per-task address files (raw big-endian longs)
      // into the sidecar LanceNativeDeltaWriter reads; the Python commit
      // enforces the 10M bound and the per-fragment grouping
      Path deletesBin = stagingDir.resolve("deletes.bin");
      try (var out = new BufferedOutputStream(
          new FileOutputStream(deletesBin.toFile()))) {
        byte[] buf = new byte[1 << 16];
        for (String f : new TreeSet<>(deleteFiles)) {
          try (var in = new BufferedInputStream(new FileInputStream(f))) {
            int n;
            while ((n = in.read(buf)) > 0) {
              out.write(buf, 0, n);
            }
          }
        }
      } catch (IOException e) {
        cleanup();
        throw new RuntimeException("staging delta delete addresses failed", e);
      }

      try {
        SparkSession spark = SparkSession.active();
        Dataset<Row> inserts = insertFiles.isEmpty()
            ? spark.createDataFrame(new ArrayList<Row>(), tableSchema)
            : spark.read().schema(schema)
                .parquet(new TreeSet<>(insertFiles).toArray(new String[0]));
        inserts.write().format("lance").mode("append")
            .option("path", datasetPath)
            .option("commit_mode", "delta")
            .option("delete_addresses_file", deletesBin.toString())
            .save();
      } finally {
        cleanup();
      }
    }

    @Override
    public void abort(WriterCommitMessage[] messages) {
      cleanup();
    }

    /** Deletes every staging-dir entry NOT named by a commit message. */
    private void purgeOrphans(HashSet<String> insertFiles,
        HashSet<String> deleteFiles) throws IOException {
      if (!Files.isDirectory(stagingDir)) {
        return;
      }
      try (var s = Files.newDirectoryStream(stagingDir)) {
        for (Path p : s) {
          String abs = p.toString();
          if (!insertFiles.contains(abs) && !deleteFiles.contains(abs)) {
            Files.deleteIfExists(p);
          }
        }
      }
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
        // best-effort; the dot-prefixed dir is invisible to scans/vacuum
      }
    }
  }
}
