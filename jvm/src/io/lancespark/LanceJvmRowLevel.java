/*
 * Native SQL UPDATE / MERGE INTO / (complex-predicate) DELETE through the
 * JVM catalog — MERGE-ON-READ deltas via SupportsDelta.
 *
 * Reference parity: the reference plans row-level operations as
 * DELETE_ROW_AND_INSERT_ROW — touched rows become per-fragment deletion
 * vector entries and replacement rows land in NEW fragments
 * (LanceMetadata.java:1116-1133,1175-1271; LanceMergeSink.java:49-204).
 * Spark's native shape for exactly that paradigm is SupportsDelta with
 * representUpdateAsDeleteAndInsert(): RewriteUpdateTable /
 * RewriteMergeIntoTable produce a WriteDelta plan whose scan is the
 * table's normal DV-aware vectorized scan (filters push down — only
 * MATCHED rows flow through a delta plan, so row-group skipping is safe
 * here, unlike the old copy-on-write ReplaceData where it lost rows), and
 * each row reaches the DeltaWriter as delete($row_address) / insert(row).
 *
 * Row identity is the table's $row_address metadata column
 * (fragment_id << 32 | row_index — RowAddress.java:22-43), the same
 * 64-bit address the reference's merge sink keys its deletion buckets by.
 *
 * Scale/semantics notes:
 *   - Write amplification is O(changed rows), not O(admitted fragments):
 *     a 1-row UPDATE on a 1M-row fragment commits one DV entry plus a
 *     1-row fragment — no fragment rewrite (pinned by the smoke's
 *     jvm-mor-write-amplification check). The old COW path rewrote every
 *     zone-map-admitted fragment wholesale.
 *   - Executors stream deletes to staged address files and inserts to
 *     staged parquet; the commit message names ONLY the files that task
 *     attempt actually committed, and the driver moves exactly those —
 *     orphans from failed/speculative attempts in the staging dir are
 *     purged, never committed.
 *   - The driver unions new deletes with existing per-fragment DVs
 *     (LanceMetadata.java:1199-1213 union-before-apply), drops fully
 *     deleted fragments, and commits ONE manifest through the hard-link
 *     protocol shared with the Python committer. Conflict stance: refuse
 *     when the table moved past the planned snapshot.
 *   - Driver delete collection is capped (same 10M bound as
 *     LanceJvmDelete) — a delete that large should be a copy-on-write
 *     rewrite through the Python committer.
 */
package io.lancespark;

import java.io.BufferedInputStream;
import java.io.BufferedOutputStream;
import java.io.DataInputStream;
import java.io.DataOutputStream;
import java.io.EOFException;
import java.io.FileInputStream;
import java.io.FileOutputStream;
import java.io.IOException;
import java.nio.file.Files;
import java.nio.file.Path;
import java.nio.file.Paths;
import java.util.ArrayList;
import java.util.HashMap;
import java.util.HashSet;
import java.util.List;
import java.util.Map;
import java.util.TreeSet;
import java.util.UUID;

import com.fasterxml.jackson.databind.JsonNode;
import com.fasterxml.jackson.databind.ObjectMapper;
import com.fasterxml.jackson.databind.node.ArrayNode;
import com.fasterxml.jackson.databind.node.ObjectNode;

import org.apache.hadoop.conf.Configuration;
import org.apache.parquet.example.data.Group;
import org.apache.parquet.hadoop.ParquetReader;
import org.apache.parquet.hadoop.ParquetWriter;
import org.apache.parquet.hadoop.api.WriteSupport;
import org.apache.parquet.hadoop.example.GroupReadSupport;
import org.apache.parquet.hadoop.metadata.CompressionCodecName;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.connector.expressions.NamedReference;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.DeltaBatchWrite;
import org.apache.spark.sql.connector.write.DeltaWrite;
import org.apache.spark.sql.connector.write.DeltaWriter;
import org.apache.spark.sql.connector.write.DeltaWriterFactory;
import org.apache.spark.sql.connector.write.DeltaWriteBuilder;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.PhysicalWriteInfo;
import org.apache.spark.sql.connector.write.RowLevelOperationInfo;
import org.apache.spark.sql.connector.write.SupportsDelta;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

final class LanceJvmRowLevel implements SupportsDelta {

  private static final ObjectMapper MAPPER = new ObjectMapper();
  /** Mirrors LanceJvmDelete.MAX_COLLECTED_DELETES: beyond this, the
   *  statement should be a copy-on-write rewrite (Python committer). */
  private static final long MAX_COLLECTED_DELETES = 10_000_000L;

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
  public NamedReference[] rowId() {
    // the $row_address metadata column — non-nullable 64-bit row identity,
    // already served by the DV-aware scan (SupportsMetadataColumns)
    // FieldReference.apply(Seq) — NOT Expressions.column/FieldReference
    // .apply(String), which PARSE the name and choke on the '$'
    return new NamedReference[] {
        org.apache.spark.sql.connector.expressions.FieldReference.apply(
            scala.jdk.javaapi.CollectionConverters.asScala(
                java.util.List.of(LanceDvScan.ROW_ADDRESS_COL)).toSeq())};
  }

  @Override
  public boolean representUpdateAsDeleteAndInsert() {
    // the reference's DELETE_ROW_AND_INSERT_ROW paradigm
    // (LanceMergeSink.java:49-204)
    return true;
  }

  @Override
  public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
    // The table's normal DV-aware vectorized scan. Unlike the group-based
    // COW rewrite, a delta plan only consumes rows the statement actually
    // touches, so predicate pushdown (and parquet row-group skipping) is
    // both safe and the point: untouched rows are never read or written.
    return table.newScanBuilder(options);
  }

  @Override
  public DeltaWriteBuilder newWriteBuilder(LogicalWriteInfo info) {
    return new DeltaWriteBuilder() {
      @Override
      public DeltaWrite build() {
        return new MorDeltaWrite(table, info.schema());
      }
    };
  }

  @Override
  public String description() {
    return "lance-mor-" + command + "(" + table.name() + ")";
  }

  /** MoR delta write: executors stage per-task delete-address files and
   *  insert parquet fragments; the driver turns them into per-fragment
   *  DV unions plus appended fragments in ONE manifest commit. */
  static final class MorDeltaWrite implements DeltaWrite, DeltaBatchWrite {
    private final Path tableDir;
    private final long snapshotVersion;
    private final StructType schema;
    private final Path stagingDir;

    MorDeltaWrite(LanceJvmTable table, StructType schema) {
      this.tableDir = table.dir();
      this.snapshotVersion = table.snapshotVersion();
      this.schema = schema;
      this.stagingDir =
          tableDir.resolve("data").resolve(".stage-" + UUID.randomUUID());
    }

    @Override
    public DeltaBatchWrite toBatch() {
      return this;
    }

    @Override
    public DeltaWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
      return newWriterFactory(stagingDir, schema);
    }

    @Override
    public void commit(WriterCommitMessage[] messages) {
      long latest = LanceJvmDelete.latestVersion(tableDir);
      if (latest != snapshotVersion) {
        throw new IllegalStateException(
            "row-level conflict: table moved from v" + snapshotVersion
            + " to v" + latest + " during the statement; rerun it");
      }
      // ONLY files named by successful task commits are eligible; anything
      // else in the staging dir is an orphan from a failed or speculative
      // attempt whose abort never ran — purge it, never commit it
      HashSet<String> insertFiles = new HashSet<>();
      HashSet<String> deleteFiles = new HashSet<>();
      for (WriterCommitMessage m : messages) {
        if (m == null) {
          continue;
        }
        for (String f : messageFiles(m, "insertFiles")) {
          insertFiles.add(f);
        }
        for (String f : messageFiles(m, "deleteFiles")) {
          deleteFiles.add(f);
        }
      }
      try {
        purgeOrphans(insertFiles, deleteFiles);
      } catch (IOException e) {
        throw new RuntimeException("purging staging orphans failed", e);
      }

      // deleted addresses -> per-fragment row-index sets (bounded)
      Map<Long, TreeSet<Long>> byFrag = new HashMap<>();
      long total = 0;
      for (String f : new TreeSet<>(deleteFiles)) {
        try (DataInputStream in = new DataInputStream(
            new BufferedInputStream(new FileInputStream(f)))) {
          while (true) {
            long addr;
            try {
              addr = in.readLong();
            } catch (EOFException eof) {
              break;
            }
            byFrag.computeIfAbsent(addr >>> 32, k -> new TreeSet<>())
                .add(addr & 0xFFFFFFFFL);
            if (++total > MAX_COLLECTED_DELETES) {
              throw new UnsupportedOperationException(
                  "row-level statement deletes > " + MAX_COLLECTED_DELETES
                  + " rows; a change this large should rewrite the table "
                  + "copy-on-write through the Python committer "
                  + "(operators/dml)");
            }
          }
        } catch (IOException e) {
          throw new RuntimeException("reading staged deletes " + f + " failed", e);
        }
      }

      // staged inserts -> new fragments (authoritative row counts and
      // zone-map stats from the parquet footers, like the INSERT commit)
      List<String> rels = new ArrayList<>();
      List<Long> rowCounts = new ArrayList<>();
      List<ObjectNode> fragStats = new ArrayList<>();
      Configuration conf = new Configuration();
      try {
        Files.createDirectories(tableDir.resolve("data"));
        for (String f : new TreeSet<>(insertFiles)) {
          long rows;
          ObjectNode stats;
          try (org.apache.parquet.hadoop.ParquetFileReader r =
              org.apache.parquet.hadoop.ParquetFileReader.open(
                  org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                      new org.apache.hadoop.fs.Path(f), conf))) {
            rows = r.getRecordCount();
            stats = LanceJvmWrite.footerStats(r);
          }
          if (rows == 0) {
            continue;
          }
          String rel = "data/" + UUID.randomUUID() + ".parquet";
          Files.move(Paths.get(f), tableDir.resolve(rel));
          rels.add(rel);
          rowCounts.add(rows);
          fragStats.add(stats);
        }
      } catch (IOException e) {
        throw new RuntimeException("staging delta insert fragments failed", e);
      }

      if (byFrag.isEmpty() && rels.isEmpty()) {
        cleanup(); // statement changed no rows: skip the no-op version
        return;
      }

      JsonNode base = readManifest(tableDir, latest);
      ObjectNode next = ((ObjectNode) base).deepCopy();
      next.put("version", latest + 1);
      next.put("operation", "update");
      next.put("read_version", latest);
      next.put("timestamp_ms", System.currentTimeMillis());
      next.remove("commit_metadata");

      org.apache.spark.sql.classic.SparkSession spark =
          org.apache.spark.sql.classic.SparkSession.active();
      ArrayNode frags = MAPPER.createArrayNode();
      long maxId = -1;
      for (JsonNode frag : base.get("fragments")) {
        long fid = frag.get("id").asLong();
        maxId = Math.max(maxId, fid);
        TreeSet<Long> adds = byFrag.remove(fid);
        if (adds == null) {
          frags.add(frag.deepCopy()); // untouched — ids, DVs, stats intact
          continue;
        }
        TreeSet<Long> merged = new TreeSet<>(adds);
        JsonNode del = frag.get("deletion");
        if (del != null && !del.isNull()) {
          // union-before-apply (LanceMetadata.java:1199-1213)
          readDvRows(tableDir.resolve(del.get("path").asText()).toString(),
              conf, merged);
        }
        long physical = frag.get("physical_rows").asLong();
        if (merged.size() >= physical) {
          continue; // fully deleted fragment drops out of the manifest
        }
        String rel = "_deletions/"
            + UUID.randomUUID().toString().replace("-", "") + ".parquet";
        LanceJvmDelete.writeDeletionParquet(spark, tableDir, rel, fid, merged);
        ObjectNode updated = frag.deepCopy();
        ObjectNode delNode = MAPPER.createObjectNode();
        delNode.put("path", rel);
        delNode.put("num_deleted", merged.size());
        updated.set("deletion", delNode);
        frags.add(updated);
      }
      if (!byFrag.isEmpty()) {
        throw new IllegalStateException(
            "deletes target unknown fragment ids " + byFrag.keySet());
      }
      for (int i = 0; i < rels.size(); i++) {
        maxId++;
        ObjectNode f = MAPPER.createObjectNode();
        f.put("id", maxId);
        f.put("path", rels.get(i));
        f.put("physical_rows", rowCounts.get(i));
        f.set("deletion", MAPPER.nullNode());
        if (fragStats.get(i) != null && fragStats.get(i).size() > 0) {
          f.set("stats", fragStats.get(i));
        }
        frags.add(f);
      }
      next.set("fragments", frags);
      next.put("max_fragment_id", maxId);
      LanceJvmDelete.commitManifest(tableDir, latest + 1, next);
      cleanup();
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
        // best-effort staging cleanup; vacuum reaps aged .stage-* dirs
      }
    }

    private static void readDvRows(String dvPath, Configuration conf,
        TreeSet<Long> into) {
      org.apache.hadoop.fs.Path p = new org.apache.hadoop.fs.Path(dvPath);
      try (ParquetReader<Group> r =
          ParquetReader.builder(new GroupReadSupport(), p).withConf(conf).build()) {
        Group g;
        while ((g = r.read()) != null) {
          into.add(g.getLong("row_index", 0));
        }
      } catch (IOException e) {
        throw new RuntimeException("reading deletion vector " + p + " failed", e);
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

  /** Driver-side factory prep shared by the own-format MoR delta write
   *  and the native-table delta write (LancePyNativeRowLevel): create the
   *  staging dir, capture the session hadoop conf (it carries every
   *  spark.sql.* key the parquet schema converter reads) and ship it to
   *  executors the same way Spark's own FileWriterFactory does. */
  static MorDeltaWriterFactory newWriterFactory(Path stagingDir, StructType schema) {
    try {
      Files.createDirectories(stagingDir);
    } catch (IOException e) {
      throw new RuntimeException("creating staging dir failed", e);
    }
    org.apache.spark.sql.classic.SparkSession session =
        org.apache.spark.sql.classic.SparkSession.active();
    Configuration conf = session.sessionState().newHadoopConf();
    ParquetWriteSupport.setSchema(schema, conf);
    // the keys ParquetFileFormat.prepareWrite sets explicitly (they
    // are not guaranteed present in newHadoopConf at default values)
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
    return new MorDeltaWriterFactory(
        stagingDir.toString(), schema.json(),
        new org.apache.spark.util.SerializableConfiguration(conf));
  }

  /** Reads a public String[] field off a commit message by name via
   *  reflection: an ADD JAR jar lives in different classloaders on the
   *  write path and the commit path, so an instanceof/cast would fail —
   *  but field NAMES and java.lang.String[] values are classloader-safe. */
  static String[] messageFiles(WriterCommitMessage m, String field) {
    try {
      java.lang.reflect.Field f = m.getClass().getField(field);
      f.setAccessible(true);
      Object v = f.get(m);
      return v == null ? new String[0] : (String[]) v;
    } catch (ReflectiveOperationException e) {
      throw new IllegalStateException(
          "unexpected delta commit message " + m.getClass().getName(), e);
    }
  }

  /** Classloader-safe commit message: the driver reads the public fields
   *  by NAME via reflection (see messageFiles). */
  public static final class DeltaCommitMessage implements WriterCommitMessage {
    public final String[] insertFiles;
    public final String[] deleteFiles;

    public DeltaCommitMessage(String[] insertFiles, String[] deleteFiles) {
      this.insertFiles = insertFiles;
      this.deleteFiles = deleteFiles;
    }
  }

  /** Executor side: deletes stream to a per-task address file (8 bytes per
   *  deleted row), inserts to a per-task staged parquet file through
   *  Spark's own ParquetWriteSupport. Both open lazily — a task that only
   *  deletes stages no parquet, and vice versa. */
  static final class MorDeltaWriterFactory implements DeltaWriterFactory {
    private final String stagingDir;
    private final String schemaJson;
    private final org.apache.spark.util.SerializableConfiguration conf;

    MorDeltaWriterFactory(String stagingDir, String schemaJson,
        org.apache.spark.util.SerializableConfiguration conf) {
      this.stagingDir = stagingDir;
      this.schemaJson = schemaJson;
      this.conf = conf;
    }

    @Override
    public DeltaWriter<InternalRow> createWriter(int partitionId, long taskId) {
      StructType schema = (StructType) DataType.fromJson(schemaJson);
      String insertFile =
          stagingDir + "/ins-" + partitionId + "-" + taskId + ".parquet";
      String deleteFile =
          stagingDir + "/del-" + partitionId + "-" + taskId + ".addrs";
      return new DeltaWriter<>() {
        private ParquetWriter<InternalRow> insertWriter;
        private DataOutputStream deleteOut;

        @Override
        public void delete(InternalRow meta, InternalRow id) throws IOException {
          if (deleteOut == null) {
            deleteOut = new DataOutputStream(
                new BufferedOutputStream(new FileOutputStream(deleteFile)));
          }
          deleteOut.writeLong(id.getLong(0)); // $row_address
        }

        @Override
        public void update(InternalRow meta, InternalRow id, InternalRow row)
            throws IOException {
          // unreachable with representUpdateAsDeleteAndInsert() == true,
          // but the decomposition is exactly what it would mean anyway
          delete(meta, id);
          insert(row);
        }

        @Override
        public void insert(InternalRow row) throws IOException {
          if (insertWriter == null) {
            insertWriter = new SupportBuilder(
                new org.apache.hadoop.fs.Path(insertFile),
                new ParquetWriteSupport())
                .withConf(conf.value())
                .withCompressionCodec(CompressionCodecName.SNAPPY)
                .build();
          }
          insertWriter.write(row);
        }

        @Override
        public WriterCommitMessage commit() throws IOException {
          List<String> ins = new ArrayList<>();
          List<String> dels = new ArrayList<>();
          if (insertWriter != null) {
            insertWriter.close();
            ins.add(insertFile);
          }
          if (deleteOut != null) {
            deleteOut.close();
            dels.add(deleteFile);
          }
          return new DeltaCommitMessage(
              ins.toArray(new String[0]), dels.toArray(new String[0]));
        }

        @Override
        public void abort() throws IOException {
          if (insertWriter != null) {
            insertWriter.close();
          }
          if (deleteOut != null) {
            deleteOut.close();
          }
          Files.deleteIfExists(Paths.get(insertFile));
          Files.deleteIfExists(Paths.get(deleteFile));
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
