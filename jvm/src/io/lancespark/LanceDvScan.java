/*
 * Deletion-vector-aware JVM scan: merge-on-read SELECTs for DV-bearing
 * tables through the delegated parquet reader.
 *
 * The reference applies Lance deletion vectors below its Arrow scanner
 * (LanceFragmentPageSource.java:87-92,144-151 — "dataset-level scan for DV
 * correctness").  The stock ParquetTable delegation has no DV hook, and
 * DSv2 file scans expose no `_metadata.row_index`, so this scan derives
 * row positions the same way the committers define them: it re-groups the
 * delegate's planned PartitionedFiles into ONE partition per data file
 * (splits of a file ordered by start offset), reads each file start to
 * finish with NO pushed filters (nothing can skip row groups), and counts
 * rows — the counter IS the fragment row index (fragment_id << 32 |
 * row_index row addressing, RowAddress.java:22-43).  Rows whose index is
 * in the fragment's deletion vector are skipped.
 *
 * Cost model: row-based readers, no filter pushdown, one task per data
 * file — correct first, and only for tables that currently carry deletion
 * vectors; OPTIMIZE (compaction) restores the vectorized pushdown path.
 * Deletion vectors are loaded once on the driver (bounded by fragment
 * size, same bound the committers enforce) and ship inside the serialized
 * reader factory.
 */
package io.lancespark;

import java.io.IOException;
import java.io.Serializable;
import java.nio.file.Path;
import java.util.ArrayList;
import java.util.HashMap;
import java.util.HashSet;
import java.util.LinkedHashMap;
import java.util.List;
import java.util.Map;

import com.fasterxml.jackson.databind.JsonNode;
import com.fasterxml.jackson.databind.node.ArrayNode;

import org.apache.hadoop.conf.Configuration;
import org.apache.parquet.example.data.Group;
import org.apache.parquet.hadoop.ParquetReader;
import org.apache.parquet.hadoop.example.GroupReadSupport;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.execution.datasources.FilePartition;
import org.apache.spark.sql.execution.datasources.PartitionedFile;
import org.apache.spark.sql.types.StructType;

final class LanceDvScan {

  private LanceDvScan() {}

  /** Driver-side: load every fragment's deletion vector into
   *  {data-file basename -> deleted row indexes}. */
  static HashMap<String, HashSet<Long>> loadDeletions(Path tableDir, JsonNode manifest) {
    HashMap<String, HashSet<Long>> out = new HashMap<>();
    Configuration conf = new Configuration();
    for (JsonNode frag : (ArrayNode) manifest.get("fragments")) {
      JsonNode del = frag.get("deletion");
      if (del == null || del.isNull()) {
        continue;
      }
      String dataBase = baseName(frag.get("path").asText());
      HashSet<Long> rows = new HashSet<>();
      org.apache.hadoop.fs.Path p = new org.apache.hadoop.fs.Path(
          tableDir.resolve(del.get("path").asText()).toString());
      try (ParquetReader<Group> r =
          ParquetReader.builder(new GroupReadSupport(), p).withConf(conf).build()) {
        Group g;
        while ((g = r.read()) != null) {
          rows.add(g.getLong("row_index", 0));
        }
      } catch (IOException e) {
        throw new RuntimeException("reading deletion vector " + p + " failed", e);
      }
      out.put(dataBase, rows);
    }
    return out;
  }

  static String baseName(String path) {
    int i = path.lastIndexOf('/');
    return i < 0 ? path : path.substring(i + 1);
  }

  /** ScanBuilder for DV tables: no filter pushdown reaches the delegate
   *  (full-file sequential reads keep the row counter == row index),
   *  Spark evaluates every predicate above the scan. */
  static ScanBuilder builder(ScanBuilder delegateBuilder, StructType tableSchema,
      Path tableDir, JsonNode manifest, String tableName) {
    return () -> {
      Scan inner = delegateBuilder.build();
      HashMap<String, HashSet<Long>> deletions = loadDeletions(tableDir, manifest);
      return new Scan() {
        @Override
        public StructType readSchema() {
          return tableSchema;
        }

        @Override
        public String description() {
          return "lance-dv-scan(" + tableName + ")";
        }

        @Override
        public Batch toBatch() {
          Batch innerBatch = inner.toBatch();
          return new Batch() {
            @Override
            public InputPartition[] planInputPartitions() {
              // regroup: one partition per data FILE, its splits ordered
              // by start offset — sequential whole-file read, so the
              // reader-side row counter equals the fragment row index
              Map<String, List<PartitionedFile>> byFile = new LinkedHashMap<>();
              for (InputPartition p : innerBatch.planInputPartitions()) {
                FilePartition fp = (FilePartition) p;
                for (PartitionedFile f : fp.files()) {
                  byFile.computeIfAbsent(
                      f.filePath().toString(), k -> new ArrayList<>()).add(f);
                }
              }
              List<InputPartition> out = new ArrayList<>();
              int idx = 0;
              for (List<PartitionedFile> files : byFile.values()) {
                files.sort(java.util.Comparator.comparingLong(PartitionedFile::start));
                out.add(new FilePartition(
                    idx++, files.toArray(new PartitionedFile[0])));
              }
              return out.toArray(new InputPartition[0]);
            }

            @Override
            public PartitionReaderFactory createReaderFactory() {
              return new DvReaderFactory(
                  innerBatch.createReaderFactory(), deletions);
            }
          };
        }
      };
    };
  }

  /** Serializable factory shipping the DV map to executors; readers are
   *  row-based and skip deleted positions by per-partition row count. */
  static final class DvReaderFactory implements PartitionReaderFactory, Serializable {
    private final PartitionReaderFactory delegate;
    private final HashMap<String, HashSet<Long>> deletions;

    DvReaderFactory(PartitionReaderFactory delegate,
        HashMap<String, HashSet<Long>> deletions) {
      this.delegate = delegate;
      this.deletions = deletions;
    }

    @Override
    public boolean supportColumnarReads(InputPartition partition) {
      return false; // DV filtering is row-counted; compaction restores columnar
    }

    @Override
    public PartitionReader<InternalRow> createReader(InputPartition partition) {
      FilePartition fp = (FilePartition) partition;
      String base = baseName(fp.files()[0].filePath().toString());
      HashSet<Long> dead = deletions.get(base);
      PartitionReader<InternalRow> inner = delegate.createReader(partition);
      if (dead == null || dead.isEmpty()) {
        return inner;
      }
      return new PartitionReader<>() {
        private long rowIndex = -1;
        private InternalRow current;

        @Override
        public boolean next() throws IOException {
          while (inner.next()) {
            rowIndex++;
            if (dead.contains(rowIndex)) {
              continue;
            }
            current = inner.get();
            return true;
          }
          return false;
        }

        @Override
        public InternalRow get() {
          return current;
        }

        @Override
        public void close() throws IOException {
          inner.close();
        }
      };
    }
  }
}
