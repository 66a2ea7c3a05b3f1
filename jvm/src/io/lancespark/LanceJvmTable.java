/*
 * Read-side Table returned by LanceJvmCatalog.
 *
 * Scans delegate to Spark's built-in ParquetTable over the manifest's live
 * fragment files, pinned at load time (snapshot isolation — the reference
 * pins datasetVersion in the table handle at planning time,
 * LanceTableHandle.java:48,250-254).  Delegation means the stock parquet
 * ScanBuilder supplies predicate pushdown, column pruning and vectorized
 * reads (SURVEY §4.1 "built-in driver" rows) with zero custom scan code.
 *
 * Merge-on-read deletion vectors ARE applied on this path: DV-bearing
 * tables scan through LanceDvScan (row-counted readers over whole-file
 * partitions — correct but row-based and unpushed; OPTIMIZE restores the
 * vectorized pushdown path), mirroring the reference's
 * dataset-level-scan-for-DV-correctness stance
 * (LanceFragmentPageSource.java:87-92,144-151).
 *
 * Writes: INSERT / INSERT OVERWRITE via the V1Write fallback
 * (LanceJvmWrite) and DELETE / TRUNCATE via SupportsDeleteV2
 * (LanceJvmDelete); UPDATE/MERGE remain Python-committer capabilities.
 */
package io.lancespark;

import java.nio.file.Path;
import java.util.Collections;
import java.util.EnumSet;
import java.util.HashMap;
import java.util.List;
import java.util.Map;
import java.util.Set;

import com.fasterxml.jackson.databind.JsonNode;

import org.apache.spark.sql.connector.catalog.SupportsDeleteV2;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.SupportsWrite;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.expressions.filter.Predicate;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.SupportsTruncate;
import org.apache.spark.sql.connector.write.V1Write;
import org.apache.spark.sql.connector.write.Write;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.sources.InsertableRelation;
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat;
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

public class LanceJvmTable
    implements Table, SupportsRead, SupportsWrite, SupportsDeleteV2,
    org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations,
    org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  private final String tableName;
  private final Path tableDir;
  private final long version;
  private final JsonNode manifest;
  private final StructType schema;

  LanceJvmTable(String tableName, Path tableDir, long version, JsonNode manifest) {
    this.tableName = tableName;
    this.tableDir = tableDir;
    this.version = version;
    this.manifest = manifest;
    this.schema = (StructType) DataType.fromJson(manifest.get("schema").toString());
  }

  @Override
  public String name() {
    return tableName + "@v" + version;
  }

  java.nio.file.Path dir() {
    return tableDir;
  }

  /* ---- $row_address hidden column (SupportsMetadataColumns) -----------
   * The reference's 64-bit row identity (fragment_id << 32 | row_index,
   * RowAddress.java:22-43, exposed as $row_address by
   * LanceFragmentPageSource.java:36,62-75). Selectable in plain SQL as
   * `$row_address` (backticks); synthesized from the parquet row-index
   * column inside LanceDvScan, stable across merge-on-read deletes. */
  @Override
  public org.apache.spark.sql.connector.catalog.MetadataColumn[] metadataColumns() {
    return new org.apache.spark.sql.connector.catalog.MetadataColumn[] {
        new org.apache.spark.sql.connector.catalog.MetadataColumn() {
          @Override
          public String name() {
            return LanceDvScan.ROW_ADDRESS_COL;
          }

          @Override
          public DataType dataType() {
            return org.apache.spark.sql.types.DataTypes.LongType;
          }

          @Override
          public boolean isNullable() {
            return false;
          }

          @Override
          public String comment() {
            return "fragment_id << 32 | row_index (Lance row address)";
          }
        }
    };
  }

  long snapshotVersion() {
    return version;
  }

  /* ---- native SQL UPDATE / MERGE (SupportsRowLevelOperations) ---------
   * MERGE-ON-READ deltas (SupportsDelta, representUpdateAsDeleteAndInsert):
   * Spark rewrites the statement into a WriteDelta plan over the table's
   * normal DV-aware scan keyed by the $row_address metadata column;
   * deleted rows become per-fragment deletion-vector entries and
   * replacement rows land in new fragments (LanceJvmRowLevel) — the
   * reference's DELETE_ROW_AND_INSERT_ROW paradigm. Simple-predicate
   * DELETE still optimizes down to SupportsDeleteV2's metadata path. */
  @Override
  public org.apache.spark.sql.connector.write.RowLevelOperationBuilder
      newRowLevelOperationBuilder(
          org.apache.spark.sql.connector.write.RowLevelOperationInfo info) {
    return () -> new LanceJvmRowLevel(this, info);
  }

  @Override
  public StructType schema() {
    return schema;
  }

  @Override
  public Set<TableCapability> capabilities() {
    return Collections.unmodifiableSet(EnumSet.of(
        TableCapability.BATCH_READ,
        TableCapability.BATCH_WRITE,
        TableCapability.V1_BATCH_WRITE,
        TableCapability.TRUNCATE));
  }

  @Override
  public Map<String, String> properties() {
    Map<String, String> props = new HashMap<>();
    props.put("format", "lance");
    props.put("location", tableDir.toString());
    props.put("version", Long.toString(version));
    long totalRows = 0;
    for (JsonNode frag : manifest.get("fragments")) {
      long physical = frag.get("physical_rows").asLong();
      JsonNode del = frag.get("deletion");
      long deleted = (del == null || del.isNull()) ? 0 : del.path("num_deleted").asLong();
      totalRows += physical - deleted; // deletion-aware (LanceSplitManager.java:78-84)
    }
    props.put("total_rows", Long.toString(totalRows));
    // user TBLPROPERTIES (ALTER TABLE ... SET TBLPROPERTIES): surface
    // scalar-valued manifest properties; engine-owned structured entries
    // (retired_columns, index registries...) stay internal
    JsonNode mp = manifest.get("properties");
    if (mp != null && mp.isObject()) {
      mp.fields().forEachRemaining(e -> {
        if (e.getValue().isValueNode() && !props.containsKey(e.getKey())
            && !e.getKey().equals("stream_last_epoch")) {
          props.put(e.getKey(), e.getValue().asText());
        }
      });
    }
    return props;
  }

  /* ---- native SQL INSERT (SupportsWrite, V1 fallback) -----------------
   * Executors stage parquet parts; the driver moves them into data/ and
   * commits an Append (retry: append commutes) or Overwrite (refuse on
   * conflict) manifest through the shared hard-link protocol — the JVM
   * half of the reference's beginInsert/finishInsert two-phase commit
   * (LanceMetadata.java). Blob-column tables are refused: their appends
   * REQUIRE the Python staging transform (out-of-line blob descriptors),
   * and a raw parquet append would corrupt the layout. Vector/scalar
   * index sidecars are not built here — new fragments scan via
   * consult-if-present until ensure_*_index_files/OPTIMIZE runs, same as
   * a Python append without maintain_indexes. */
  @Override
  public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
    if (manifest.path("properties").has("blob_columns")) {
      throw new UnsupportedOperationException(
          "table " + tableName + " has blob columns; INSERT must go through "
          + "the Python committer (LanceDataset.append), which stages blob "
          + "descriptors");
    }
    return new LanceWriteBuilder();
  }

  private final class LanceWriteBuilder implements WriteBuilder, SupportsTruncate {
    private boolean overwrite;

    @Override
    public WriteBuilder truncate() {
      overwrite = true;
      return this;
    }

    @Override
    public Write build() {
      final boolean ovr = overwrite;
      return new V1Write() {
        @Override
        public InsertableRelation toInsertableRelation() {
          return (data, overwriteFlag) ->
              LanceJvmWrite.insert(tableDir, data, ovr || overwriteFlag);
        }
      };
    }
  }

  /* ---- native SQL DELETE (SupportsDeleteV2) ---------------------------
   * `DELETE FROM lance.ns.t WHERE ...` in plain spark.sql() — MoR
   * deletion vectors written by LanceJvmDelete with the same on-disk
   * layout and hard-link commit protocol as the Python committer
   * (reference surface: LanceMetadata.java:1116-1271). Unsupported
   * predicate shapes make canDeleteWhere return false so Spark raises
   * its standard analysis error instead of a wrong answer. */
  @Override
  public boolean canDeleteWhere(Predicate[] predicates) {
    return LanceJvmDelete.toSql(predicates) != null;
  }

  @Override
  public void deleteWhere(Predicate[] predicates) {
    String cond = LanceJvmDelete.toSql(predicates);
    if (cond == null) {
      throw new UnsupportedOperationException(
          "DELETE predicate has no SQL rendering; use the Python committer");
    }
    LanceJvmDelete.run(tableDir, version, manifest, schema, cond);
  }

  JsonNode manifestJson() {
    return manifest;
  }

  @Override
  public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
    List<String> paths = new java.util.ArrayList<>();
    for (JsonNode frag : manifest.get("fragments")) {
      paths.add(tableDir.resolve(frag.get("path").asText()).toString());
    }
    boolean mor = true; // delegate schema always carries the row-index
                        // field now: the wrapper decides per scan whether
                        // to request it ($row_address and/or DVs)
    // merge-on-read tables ask the delegate for the parquet row-index
    // temporary column too (it must live in the delegate's dataSchema for
    // FileScanBuilder to keep it through pruning) — the readers populate
    // it with true file positions even under row-group skipping, and
    // LanceDvScan filters batches against the deletion vectors while
    // keeping the delegate's vectorized decode and filter pushdown.
    StructType delegateSchema = schema.add(LanceDvScan.rowIndexField());
    ParquetTable delegate = ParquetTable.apply(
        name(),
        org.apache.spark.sql.classic.SparkSession.active(),
        options,
        scala.jdk.javaapi.CollectionConverters.asScala(paths).toSeq(),
        scala.Option.apply(delegateSchema),
        ParquetFileFormat.class);
    return LanceDvScan.builder(
        delegate.newScanBuilder(options), schema, tableDir, manifest,
        tableName);
  }
}
