/*
 * A catalog Table for REAL `.lance` datasets (binary protobuf manifests)
 * that DELEGATES both planes to the session-registered PYTHON "lance"
 * data source — the JVM cannot decode native v1/v2 pages, but the Python
 * DSv2 reader/writer can, so plain `spark.sql("SELECT ... FROM
 * cat.ns.native_table [VERSION AS OF ...]")` and `INSERT INTO` plan
 * through Catalyst like any other table.
 *
 * Why a wrapper instead of returning Spark's PythonTable directly: the
 * Python source resolves its dataset from the `path` OPTION. Reads carry
 * it (the option map is pickled into the data source instance at
 * creation), but catalog INSERTs construct the write-side Python
 * instance from LogicalWriteInfo.options() — which a `spark.sql`
 * statement leaves EMPTY, so the writer would fail with "requires a
 * path". This wrapper re-injects the base options (path + any pinned
 * time-travel keys) into every scan/write before delegating.
 *
 * Reference parity: plain-SQL-through-the-engine everywhere is the
 * reference's product shape (the Trino connector serves every Lance
 * table via standard SQL; LanceMetadata.java getTableHandle).
 */
package io.lancespark;

import java.util.HashMap;
import java.util.Map;
import java.util.Set;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.classic.SparkSession;
import org.apache.spark.sql.connector.catalog.MetadataColumn;
import org.apache.spark.sql.connector.catalog.SupportsDeleteV2;
import org.apache.spark.sql.connector.catalog.SupportsMetadataColumns;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations;
import org.apache.spark.sql.connector.catalog.SupportsWrite;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.connector.expressions.filter.Predicate;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.RowLevelOperationBuilder;
import org.apache.spark.sql.connector.write.RowLevelOperationInfo;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

public class LancePyNativeTable
    implements Table, SupportsRead, SupportsWrite, SupportsDeleteV2,
        SupportsRowLevelOperations, SupportsMetadataColumns {

  private final Table inner; // Spark's PythonTable for the "lance" source
  private final String name;
  private final Map<String, String> baseOpts;

  public LancePyNativeTable(Table inner, String name, Map<String, String> baseOpts) {
    this.inner = inner;
    this.name = name;
    this.baseOpts = baseOpts;
  }

  private CaseInsensitiveStringMap merged(Map<String, String> extra) {
    Map<String, String> m = new HashMap<>(baseOpts);
    m.putAll(extra); // statement-level options win over the pinned base
    return new CaseInsensitiveStringMap(m);
  }

  @Override
  public String name() {
    return name;
  }

  @Override
  @SuppressWarnings("deprecation")
  public StructType schema() {
    return inner.schema();
  }

  @Override
  public Transform[] partitioning() {
    return inner.partitioning();
  }

  @Override
  public Map<String, String> properties() {
    return baseOpts;
  }

  @Override
  public Set<TableCapability> capabilities() {
    return inner.capabilities();
  }

  @Override
  public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
    return ((SupportsRead) inner).newScanBuilder(merged(options));
  }

  /* ---- _row_address hidden column (SupportsMetadataColumns) -----------
   * The reference's 64-bit row identity (fragment_id << 32 | row_index,
   * RowAddress.java:22-43) — on the native path the PYTHON reader
   * synthesizes it when loaded with row_address=true, so it is only
   * served by row-level-operation scans (rowLevelScanBuilder), where
   * Spark's rewrites require it as the rowId. */
  @Override
  public MetadataColumn[] metadataColumns() {
    return new MetadataColumn[] {
        new MetadataColumn() {
          @Override
          public String name() {
            return LancePyNativeRowLevel.ROW_ADDRESS_COL;
          }

          @Override
          public DataType dataType() {
            return DataTypes.LongType;
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

  /* ---- SQL UPDATE / MERGE / complex DELETE (SupportsRowLevelOperations)
   * MERGE-ON-READ deltas via SupportsDelta (LancePyNativeRowLevel):
   * executors stage delete addresses + insert parquet, the driver
   * bridges both into ONE Python-committed native manifest version.
   * Simple-predicate DELETE still optimizes down to SupportsDeleteV2's
   * metadata path. Time-travel-pinned relations refuse (history is
   * immutable). */
  @Override
  public RowLevelOperationBuilder newRowLevelOperationBuilder(
      RowLevelOperationInfo info) {
    if (baseOpts.containsKey("version") || baseOpts.containsKey("timestampasof")
        || baseOpts.containsKey("tagasof")) {
      throw new UnsupportedOperationException(
          "row-level " + info.command() + " on a time-travel-pinned native "
          + "table is not supported (history is immutable)");
    }
    return () -> new LancePyNativeRowLevel(this, info);
  }

  String path() {
    return baseOpts.get("path");
  }

  /** A scan whose schema carries `_row_address`: a FRESH Python table
   *  (Spark 4.1 keeps one mutable readInfo slot per PythonDataSourceV2
   *  instance, so row-level plans never share the SELECT-path instance)
   *  loaded with row_address=true. Pushed filters reach the native
   *  page reader exactly like the normal scan. */
  ScanBuilder rowLevelScanBuilder(CaseInsensitiveStringMap options) {
    Map<String, String> m = new HashMap<>(baseOpts);
    m.putAll(options);
    m.put("row_address", "true");
    org.apache.spark.sql.execution.datasources.v2.python.PythonDataSourceV2 p =
        new org.apache.spark.sql.execution.datasources.v2.python.PythonDataSourceV2();
    p.setShortName("lance");
    CaseInsensitiveStringMap cs = new CaseInsensitiveStringMap(m);
    StructType schema = p.inferSchema(cs);
    Table t = p.getTable(schema, new Transform[0], m);
    return ((SupportsRead) t).newScanBuilder(cs);
  }

  /**
   * Catalyst-planned DELETE on a native table (`spark.sql("DELETE FROM
   * cat.db.t WHERE ...")`): the predicate is rendered back to SQL
   * (LanceJvmDelete.toSql — unsupported expressions refuse via
   * canDeleteWhere so Spark raises its standard analysis error), run
   * through the PYTHON scan (filter pushdown + zone-map fragment
   * pruning + late materialization), and the matching row addresses
   * stream into the Python committer's delete_addresses write mode —
   * ONE MoR deletion-vector manifest version, O(delete delta), the
   * reference's in-engine DELETE planning (LanceMetadata.java:1116-1271).
   * Time-travel-pinned tables refuse (history is immutable).
   */
  @Override
  public boolean canDeleteWhere(Predicate[] predicates) {
    if (baseOpts.containsKey("version") || baseOpts.containsKey("timestampasof")
        || baseOpts.containsKey("tagasof")) {
      return false;
    }
    return LanceJvmDelete.toSql(predicates) != null;
  }

  @Override
  public void deleteWhere(Predicate[] predicates) {
    String sql = LanceJvmDelete.toSql(predicates);
    if (sql == null) {
      throw new UnsupportedOperationException(
          "DELETE predicate has no SQL rendering");
    }
    SparkSession spark = SparkSession.active();
    // fresh PythonDataSourceV2 per plan (Spark 4.1 keeps one mutable
    // readInfo slot per source instance)
    Dataset<Row> df = spark.read().format("lance")
        .option("path", baseOpts.get("path"))
        .option("row_address", "true")
        .load();
    if (!sql.isEmpty()) {
      df = df.where(sql);
    }
    df.selectExpr("_row_address")
        .write().format("lance").mode("append")
        .option("path", baseOpts.get("path"))
        .option("commit_mode", "delete_addresses")
        .save();
  }

  /**
   * O(1) TRUNCATE TABLE: SupportsDeleteV2's default truncateTable()
   * streams EVERY row address through deleteWhere (O(n) scan + the 10M
   * delete cap) — the native committer's truncate shape is an empty
   * OVERWRITE commit instead: one manifest version with zero fragments,
   * schema preserved, history intact, no data read
   * (LanceNativeBatchWriter overwrite semantics).
   */
  @Override
  public boolean truncateTable() {
    if (baseOpts.containsKey("version") || baseOpts.containsKey("timestampasof")
        || baseOpts.containsKey("tagasof")) {
      throw new UnsupportedOperationException(
          "TRUNCATE on a time-travel-pinned native table is not supported");
    }
    SparkSession spark = SparkSession.active();
    spark.createDataFrame(new java.util.ArrayList<Row>(), schema())
        .write().format("lance").mode("overwrite")
        .option("path", baseOpts.get("path"))
        .save();
    return true;
  }

  @Override
  public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
    CaseInsensitiveStringMap opts = merged(info.options());
    LogicalWriteInfo withPath = new LogicalWriteInfo() {
      @Override
      public CaseInsensitiveStringMap options() {
        return opts;
      }

      @Override
      public String queryId() {
        return info.queryId();
      }

      @Override
      public StructType schema() {
        return info.schema();
      }
    };
    return ((SupportsWrite) inner).newWriteBuilder(withPath);
  }
}
