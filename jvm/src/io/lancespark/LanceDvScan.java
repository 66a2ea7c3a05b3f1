/*
 * Deletion-vector-aware JVM scan: VECTORIZED merge-on-read SELECTs for
 * DV-bearing tables through the delegated parquet reader.
 *
 * The reference applies Lance deletion vectors below its Arrow scanner
 * (LanceFragmentPageSource.java:87-92,144-151 — "dataset-level scan for DV
 * correctness").  Spark's own metadata machinery supplies the missing hook:
 * appending the parquet row-index temporary column
 * (ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME — the column that
 * backs `_metadata.row_index`) to the delegate's read schema makes BOTH
 * the vectorized and the row-based parquet readers emit each row's true
 * physical file position, robust to filter pushdown and row-group
 * skipping.  The scan therefore keeps the delegate's columnar decode,
 * predicate pushdown, column pruning and split parallelism, and applies
 * the deletion vector per batch:
 *
 *   - columnar: read the row-index vector, build the surviving-position
 *     map, and wrap each projected column in a remapping ColumnVector
 *     (one indirection per access — the standard MoR position-delete
 *     shape); batches with no deleted rows pass through untouched.
 *   - row-based fallback (nested schemas etc.): skip rows whose index is
 *     in the DV, hide the trailing row-index field.
 *
 * Partition planning only changes for files that CARRY a deletion vector:
 * their splits each become a single-file partition so the reader can
 * attribute row indexes to the right DV; DV-free files keep the
 * delegate's bin-packed partitions.  The driver never loads DV rows at
 * plan time: only the {data-file basename -> DV file path} map ships in
 * the serialized reader factory, and each executor loads ITS partition's
 * deletion vector into a compressed long-word bitmap when the reader is
 * created — the reference's per-fragment DV application inside the scan
 * (LanceFragmentPageSource.java:144-151), and the shape that survives
 * 100 TB delete churn (a whole-table row-index map in every task closure
 * would not).  Live-row counts come from the manifest's num_deleted.
 */
package io.lancespark;

import java.io.IOException;
import java.io.Serializable;
import java.nio.file.Path;
import java.util.ArrayList;
import java.util.Arrays;
import java.util.HashMap;
import java.util.List;

import com.fasterxml.jackson.databind.JsonNode;
import com.fasterxml.jackson.databind.node.ArrayNode;

import org.apache.hadoop.conf.Configuration;
import org.apache.parquet.example.data.Group;
import org.apache.parquet.hadoop.ParquetReader;
import org.apache.parquet.hadoop.example.GroupReadSupport;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.util.ArrayData;
import org.apache.spark.sql.catalyst.util.MapData;
import org.apache.spark.sql.connector.expressions.filter.Predicate;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns;
import org.apache.spark.sql.execution.datasources.FilePartition;
import org.apache.spark.sql.execution.datasources.PartitionedFile;
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat$;
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder;
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters;
import org.apache.spark.sql.types.Decimal;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.vectorized.ColumnVector;
import org.apache.spark.sql.vectorized.ColumnarArray;
import org.apache.spark.sql.vectorized.ColumnarBatch;
import org.apache.spark.sql.vectorized.ColumnarMap;
import org.apache.spark.unsafe.types.CalendarInterval;
import org.apache.spark.unsafe.types.UTF8String;

final class LanceDvScan {

  private LanceDvScan() {}

  static StructField rowIndexField() {
    // NOT ROW_INDEX_FIELD() — that is the `row_index` field nested inside
    // the `_metadata` struct; the readers recognize the TEMPORARY column
    // by the _tmp_metadata_row_index name
    // nullable: the parquet schema clipper maps missing NULLABLE columns
    // to optional (null-filled) vectors, which the row-index generator
    // then overwrites with true file positions; a non-nullable field
    // fails the read with "Required column is missing in data file"
    return new StructField(
        rowIndexName(),
        org.apache.spark.sql.types.DataTypes.LongType,
        true,
        org.apache.spark.sql.types.Metadata.empty());
  }

  static String rowIndexName() {
    return ParquetFileFormat$.MODULE$.ROW_INDEX_TEMPORARY_COLUMN_NAME();
  }

  /** Driver-side, metadata only: {data-file basename -> DV parquet path}.
   *  No deletion ROWS are read at plan time — executors load their own
   *  partition's DV (see {@link #loadDvBitmap}). */
  static HashMap<String, String> dvFiles(Path tableDir, JsonNode manifest) {
    HashMap<String, String> out = new HashMap<>();
    for (JsonNode frag : (ArrayNode) manifest.get("fragments")) {
      JsonNode del = frag.get("deletion");
      if (del == null || del.isNull()) {
        continue;
      }
      out.put(baseName(frag.get("path").asText()),
          tableDir.resolve(del.get("path").asText()).toString());
    }
    return out;
  }

  /** Executor-side: one fragment's deletion vector as a compressed
   *  long-word bitmap (fragment row indexes are dense small ints, so a
   *  bitset is ~8 KB per 64k rows vs ~48 B per boxed HashSet entry). */
  static DvBitmap loadDvBitmap(String dvPath, Configuration conf) {
    DvBitmap bm = new DvBitmap();
    org.apache.hadoop.fs.Path p = new org.apache.hadoop.fs.Path(dvPath);
    try (ParquetReader<Group> r =
        ParquetReader.builder(new GroupReadSupport(), p).withConf(conf).build()) {
      Group g;
      while ((g = r.read()) != null) {
        bm.set(g.getLong("row_index", 0));
      }
    } catch (IOException e) {
      throw new RuntimeException("reading deletion vector " + p + " failed", e);
    }
    return bm;
  }

  /** Growable bitset over fragment-relative row indexes. */
  static final class DvBitmap {
    private long[] words = new long[64];
    private long max = -1;

    void set(long idx) {
      if (idx < 0 || idx > Integer.MAX_VALUE) {
        throw new IllegalArgumentException("row index out of range: " + idx);
      }
      int w = (int) (idx >>> 6);
      if (w >= words.length) {
        int cap = words.length;
        while (cap <= w) {
          cap <<= 1;
        }
        words = Arrays.copyOf(words, cap);
      }
      words[w] |= 1L << (idx & 63);
      if (idx > max) {
        max = idx;
      }
    }

    boolean contains(long idx) {
      if (idx < 0 || idx > max) {
        return false;
      }
      return (words[(int) (idx >>> 6)] & (1L << (idx & 63))) != 0;
    }

    boolean isEmpty() {
      return max < 0;
    }
  }

  static String baseName(String path) {
    int i = path.lastIndexOf('/');
    return i < 0 ? path : path.substring(i + 1);
  }

  static final String ROW_ADDRESS_COL = "$row_address";

  static HashMap<String, Long> fragIdsByBase(JsonNode manifest) {
    HashMap<String, Long> out = new HashMap<>();
    for (JsonNode frag : (ArrayNode) manifest.get("fragments")) {
      out.put(baseName(frag.get("path").asText()), frag.get("id").asLong());
    }
    return out;
  }

  /** ScanBuilder for DV-bearing and/or $row_address-requesting scans.
   *  The delegate builder MUST come from a ParquetTable whose schema
   *  already carries the row-index temp field (FileScanBuilder
   *  .readDataSchema filters dataSchema by the required name set, so the
   *  field has to exist in both). */
  static ScanBuilder builder(ScanBuilder delegateBuilder, StructType tableSchema,
      Path tableDir, JsonNode manifest, String tableName) {
    long liveRows = 0;
    for (JsonNode frag : (ArrayNode) manifest.get("fragments")) {
      long physical = frag.get("physical_rows").asLong();
      JsonNode del = frag.get("deletion");
      long deleted = (del == null || del.isNull())
          ? 0 : del.path("num_deleted").asLong();
      liveRows += physical - deleted;
    }
    return new DvScanBuilder((FileScanBuilder) delegateBuilder, tableSchema,
        dvFiles(tableDir, manifest), fragIdsByBase(manifest), tableName,
        liveRows, columnNdvStats(manifest, tableSchema),
        columnExactBounds(manifest, tableSchema));
  }

  /* ---- CBO column statistics from the manifest zone maps --------------
   * The reference feeds Trino's CBO rowCount only
   * (LanceMetadata.java:561-588); this goes further: per-column
   * distinct-count estimates from the fragments' HLL registers (256
   * registers per numeric/bool column, written by StatsAccumulator,
   * unioned losslessly by elementwise max) plus exact null counts —
   * surfaced to Catalyst via SupportsReportStatistics so join
   * reordering sees real NDVs when spark.sql.cbo.enabled is on. A
   * column is reported only when EVERY fragment that has bounds also
   * carries registers (a register-less bounded fragment — e.g. a
   * pre-register manifest or a JVM-INSERT fragment — makes the column
   * unknown rather than wrong). */
  static HashMap<String, long[]> columnNdvStats(JsonNode manifest,
      StructType tableSchema) {
    HashMap<String, long[]> out = new HashMap<>();
    ArrayNode frags = (ArrayNode) manifest.get("fragments");
    for (StructField f : tableSchema.fields()) {
      String c = f.name();
      byte[] regs = null;
      long nulls = 0;
      boolean ok = frags.size() > 0;
      for (JsonNode frag : frags) {
        JsonNode stats = frag.get("stats");
        JsonNode s = (stats == null || stats.isNull()) ? null : stats.get(c);
        if (s == null || s.isNull()) {
          ok = false;
          break;
        }
        nulls += s.path("nulls").asLong();
        if (s.has("hll")) {
          byte[] r = hexToBytes(s.get("hll").asText());
          if (regs == null) {
            regs = r;
          } else {
            for (int i = 0; i < regs.length && i < r.length; i++) {
              if (r[i] > regs[i]) {
                regs[i] = r[i];
              }
            }
          }
        } else if (s.has("min")) {
          ok = false; // bounded but register-less: unknown, never wrong
          break;
        }
      }
      if (ok && regs != null) {
        out.put(c, new long[] {hllEstimate(regs), nulls});
      }
    }
    return out;
  }

  /* Exact per-column bounds + null counts from the manifest zone maps,
   * for MANIFEST AGGREGATE pushdown (MIN/MAX/COUNT answered with ZERO
   * data scanned — beyond the reference's COUNT(*)-only fast path,
   * LanceMetadata.java:604-665, LanceCountPageSource.java:31-108; the
   * reference refuses everything else, this path answers what the
   * manifest can answer EXACTLY and refuses the rest). A column
   * participates only when EVERY fragment carries a stats entry for it
   * (StatsAccumulator poisons NaN-bearing floats and unboundable
   * strings, so presence == exact bounds) and, for strings, both bounds
   * are SHORTER than the 256-char storage cap (a bound at the cap may
   * be a truncated prefix / bumped prefix — conservative, not the exact
   * extremum). Value shape per column: {minOrNull, maxOrNull,
   * Long nulls}, min/max already in Spark internal representation
   * (UTF8String for strings); all-null columns keep null bounds. */
  static HashMap<String, Object[]> columnExactBounds(JsonNode manifest,
      StructType tableSchema) {
    HashMap<String, Object[]> out = new HashMap<>();
    ArrayNode frags = (ArrayNode) manifest.get("fragments");
    for (StructField f : tableSchema.fields()) {
      String c = f.name();
      Object mn = null;
      Object mx = null;
      long nulls = 0;
      boolean ok = true;
      for (JsonNode frag : frags) {
        JsonNode stats = frag.get("stats");
        JsonNode s = (stats == null || stats.isNull()) ? null : stats.get(c);
        if (s == null || s.isNull()) {
          ok = false;
          break;
        }
        nulls += s.path("nulls").asLong();
        if (!s.has("min")) {
          continue; // all-null fragment: bounds unchanged
        }
        Object lo = jsonBound(s.get("min"), f.dataType());
        Object hi = jsonBound(s.get("max"), f.dataType());
        if (lo == null || hi == null) {
          ok = false;
          break;
        }
        mn = (mn == null || cmpBound(lo, mn) < 0) ? lo : mn;
        mx = (mx == null || cmpBound(hi, mx) > 0) ? hi : mx;
      }
      if (ok) {
        out.put(c, new Object[] {mn, mx, Long.valueOf(nulls)});
      }
    }
    return out;
  }

  /** JSON zone-map bound → Spark internal value, or null when the type
   *  has no exact manifest representation. */
  static Object jsonBound(JsonNode v, org.apache.spark.sql.types.DataType t) {
    if (t instanceof org.apache.spark.sql.types.LongType) {
      return Long.valueOf(v.asLong());
    }
    if (t instanceof org.apache.spark.sql.types.IntegerType) {
      return Integer.valueOf((int) v.asLong());
    }
    if (t instanceof org.apache.spark.sql.types.ShortType) {
      return Short.valueOf((short) v.asLong());
    }
    if (t instanceof org.apache.spark.sql.types.ByteType) {
      return Byte.valueOf((byte) v.asLong());
    }
    if (t instanceof org.apache.spark.sql.types.DoubleType) {
      return Double.valueOf(v.asDouble());
    }
    if (t instanceof org.apache.spark.sql.types.FloatType) {
      return Float.valueOf((float) v.asDouble());
    }
    if (t instanceof org.apache.spark.sql.types.BooleanType) {
      return Boolean.valueOf(v.asBoolean());
    }
    if (t instanceof org.apache.spark.sql.types.StringType) {
      String s = v.asText();
      // bounds AT the storage cap may be truncated (min) or bumped
      // (max) prefixes — only strictly-shorter bounds are exact values
      return s.length() >= 256 ? null : UTF8String.fromString(s);
    }
    return null;
  }

  @SuppressWarnings({"unchecked", "rawtypes"})
  static int cmpBound(Object a, Object b) {
    return ((Comparable) a).compareTo(b);
  }

  static byte[] hexToBytes(String hex) {
    byte[] out = new byte[hex.length() / 2];
    for (int i = 0; i < out.length; i++) {
      out[i] = (byte) Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16);
    }
    return out;
  }

  /** Standard HLL estimator + linear-counting small-range correction —
   *  the Java twin of format/lance_native.py hll_ndv_from_hex. */
  static long hllEstimate(byte[] regs) {
    int m = regs.length;
    double sum = 0;
    int zeros = 0;
    for (byte b : regs) {
      int v = b & 0xFF;
      sum += Math.pow(2.0, -v);
      if (v == 0) {
        zeros++;
      }
    }
    double alpha = 0.7213 / (1 + 1.079 / m);
    double est = alpha * m * m / sum;
    if (est <= 2.5 * m && zeros > 0) {
      est = m * Math.log((double) m / zeros);
    }
    return Math.round(est);
  }

  /** Forwarding Scan that adds manifest-derived Statistics (rowCount +
   *  per-column NDV/null-count). Applied ONLY when spark.sql.cbo.enabled
   *  — the default plan tree stays byte-identical otherwise. Runtime
   *  filtering (DPP) is forwarded so wrapping never costs the delegate's
   *  capabilities. */
  static final class StatsScan implements Scan,
      org.apache.spark.sql.connector.read.SupportsReportStatistics,
      org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
    private final Scan inner;
    private final long rows;
    private final HashMap<String, long[]> colNdv;

    StatsScan(Scan inner, long rows, HashMap<String, long[]> colNdv) {
      this.inner = inner;
      this.rows = rows;
      this.colNdv = colNdv;
    }

    @Override
    public StructType readSchema() {
      return inner.readSchema();
    }

    @Override
    public String description() {
      return inner.description();
    }

    @Override
    public Batch toBatch() {
      return inner.toBatch();
    }

    @Override
    public org.apache.spark.sql.connector.expressions.NamedReference[]
        filterAttributes() {
      if (inner instanceof
          org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering f) {
        return f.filterAttributes();
      }
      return new org.apache.spark.sql.connector.expressions.NamedReference[0];
    }

    @Override
    public void filter(Predicate[] predicates) {
      if (inner instanceof
          org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering f) {
        f.filter(predicates);
      }
    }

    @Override
    public org.apache.spark.sql.connector.read.Statistics estimateStatistics() {
      final java.util.OptionalLong size;
      if (inner instanceof
          org.apache.spark.sql.connector.read.SupportsReportStatistics s) {
        size = s.estimateStatistics().sizeInBytes();
      } else {
        size = java.util.OptionalLong.empty();
      }
      final java.util.Map<
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics>
          cols = new HashMap<>();
      for (StructField f : inner.readSchema().fields()) {
        long[] st = colNdv.get(f.name());
        if (st == null) {
          continue;
        }
        // Registers/null counts describe the WRITTEN rows; rowCount is
        // deletion-aware liveRows. Clamp so a heavily-deleted table can
        // never report distinctCount/nullCount above rowCount (which
        // would push CBO selectivities past 1).
        final long ndv = Math.min(st[0], rows);
        final long nulls = Math.min(st[1], rows);
        cols.put(
            org.apache.spark.sql.connector.expressions.Expressions
                .column(f.name()),
            new org.apache.spark.sql.connector.read.colstats
                .ColumnStatistics() {
              @Override
              public java.util.OptionalLong distinctCount() {
                return java.util.OptionalLong.of(ndv);
              }

              @Override
              public java.util.OptionalLong nullCount() {
                return java.util.OptionalLong.of(nulls);
              }
            });
      }
      return new org.apache.spark.sql.connector.read.Statistics() {
        @Override
        public java.util.OptionalLong sizeInBytes() {
          return size;
        }

        @Override
        public java.util.OptionalLong numRows() {
          return java.util.OptionalLong.of(rows);
        }

        @Override
        public java.util.Map<
            org.apache.spark.sql.connector.expressions.NamedReference,
            org.apache.spark.sql.connector.read.colstats.ColumnStatistics>
            columnStats() {
          return cols;
        }
      };
    }
  }

  /** Passes column pruning and catalyst filter pushdown through to the
   *  delegate parquet builder (always adding the row-index column), and
   *  deliberately does NOT implement SupportsPushDownAggregates: a
   *  pushed COUNT/MIN/MAX would bypass deletion-vector filtering. */
  static final class DvScanBuilder
      implements SupportsPushDownRequiredColumns, SupportsPushDownCatalystFilters,
      org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
    private final FileScanBuilder delegate;
    private final StructType tableSchema;
    private final HashMap<String, String> dvFiles;
    private final HashMap<String, Long> fragIds;
    private final String tableName;
    private boolean pruned;
    private boolean addrRequested;
    private boolean aggPushed;

    private final long liveRows;
    private final HashMap<String, long[]> colNdv;
    private final HashMap<String, Object[]> colBounds;
    private boolean filtersSeen;
    private StructType manifestAggSchema;
    private InternalRow manifestAggRow;

    DvScanBuilder(FileScanBuilder delegate, StructType tableSchema,
        HashMap<String, String> dvFiles,
        HashMap<String, Long> fragIds, String tableName, long liveRows,
        HashMap<String, long[]> colNdv,
        HashMap<String, Object[]> colBounds) {
      this.delegate = delegate;
      this.tableSchema = tableSchema;
      this.dvFiles = dvFiles;
      this.fragIds = fragIds;
      this.tableName = tableName;
      this.liveRows = liveRows;
      this.colNdv = colNdv;
      this.colBounds = colBounds;
    }

    /** CBO-only stats wrapper (no-op at default confs so every existing
     *  plan stays byte-identical). NOT applied above pushed aggregates
     *  (their schema is no longer the table's columns). */
    private Scan withStats(Scan s) {
      boolean cbo = org.apache.spark.sql.internal.SQLConf.get().cboEnabled();
      return cbo ? new StatsScan(s, liveRows, colNdv) : s;
    }

    @Override
    public void pruneColumns(StructType requiredSchema) {
      pruned = true;
      // $row_address is OURS (SupportsMetadataColumns): strip it before
      // the delegate sees it; its value derives from the row-index column
      List<StructField> data = new ArrayList<>();
      for (StructField f : requiredSchema.fields()) {
        if (f.name().equals(ROW_ADDRESS_COL)) {
          addrRequested = true;
        } else {
          data.add(f);
        }
      }
      StructType stripped = new StructType(data.toArray(new StructField[0]));
      if (addrRequested || !dvFiles.isEmpty()) {
        delegate.pruneColumns(stripped.add(rowIndexField()));
      } else {
        delegate.pruneColumns(stripped);
      }
    }

    /* A8 COUNT(*) pushdown generalized to MANIFEST AGGREGATES
     * (LanceCountPageSource parity + beyond, LanceMetadata.java:604-665):
     * an unfiltered, ungrouped combination of COUNT(*) / COUNT(col) /
     * MIN(col) / MAX(col) is answered entirely from the manifest's
     * deletion-aware row counts and zone-map bounds with ZERO data
     * scanned (a LocalScan — no partitions at all). COUNT(*) is
     * deletion-aware by construction (liveRows); anything touching
     * column VALUES or null counts refuses when ANY deletion vector
     * exists (a deleted row may hold the extremum / a null), when a
     * fragment lacks exact stats for the column, or when the column
     * type has no exact manifest representation. Any filter or grouping
     * refuses, exactly like the reference's guards. Non-answerable
     * aggregates delegate to the parquet builder's footer-stats path
     * ONLY on DV-free tables. Returns {schema, row values} or null. */
    private Object[] manifestAgg(
        org.apache.spark.sql.connector.expressions.aggregate.Aggregation agg) {
      if (filtersSeen || agg.groupByExpressions().length != 0
          || agg.aggregateExpressions().length == 0) {
        return null;
      }
      StructType schema = new StructType();
      Object[] row = new Object[agg.aggregateExpressions().length];
      int i = 0;
      for (org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc e
          : agg.aggregateExpressions()) {
        if (e instanceof
            org.apache.spark.sql.connector.expressions.aggregate.CountStar) {
          schema = schema.add("count(*)",
              org.apache.spark.sql.types.DataTypes.LongType, false);
          row[i++] = Long.valueOf(liveRows);
          continue;
        }
        if (!dvFiles.isEmpty()) {
          return null; // value/null aggregates under DVs: never from stats
        }
        String col = null;
        String kind = null;
        if (e instanceof
            org.apache.spark.sql.connector.expressions.aggregate.Min m) {
          col = singleName(m.column());
          kind = "min";
        } else if (e instanceof
            org.apache.spark.sql.connector.expressions.aggregate.Max m) {
          col = singleName(m.column());
          kind = "max";
        } else if (e instanceof
            org.apache.spark.sql.connector.expressions.aggregate.Count c
            && !c.isDistinct()) {
          col = singleName(c.column());
          kind = "count";
        }
        if (col == null || !colBounds.containsKey(col)) {
          return null;
        }
        Object[] b = colBounds.get(col);
        if (kind.equals("count")) {
          schema = schema.add("count(" + col + ")",
              org.apache.spark.sql.types.DataTypes.LongType, false);
          row[i++] = Long.valueOf(liveRows - (Long) b[2]);
          continue;
        }
        StructField f = tableSchema.apply(col);
        schema = schema.add(kind + "(" + col + ")", f.dataType(), true);
        row[i++] = kind.equals("min") ? b[0] : b[1];
      }
      return new Object[] {schema, row};
    }

    private static String singleName(
        org.apache.spark.sql.connector.expressions.Expression e) {
      if (e instanceof
          org.apache.spark.sql.connector.expressions.NamedReference nr
          && nr.fieldNames().length == 1) {
        return nr.fieldNames()[0];
      }
      return null;
    }

    public boolean supportCompletePushDown(
        org.apache.spark.sql.connector.expressions.aggregate.Aggregation agg) {
      if (manifestAgg(agg) != null) {
        return true;
      }
      return dvFiles.isEmpty() && !filtersSeen
          && delegate instanceof org.apache.spark.sql.connector.read
              .SupportsPushDownAggregates a
          && a.supportCompletePushDown(agg);
    }

    public boolean pushAggregation(
        org.apache.spark.sql.connector.expressions.aggregate.Aggregation agg) {
      Object[] ma = manifestAgg(agg);
      if (ma != null) {
        manifestAggSchema = (StructType) ma[0];
        manifestAggRow =
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                (Object[]) ma[1]);
        aggPushed = true;
        return true;
      }
      if (!dvFiles.isEmpty()
          || !(delegate instanceof org.apache.spark.sql.connector.read
              .SupportsPushDownAggregates a)) {
        return false;
      }
      aggPushed = a.pushAggregation(agg);
      return aggPushed;
    }

    @Override
    public scala.collection.immutable.Seq<Expression> pushFilters(
        scala.collection.immutable.Seq<Expression> filters) {
      if (!filters.isEmpty()) {
        filtersSeen = true; // any WHERE disables the manifest COUNT path
      }
      return delegate.pushFilters(filters);
    }

    @Override
    public Predicate[] pushedFilters() {
      return delegate.pushedFilters();
    }

    @Override
    public Scan build() {
      if (manifestAggSchema != null) {
        StructType schema = manifestAggSchema;
        InternalRow row = manifestAggRow;
        return new org.apache.spark.sql.connector.read.LocalScan() {
          @Override
          public InternalRow[] rows() {
            return new InternalRow[] {row};
          }

          @Override
          public StructType readSchema() {
            return schema;
          }

          @Override
          public String description() {
            return "lance-manifest-agg(" + tableName + ")";
          }
        };
      }
      if (aggPushed) {
        return delegate.build(); // agg results only — no DVs, no address
      }
      if (!pruned) {
        pruneColumns(tableSchema);
      }
      Scan inner = delegate.build();
      if (!addrRequested && dvFiles.isEmpty()) {
        // plain vectorized parquet scan, untouched (stats wrapper only
        // under spark.sql.cbo.enabled — see withStats)
        return withStats(inner);
      }
      // delegate emits readDataSchema order (dataSchema-ordered) with the
      // row-index field somewhere inside — locate it, surface the rest
      StructType innerRead = inner.readSchema();
      int rowIdxOrdinal = -1;
      List<StructField> visible = new ArrayList<>();
      StructField[] innerFields = innerRead.fields();
      for (int i = 0; i < innerFields.length; i++) {
        if (innerFields[i].name().equals(rowIndexName())) {
          rowIdxOrdinal = i;
        } else {
          visible.add(innerFields[i]);
        }
      }
      if (rowIdxOrdinal < 0) {
        throw new IllegalStateException(
            "row-index column missing from delegate read schema " + innerRead);
      }
      StructType dataSchema = new StructType(visible.toArray(new StructField[0]));
      final StructType outSchema = addrRequested
          // metadata columns surface AFTER the data columns
          ? dataSchema.add(new StructField(
              ROW_ADDRESS_COL, org.apache.spark.sql.types.DataTypes.LongType,
              false, org.apache.spark.sql.types.Metadata.empty()))
          : dataSchema;
      final boolean addr = addrRequested;
      final int ordinal = rowIdxOrdinal;
      return withStats(new Scan() {
        @Override
        public StructType readSchema() {
          return outSchema;
        }

        @Override
        public String description() {
          // include the delegate's description so EXPLAIN surfaces its
          // PushedFilters / ReadSchema lines for the DV path too
          return "lance-dv-scan(" + tableName + ") over " + inner.description();
        }

        @Override
        public Batch toBatch() {
          Batch innerBatch = inner.toBatch();
          return new Batch() {
            @Override
            public InputPartition[] planInputPartitions() {
              // files carrying a DV get single-file partitions (row-index
              // -> DV attribution); everything else keeps the delegate's
              // bin-packed split planning
              List<InputPartition> out = new ArrayList<>();
              int idx = 0;
              for (InputPartition p : innerBatch.planInputPartitions()) {
                FilePartition fp = (FilePartition) p;
                boolean needFileIdentity = addr;
                for (PartitionedFile f : fp.files()) {
                  if (dvFiles.containsKey(baseName(f.filePath().toString()))) {
                    needFileIdentity = true;
                    break;
                  }
                }
                if (!needFileIdentity) {
                  out.add(new FilePartition(idx++, fp.files()));
                } else {
                  for (PartitionedFile f : fp.files()) {
                    out.add(new FilePartition(idx++, new PartitionedFile[] {f}));
                  }
                }
              }
              return out.toArray(new InputPartition[0]);
            }

            @Override
            public PartitionReaderFactory createReaderFactory() {
              return new DvReaderFactory(
                  innerBatch.createReaderFactory(), dvFiles, ordinal,
                  addr, fragIds,
                  new org.apache.spark.util.SerializableConfiguration(
                      org.apache.spark.sql.SparkSession.active()
                          .sessionState().newHadoopConf()));
            }
          };
        }
      });
    }
  }

  /** Serializable factory. Its serialized form carries ONLY metadata —
   *  {data-file basename -> DV file path} strings, never deletion row
   *  indexes (pinned by tests/test_jvm_catalog.py) — so the task closure
   *  stays O(#fragments) regardless of how many rows are deleted. Each
   *  reader loads its own partition's DV into a bitmap on the executor. */
  static final class DvReaderFactory implements PartitionReaderFactory, Serializable {
    private final PartitionReaderFactory delegate;
    private final HashMap<String, String> dvFiles;
    private final int rowIdxOrdinal;
    private final boolean addr;
    private final HashMap<String, Long> fragIds;
    private final org.apache.spark.util.SerializableConfiguration conf;

    DvReaderFactory(PartitionReaderFactory delegate,
        HashMap<String, String> dvFiles, int rowIdxOrdinal,
        boolean addr, HashMap<String, Long> fragIds,
        org.apache.spark.util.SerializableConfiguration conf) {
      this.delegate = delegate;
      this.dvFiles = dvFiles;
      this.rowIdxOrdinal = rowIdxOrdinal;
      this.addr = addr;
      this.fragIds = fragIds;
      this.conf = conf;
    }

    /** fragment_id << 32 for this partition's single file ($row_address
     *  high bits, RowAddress.java:22-43); -1 when addresses are off. */
    private long addrHi(InputPartition partition) {
      if (!addr) {
        return -1L;
      }
      FilePartition fp = (FilePartition) partition;
      String base = baseName(fp.files()[0].filePath().toString());
      Long fid = fragIds.get(base);
      if (fid == null) {
        throw new IllegalStateException(
            "no fragment id for data file " + base);
      }
      return fid.longValue() << 32;
    }

    @Override
    public boolean supportColumnarReads(InputPartition partition) {
      return delegate.supportColumnarReads(partition);
    }

    /** Executor-side: load THIS partition's deletion vector (null when
     *  none of its files carry one). DV-bearing files are planned as
     *  single-file partitions, so each DV parquet is read exactly once
     *  per scan of its fragment. */
    private DvBitmap deadFor(InputPartition partition) {
      FilePartition fp = (FilePartition) partition;
      DvBitmap dead = null;
      for (PartitionedFile f : fp.files()) {
        String dvPath = dvFiles.get(baseName(f.filePath().toString()));
        if (dvPath != null) {
          if (fp.files().length > 1) {
            throw new IllegalStateException(
                "DV-bearing file in a multi-file partition: " + f.filePath());
          }
          dead = loadDvBitmap(dvPath, conf.value());
        }
      }
      return dead == null || dead.isEmpty() ? null : dead;
    }

    @Override
    public PartitionReader<InternalRow> createReader(InputPartition partition) {
      DvBitmap dead = deadFor(partition);
      long hi = addrHi(partition);
      PartitionReader<InternalRow> inner = delegate.createReader(partition);
      return new PartitionReader<>() {
        private InternalRow current;

        @Override
        public boolean next() throws IOException {
          while (inner.next()) {
            InternalRow r = inner.get();
            if (dead != null && dead.contains(r.getLong(rowIdxOrdinal))) {
              continue;
            }
            current = addr
                ? new AddressRow(r, rowIdxOrdinal, hi)
                : new OrdinalSkipRow(r, rowIdxOrdinal);
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

    @Override
    public PartitionReader<ColumnarBatch> createColumnarReader(InputPartition partition) {
      DvBitmap dead = deadFor(partition);
      long hi = addrHi(partition);
      PartitionReader<ColumnarBatch> inner = delegate.createColumnarReader(partition);
      return new PartitionReader<>() {
        private ColumnarBatch current;

        @Override
        public boolean next() throws IOException {
          if (!inner.next()) {
            return false;
          }
          current = apply(inner.get());
          return true;
        }

        private ColumnarBatch apply(ColumnarBatch b) {
          int n = b.numRows();
          int visible = b.numCols() - 1;
          int outCols = addr ? visible + 1 : visible;
          ColumnVector[] cols = new ColumnVector[outCols];
          ColumnVector rowIdx = b.column(rowIdxOrdinal);
          if (dead == null || dead.isEmpty()) {
            for (int i = 0; i < visible; i++) {
              cols[i] = b.column(i < rowIdxOrdinal ? i : i + 1);
            }
            if (addr) {
              cols[visible] = new AddressColumnVector(rowIdx, hi);
            }
            return new ColumnarBatch(cols, n);
          }
          int[] map = new int[n];
          int live = 0;
          for (int i = 0; i < n; i++) {
            if (!dead.contains(rowIdx.getLong(i))) {
              map[live++] = i;
            }
          }
          if (live == n) {
            for (int i = 0; i < visible; i++) {
              cols[i] = b.column(i < rowIdxOrdinal ? i : i + 1);
            }
            if (addr) {
              cols[visible] = new AddressColumnVector(rowIdx, hi);
            }
            return new ColumnarBatch(cols, n);
          }
          int[] m = Arrays.copyOf(map, live);
          for (int i = 0; i < visible; i++) {
            cols[i] = new MappedColumnVector(
                b.column(i < rowIdxOrdinal ? i : i + 1), m);
          }
          if (addr) {
            // surviving rows keep their ORIGINAL file positions — the
            // address is stable across merge-on-read deletes
            cols[visible] = new AddressColumnVector(
                new MappedColumnVector(rowIdx, m), hi);
          }
          return new ColumnarBatch(cols, live);
        }

        @Override
        public ColumnarBatch get() {
          return current;
        }

        @Override
        public void close() throws IOException {
          inner.close();
        }
      };
    }
  }

  /** ColumnVector view remapping logical position i to the delegate's
   *  physical position map[i] — vectorized decode stays with the delegate;
   *  the view costs one array indirection per access (the standard MoR
   *  position-delete application). Lifecycle stays with the delegate
   *  reader, so close() is a no-op. */
  static final class MappedColumnVector extends ColumnVector {
    private final ColumnVector data;
    private final int[] map;
    private HashMap<Integer, ColumnVector> children;

    MappedColumnVector(ColumnVector data, int[] map) {
      super(data.dataType());
      this.data = data;
      this.map = map;
    }

    @Override
    public void close() {}

    @Override
    public boolean hasNull() {
      return data.hasNull();
    }

    @Override
    public int numNulls() {
      if (!data.hasNull()) {
        return 0;
      }
      int n = 0;
      for (int i : map) {
        if (data.isNullAt(i)) {
          n++;
        }
      }
      return n;
    }

    @Override
    public boolean isNullAt(int i) {
      return data.isNullAt(map[i]);
    }

    @Override
    public boolean getBoolean(int i) {
      return data.getBoolean(map[i]);
    }

    @Override
    public byte getByte(int i) {
      return data.getByte(map[i]);
    }

    @Override
    public short getShort(int i) {
      return data.getShort(map[i]);
    }

    @Override
    public int getInt(int i) {
      return data.getInt(map[i]);
    }

    @Override
    public long getLong(int i) {
      return data.getLong(map[i]);
    }

    @Override
    public float getFloat(int i) {
      return data.getFloat(map[i]);
    }

    @Override
    public double getDouble(int i) {
      return data.getDouble(map[i]);
    }

    @Override
    public ColumnarArray getArray(int i) {
      return data.getArray(map[i]);
    }

    @Override
    public ColumnarMap getMap(int i) {
      return data.getMap(map[i]);
    }

    @Override
    public Decimal getDecimal(int i, int precision, int scale) {
      return data.getDecimal(map[i], precision, scale);
    }

    @Override
    public UTF8String getUTF8String(int i) {
      return data.getUTF8String(map[i]);
    }

    @Override
    public byte[] getBinary(int i) {
      return data.getBinary(map[i]);
    }

    @Override
    public CalendarInterval getInterval(int i) {
      return data.getInterval(map[i]);
    }

    @Override
    public ColumnVector getChild(int ordinal) {
      // struct children are accessed per row through the parent's rowId —
      // remap them with the same position map (array/map children are
      // reached through getArray/getMap above and stay unwrapped)
      if (children == null) {
        children = new HashMap<>();
      }
      return children.computeIfAbsent(
          ordinal, o -> new MappedColumnVector(data.getChild(o), map));
    }
  }

  /** $row_address synthesis over the (possibly DV-remapped) row-index
   *  vector: fragment_id << 32 | row_index (RowAddress.java:22-43). */
  static final class AddressColumnVector extends ColumnVector {
    private final ColumnVector rowIdx;
    private final long hi;

    AddressColumnVector(ColumnVector rowIdx, long hi) {
      super(org.apache.spark.sql.types.DataTypes.LongType);
      this.rowIdx = rowIdx;
      this.hi = hi;
    }

    @Override
    public void close() {}

    @Override
    public boolean hasNull() {
      return false;
    }

    @Override
    public int numNulls() {
      return 0;
    }

    @Override
    public boolean isNullAt(int i) {
      return false;
    }

    @Override
    public long getLong(int i) {
      return hi | rowIdx.getLong(i);
    }

    @Override
    public boolean getBoolean(int i) {
      throw new UnsupportedOperationException();
    }

    @Override
    public byte getByte(int i) {
      throw new UnsupportedOperationException();
    }

    @Override
    public short getShort(int i) {
      throw new UnsupportedOperationException();
    }

    @Override
    public int getInt(int i) {
      throw new UnsupportedOperationException();
    }

    @Override
    public float getFloat(int i) {
      throw new UnsupportedOperationException();
    }

    @Override
    public double getDouble(int i) {
      throw new UnsupportedOperationException();
    }

    @Override
    public ColumnarArray getArray(int i) {
      throw new UnsupportedOperationException();
    }

    @Override
    public ColumnarMap getMap(int i) {
      throw new UnsupportedOperationException();
    }

    @Override
    public Decimal getDecimal(int i, int precision, int scale) {
      throw new UnsupportedOperationException();
    }

    @Override
    public UTF8String getUTF8String(int i) {
      throw new UnsupportedOperationException();
    }

    @Override
    public byte[] getBinary(int i) {
      throw new UnsupportedOperationException();
    }

    @Override
    public CalendarInterval getInterval(int i) {
      throw new UnsupportedOperationException();
    }

    @Override
    public ColumnVector getChild(int ordinal) {
      throw new UnsupportedOperationException();
    }
  }

  /** Row view hiding the row-index ordinal and appending the computed
   *  $row_address as the LAST field. Read-only. */
  static final class AddressRow extends InternalRow {
    private final InternalRow row;
    private final int skip;
    private final long hi;

    AddressRow(InternalRow row, int skip, long hi) {
      this.row = row;
      this.skip = skip;
      this.hi = hi;
    }

    private int map(int i) {
      return i < skip ? i : i + 1;
    }

    private boolean isAddress(int i) {
      return i == numFields() - 1;
    }

    @Override
    public int numFields() {
      return row.numFields(); // minus row-index, plus $row_address
    }

    @Override
    public void setNullAt(int i) {
      throw new UnsupportedOperationException("read-only row");
    }

    @Override
    public void update(int i, Object value) {
      throw new UnsupportedOperationException("read-only row");
    }

    @Override
    public InternalRow copy() {
      return new AddressRow(row.copy(), skip, hi);
    }

    @Override
    public boolean isNullAt(int i) {
      return !isAddress(i) && row.isNullAt(map(i));
    }

    @Override
    public long getLong(int i) {
      return isAddress(i) ? (hi | row.getLong(skip)) : row.getLong(map(i));
    }

    @Override
    public boolean getBoolean(int i) {
      if (isAddress(i)) {
        throw new UnsupportedOperationException(
            "$row_address is a LONG column — use getLong");
      }
      return row.getBoolean(map(i));
    }

    @Override
    public byte getByte(int i) {
      if (isAddress(i)) {
        throw new UnsupportedOperationException(
            "$row_address is a LONG column — use getLong");
      }
      return row.getByte(map(i));
    }

    @Override
    public short getShort(int i) {
      if (isAddress(i)) {
        throw new UnsupportedOperationException(
            "$row_address is a LONG column — use getLong");
      }
      return row.getShort(map(i));
    }

    @Override
    public int getInt(int i) {
      if (isAddress(i)) {
        throw new UnsupportedOperationException(
            "$row_address is a LONG column — use getLong");
      }
      return row.getInt(map(i));
    }

    @Override
    public float getFloat(int i) {
      if (isAddress(i)) {
        throw new UnsupportedOperationException(
            "$row_address is a LONG column — use getLong");
      }
      return row.getFloat(map(i));
    }

    @Override
    public double getDouble(int i) {
      if (isAddress(i)) {
        throw new UnsupportedOperationException(
            "$row_address is a LONG column — use getLong");
      }
      return row.getDouble(map(i));
    }

    @Override
    public Decimal getDecimal(int i, int precision, int scale) {
      if (isAddress(i)) {
        throw new UnsupportedOperationException(
            "$row_address is a LONG column — use getLong");
      }
      return row.getDecimal(map(i), precision, scale);
    }

    @Override
    public UTF8String getUTF8String(int i) {
      if (isAddress(i)) {
        throw new UnsupportedOperationException(
            "$row_address is a LONG column — use getLong");
      }
      return row.getUTF8String(map(i));
    }

    @Override
    public byte[] getBinary(int i) {
      if (isAddress(i)) {
        throw new UnsupportedOperationException(
            "$row_address is a LONG column — use getLong");
      }
      return row.getBinary(map(i));
    }

    @Override
    public org.apache.spark.unsafe.types.GeographyVal getGeography(int i) {
      if (isAddress(i)) {
        throw new UnsupportedOperationException(
            "$row_address is a LONG column — use getLong");
      }
      return row.getGeography(map(i));
    }

    @Override
    public org.apache.spark.unsafe.types.GeometryVal getGeometry(int i) {
      if (isAddress(i)) {
        throw new UnsupportedOperationException(
            "$row_address is a LONG column — use getLong");
      }
      return row.getGeometry(map(i));
    }

    @Override
    public CalendarInterval getInterval(int i) {
      if (isAddress(i)) {
        throw new UnsupportedOperationException(
            "$row_address is a LONG column — use getLong");
      }
      return row.getInterval(map(i));
    }

    @Override
    public org.apache.spark.unsafe.types.VariantVal getVariant(int i) {
      if (isAddress(i)) {
        throw new UnsupportedOperationException(
            "$row_address is a LONG column — use getLong");
      }
      return row.getVariant(map(i));
    }

    @Override
    public InternalRow getStruct(int i, int numFields) {
      if (isAddress(i)) {
        throw new UnsupportedOperationException(
            "$row_address is a LONG column — use getLong");
      }
      return row.getStruct(map(i), numFields);
    }

    @Override
    public ArrayData getArray(int i) {
      if (isAddress(i)) {
        throw new UnsupportedOperationException(
            "$row_address is a LONG column — use getLong");
      }
      return row.getArray(map(i));
    }

    @Override
    public MapData getMap(int i) {
      if (isAddress(i)) {
        throw new UnsupportedOperationException(
            "$row_address is a LONG column — use getLong");
      }
      return row.getMap(map(i));
    }

    @Override
    public Object get(int i, org.apache.spark.sql.types.DataType dataType) {
      if (isAddress(i)) {
        return Long.valueOf(hi | row.getLong(skip));
      }
      return row.get(map(i), dataType);
    }
  }

  /** InternalRow view hiding one ordinal (the trailing row-index column)
   *  from the delegate row. Read-only. */
  static final class OrdinalSkipRow extends InternalRow {
    private final InternalRow row;
    private final int skip;

    OrdinalSkipRow(InternalRow row, int skip) {
      this.row = row;
      this.skip = skip;
    }

    private int map(int i) {
      return i < skip ? i : i + 1;
    }

    @Override
    public int numFields() {
      return row.numFields() - 1;
    }

    @Override
    public void setNullAt(int i) {
      throw new UnsupportedOperationException("read-only row");
    }

    @Override
    public void update(int i, Object value) {
      throw new UnsupportedOperationException("read-only row");
    }

    @Override
    public InternalRow copy() {
      return new OrdinalSkipRow(row.copy(), skip);
    }

    @Override
    public boolean isNullAt(int i) {
      return row.isNullAt(map(i));
    }

    @Override
    public boolean getBoolean(int i) {
      return row.getBoolean(map(i));
    }

    @Override
    public byte getByte(int i) {
      return row.getByte(map(i));
    }

    @Override
    public short getShort(int i) {
      return row.getShort(map(i));
    }

    @Override
    public int getInt(int i) {
      return row.getInt(map(i));
    }

    @Override
    public long getLong(int i) {
      return row.getLong(map(i));
    }

    @Override
    public float getFloat(int i) {
      return row.getFloat(map(i));
    }

    @Override
    public double getDouble(int i) {
      return row.getDouble(map(i));
    }

    @Override
    public Decimal getDecimal(int i, int precision, int scale) {
      return row.getDecimal(map(i), precision, scale);
    }

    @Override
    public UTF8String getUTF8String(int i) {
      return row.getUTF8String(map(i));
    }

    @Override
    public byte[] getBinary(int i) {
      return row.getBinary(map(i));
    }

    @Override
    public org.apache.spark.unsafe.types.GeographyVal getGeography(int i) {
      return row.getGeography(map(i));
    }

    @Override
    public org.apache.spark.unsafe.types.GeometryVal getGeometry(int i) {
      return row.getGeometry(map(i));
    }

    @Override
    public CalendarInterval getInterval(int i) {
      return row.getInterval(map(i));
    }

    @Override
    public org.apache.spark.unsafe.types.VariantVal getVariant(int i) {
      return row.getVariant(map(i));
    }

    @Override
    public InternalRow getStruct(int i, int numFields) {
      return row.getStruct(map(i), numFields);
    }

    @Override
    public ArrayData getArray(int i) {
      return row.getArray(map(i));
    }

    @Override
    public MapData getMap(int i) {
      return row.getMap(map(i));
    }

    @Override
    public Object get(int i, org.apache.spark.sql.types.DataType dataType) {
      return row.get(map(i), dataType);
    }
  }
}
