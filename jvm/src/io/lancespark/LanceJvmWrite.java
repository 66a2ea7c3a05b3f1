/*
 * Native SQL INSERT through the JVM catalog (SupportsWrite, V1 fallback).
 *
 * Reference surface: the connector's distributed two-phase INSERT
 * (LanceMetadata.java beginInsert/finishInsert — executors stage fragment
 * files, the coordinator commits one Append transaction).  Here the V1Write
 * fallback hands the driver a resolved DataFrame; executors stage parquet
 * part files into a tmp dir (the data plane is Spark's own vectorized
 * parquet writer — same files the Python committer writes), the driver
 * moves them into data/ as fragments with footer-derived row counts, and
 * the manifest append commits via the shared hard-link protocol with
 * retry (append commutes — same loop as the Python committer's append).
 *
 * INSERT OVERWRITE commits an Overwrite manifest instead and, like the
 * Python commit_overwrite, refuses on conflict rather than retrying (the
 * snapshot it replaces is gone).  Zone-map stats come from the parquet
 * footers for the SOUND subset (untagged int columns — see footerStats);
 * other columns carry no stats and are simply never pruned, matching the
 * Python accumulator's conservative poisoning rules.
 */
package io.lancespark;

import java.io.IOException;
import java.nio.file.DirectoryStream;
import java.nio.file.Files;
import java.nio.file.Path;
import java.util.ArrayList;
import java.util.List;
import java.util.Map;
import java.util.Set;
import java.util.UUID;

import com.fasterxml.jackson.databind.JsonNode;
import com.fasterxml.jackson.databind.ObjectMapper;
import com.fasterxml.jackson.databind.node.ArrayNode;
import com.fasterxml.jackson.databind.node.ObjectNode;

import org.apache.hadoop.conf.Configuration;
import org.apache.parquet.hadoop.ParquetFileReader;
import org.apache.parquet.hadoop.util.HadoopInputFile;
import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;

final class LanceJvmWrite {

  private static final ObjectMapper MAPPER = new ObjectMapper();

  private LanceJvmWrite() {}

  static void insert(Path tableDir, Dataset<Row> data, boolean overwrite) {
    // 1. executors stage parquet parts into a tmp dir under the table
    Path tmpDir = tableDir.resolve("data").resolve(".stage-" + UUID.randomUUID());
    data.write().mode("overwrite").parquet(tmpDir.toString());
    List<String> rels = new ArrayList<>();
    List<Long> rowCounts = new ArrayList<>();
    List<ObjectNode> fragStats = new ArrayList<>();
    Configuration conf = new Configuration();
    try {
      Files.createDirectories(tableDir.resolve("data"));
      try (DirectoryStream<Path> s = Files.newDirectoryStream(tmpDir)) {
        List<Path> parts = new ArrayList<>();
        for (Path p : s) {
          String name = p.getFileName().toString();
          if (name.startsWith("part-") && name.endsWith(".parquet")) {
            parts.add(p);
          }
        }
        parts.sort(java.util.Comparator.comparing(Path::toString));
        for (Path p : parts) {
          long rows;
          ObjectNode stats;
          try (ParquetFileReader r = ParquetFileReader.open(
              HadoopInputFile.fromPath(
                  new org.apache.hadoop.fs.Path(p.toString()), conf))) {
            rows = r.getRecordCount();
            stats = footerStats(r);
          }
          if (rows == 0) {
            continue; // empty partitions produce empty parts — skip
          }
          String rel = "data/" + UUID.randomUUID() + ".parquet";
          Files.move(p, tableDir.resolve(rel));
          rels.add(rel);
          rowCounts.add(rows);
          fragStats.add(stats);
        }
      }
      deleteRecursively(tmpDir);
    } catch (IOException e) {
      throw new RuntimeException("staging INSERT fragments failed", e);
    }
    // 2. commit: append retries through conflicts (it commutes),
    //    overwrite refuses on conflict like the Python commit_overwrite
    while (true) {
      long latest = LanceJvmDelete.latestVersion(tableDir);
      JsonNode base = readManifest(tableDir, latest);
      ObjectNode next = ((ObjectNode) base).deepCopy();
      next.put("version", latest + 1);
      next.put("operation", overwrite ? "overwrite" : "append");
      next.put("read_version", latest);
      next.put("timestamp_ms", System.currentTimeMillis());
      next.remove("commit_metadata");
      long maxId = base.path("max_fragment_id").asLong(-1);
      ArrayNode frags = overwrite
          ? MAPPER.createArrayNode()
          : ((ArrayNode) base.get("fragments")).deepCopy();
      long nextId = overwrite ? 0 : maxId + 1;
      for (int i = 0; i < rels.size(); i++) {
        ObjectNode f = MAPPER.createObjectNode();
        f.put("id", nextId);
        f.put("path", rels.get(i));
        f.put("physical_rows", rowCounts.get(i));
        f.set("deletion", MAPPER.nullNode());
        if (fragStats.get(i) != null && fragStats.get(i).size() > 0) {
          f.set("stats", fragStats.get(i));
        }
        frags.add(f);
        nextId++;
      }
      next.set("fragments", frags);
      next.put("max_fragment_id", nextId - 1);
      try {
        LanceJvmDelete.commitManifest(tableDir, latest + 1, next);
        return;
      } catch (IllegalStateException conflict) {
        if (overwrite) {
          throw conflict;
        }
        // append commutes: re-read the new latest and retry
      }
    }
  }

  /** Zone-map stats from the parquet footer — the SOUND subset only:
   *  untagged integer columns (footer int stats are exact; footer
   *  STRING stats are unsound under truncation and float stats under NaN,
   *  so those columns get no stats — a fragment without stats for a
   *  column is simply never pruned on it, conservative-correct, matching
   *  format/fragments.py's poisoning rules). Shape matches the Python
   *  writer: {col: {"min": v, "max": v, "nulls": n}}. */
  static ObjectNode footerStats(ParquetFileReader r) {
    ObjectNode out = MAPPER.createObjectNode();
    Map<String, long[]> agg = new java.util.LinkedHashMap<>(); // min,max,nulls,seen
    Set<String> poisoned = new java.util.HashSet<>();
    for (org.apache.parquet.hadoop.metadata.BlockMetaData block
        : r.getFooter().getBlocks()) {
      for (org.apache.parquet.hadoop.metadata.ColumnChunkMetaData c
          : block.getColumns()) {
        if (c.getPath().size() != 1) {
          continue; // top-level columns only, like the Python accumulator
        }
        String name = c.getPath().toDotString();
        if (poisoned.contains(name)) {
          continue;
        }
        org.apache.parquet.column.statistics.Statistics<?> st = c.getStatistics();
        org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName t =
            c.getPrimitiveType().getPrimitiveTypeName();
        boolean intLike =
            t == org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32
            || t == org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64;
        // only untagged ints/bools: logical annotations (DATE, DECIMAL,
        // TIMESTAMP...) have value spaces the raw footer longs don't match
        if (!intLike || c.getPrimitiveType().getLogicalTypeAnnotation() != null
            || st == null || !st.isNumNullsSet()
            || (!st.hasNonNullValue() && st.getNumNulls() < block.getRowCount())) {
          poisoned.add(name);
          agg.remove(name);
          continue;
        }
        long[] cur = agg.computeIfAbsent(name,
            k -> new long[] {Long.MAX_VALUE, Long.MIN_VALUE, 0, 0});
        cur[2] += st.getNumNulls();
        if (st.hasNonNullValue()) {
          cur[0] = Math.min(cur[0], ((Number) st.genericGetMin()).longValue());
          cur[1] = Math.max(cur[1], ((Number) st.genericGetMax()).longValue());
          cur[3] = 1;
        }
      }
    }
    for (Map.Entry<String, long[]> e : agg.entrySet()) {
      ObjectNode s = MAPPER.createObjectNode();
      long[] v = e.getValue();
      if (v[3] == 1) {
        s.put("min", v[0]);
        s.put("max", v[1]);
      }
      s.put("nulls", v[2]);
      out.set(e.getKey(), s);
    }
    return out;
  }

  private static JsonNode readManifest(Path tableDir, long version) {
    try {
      return MAPPER.readTree(Files.readAllBytes(
          tableDir.resolve("_versions").resolve(version + ".manifest.json")));
    } catch (IOException e) {
      throw new RuntimeException("reading manifest v" + version + " failed", e);
    }
  }

  private static void deleteRecursively(Path p) {
    try (DirectoryStream<Path> s = Files.newDirectoryStream(p)) {
      for (Path c : s) {
        if (Files.isDirectory(c)) {
          deleteRecursively(c);
        } else {
          Files.delete(c);
        }
      }
      Files.delete(p);
    } catch (IOException ignored) {
      // best-effort tmp cleanup
    }
  }
}
