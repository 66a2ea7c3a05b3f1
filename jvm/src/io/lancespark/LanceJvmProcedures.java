/*
 * Vanilla-SQL maintenance surface: Spark 4.1 stored procedures
 * (ProcedureCatalog / CALL) over the own-format metadata plane — the
 * statements the router serves (RESTORE, CREATE/DROP TAG) become plain
 * `CALL lance.system.restore('db.t', 3)` in an unmodified session. All
 * three are metadata-only (one manifest or one _refs file), mirror the
 * Python implementations exactly (format/dataset.py restore,
 * format/refs.py tags — same JSON layouts, same commit protocol), and
 * commit through the shared hard-link path so the two planes
 * conflict-detect against each other. The reference has no procedure
 * surface at all (SURVEY §2C); this is a beyond-reference addition.
 */
package io.lancespark;

import java.io.IOException;
import java.nio.charset.StandardCharsets;
import java.nio.file.Files;
import java.nio.file.Path;
import java.nio.file.StandardOpenOption;
import java.util.Collections;
import java.util.Iterator;
import java.util.regex.Pattern;

import com.fasterxml.jackson.databind.JsonNode;
import com.fasterxml.jackson.databind.ObjectMapper;
import com.fasterxml.jackson.databind.node.ObjectNode;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.connector.catalog.procedures.BoundProcedure;
import org.apache.spark.sql.connector.catalog.procedures.ProcedureParameter;
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure;
import org.apache.spark.sql.connector.read.LocalScan;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.unsafe.types.UTF8String;

final class LanceJvmProcedures {
  private static final ObjectMapper MAPPER = new ObjectMapper();
  private static final Pattern TAG_OK =
      Pattern.compile("^[A-Za-z0-9][A-Za-z0-9._-]{0,99}$");

  private LanceJvmProcedures() {}

  /** Resolve "db.table" against the catalog root (same layout the
   *  TableCatalog uses: {@code <root>/<db>/<table>.lance}). */
  private static Path tableDir(Path root, String qualified) {
    String[] parts = qualified.split("\\.", 2);
    if (parts.length != 2 || parts[0].isEmpty() || parts[1].isEmpty()) {
      throw new IllegalArgumentException(
          "table must be '<namespace>.<table>', got: " + qualified);
    }
    Path dir = root.resolve(parts[0]).resolve(parts[1] + ".lance");
    if (!Files.isDirectory(dir.resolve("_versions"))) {
      throw new IllegalArgumentException("no such table: " + qualified);
    }
    // native binary-manifest tables: their restore/tags live in the
    // Python surface (native_restore / native_create_tag, or the SQL
    // router) — refuse before a JSON parse produces a confusing error
    try (var s = Files.list(dir.resolve("_versions"))) {
      if (s.anyMatch(p -> p.getFileName().toString().endsWith(".manifest"))) {
        throw new UnsupportedOperationException(
            "table " + qualified + " is a native .lance dataset — use "
            + "native_restore / native_create_tag (or the SQL router); "
            + "these procedures serve the JSON-manifest format");
      }
    } catch (IOException e) {
      throw new RuntimeException("listing versions failed", e);
    }
    return dir;
  }

  private static JsonNode readManifest(Path dir, long version) {
    Path p = dir.resolve("_versions").resolve(version + ".manifest.json");
    try {
      return MAPPER.readTree(Files.readString(p));
    } catch (IOException e) {
      throw new IllegalArgumentException(
          "no such version " + version + " of " + dir, e);
    }
  }

  private static Iterator<Scan> oneRow(StructType schema, Object... vals) {
    InternalRow row =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals);
    Scan s = new LocalScan() {
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
        return "lance-procedure-result";
      }
    };
    return Collections.singletonList(s).iterator();
  }

  /** One-shape helper: all three procedures bind fixed IN parameters and
   *  run a metadata-only body on the driver. */
  private abstract static class Proc implements UnboundProcedure, BoundProcedure {
    private final String name;
    private final ProcedureParameter[] params;

    Proc(String name, ProcedureParameter... params) {
      this.name = name;
      this.params = params;
    }

    @Override
    public String name() {
      return name;
    }

    @Override
    public String description() {
      return "lance." + name;
    }

    @Override
    public BoundProcedure bind(StructType inputType) {
      return this;
    }

    @Override
    public ProcedureParameter[] parameters() {
      return params;
    }

    @Override
    public boolean isDeterministic() {
      return false; // commits a version / mutates refs
    }
  }

  /** CALL lance.system.restore('db.t', v) — format/dataset.py restore
   *  verbatim: the target version's schema, fragments AND properties
   *  republish at latest+1 (operation 'restore', read_version = target),
   *  the max_fragment_id watermark carries forward from the CURRENT
   *  manifest so post-target fragment ids stay retired forever. */
  static UnboundProcedure restore(Path root) {
    return new Proc("restore",
        ProcedureParameter.in("table", DataTypes.StringType).build(),
        ProcedureParameter.in("version", DataTypes.LongType).build()) {
      @Override
      public Iterator<Scan> call(InternalRow args) {
        Path dir = tableDir(root, args.getUTF8String(0).toString());
        long version = args.getLong(1);
        JsonNode target = readManifest(dir, version);
        while (true) {
          long latest = LanceJvmDelete.latestVersion(dir);
          JsonNode base = readManifest(dir, latest);
          ObjectNode next = MAPPER.createObjectNode();
          next.put("version", latest + 1);
          next.set("schema", target.get("schema").deepCopy());
          next.set("fragments", target.get("fragments").deepCopy());
          next.put("operation", "restore");
          next.put("read_version", version);
          next.put("timestamp_ms", System.currentTimeMillis());
          next.put("max_fragment_id",
              base.path("max_fragment_id").asLong(-1));
          next.set("properties", target.path("properties").isObject()
              ? target.get("properties").deepCopy()
              : MAPPER.createObjectNode());
          try {
            LanceJvmDelete.commitManifest(dir, latest + 1, next);
            return oneRow(
                new StructType()
                    .add("restored_to", DataTypes.LongType, false)
                    .add("new_version", DataTypes.LongType, false),
                Long.valueOf(version), Long.valueOf(latest + 1));
          } catch (IllegalStateException conflict) {
            // lost the commit race — rebase on the new latest and retry
          }
        }
      }
    };
  }

  /** CALL lance.system.create_tag('db.t', 'name'[, version]) —
   *  format/refs.py create_tag: one _refs/<name>.json, atomic-exclusive
   *  create (racers lose loudly), version defaults to latest. */
  static UnboundProcedure createTag(Path root) {
    return new Proc("create_tag",
        ProcedureParameter.in("table", DataTypes.StringType).build(),
        ProcedureParameter.in("tag", DataTypes.StringType).build(),
        ProcedureParameter.in("version", DataTypes.LongType)
            .defaultValue("-1").build()) {
      @Override
      public Iterator<Scan> call(InternalRow args) {
        Path dir = tableDir(root, args.getUTF8String(0).toString());
        String tag = args.getUTF8String(1).toString();
        long version = args.isNullAt(2) ? -1L : args.getLong(2);
        if (!TAG_OK.matcher(tag).matches()) {
          throw new IllegalArgumentException(
              "invalid tag name '" + tag + "' (alnum start, then "
              + "alnum/._-)");
        }
        if (version < 0) {
          version = LanceJvmDelete.latestVersion(dir);
        }
        readManifest(dir, version); // must exist
        Path refs = dir.resolve("_refs");
        try {
          Files.createDirectories(refs);
          Files.write(refs.resolve(tag + ".json"),
              ("{\"version\": " + version + "}")
                  .getBytes(StandardCharsets.UTF_8),
              StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE);
        } catch (java.nio.file.FileAlreadyExistsException e) {
          throw new IllegalArgumentException(
              "tag '" + tag + "' already exists", e);
        } catch (IOException e) {
          throw new RuntimeException("tag write failed", e);
        }
        return oneRow(
            new StructType()
                .add("tag", DataTypes.StringType, false)
                .add("version", DataTypes.LongType, false),
            UTF8String.fromString(tag), Long.valueOf(version));
      }
    };
  }

  /** CALL lance.system.drop_tag('db.t', 'name') — refs.py delete_tag. */
  static UnboundProcedure dropTag(Path root) {
    return new Proc("drop_tag",
        ProcedureParameter.in("table", DataTypes.StringType).build(),
        ProcedureParameter.in("tag", DataTypes.StringType).build()) {
      @Override
      public Iterator<Scan> call(InternalRow args) {
        Path dir = tableDir(root, args.getUTF8String(0).toString());
        String tag = args.getUTF8String(1).toString();
        if (!TAG_OK.matcher(tag).matches()) {
          throw new IllegalArgumentException("invalid tag name: " + tag);
        }
        try {
          if (!Files.deleteIfExists(
              dir.resolve("_refs").resolve(tag + ".json"))) {
            throw new IllegalArgumentException("no such tag: " + tag);
          }
        } catch (IOException e) {
          throw new RuntimeException("tag delete failed", e);
        }
        return oneRow(
            new StructType().add("dropped", DataTypes.StringType, false),
            UTF8String.fromString(tag));
      }
    };
  }
}
