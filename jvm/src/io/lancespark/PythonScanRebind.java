/*
 * Workaround for an upstream Spark defect in the Python DataSource V2
 * bridge (observed in Spark 4.1.x): `PythonDataSourceV2` caches ONE
 * `readInfo` (pickled partitions + read function) in a mutable field on
 * the TableProvider instance, and `PythonScanBuilder.pushFilters`
 * overwrites it on every push (setReadInfo).  When one DataFrame is
 * reused under DIFFERENT pushed filters in a single plan — a self-union
 * or self-join with per-branch predicates — every PythonScan of that
 * relation executes with the LAST branch's partitions and read function:
 * silently wrong rows with no error (each branch returns the last
 * branch's data).  The physical plan LOOKS right (per-scan
 * PushedFilters), only execution is aliased.
 *
 * This rule runs in the "User Provided Optimizers" batch (AFTER
 * V2ScanRelationPushDown, BEFORE physical planning / any
 * PythonBatch.planInputPartitions call) and rebinds every PythonScan in
 * an aliased group to its own PythonDataSourceV2 clone:
 *
 *   - group all PythonScans in the plan (subqueries included) by the
 *     IDENTITY of their shared `ds`;
 *   - for groups of two or more, give each scan a fresh
 *     PythonDataSourceV2 carrying the original's pickled
 *     `dataSourceInPython` (no re-create roundtrip), and re-push the
 *     scan's own accepted filters through a fresh PythonScanBuilder so
 *     the clone's readInfo is THAT scan's partitions + read function;
 *     scans with no pushed filters keep readInfo unset, and the lazy
 *     no-filter path rebuilds it correctly at execution.
 *
 * Non-aliased plans (group size 1 — the overwhelmingly common case) are
 * untouched: zero overhead, no Python roundtrip.  The rule converges in
 * one pass (after rebinding, every group has size 1), so the fixedPoint
 * batch stops immediately.  Installed at runtime on live sessions by
 * lance_trino_spark.session.install_pyds_scan_rebind via
 * spark.experimental.extraOptimizations — no session rebuild needed.
 */
package io.lancespark;

import java.lang.reflect.Field;
import java.util.ArrayList;
import java.util.IdentityHashMap;
import java.util.List;

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation;
import org.apache.spark.sql.execution.datasources.v2.python.PythonDataSourceV2;
import org.apache.spark.sql.execution.datasources.v2.python.PythonScan;
import org.apache.spark.sql.execution.datasources.v2.python.PythonScanBuilder;
import org.apache.spark.sql.sources.Filter;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

import scala.runtime.AbstractFunction1;
import scala.runtime.BoxedUnit;

public class PythonScanRebind extends Rule<LogicalPlan> {

  private static Field field(Class<?> cls, String name) {
    try {
      Field f = cls.getDeclaredField(name);
      f.setAccessible(true);
      return f;
    } catch (ReflectiveOperationException e) {
      throw new IllegalStateException(
          "PythonScanRebind: Spark internals changed — field " + name
              + " missing on " + cls.getName()
              + "; drop this workaround or update it", e);
    }
  }

  @Override
  public LogicalPlan apply(LogicalPlan plan) {
    final List<PythonScan> scans = new ArrayList<>();
    AbstractFunction1<LogicalPlan, BoxedUnit> visit =
        new AbstractFunction1<LogicalPlan, BoxedUnit>() {
          @Override
          public BoxedUnit apply(LogicalPlan node) {
            if (node instanceof DataSourceV2ScanRelation rel
                && rel.scan() instanceof PythonScan ps) {
              scans.add(ps);
            }
            return BoxedUnit.UNIT;
          }
        };
    plan.foreach(visit);
    scala.collection.Iterator<LogicalPlan> subs =
        plan.subqueriesAll().iterator();
    while (subs.hasNext()) {
      subs.next().foreach(visit);
    }
    if (scans.isEmpty()) {
      return plan;
    }

    Field dsField = field(PythonScan.class, "ds");
    IdentityHashMap<Object, List<PythonScan>> byDs = new IdentityHashMap<>();
    try {
      for (PythonScan s : scans) {
        byDs.computeIfAbsent(dsField.get(s), k -> new ArrayList<>()).add(s);
      }
      for (List<PythonScan> group : byDs.values()) {
        if (group.size() < 2) {
          // Cross-ACTION variant of the same upstream defect: a solo
          // UNFILTERED scan whose ds already carries a readInfo would
          // execute a PREVIOUS action's (possibly filtered) partitions
          // — df.count() after df.filter(...).count() returned the
          // filtered count. Its own planning never pushed (no filters
          // to push), so a non-null slot here is either stale or a
          // previous unfiltered build; clearing it is correct either
          // way (the lazy no-filter path rebuilds unfiltered). A solo
          // FILTERED scan's own push was this pass's last write — its
          // slot is correct, leave it.
          PythonScan solo = group.get(0);
          Filter[] pushed =
              (Filter[]) field(PythonScan.class, "supportedFilters")
                  .get(solo);
          if (pushed == null || pushed.length == 0) {
            Field readInfoField =
                field(PythonDataSourceV2.class, "readInfo");
            Object ds = dsField.get(solo);
            if (readInfoField.get(ds) != null) {
              readInfoField.set(ds, null);
            }
          }
          continue;
        }
        Field nameField = field(PythonScan.class, "shortName");
        Field schemaField = field(PythonScan.class, "outputSchema");
        Field optsField = field(PythonScan.class, "options");
        Field filtersField = field(PythonScan.class, "supportedFilters");
        Field createdField =
            field(PythonDataSourceV2.class, "dataSourceInPython");
        for (PythonScan s : group) {
          PythonDataSourceV2 oldDs = (PythonDataSourceV2) dsField.get(s);
          String shortName = (String) nameField.get(s);
          StructType schema = (StructType) schemaField.get(s);
          CaseInsensitiveStringMap options =
              (CaseInsensitiveStringMap) optsField.get(s);
          Filter[] pushed = (Filter[]) filtersField.get(s);

          PythonDataSourceV2 fresh = new PythonDataSourceV2();
          fresh.setShortName(shortName);
          // reuse the pickled creation result — cloning must not
          // re-run the Python data source constructor
          createdField.set(fresh, createdField.get(oldDs));
          if (pushed != null && pushed.length > 0) {
            // re-derive THIS scan's readInfo (partitions + read
            // function under its own filters) into the private clone
            new PythonScanBuilder(fresh, shortName, schema, options)
                .pushFilters(pushed);
          }
          // unfiltered scans leave readInfo null: the lazy no-filter
          // path (getOrCreateReadInfo) rebuilds it correctly
          dsField.set(s, fresh);
        }
      }
    } catch (IllegalAccessException e) {
      throw new IllegalStateException(
          "PythonScanRebind: reflective rebind failed", e);
    }
    return plan;
  }
}
