"""Read-side data skipping: zone-map file pruning over clustered layouts.

The read-side half of ``sinks.writer.write_range_clustered`` (which
lays files out with disjoint per-file [min, max] envelopes on the
cluster column).  A point or range predicate on that column should
read ONE file, not all of them — this module makes that happen from
plain Spark + parquet, the way Delta's file-level stats / Iceberg's
manifest min-max do it:

- ``build_zonemap``: one distributed scan produces the per-file
  (file, min, max, rows) table — O(#files) rows, built ONCE and
  amortized over every subsequent query.  At 100 TB the zonemap for a
  100k-file table is ~100k rows: driver-collectable metadata, the same
  scale contract as Iceberg's manifests.
- ``footer_zonemap``: the no-extra-scan variant — reads parquet FOOTER
  statistics via pyarrow (pure metadata IO, no data pages touched).
  Right after a write, when the files were just produced and a full
  scan would be wasteful; footer stats are what the writer already
  persisted for free.
- ``skipping_scan``: prunes the file list against the predicate's
  [lo, hi] envelope, reads only surviving files, and RE-APPLIES the
  exact predicate (the zonemap admits false positives — a surviving
  file can still hold rows outside the range; it can never hold a
  false negative, which is the correctness contract).

Parity note: mirrors the file/row-group statistics pruning of the
reference's scan path at the FILE granularity; row-group granularity
inside each surviving file is Spark's own parquet filter pushdown,
which composes with this (``PushedFilters`` in the scan node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_zonemap(spark: SparkSession, path: str, col: str) -> DataFrame:
    """Per-file [min, max, rows] envelope table for ``col``.

    One aggregation grouped on ``input_file_name()`` — combinable
    map-side, shuffles only #files rows.  Persist the result next to
    the table (a normal parquet write) and every reader prunes from it
    without touching the data again.
    """
    # mergeSchema: on a schema-evolved layout the default read may pick
    # a vintage that predates `col`; merged, old files contribute NULL
    # min/max → unknown stats → never pruned (the safe degradation)
    return (
        spark.read.option("mergeSchema", "true").parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(col).alias("zmin"),
            F.max(col).alias("zmax"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def _data_files(path: str) -> list[str]:
    """Parquet DATA files under ``path`` — excludes entries under
    ``_``/``.``-prefixed components (Spark's hidden-file convention:
    `_SUCCESS`, `_zonemap`, checkpoint metadata), matching what
    ``spark.read.parquet`` itself would list.
    """
    import glob
    import os

    out = []
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        rel = os.path.relpath(f, path)
        if any(p.startswith(("_", ".")) for p in rel.split(os.sep)):
            continue
        out.append(f)
    return out


def footer_zonemap(path: str, col: str) -> list[tuple[str, object, object, int]]:
    """Per-file envelopes from parquet FOOTER statistics — metadata-only
    IO (no data pages), no Spark job.

    Returns ``[(file_path, min, max, n_rows), ...]``.  Driver-side by
    design: footers are a few KiB each and the file count bounds the
    work — the same O(#files) contract as a manifest listing.  On an
    object store this is one ranged GET per file; for hot tables
    prefer the persisted ``build_zonemap`` output.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    out: list[tuple[str, object, object, int]] = []
    for f in sorted(_data_files(path)):
        md = pq.ParquetFile(f).metadata
        if col not in md.schema.names:
            # schema-evolved vintage (file predates the column) or a
            # Hive partition column (never in the footer): unknown
            # stats — the file is unprunable, never an error
            out.append((f, None, None, md.num_rows))
            continue
        idx = md.schema.names.index(col)
        lo, hi, rows = None, None, 0
        prunable = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            rows += md.row_group(rg).num_rows
            if st is None or not st.has_min_max:
                # a row group without stats makes the file unprunable
                prunable = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((f, lo, hi, rows) if prunable else (f, None, None, rows))
    return out


def prune_files(
    zonemap: list[tuple[str, object, object, int]],
    lo: object | None,
    hi: object | None,
) -> list[str]:
    """Files whose [zmin, zmax] envelope intersects [lo, hi].

    ``None`` bounds are open (half-range predicates).  A file with
    unknown stats (``zmin is None``) always survives — skipping may
    only ever drop files PROVEN irrelevant.
    """
    keep = []
    for f, zmin, zmax, _rows in zonemap:
        if zmin is None or zmax is None:
            keep.append(f)
            continue
        if lo is not None and zmax < lo:
            continue
        if hi is not None and zmin > hi:
            continue
        keep.append(f)
    return keep


def skipping_scan(
    spark: SparkSession,
    path: str,
    col: str,
    lo: object | None = None,
    hi: object | None = None,
    zonemap: list[tuple[str, object, object, int]] | None = None,
) -> DataFrame:
    """Range scan that reads only files whose envelope can match.

    The exact predicate is re-applied after pruning: the envelope test
    is necessary, not sufficient.  With a ``write_range_clustered``
    layout the surviving set for a point lookup is one file; with an
    unclustered layout pruning degrades gracefully to a full file
    list — never a wrong answer.
    """
    zmap = zonemap if zonemap is not None else footer_zonemap(path, col)
    files = prune_files(zmap, lo, hi)
    if not files:
        # no file can match: an empty frame with the table's schema
        return spark.read.parquet(path).where(F.lit(False))
    # basePath keeps Hive partition columns in the schema when reading
    # a pruned subset of a partitioned layout — without it the two
    # branches (pruned vs empty-prune) would return different schemas
    df = spark.read.option("basePath", path).parquet(*files)
    if lo is not None:
        df = df.where(F.col(col) >= F.lit(lo))
    if hi is not None:
        df = df.where(F.col(col) <= F.lit(hi))
    return df


# --- persisted zonemaps: the maintenance-loop artifact -----------------------

#: zonemap artifacts live under an underscore directory — Spark's file
#: listing ignores `_`/`.`-prefixed entries, so the map never pollutes
#: reads of the table itself (the `_SUCCESS` convention)
_ZONEMAP_DIR = "_zonemap"


def persist_zonemap(spark: SparkSession, path: str, col: str) -> int:
    """Build and persist the zonemap for ``col`` at
    ``<path>/_zonemap/<col>/`` — the nightly-maintenance artifact that
    lets every subsequent reader prune without touching data OR
    footers.  Returns the number of files mapped.
    """
    zmap = build_zonemap(spark, path, col)
    target = f"{path}/{_ZONEMAP_DIR}/{col}"
    zmap.coalesce(1).write.mode("overwrite").parquet(target)
    return spark.read.parquet(target).count()


def load_zonemap(
    spark: SparkSession, path: str, col: str
) -> list[tuple[str, object, object, int]] | None:
    """Load a persisted zonemap and RECONCILE it against the live file
    listing — the property that makes a stale map safe:

    - a file in the map but gone from disk (compacted away) is dropped
      from the map (reading it would error);
    - a file on disk but missing from the map (appended since the last
      refresh) enters with unknown stats, so it ALWAYS survives
      pruning — skipping degrades, correctness doesn't.

    Returns ``None`` when no map was ever persisted (callers fall back
    to ``footer_zonemap``).  Reconciliation is a driver-side directory
    listing — O(#files), the same metadata contract as pruning itself.
    """
    import os

    target = f"{path}/{_ZONEMAP_DIR}/{col}"
    if not os.path.isdir(target):
        return None
    mapped = {
        r["file"].removeprefix("file://"): (r["zmin"], r["zmax"], r["n_rows"])
        for r in spark.read.parquet(target).collect()
    }
    live = set(_data_files(path))
    out: list[tuple[str, object, object, int]] = []
    for f in sorted(live):
        if f in mapped:
            lo, hi, rows = mapped[f]
            out.append((f, lo, hi, rows))
        else:
            out.append((f, None, None, -1))  # unmapped: never pruned
    return out


def refresh_zonemap_incremental(
    spark: SparkSession, path: str, col: str
) -> tuple[int, int, int]:
    """Bring the persisted zonemap up to date touching only CHANGED
    files: footer-read the files missing from the map (appends since
    the last refresh), drop entries whose files are gone (compaction),
    keep everything else verbatim.  Returns (kept, added, dropped).

    The cost model is the point: a full ``persist_zonemap`` rebuild
    scans the whole table; this pays O(new files) footer reads + one
    tiny metadata write — the nightly cadence for an append-mostly
    table, with the full rebuild reserved for after a clustering
    rewrite.  Falls back to a full build when no map exists yet.
    """
    import os

    import pyarrow.parquet as pq

    target = f"{path}/{_ZONEMAP_DIR}/{col}"
    if not os.path.isdir(target):
        return (0, persist_zonemap(spark, path, col), 0)
    raw = spark.read.parquet(target)
    raw_rows = raw.collect()
    live = set(_data_files(path))
    kept_rows = [
        r for r in raw_rows if r["file"].removeprefix("file://") in live
    ]
    dropped = len(raw_rows) - len(kept_rows)
    known = {r["file"].removeprefix("file://") for r in kept_rows}
    new_rows = []
    for f in sorted(live - known):
        md = pq.ParquetFile(f).metadata
        if col not in md.schema.names:
            # evolved vintage / partition column: unknown stats, file
            # degrades to unprunable instead of aborting the refresh
            new_rows.append(("file://" + f, None, None, md.num_rows))
            continue
        idx = md.schema.names.index(col)
        lo, hi, rows, prunable = None, None, 0, True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            rows += md.row_group(rg).num_rows
            if st is None or not st.has_min_max:
                prunable = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if not prunable:
            lo = hi = None
        new_rows.append(("file://" + f, lo, hi, rows))
    merged = spark.createDataFrame(
        [tuple(r) for r in kept_rows] + new_rows, raw.schema
    )
    # write via a temp dir: the overwrite would otherwise delete the
    # very files the kept rows were just read from mid-plan
    merged_rows = merged.collect()
    spark.createDataFrame(merged_rows, raw.schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(target)
    return (len(kept_rows), len(new_rows), dropped)


def skipping_scan_multi(
    spark: SparkSession,
    path: str,
    preds: list[tuple[str, object | None, object | None]],
) -> DataFrame:
    """Conjunctive multi-column range scan through file skipping: the
    surviving file set is the INTERSECTION of each column's zonemap
    prune — the read-side payoff of a Z-order clustered layout
    (`sinks/writer.py::write_zorder_clustered`), where every file's
    footer stats bound a box in the clustered dimensions.

    Exactly like :func:`skipping_scan`, the envelope test is necessary
    but not sufficient, so every predicate re-applies on the survivors;
    an unclustered layout degrades to reading every file — never a
    wrong answer.  Pruning cost is O(#files × #preds) footer metadata.
    """
    surviving: set[str] | None = None
    for col, lo, hi in preds:
        zmap = footer_zonemap(path, col)
        files = set(prune_files(zmap, lo, hi))
        surviving = files if surviving is None else (surviving & files)
    files_list = sorted(surviving or set())
    if not files_list:
        df = spark.read.parquet(path).where(F.lit(False))
    else:
        df = spark.read.option("basePath", path).parquet(*files_list)
    for col, lo, hi in preds:
        if lo is not None:
            df = df.where(F.col(col) >= F.lit(lo))
        if hi is not None:
            df = df.where(F.col(col) <= F.lit(hi))
    return df
