"""Production table maintenance for snapshot tables: compact (optionally
clustered), then expire old snapshots — the job a 100 TB deployment runs
on a schedule so file counts (and thus manifest size and scan planning)
stay bounded and range queries keep pruning.

Usage::

    zip -qr engine.zip ocr_spark
    spark-submit --master <cluster> --py-files engine.zip \\
        scripts/table_maintenance_job.py <table_root> \\
        [--target-mb 128] [--cluster-by COL | --zorder-by COL,COL] \\
        [--keep-last 2]

Prints one JSON line: files before/after, snapshots dropped, data files
deleted, and (when --cluster-by / --zorder-by is given) a before/after
probe of how many files a mid-domain range query opens — probed on the
cluster column, or on EVERY z-order column (the multi-dimension pruning
is the point of the z layout).
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if len(args) < 1:
        print(__doc__)
        sys.exit(2)
    root = args[0]

    def opt(name: str, default):
        flag = f"--{name}"
        for i, a in enumerate(sys.argv[1:-1], 1):
            if a == flag:
                return sys.argv[i + 1]
        return default

    target_mb = int(opt("target-mb", 128))
    cluster_by = opt("cluster-by", None)
    zorder_by = opt("zorder-by", None)
    zorder_cols = zorder_by.split(",") if zorder_by else None
    keep_last = int(opt("keep-last", 2))

    from ocr_spark import tables_snapshot as snap
    from ocr_spark.session import build_session

    spark = build_session(app_name="table-maintenance")
    t0 = time.monotonic()
    before = snap._read_snapshot(root, snap.current_version(root))
    probe_cols = zorder_cols or ([cluster_by] if cluster_by else [])
    probe_ranges = {}
    probe_before = {} if probe_cols else None
    probe_after = None
    for col in probe_cols:
        mm = [
            s.get("minmax", {}).get(col)
            for s in before.get("stats", {}).values()
        ]
        mm = [m for m in mm if m]
        if mm and all(isinstance(m[0], (int, float)) for m in mm):
            lo = min(m[0] for m in mm)
            hi = max(m[1] for m in mm)
            mid, span = (lo + hi) / 2, (hi - lo) / 100 or 1
            probe_ranges[col] = (mid, mid + span)
            _, probe_before[col], _ = snap.read_where(
                spark, root, col, mid, mid + span
            )
    v = snap.compact(
        spark, root, target_file_bytes=target_mb << 20,
        cluster_by=cluster_by, zorder_by=zorder_cols,
    )
    after = snap._read_snapshot(root, v)
    if probe_ranges:
        probe_after = {}
        for col, (lo_p, hi_p) in probe_ranges.items():
            _, probe_after[col], _ = snap.read_where(
                spark, root, col, lo_p, hi_p
            )
    dropped, deleted = snap.expire(root, keep_last=keep_last)
    print(json.dumps({
        "table": root,
        "version": v,
        "files_before": len(before["files"]),
        "files_after": len(after["files"]),
        "snapshots_dropped": dropped,
        "data_files_deleted": deleted,
        "range_probe_files_before": probe_before,
        "range_probe_files_after": probe_after,
        "wall_sec": round(time.monotonic() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
