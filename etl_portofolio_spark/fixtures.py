"""Content-keyed derived-fixture cache.

Several registry queries exercise write-then-read machinery (zonemap
layouts, WAP snapshot stores, materialized views, bucketed warehouses)
and therefore derive an on-disk fixture from the sf tables.  The
fixture is a CACHE: the oracle always recomputes from the source
parquet, so a fixture that drifts from the sources silently returns
wrong answers while row counts still match — the exact failure mode
the r6 verdict traced through `wap_time_travel_delta`.

Two rules make stale or partial state unservable:

1. **Content keying** — the cache path embeds a fingerprint of the
   source tables (file names + sizes + mtimes).  Regenerated testdata
   changes the fingerprint, which changes the path, which forces a
   rebuild; an old cache for old data is simply never addressed again.

2. **Atomic publish** — builds write into a process-unique temp dir
   and `os.rename` it into place.  A concurrent reader either sees the
   complete fixture or none at all; a lost build race discards its own
   temp dir and uses the winner's.

Stale fingerprint dirs are garbage, not hazards — best-effort cleanup
removes siblings for the same sf_dir once a new fingerprint appears.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid
from collections.abc import Callable

#: version tag baked into fixture paths — bump when fixture-building
#: logic changes so dirs from older code can never be reused
FIXTURE_TAG = "r7a"

_ROOT = os.path.join("/tmp", f"spark_graft_fixtures_{FIXTURE_TAG}")


def source_fingerprint(sf_dir: str) -> str:
    """Fingerprint of the source tables: names + sizes + mtimes.

    mtime_ns + size changes on any regeneration of the testdata (a
    byte-identical rewrite that also forges mtimes is out of scope —
    that is not drift, that is an attack).  O(#files) stat calls,
    no data IO.
    """
    parts: list[str] = []
    try:
        with os.scandir(sf_dir) as it:
            for e in sorted(it, key=lambda e: e.name):
                if e.name.endswith(".parquet"):
                    st = e.stat()
                    parts.append(f"{e.name}:{st.st_size}:{st.st_mtime_ns}")
    except FileNotFoundError:
        parts.append("missing")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def fixture_dir(sf_dir: str, name: str) -> str:
    """Cache location keyed by sf_dir path AND source-content fingerprint."""
    path_key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    return os.path.join(
        _ROOT, f"{path_key}-{source_fingerprint(sf_dir)}", name
    )


def _sweep_stale_siblings(current_key_dir: str) -> None:
    """Drop cache dirs for the same sf_dir with an outdated fingerprint."""
    path_key = os.path.basename(current_key_dir).split("-")[0]
    try:
        siblings = os.listdir(_ROOT)
    except FileNotFoundError:
        return
    for d in siblings:
        if d.startswith(f"{path_key}-") and d != os.path.basename(
            current_key_dir
        ):
            shutil.rmtree(os.path.join(_ROOT, d), ignore_errors=True)


def ensure_fixture(
    sf_dir: str,
    name: str,
    build: Callable[[str], None],
    ready: Callable[[str], bool] | None = None,
) -> str:
    """Return the fixture path, building it atomically if absent.

    ``build(tmp_path)`` must materialize the complete fixture under
    ``tmp_path``; it is then renamed into place in one syscall.
    ``ready(path)`` decides whether an existing dir is complete
    (default: a ``_SUCCESS`` marker exists — Spark writes one per
    parquet directory).
    """
    path = fixture_dir(sf_dir, name)
    is_ready = ready or (
        lambda p: os.path.exists(os.path.join(p, "_SUCCESS"))
    )
    if is_ready(path):
        return path
    key_dir = os.path.dirname(path)
    _sweep_stale_siblings(key_dir)
    # NOT dot/underscore-prefixed: Spark's file index treats those as
    # hidden, which breaks builders that read their own staged files
    # back (e.g. create_rollup_mv's audit).  The temp dir lives beside
    # the fixture (never inside it), so no production reader lists it.
    tmp = os.path.join(
        key_dir, f"tmpbuild-{name}-{os.getpid()}-{uuid.uuid4().hex[:6]}"
    )
    os.makedirs(tmp, exist_ok=True)
    try:
        build(tmp)
        if not is_ready(tmp):
            raise RuntimeError(
                f"fixture build for {name} produced an incomplete dir "
                f"(ready() false on {tmp})"
            )
        # half-built leftovers (a crashed earlier build) must not block
        # the atomic publish; a COMPLETE dir (is_ready) is never removed
        if os.path.isdir(path) and not is_ready(path):
            shutil.rmtree(path, ignore_errors=True)
        try:
            os.rename(tmp, path)
        except OSError:
            # lost the build race — the winner's dir is complete; keep it
            if not is_ready(path):
                raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return path
