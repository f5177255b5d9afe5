"""The engine's query surface.

Modules register their queries into :mod:`.registry`; importing this package
pulls in every operator family so ``registry.QUERIES`` is fully populated.
"""

from distributed_video_analytics_flink_spark.operators import (  # noqa: F401
    audio,
    curation,
    dedup,
    relational,
    scalars,
    similarity,
    sketches,
    sql_surface,
    text_analysis,
    video,
    web,
)
from distributed_video_analytics_flink_spark.operators.registry import (  # noqa: F401
    QUERIES,
    QuerySpec,
    oracle_sql,
    queries,
)

# The driver checks only the FIRST 50 registered queries per round; the
# registry holds more than that (len(QUERIES) — README carries the current
# count, test-enforced), so a static order would leave the rest permanently
# unchecked. Worse, old evidence rots two ways: environment shifts (the r03
# testdata regeneration invalidated every r01 row) and CODE shifts (a
# rewritten query keeps its pre-rewrite green rounds — ADVICE r4). We
# therefore key registration order on LEAST-RECENTLY-DRIVER-CHECKED, read
# dynamically from the CORRECTNESS_r*.json files the driver leaves in the
# repo root, and bind each evidence row to the md5 of the query's source at
# the time the evidence was first observed (QUERY_EVIDENCE_HASHES.json):
# queries never checked, stale-checked, or REWRITTEN since their last check
# register first and re-earn a fresh driver row.

_SIDECAR = "QUERY_EVIDENCE_HASHES.json"


def _query_source_hash(spec) -> str:
    """md5 over the query function's source + its oracle SQL — the identity
    a driver-green row certifies. A comment-only edit also invalidates
    (conservative: triggers one extra re-check, never a stale pass)."""
    import hashlib
    import inspect

    try:
        src = inspect.getsource(spec.fn)
    except (OSError, TypeError):  # source unavailable (REPL/frozen): name only
        src = spec.fn.__qualname__
    return hashlib.md5((src + "\n" + (spec.oracle or "")).encode()).hexdigest()


def _last_checked_round(root: str | None = None) -> dict[str, int]:
    """Map query name -> highest round whose CORRECTNESS file has a
    fully-passing row for it (rows+schema green; hash green when an oracle
    exists) AND whose recorded source hash still matches the query's
    current source. A FAILED row is not evidence — the query must re-enter
    the window next round, so failures don't count as "checked"; neither
    does a green row for source that has since been rewritten. Missing or
    unreadable files degrade to {} (original order kept). ``root`` defaults
    to the repo root (where the driver writes the files); injectable for
    tests.

    Side effect: newly-observed (name, round) evidence rows are recorded in
    QUERY_EVIDENCE_HASHES.json with the query's CURRENT source hash. This
    is sound because the registry is imported at round start, before any
    in-round rewrite: the source now is the source the driver just tested.
    Names absent from the registry (renamed/removed queries, synthetic test
    fixtures) are counted without hash binding — they cannot affect the
    ordering of real queries."""
    import glob
    import json
    import os
    import re

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    green_rows: list[tuple[str, int]] = []
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle":
                # rows-only check (by design): the query ran and returned
                # rows — that IS its evidence.
                green = row.get("spark_rows") is not None
            elif row.get("err"):
                green = False
            else:
                green = bool(row.get("rows_match")) and row.get("schema_match") in (True, None)
                if row.get("hash_match") is not None:
                    green = green and bool(row["hash_match"])
            if green:
                green_rows.append((name, rnd))

    sidecar_path = os.path.join(root, _SIDECAR)
    try:
        with open(sidecar_path) as fh:
            sidecar = json.load(fh)
        if not isinstance(sidecar, dict):
            sidecar = {}
    except (OSError, ValueError):
        sidecar = {}

    last: dict[str, int] = {}
    changed = False
    for name, rnd in green_rows:
        spec = QUERIES.get(name)
        if spec is None:
            last[name] = max(last.get(name, 0), rnd)
            continue
        cur = _query_source_hash(spec)
        rec = sidecar.setdefault(name, {})
        if str(rnd) not in rec:
            rec[str(rnd)] = cur
            changed = True
        if rec[str(rnd)] == cur:
            last[name] = max(last.get(name, 0), rnd)
    if changed:
        try:
            tmp = sidecar_path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(sidecar, fh, indent=1, sort_keys=True)
            os.replace(tmp, sidecar_path)
        except OSError:
            pass  # read-only checkout: ordering still correct this run
    return last


def _reorder_for_driver_window() -> None:
    last = _last_checked_round()
    idx = {name: i for i, name in enumerate(QUERIES)}
    ordered = sorted(QUERIES, key=lambda n: (last.get(n, 0), idx[n]))
    specs = {name: QUERIES[name] for name in ordered}
    QUERIES.clear()
    QUERIES.update(specs)


_reorder_for_driver_window()
