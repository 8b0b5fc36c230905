"""Registry invariants: one authoritative query count (docs pinned to
``len(queries())`` so the number can't drift), and the deterministic
least-recently-sampled rotation that bounds how many rounds any query
can go without a driver-recorded correctness row."""

from __future__ import annotations

import json
import os
import re

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.abspath(entry.__file__))


def test_readme_count_matches_registry():
    n = len(entry.queries())
    text = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"(\d+)-query Spark-vs-DuckDB value gate", text)
    assert m, "README must cite the registry count next to gate_check"
    assert int(m.group(1)) == n, (
        f"README says {m.group(1)} queries, registry has {n} — "
        "update the README (the count is len(__spark_entry__.queries()))"
    )


def test_every_query_has_oracle_or_documented_exception():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    missing = set(qs) - set(oracles)
    # rows-only checks are allowed but must be the rare exception
    assert not missing, f"queries without a value oracle: {sorted(missing)}"


def test_zone_join_dateline_straddles_both_sides():
    """VERDICT round-6 done-criterion for the zone_join_dateline gate:
    the match set must include points on BOTH sides of ±180° (east
    lon > 0 and west lon < 0 after the dateline shift). DuckDB-only —
    the gate SQL is shared text, and the driver separately verifies
    Spark == DuckDB values."""
    import duckdb

    from spinix_spark.queries_geo import (
        _LON_SHIFTED,
        _PTS,
        Q_ZONE_JOIN_DATELINE,
        Q_ZONE_JOIN_POLAR,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    east, west = con.execute(
        f"SELECT SUM(CASE WHEN s.lon > 0 THEN 1 ELSE 0 END),"
        f" SUM(CASE WHEN s.lon < 0 THEN 1 ELSE 0 END)"
        f" FROM ({Q_ZONE_JOIN_DATELINE}) j JOIN"
        f" (SELECT doc_id, {_LON_SHIFTED} AS lon FROM {_PTS} p) s"
        f" USING (doc_id)"
    ).fetchone()
    assert east and west, (east, west)
    (n_polar,) = con.execute(
        f"SELECT COUNT(*) FROM ({Q_ZONE_JOIN_POLAR})"
    ).fetchone()
    assert n_polar > 0


def test_rotation_orders_least_recently_sampled_first():
    """The registry prefix (what the driver samples) must lead with
    never-sampled queries, then ascend by last-sampled round — the
    property that guarantees bounded-round driver coverage."""
    last: dict[str, int] = {}
    for f in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f)
        if not m:
            continue
        rnd = int(m.group(1))
        for name in json.load(open(os.path.join(REPO, f))):
            last[name] = max(last.get(name, 0), rnd)
    names = list(entry.queries())
    rounds = [last.get(n, 0) for n in names]
    assert rounds == sorted(rounds), (
        "registry order must be ascending in last-driver-sampled round"
    )
