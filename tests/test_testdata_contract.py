"""Early-warning tripwire for driver testdata regeneration.

The driver regenerates /root/testdata between rounds, and physical
types have already changed once (round 4: events.ts TIMESTAMP(NANOS)
-> timestamp[us], which broke four queries — one silently — and the
bench). This suite pins the parquet-footer schema of every table so a
regeneration with changed types fails HERE, with a message naming the
exact column, instead of surfacing as downstream query breakage.

A failure here is not necessarily a bug — it means the environment
moved. Triage: (1) check whether the ingestion choke points
(plans/registry.table for events.ts; streaming/replay's footer probe)
already normalize the new encoding; (2) extend the allowed set below
once the queries are verified green on the new encoding.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from .conftest import ORACLE_SF_DIR, SF_DIR

# col -> set of acceptable pyarrow type strings. Multiple entries mean
# the engine is verified encoding-agnostic for that column (events.ts
# is normalized at plans/registry.table; see
# tests/test_event_time_encodings.py).
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": {"int32"}, "r_name": {"string"}},
    "nation": {
        "n_nationkey": {"int32"},
        "n_name": {"string"},
        "n_regionkey": {"int32"},
    },
    "customer": {
        "c_custkey": {"int64"},
        "c_name": {"string"},
        "c_nationkey": {"int32"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string"},
    },
    "supplier": {
        "s_suppkey": {"int64"},
        "s_name": {"string"},
        "s_nationkey": {"int32"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"int64"},
        "p_name": {"string"},
        "p_brand": {"string"},
        "p_type": {"string"},
        "p_size": {"int32"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_custkey": {"int64"},
        "o_orderstatus": {"string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp[us]", "timestamp[us, tz=UTC]"},
        "o_orderpriority": {"string"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_partkey": {"int64"},
        "l_suppkey": {"int64"},
        "l_linenumber": {"int32"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
        "l_shipdate": {"timestamp[us]", "timestamp[us, tz=UTC]"},
    },
    "events": {
        "event_id": {"int64"},
        # all three historical/likely encodings are ingestion-verified
        "ts": {"timestamp[ns]", "timestamp[us]", "timestamp[us, tz=UTC]"},
        "user_id": {"int64"},
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string"},
        "lang": {"string"},
        "source": {"string"},
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<element: double>"},
        "label": {"int32"},
    },
}


@pytest.mark.parametrize("sf_dir", sorted({SF_DIR, ORACLE_SF_DIR}))
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_testdata_schema_contract(sf_dir, table):
    schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
    got = {f.name: str(f.type) for f in schema}
    want = EXPECTED[table]
    assert set(got) == set(want), (
        f"{table} column set changed: got {sorted(got)}, expected "
        f"{sorted(want)} — the driver regenerated testdata with a new "
        "layout; re-verify every query touching this table"
    )
    for col, typ in got.items():
        assert typ in want[col], (
            f"{table}.{col} physical type changed to {typ!r} (allowed: "
            f"{sorted(want[col])}) — the round-4 failure mode. Check the "
            "ingestion choke points (plans/registry.table, "
            "streaming/replay footer probe), verify queries green on the "
            "new encoding, then extend the allowed set here"
        )


@pytest.mark.parametrize("sf_dir", sorted({SF_DIR, ORACLE_SF_DIR}))
def test_event_id_is_unique(sf_dir):
    """stream_dedup_replay's oracle (plans/stream_queries.py) is the
    plain events table, which is only correct while event_id is a key.
    If regeneration ever introduces duplicate ids, that oracle must
    switch to an explicit survivor rule."""
    import duckdb

    n, d = duckdb.sql(
        f"SELECT count(*), count(DISTINCT event_id) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    assert n == d, (
        f"events.event_id no longer unique ({n} rows, {d} ids) — "
        "stream_dedup_replay's oracle assumption is broken"
    )
