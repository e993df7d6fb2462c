"""tools/scale_up.py is tested infrastructure, not a one-off script:
the sf1.0 scale record (SCALE_r5.json, SURVEY §4.3) rests on the claim
that the scaled data is deterministic and referentially intact."""

from __future__ import annotations

import subprocess
import sys
import os
import hashlib

import duckdb
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001"


def _run(dst: str, copies: int = 3) -> None:
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "scale_up.py"),
         SRC, dst, str(copies)],
        check=True, capture_output=True,
    )


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scaleup") / "out")
    _run(dst)
    return dst


def test_row_counts_and_fixed_dims(scaled):
    con = duckdb.connect()
    for t, mult in [("region", 1), ("nation", 1), ("customer", 3),
                    ("orders", 3), ("lineitem", 3), ("documents", 3),
                    ("embeddings", 3), ("events", 3)]:
        n_src = con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        n_dst = con.execute(
            f"SELECT count(*) FROM read_parquet('{scaled}/{t}.parquet')"
        ).fetchone()[0]
        assert n_dst == n_src * mult, t


def test_referential_integrity(scaled):
    con = duckdb.connect()
    probes = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    for fact, fk, dim, pk in probes:
        dangling = con.execute(
            f"SELECT count(*) FROM read_parquet('{scaled}/{fact}.parquet') f "
            f"WHERE NOT EXISTS (SELECT 1 FROM "
            f"read_parquet('{scaled}/{dim}.parquet') d WHERE d.{pk} = f.{fk})"
        ).fetchone()[0]
        assert dangling == 0, (fact, fk)


def test_keys_stay_unique(scaled):
    con = duckdb.connect()
    for t, pk in [("customer", "c_custkey"), ("orders", "o_orderkey"),
                  ("documents", "doc_id"), ("embeddings", "vec_id")]:
        n, d = con.execute(
            f"SELECT count(*), count(DISTINCT {pk}) FROM "
            f"read_parquet('{scaled}/{t}.parquet')"
        ).fetchone()
        assert n == d, t


def test_documents_are_distinct_but_near(scaled):
    """Replica stamps must break exact duplication (so exact dedup is
    not a 10:1 collapse) while n_chars stays consistent with text."""
    con = duckdb.connect()
    n, d = con.execute(
        f"SELECT count(*), count(DISTINCT text) FROM "
        f"read_parquet('{scaled}/documents.parquet')"
    ).fetchone()
    src_distinct = con.execute(
        f"SELECT count(DISTINCT text) FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    assert d >= src_distinct * 3 - src_distinct // 10  # stamps keep copies distinct
    bad = con.execute(
        f"SELECT count(*) FROM read_parquet('{scaled}/documents.parquet') "
        f"WHERE n_chars != length(text)"
    ).fetchone()[0]
    assert bad == 0


def test_deterministic(scaled, tmp_path):
    dst2 = str(tmp_path / "again")
    _run(dst2)
    for t in ("lineitem", "documents", "embeddings"):
        h1 = hashlib.md5(open(f"{scaled}/{t}.parquet", "rb").read()).hexdigest()
        h2 = hashlib.md5(open(f"{dst2}/{t}.parquet", "rb").read()).hexdigest()
        assert h1 == h2, t
