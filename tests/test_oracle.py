"""Oracle parity: every registered query with an oracle must match DuckDB
exactly (row count + columns + bit-exact values) at sf0.001 — a local
mirror of the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_weather_spark.registry import load_all
from tools.check_oracle import compare_one, duck_con


def _specs():
    return sorted(load_all().items())


def _module_representatives() -> list[str]:
    """One query per operator module (alphabetically first), always
    run: a cheap canary that every module's registration, load_table
    path and oracle machinery still work. The FULL 423-query sweep is
    the ``sweep``-marked test below (plus the committed
    LOCAL_CORRECTNESS.json artifact, which test_local_correctness
    gates against the live registry)."""
    by_module: dict[str, str] = {}
    for name, spec in _specs():
        mod = getattr(spec.fn, "__module__", "?")
        by_module.setdefault(mod, name)
    return sorted(by_module.values())


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _module_representatives())
def test_module_canary_matches_oracle(name, spark, con, sf_dir):
    spec = load_all()[name]
    res = compare_one(name, spec, spark, con, sf_dir)
    assert res["status"] in ("OK", "ROWS_ONLY"), res


@pytest.mark.sweep
@pytest.mark.parametrize("name", [n for n, _ in _specs()])
def test_query_matches_oracle(name, spark, con, sf_dir):
    spec = load_all()[name]
    res = compare_one(name, spec, spark, con, sf_dir)
    assert res["status"] in ("OK", "ROWS_ONLY"), res
