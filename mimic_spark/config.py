"""Config-driven job setup (the reference's etlconf machinery, re-expressed).

The reference merges a global JSON conf with per-workflow confs and CLI
``--set @k=v`` pairs, then substitutes ``@variables`` into SQL/config strings
longest-match-first to a fixpoint (run_workflow.py:264-278;
duckdb_run_script.py:30-51; tested by test/py/test_variable_substitution.py).
Same contract here, for job parameters instead of SQL text.
"""

from __future__ import annotations

import json
from typing import Any

DEFAULTS: dict[str, Any] = {
    "n_events": 100_000,
    "n_convs": 2_000,
    "n_chunks": 16,
    "n_buckets": 32,
    "parallelism": None,  # None => $SPARK_GRAFT_CPUS or all cores
    "workdir": "/tmp/mimic_spark_job",
    "mode": "stream",  # stream | batch
    "expected_final_count": None,
    "fail_on_audit": True,
}


def merge_config(base: dict, override: dict) -> dict:
    """Deep dict merge, override wins (ref duckdb_run_script.py:30-37)."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_config(out[k], v)
        else:
            out[k] = v
    return out


def substitute_variables(text: str, variables: dict[str, str], max_rounds: int = 10) -> str:
    """@var substitution: longest-name-first, iterated to a fixpoint
    (ref duckdb_run_script.py:40-51)."""
    for _ in range(max_rounds):
        before = text
        for name in sorted(variables, key=len, reverse=True):
            text = text.replace(f"@{name}", str(variables[name]))
        if text == before:
            return text
    return text


def load_config(
    conf_path: str | None = None,
    sets: list[str] | None = None,
) -> dict[str, Any]:
    conf = dict(DEFAULTS)
    if conf_path:
        with open(conf_path) as f:
            conf = merge_config(conf, json.load(f))
    for pair in sets or []:
        k, _, v = pair.partition("=")
        k = k.lstrip("@")
        try:
            v2: Any = json.loads(v)
        except json.JSONDecodeError:
            v2 = v
        conf[k] = v2
    variables = {k: v for k, v in conf.items() if isinstance(v, (str, int, float))}
    for k, v in conf.items():
        if isinstance(v, str):
            conf[k] = substitute_variables(v, variables)
    return conf
