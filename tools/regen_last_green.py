#!/usr/bin/env python
"""Regenerate the `_LAST_GREEN` map in lab_etl_spark/queries/__init__.py
from all CORRECTNESS_r*.json files — the per-round rotation chore.

A query's last green round is the highest round whose record shows
``hash_match: true``, or (for rows-only queries) ``err == 'no_oracle'``
with ``spark_rows`` present.  Queries absent from the output have never
been driver-checked and therefore sort FIRST among veterans (see
load_all's ordering), i.e. they enter the next window automatically.

Usage: python tools/regen_last_green.py   # prints the dict body to paste

Names that no longer exist in the registry (e.g. round-1's
q_rollup/q_cube, merged into q_rollup_cube in round 2) are dropped
automatically — registered names are read by regexing the ``register(``
calls in ``lab_etl_spark/queries/*.py``, so no Spark import is needed.
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def registered_names() -> set[str]:
    out: set[str] = set()
    for path in glob.glob(
        os.path.join(ROOT, "lab_etl_spark", "queries", "*.py")
    ):
        src = open(path).read()
        out |= set(re.findall(r'register\(\s*\n?\s*"(q_\w+)"', src))
        out |= set(re.findall(r'@register\(\s*"(q_\w+)"', src))
    return out


def last_green() -> dict[str, int]:
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        data = json.load(open(path))
        records = data if isinstance(data, list) else data.get("queries", data)
        if isinstance(records, dict):
            records = [dict(v, name=k) for k, v in records.items()]
        for rec in records:
            name = rec.get("name") or rec.get("query")
            if not name:
                continue
            ok = rec.get("hash_match") is True or (
                rec.get("err") == "no_oracle"
                and rec.get("spark_rows") is not None
            )
            if ok:
                out[name] = max(out.get(name, 0), rnd)
    return out


if __name__ == "__main__":
    lg = last_green()
    live = registered_names()
    dead = sorted(set(lg) - live)
    lg = {n: r for n, r in lg.items() if n in live}
    if dead:
        print(f"# dropped {len(dead)} unregistered names: {dead}")
    print(f"# {len(lg)} queries with a driver-green row")
    print("_LAST_GREEN = {")
    line = "   "
    for name, rnd in lg.items():
        frag = f' "{name}": {rnd},'
        if len(line) + len(frag) > 78:
            print(line)
            line = "   "
        line += frag
    if line.strip():
        print(line)
    print("}")
